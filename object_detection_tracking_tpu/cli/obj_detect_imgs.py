"""Image-list object detection CLI.

Covers the reference obj_detect_imgs.py / _multi / _multi_queuer trio —
batching and the threaded prefetch enqueuer are always on. Writes one
detection json per image (same schema as the video CLI / eval.py input).

Example:
  python -m object_detection_tracking_tpu.cli.obj_detect_imgs \
    --img_lst imgs.lst --out_dir out_json \
    --model_path model.npz --version 5 --num_class 16 \
    --im_batch_size 8 --num_cpu_worker 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from ..data import DatasetEnqueuer, ImageDataset
from ..runtime import DetectionRunner, enable_persistent_cache
from .obj_detect_tracking import build_config


def get_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--img_lst", required=True,
                        help="file with one image path per line")
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--version", type=int, default=4)
    parser.add_argument("--num_class", type=int, default=16)
    parser.add_argument("--is_coco_model", action="store_true")
    parser.add_argument("--use_partial_classes", action="store_true")
    parser.add_argument("--resnet18", action="store_true")
    parser.add_argument("--resnet34", action="store_true")
    parser.add_argument("--resnet50", action="store_true")
    parser.add_argument("--resnet152", action="store_true")
    parser.add_argument("--is_efficientdet", action="store_true")
    parser.add_argument("--efficientdet_modelname", default="efficientdet-d0")
    parser.add_argument("--efficientdet_max_detection_topk", type=int,
                        default=5000)
    parser.add_argument("--add_mask", action="store_true",
                        help="Mask-RCNN head: segmentation RLE in the json")
    parser.add_argument("--actasobj", action="store_true")
    # architecture toggles layered over --version (None = preset value)
    for flag in ("use_dilations", "use_deformable", "use_se", "use_resnext",
                 "use_gn", "use_frcnn_class_agnostic", "use_att_frcnn_head",
                 "use_conv_frcnn_head", "add_relation_nn"):
        parser.add_argument("--" + flag, action="store_true", default=None)
    parser.add_argument("--rpn_test_post_nms_topk", type=int, default=None)
    parser.add_argument("--person_only", action="store_true",
                        help="only write Person detections")
    parser.add_argument("--only_classes", default=None,
                        help="comma list: only write these class names")
    parser.add_argument("--visualize", action="store_true")
    parser.add_argument("--vis_path", default="/tmp/vis")
    parser.add_argument("--vis_thres", type=float, default=0.7)
    parser.add_argument("--max_size", type=int, default=1920)
    parser.add_argument("--short_edge_size", type=int, default=1080)
    parser.add_argument("--im_batch_size", type=int, default=1)
    parser.add_argument("--num_cpu_worker", type=int, default=1)
    parser.add_argument("--prefetch", type=int, default=5)
    parser.add_argument("--threshold_conf", type=float, default=0.0001)
    parser.add_argument("--compute_dtype", default="bfloat16")
    parser.add_argument("--use_my_naming", action="store_true")
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    enable_persistent_cache()
    cfg = build_config(args)

    import jax
    from ..models import get_model
    from ..utils.weights import load_weights

    model = get_model(
        cfg, "efficientdet" if args.is_efficientdet else "faster_rcnn")
    if args.model_path:
        params = load_weights(args.model_path, model)
    else:
        print("warning: no --model_path, using random weights",
              file=sys.stderr)
        params = model.init_params(jax.random.PRNGKey(0))
    runner = DetectionRunner(model, params)
    classid2name = cfg.classid2name

    only = None
    if args.person_only:
        only = {"Person", "person"}
    elif args.only_classes:
        only = set(args.only_classes.split(","))
    with open(args.img_lst) as f:
        paths = [l.strip() for l in f if l.strip()]
    os.makedirs(args.out_dir, exist_ok=True)

    ds = ImageDataset(paths, args.short_edge_size, args.max_size,
                      batch_size=args.im_batch_size)
    enq = DatasetEnqueuer(ds, prefetch=args.prefetch,
                          num_workers=args.num_cpu_worker)

    def batch_iter():
        for batch in enq.get():
            yield batch["imgs"], batch

    start = time.time()
    count = 0
    for host, batch in runner.run(batch_iter()):
        for bi, img_name in enumerate(batch["img_names"]):
            scale = batch["scales"][bi]
            valid = host["final_valid"][bi]
            pred = []
            vis_rows = []
            for i in np.flatnonzero(valid):
                box = host["final_boxes"][bi][i] / scale
                cat_id = int(host["final_labels"][bi][i])
                if only is not None and \
                        classid2name.get(cat_id) not in only:
                    continue
                if args.visualize and \
                        host["final_probs"][bi][i] >= args.vis_thres:
                    vis_rows.append((box, cat_id,
                                     float(host["final_probs"][bi][i])))
                pred.append({
                    "category_id": cat_id,
                    "cat_name": classid2name.get(cat_id, str(cat_id)),
                    "score": float(round(float(host["final_probs"][bi][i]),
                                         7)),
                    "bbox": [round(float(box[0]), 2), round(float(box[1]), 2),
                             round(float(box[2] - box[0]), 2),
                             round(float(box[3] - box[1]), 2)],
                    "segmentation": None,
                })
            out_name = os.path.splitext(img_name)[0] + ".json"
            with open(os.path.join(args.out_dir, out_name), "w") as f:
                json.dump(pred, f)
            if args.visualize and vis_rows:
                import cv2

                from ..utils.viz import draw_boxes
                im = cv2.imread(batch["img_paths"][bi])
                if im is not None:
                    labels = ["%s_%.2f" % (classid2name.get(c, "?"), pb)
                              for _, c, pb in vis_rows]
                    newim = draw_boxes(im, [b for b, _, _ in vis_rows],
                                       labels)
                    os.makedirs(args.vis_path, exist_ok=True)
                    cv2.imwrite(os.path.join(
                        args.vis_path, os.path.basename(img_name)), newim)
            count += 1
    elapsed = time.time() - start
    print("processed %d images in %.1fs (%.2f/s)"
          % (count, elapsed, count / max(elapsed, 1e-6)))


if __name__ == "__main__":
    main()
