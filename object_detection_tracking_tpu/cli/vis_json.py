"""Visualize per-frame detection json onto frames (reference vis_json.py).

  python -m object_detection_tracking_tpu.cli.vis_json \
    videos.lst --video_dir videos --jsonpath out_json --despath vis \
    --score_thres 0.5
"""

from __future__ import annotations

import argparse
import json
import os


from ..data import open_video
from ..utils.viz import draw_boxes


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("videonamelst")
    p.add_argument("--video_dir", required=True)
    p.add_argument("--jsonpath", required=True)
    p.add_argument("--despath", required=True)
    p.add_argument("--score_thres", type=float, default=0.4)
    p.add_argument("--frame_gap", type=int, default=8)
    return p.parse_args(argv)


def main(argv=None):
    import cv2
    args = get_args(argv)
    with open(args.videonamelst) as f:
        videos = [l.strip() for l in f if l.strip()]
    for video in videos:
        videoname = os.path.splitext(os.path.basename(video))[0]
        vcap = open_video(os.path.join(args.video_dir, video))
        out_dir = os.path.join(args.despath, videoname)
        os.makedirs(out_dir, exist_ok=True)
        idx = 0
        n = 0
        while True:
            ok, frame = vcap.read()
            if not ok:
                break
            jf = os.path.join(args.jsonpath, videoname, f"{idx}.json")
            if os.path.exists(jf):
                with open(jf) as f:
                    dets = json.load(f)
                dets = [d for d in dets if d["score"] >= args.score_thres]
                boxes = [[d["bbox"][0], d["bbox"][1],
                          d["bbox"][0] + d["bbox"][2],
                          d["bbox"][1] + d["bbox"][3]] for d in dets]
                labels = ["%s_%.2f" % (d["cat_name"], d["score"])
                          for d in dets]
                frame = draw_boxes(frame, boxes, labels)
                cv2.imwrite(os.path.join(
                    out_dir, "%s_F_%08d.jpg" % (videoname, idx)), frame)
                n += 1
            idx += 1
        print(f"{videoname}: wrote {n} vis frames")


if __name__ == "__main__":
    main()
