"""Mask / keypoint overlay drawing (reference viz.py:276-361) and the
vis_json CLI mask path, asserted by pixel counts."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from object_detection_tracking_tpu.utils.masks import rle_encode
from object_detection_tracking_tpu.utils.viz import draw_mask, vis_keypoints


def test_draw_mask_blends_and_borders():
    im = np.zeros((32, 32, 3), np.uint8)
    mask = np.zeros((32, 32), np.uint8)
    mask[8:24, 8:24] = 1
    out = draw_mask(im, mask, color=(0, 0, 200), alpha=0.5)
    assert out.dtype == np.uint8 and out.shape == im.shape
    # interior blended toward the color: 0*(1-a) + 200*a = 100 on B... wait
    # color is BGR (0,0,200) -> red channel 100 after blending onto black
    inner = out[12:20, 12:20]
    assert (inner[..., 2] == 100).all()
    # outside untouched
    assert (out[:4, :4] == 0).all()
    # white(ish — LINE_AA) border traced along the contour
    assert (out > 180).all(axis=-1).sum() >= 16


def test_draw_mask_roundtrips_pipeline_rle():
    """The RLE the detection pipeline emits decodes and overlays."""
    from object_detection_tracking_tpu.utils.masks import rle_decode
    mask = np.zeros((24, 40), np.uint8)
    mask[4:12, 10:30] = 1
    rle = rle_encode(mask)
    dec = rle_decode(rle)
    im = np.full((24, 40, 3), 10, np.uint8)
    out = draw_mask(im, dec, color=(200, 0, 0), alpha=0.5, show_border=False)
    changed = (out != im).any(axis=-1)
    np.testing.assert_array_equal(changed, mask.astype(bool))


def test_vis_keypoints_draws_skeleton():
    im = np.zeros((64, 64, 3), np.uint8)
    # a full-confidence upright figure: 17 (x, y) joints in-frame
    xs = np.linspace(20, 44, 17)
    ys = np.linspace(8, 56, 17)
    kps = np.stack([xs, ys, np.full(17, 5.0)])  # scores > kp_thresh
    out = vis_keypoints(im, kps)
    assert out.shape == im.shape
    assert (out.sum(axis=-1) > 0).sum() > 50  # bones + joints got drawn
    # below-threshold keypoints draw nothing
    kps_low = np.stack([xs, ys, np.zeros(17)])
    out_low = vis_keypoints(im, kps_low)
    assert (out_low == 0).all()


def test_vis_json_cli_mask_overlay(tmp_path):
    """End-to-end: video + per-frame json with segmentation -> --show_mask
    writes frames whose masked region is visibly tinted."""
    from object_detection_tracking_tpu.cli import vis_json

    vdir = tmp_path / "videos"
    vdir.mkdir()
    h, w = 48, 64
    vw = cv2.VideoWriter(str(vdir / "v.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    for _ in range(3):
        vw.write(np.zeros((h, w, 3), np.uint8))
    vw.release()
    (tmp_path / "videos.lst").write_text("v.mp4\n")

    mask = np.zeros((h, w), np.uint8)
    mask[10:30, 10:40] = 1
    jdir = tmp_path / "json" / "v"
    jdir.mkdir(parents=True)
    det = {"category_id": 1, "cat_name": "Person", "score": 0.9,
           "bbox": [10, 10, 30, 20], "segmentation": rle_encode(mask)}
    for i in range(3):
        (jdir / f"{i}.json").write_text(json.dumps([det]))

    out = tmp_path / "vis"
    vis_json.main([str(tmp_path / "videos.lst"),
                   "--video_dir", str(vdir),
                   "--jsonpath", str(tmp_path / "json"),
                   "--despath", str(out), "--show_mask"])
    frames = sorted(os.listdir(out / "v"))
    assert len(frames) == 3
    img = cv2.imread(str(out / "v" / frames[0]))
    inner = img[15:25, 15:35].astype(int)
    outer = img[35:45, 45:60].astype(int)
    # the masked interior is tinted well away from the black background
    assert inner.mean() > outer.mean() + 20
