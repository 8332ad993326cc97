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


def _write_track_video(tmp_path, n_frames=3, h=48, w=64):
    vdir = tmp_path / "videos"
    vdir.mkdir(exist_ok=True)
    vw = cv2.VideoWriter(str(vdir / "v.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    for _ in range(n_frames):
        vw.write(np.zeros((h, w, 3), np.uint8))
    vw.release()
    (tmp_path / "videos.lst").write_text("v.mp4\n")
    return vdir


def test_vis_tracks_cli_multicat_global_ids(tmp_path):
    """Reference vis_tracks.py parity: Person+Vehicle in one pass, the
    8th MOT column is the multi-camera global id (labels g<id>),
    --show_only_global filters local tracks, --to_video writes an mp4."""
    from object_detection_tracking_tpu.cli import vis_tracks

    vdir = _write_track_video(tmp_path)
    # frame 0: a global Person track (gid 7) + a local Vehicle track
    for cat, rows in {
        "Person": "0,1,5,5,10,20,1,7,-1,-1\n1,1,6,5,10,20,1,7,-1,-1\n",
        "Vehicle": "0,2,30,20,20,12,0.8,-1,-1,-1\n",
    }.items():
        d = tmp_path / "tracks" / "v" / cat
        d.mkdir(parents=True)
        (d / "v.txt").write_text(rows)

    out = tmp_path / "vis"
    vis_tracks.main([str(tmp_path / "videos.lst"),
                     "--video_dir", str(vdir),
                     "--trackpath", str(tmp_path / "tracks"),
                     "--cat_name", "Person,Vehicle",
                     "--despath", str(out)])
    frames = sorted(os.listdir(out / "v"))
    assert len(frames) == 2  # frames 0 and 1 carry tracks
    img0 = cv2.imread(str(out / "v" / frames[0]))
    # both category boxes drew something in their regions
    assert img0[5:25, 5:15].sum() > 0 and img0[20:32, 30:50].sum() > 0

    # --show_only_global drops the local Vehicle row on frame 0
    out2 = tmp_path / "vis_g"
    vis_tracks.main([str(tmp_path / "videos.lst"),
                     "--video_dir", str(vdir),
                     "--trackpath", str(tmp_path / "tracks"),
                     "--cat_name", "Person,Vehicle",
                     "--despath", str(out2), "--show_only_global"])
    g0 = cv2.imread(str(out2 / "v" / sorted(os.listdir(out2 / "v"))[0]))
    assert g0[5:25, 5:15].sum() > 100        # global Person kept
    # local Vehicle dropped: its box interior stays (codec-noise) black
    assert g0[22:30, 32:48].sum() < 50 < img0[22:30, 32:48].sum()

    # --to_video emits a readable mp4 at --video_size with ALL frames
    outv = tmp_path / "vism"
    vis_tracks.main([str(tmp_path / "videos.lst"),
                     "--video_dir", str(vdir),
                     "--trackpath", str(tmp_path / "tracks"),
                     "--cat_name", "Person",
                     "--despath", str(outv), "--to_video",
                     "--video_size", "128x96"])
    cap = cv2.VideoCapture(str(outv / "v.mp4"))
    n, shape = 0, None
    while True:
        ok, f = cap.read()
        if not ok:
            break
        n, shape = n + 1, f.shape
    assert n == 3 and shape == (96, 128, 3)
