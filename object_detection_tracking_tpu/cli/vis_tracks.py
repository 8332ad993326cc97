"""Visualize MOT track txt onto frames with per-id colors
(reference vis_tracks.py).

  python -m object_detection_tracking_tpu.cli.vis_tracks \
    videos.lst --video_dir videos --trackpath tracks --cat_name Person \
    --despath vis_tracks
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict

import numpy as np

from ..data import open_video
from ..utils.viz import draw_tracks


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("videonamelst")
    p.add_argument("--video_dir", required=True)
    p.add_argument("--trackpath", required=True)
    p.add_argument("--cat_name", default="Person")
    p.add_argument("--despath", required=True)
    return p.parse_args(argv)


def main(argv=None):
    import cv2
    args = get_args(argv)
    with open(args.videonamelst) as f:
        videos = [l.strip() for l in f if l.strip()]
    for video in videos:
        videoname = os.path.splitext(os.path.basename(video))[0]
        txt = os.path.join(args.trackpath, videoname, args.cat_name,
                           f"{videoname}.txt")
        by_frame = defaultdict(list)
        if os.path.exists(txt):
            data = np.loadtxt(txt, delimiter=",", ndmin=2)
            for r in data:
                by_frame[int(r[0])].append(r)
        vcap = open_video(os.path.join(args.video_dir, video))
        out_dir = os.path.join(args.despath, videoname)
        os.makedirs(out_dir, exist_ok=True)
        idx, n = 0, 0
        while True:
            ok, frame = vcap.read()
            if not ok:
                break
            if idx in by_frame:
                frame = draw_tracks(frame, np.asarray(by_frame[idx]))
                cv2.imwrite(os.path.join(
                    out_dir, "%s_F_%08d.jpg" % (videoname, idx)), frame)
                n += 1
            idx += 1
        print(f"{videoname}: wrote {n} track-vis frames")


if __name__ == "__main__":
    main()
