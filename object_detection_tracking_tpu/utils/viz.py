"""Drawing helpers (reference utils.py:727-790, viz.py:143-376).

Host-side cv2 drawing for --visualize outputs and the track/json viewers.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# distinct color palette (reference PALETTE_HEX, utils.py:850)
PALETTE_HEX = [
    "#FFFF00", "#1CE6FF", "#FF34FF", "#FF4A46", "#008941", "#006FA6",
    "#A30059", "#FFDBE5", "#7A4900", "#0000A6", "#63FFAC", "#B79762",
    "#004D43", "#8FB0FF", "#997D87", "#5A0007", "#809693", "#FEFFE6",
    "#1B4400", "#4FC601", "#3B5DFF", "#4A3B53", "#FF2F80", "#61615A",
    "#BA0900", "#6B7900", "#00C2A0", "#FFAA92", "#FF90C9", "#B903AA",
]


def hex_to_bgr(h: str):
    h = h.lstrip("#")
    r, g, b = (int(h[i:i + 2], 16) for i in (0, 2, 4))
    return (b, g, r)


PALETTE_BGR = [hex_to_bgr(h) for h in PALETTE_HEX]


def color_for_id(track_id: int):
    return PALETTE_BGR[int(track_id) % len(PALETTE_BGR)]


def draw_boxes(im: np.ndarray, boxes: Sequence, labels: Optional[List[str]]
               = None, colors=None, font_scale: float = 0.5,
               thickness: int = 2) -> np.ndarray:
    """boxes x1y1x2y2; returns a drawn copy (utils.py:727)."""
    im = im.copy()
    for i, box in enumerate(boxes):
        x1, y1, x2, y2 = [int(round(float(v))) for v in box]
        color = (colors[i] if colors is not None else (255, 0, 0))
        if isinstance(color, np.ndarray):
            color = tuple(int(c) for c in color)
        cv2.rectangle(im, (x1, y1), (x2, y2), color, thickness)
        if labels is not None:
            cv2.putText(im, labels[i], (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, 1,
                        cv2.LINE_AA)
    return im


def draw_tracks(im: np.ndarray, rows: np.ndarray,
                thickness: int = 2) -> np.ndarray:
    """rows: [N, >=6] (frame, id, x, y, w, h) already filtered to one
    frame; per-id stable colors (vis_tracks.py)."""
    boxes = []
    labels = []
    colors = []
    for r in rows:
        tid = int(r[1])
        x, y, w, h = r[2:6]
        boxes.append([x, y, x + w, y + h])
        labels.append(f"#{tid}")
        colors.append(color_for_id(tid))
    return draw_boxes(im, boxes, labels, colors, thickness=thickness)
