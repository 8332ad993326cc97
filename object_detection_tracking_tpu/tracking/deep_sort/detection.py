"""Detection container (reference deep_sort/detection.py)."""

from __future__ import annotations

import numpy as np


class Detection:
    """One detection: tlwh box, confidence, appearance feature."""

    __slots__ = ("tlwh", "confidence", "feature", "_xyah")

    def __init__(self, tlwh, confidence, feature):
        self.tlwh = np.asarray(tlwh, np.float32)
        self.confidence = float(confidence)
        self.feature = np.asarray(feature, np.float32)
        # xyah is read once per (track row, cascade level) in the gate —
        # hot enough on the host CPU to precompute (92k calls/bench run)
        out = self.tlwh.copy()
        out[:2] += out[2:] / 2
        out[2] /= out[3]
        self._xyah = out

    def to_tlbr(self) -> np.ndarray:
        out = self.tlwh.copy()
        out[2:] += out[:2]
        return out

    def to_xyah(self) -> np.ndarray:
        return self._xyah.copy()
