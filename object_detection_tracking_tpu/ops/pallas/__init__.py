"""Pallas TPU kernels for the hot ops XLA handles poorly.

ROIAlign: XLA lowers the 6M-index bilinear gather to ~50 GB/s effective —
the Pallas kernel (roi_align_pallas.py) replaces it with per-ROI window DMAs
+ on-chip interpolation matmuls, ~20x faster at B=8x1000 ROIs.
"""

from .roi_align_pallas import multilevel_roi_align_pallas  # noqa: F401
