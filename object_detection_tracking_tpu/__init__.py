"""object_detection_tracking_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
CMU DIVA/ActEV surveillance-video analysis stack (object detection +
multi-object tracking + ReID).

Capability reference: JunweiLiang/Object_Detection_Tracking (TF1/CUDA).
This package is a ground-up redesign for TPU: every detector forward is a
single jit-compiled function with static padded shapes; hot ops (ROIAlign,
NMS) are shape-static masked kernels; scale-out is `jax.sharding.Mesh` +
XLA collectives; trackers run host-side on numpy with batched on-device
embedding preparation.

Layout:
  config.py       typed config (replaces per-script argparse derivations)
  class_ids.py    class taxonomies (ActEV/DIVA, COCO)
  ops/            box math, anchors, ROIAlign, NMS, norm layers, pallas kernels
  models/         ResNet-FPN Faster-RCNN, EfficientDet, ReID nets
  tracking/       Deep SORT + TMOT/JDE trackers, Kalman, assignment
  data/           video decode, prefetch enqueuers, datasets
  parallel/       mesh/sharding helpers, pjit train/infer steps
  runtime/        AOT compile cache, performance logger
  train/          losses, schedules, trainer, eval
  utils/          weight converters, visualization
  cli/            entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
