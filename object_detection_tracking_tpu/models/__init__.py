"""Model zoo: ResNet-FPN Faster/Mask-RCNN (flagship), EfficientDet, ReID nets.

All models are pure functions over parameter pytrees: ``init_params(rng)``
builds the pytree, ``forward(params, image)`` is jit-compiled with static
shapes. The factory mirrors the reference ``get_model`` (models.py:97-132).
"""

from .faster_rcnn import FasterRCNNFPN  # noqa: F401


def get_model(config, model_name: str = None):
    if model_name is None:
        model_name = getattr(config, "model", "faster_rcnn")
    if model_name in ("faster_rcnn", "mask_rcnn"):
        return FasterRCNNFPN(config)
    if model_name == "efficientdet":
        from .efficientdet import EfficientDet
        return EfficientDet(config)
    raise ValueError(f"unknown model {model_name!r}")
