"""FPN neck and RPN head (functional NHWC).

Matches reference fpn_model (nn.py:947-1014): lateral 1x1 convs, top-down
nearest 2x upsample accumulation, posthoc 3x3 convs, p6 = stride-2 subsample
of p5 (1x1/2 max pool == every-other-pixel). RPN head: shared 3x3 conv +
1x1 class/box convs per level (models.py:979-1006).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..ops.norm import init_gn, group_norm
from .layers import conv2d, init_conv, upsample2x_nearest


def init_fpn(rng, c_channels=(256, 512, 1024, 2048), num_channel: int = 256,
             use_gn: bool = False) -> Dict:
    rngs = list(jax.random.split(rng, 8))
    p: Dict = {}
    for i, c in enumerate(c_channels):
        p[f"lateral_1x1_c{i + 2}"] = init_conv(
            rngs[i], 1, c, num_channel, use_bias=True, w_init="xavier1")
        p[f"posthoc_3x3_p{i + 2}"] = init_conv(
            rngs[i + 4], 3, num_channel, num_channel, use_bias=True,
            w_init="xavier1")
        if use_gn:
            p[f"gn_c{i + 2}"] = init_gn(num_channel)
            p[f"gn_p{i + 2}"] = init_gn(num_channel)
    return p


def fpn_model(params, c2345: List[jnp.ndarray],
              use_gn: bool = False) -> List[jnp.ndarray]:
    """c2..c5 NHWC -> [p2, p3, p4, p5, p6]."""
    lat = [conv2d(params[f"lateral_1x1_c{i + 2}"], c)
           for i, c in enumerate(c2345)]
    if use_gn:
        lat = [group_norm(params[f"gn_c{i + 2}"], x)
               for i, x in enumerate(lat)]

    # top-down accumulation (p5 -> p2)
    acc = [lat[3]]
    for idx in range(2, -1, -1):
        up = upsample2x_nearest(acc[-1])
        # upsampled map can overhang by one row/col when the lower level has
        # odd extent; crop to match (static shapes)
        h, w = lat[idx].shape[1:3]
        acc.append(lat[idx] + up[:, :h, :w, :])
    acc = acc[::-1]  # [p2_sum, p3_sum, p4_sum, p5_sum]

    p2345 = [conv2d(params[f"posthoc_3x3_p{i + 2}"], x, padding="SAME")
             for i, x in enumerate(acc)]
    if use_gn:
        p2345 = [group_norm(params[f"gn_p{i + 2}"], x)
                 for i, x in enumerate(p2345)]

    p6 = p2345[-1][:, ::2, ::2, :]  # 1x1/2 max pool == subsample
    return p2345 + [p6]


def init_rpn_head(rng, channel: int = 256, num_anchors: int = 3) -> Dict:
    rngs = list(jax.random.split(rng, 3))
    return {
        "conv0": init_conv(rngs[0], 3, channel, channel, use_bias=True,
                           w_init="normal", stddev=0.01),
        "class": init_conv(rngs[1], 1, channel, num_anchors, use_bias=True,
                           w_init="normal", stddev=0.01),
        "box": init_conv(rngs[2], 1, channel, 4 * num_anchors, use_bias=True,
                         w_init="normal", stddev=0.01),
    }


def rpn_head(params, feat: jnp.ndarray,
             num_anchors: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """feat [B, FH, FW, C] -> (label_logits [B, FH, FW, A],
    box_logits [B, FH, FW, A, 4]). Shared across levels."""
    h = jax.nn.relu(conv2d(params["conv0"], feat, padding="SAME"))
    label = conv2d(params["class"], h)
    box = conv2d(params["box"], h)
    b, fh, fw, _ = box.shape
    box = box.reshape(b, fh, fw, num_anchors, 4)
    return label, box
