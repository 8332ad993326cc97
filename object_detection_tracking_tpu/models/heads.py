"""Fast-RCNN box heads and Mask-RCNN head (functional NHWC).

Reference: fastrcnn_2fc_head (models.py:1030-1108), class-agnostic variant
(models.py:1126-1172), conv head (models.py:1110-1124), mask up4conv head
(models.py:1173-1202).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from typing import Optional

from .layers import conv2d, deconv2d, dense, init_conv, init_dense


def init_fastrcnn_2fc_head(rng, num_class: int, feat_dim: int = 256,
                           pool: int = 7, fc_dim: int = 1024,
                           class_agnostic: bool = False,
                           add_relation_nn: bool = False,
                           use_att_head: bool = False,
                           use_conv_head: bool = False,
                           conv_dim: int = 256) -> Dict:
    rngs = list(jax.random.split(rng, 12))
    num_box_class = 1 if class_agnostic else num_class
    p: Dict = {
        "outputs": {
            "class": init_dense(rngs[2], fc_dim, num_class, "normal", 0.01),
            "box": init_dense(rngs[3], fc_dim, num_box_class * 4,
                              "normal", 0.001),
        },
    }
    if use_conv_head:
        c_in = feat_dim
        for k in range(4):
            p[f"conv{k}"] = init_conv(rngs[4 + k], 3, c_in, conv_dim,
                                      use_bias=True, w_init="msra_fanout")
            c_in = conv_dim
        p["fc"] = init_dense(rngs[8], pool * pool * conv_dim, fc_dim,
                             "xavier1")
    else:
        p["fc6"] = init_dense(rngs[0], pool * pool * feat_dim, fc_dim,
                              "xavier1")
        p["fc7"] = init_dense(rngs[1], fc_dim, fc_dim, "xavier1")
    if add_relation_nn:
        from .relation import init_relation
        p["RM_r1"] = init_relation(rngs[9], fc_dim)
        p["RM_r2"] = init_relation(rngs[10], fc_dim)
    if use_att_head:
        r_att = jax.random.split(rngs[11])
        p["attention"] = init_conv(r_att[0], 3, feat_dim, 1, use_bias=True,
                                   w_init="xavier1")
        p["att_trans"] = init_dense(r_att[1], feat_dim, fc_dim, "xavier1")
    return p


def fastrcnn_2fc_head(params, feature: jnp.ndarray, num_class: int,
                      class_agnostic: bool = False,
                      boxes: Optional[jnp.ndarray] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """feature [K, 7, 7, C] -> (class logits [K, num_class],
    box deltas [K, num_class-1 (or 1), 4]).

    Matches models.py:1030-1172: two ReLU FCs (or the 4-conv head), then
    linear class/box heads; non-agnostic drops the BG box row. Optional
    relation-network residuals (needs boxes of ONE image) and the conv
    attention head (models.py:1064-1089)."""
    if "fc6" in params:
        hidden = jax.nn.relu(dense(params["fc6"], feature))
        if "RM_r1" in params:
            from .relation import relation_network
            hidden = hidden + relation_network(params["RM_r1"], hidden,
                                               boxes)
        hidden = jax.nn.relu(dense(params["fc7"], hidden))
        if "RM_r2" in params:
            from .relation import relation_network
            hidden = hidden + relation_network(params["RM_r2"], hidden,
                                               boxes)
    else:  # conv head (models.py:1110-1124)
        l = feature
        for k in range(4):
            l = jax.nn.relu(conv2d(params[f"conv{k}"], l, padding="SAME"))
        hidden = jax.nn.relu(dense(params["fc"], l))

    if "attention" in params:
        # [K, 7, 7, 1] softmax over spatial positions
        att = conv2d(params["attention"], feature, padding="SAME")
        k_, h_, w_, c_ = feature.shape
        att = jax.nn.softmax(att.reshape(k_, h_ * w_, 1), axis=1)
        attended = (feature.reshape(k_, h_ * w_, c_) * att).sum(axis=1)
        hidden = hidden + jax.nn.relu(
            dense(params["att_trans"], attended))

    classification = dense(params["outputs"]["class"], hidden)
    box = dense(params["outputs"]["box"], hidden)
    if class_agnostic:
        box = box.reshape(-1, 1, 4)
    else:
        box = box.reshape(-1, num_class, 4)[:, 1:, :]
    return classification, box


def init_maskrcnn_head(rng, num_class: int, feat_dim: int = 256,
                       head_dim: int = 256, num_conv: int = 4) -> Dict:
    rngs = list(jax.random.split(rng, num_conv + 2))
    p: Dict = {}
    c_in = feat_dim
    for k in range(num_conv):
        p[f"fcn{k}"] = init_conv(rngs[k], 3, c_in, head_dim, use_bias=True,
                                 w_init="msra_fanout")
        c_in = head_dim
    p["deconv"] = init_conv(rngs[num_conv], 2, head_dim, head_dim,
                            use_bias=True, w_init="msra_fanout")
    p["conv"] = init_conv(rngs[num_conv + 1], 1, head_dim, num_class - 1,
                          use_bias=True, w_init="msra_fanout")
    return p


def maskrcnn_up4conv_head(params, feature: jnp.ndarray, num_class: int,
                          num_conv: int = 4) -> jnp.ndarray:
    """feature [K, 14, 14, C] -> mask logits [K, 28, 28, num_class-1]
    (models.py:1173-1202)."""
    l = feature
    for k in range(num_conv):
        l = jax.nn.relu(conv2d(params[f"fcn{k}"], l, padding="SAME"))
    l = jax.nn.relu(deconv2d(params["deconv"], l, stride=2))
    return conv2d(params["conv"], l)
