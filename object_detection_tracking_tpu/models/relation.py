"""Box relation modules (Hu et al., "Relation Networks for Object
Detection") — reference nn.py:115-330.

relation_network: grouped attention among one image's ROI features with a
log-geometric prior; person_object_relation: the same attending from K
query boxes to R reference (person) boxes, used by the small-object
association heads (models.py:646-690).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from .layers import dense, init_dense


def init_relation(rng, feat_dim: int = 1024, group: int = 16,
                  geo_feat_dim: int = 64) -> Dict:
    r = jax.random.split(rng, 5)
    p = {
        "geo_emb": init_dense(r[0], 4, geo_feat_dim, "xavier1"),
        # 1x1 conv over [*, geo_feat_dim] == dense to group dim
        "geo_conv": init_dense(r[1], geo_feat_dim, group, "xavier1"),
        "query_linear": {"W": init_dense(r[2], feat_dim, feat_dim,
                                         "xavier1")["W"]},
        "key_linear": {"W": init_dense(r[3], feat_dim, feat_dim,
                                       "xavier1")["W"]},
        # reference dense(output, D, keep_first=True) flattens the group
        # dim: W is [group*D, D] (nn.py:186-190)
        "output_linear": {"W": init_dense(r[4], group * feat_dim, feat_dim,
                                          "xavier1")["W"]},
    }
    return p


def geometric_encoding(boxes: jnp.ndarray, ref_boxes: jnp.ndarray
                       ) -> jnp.ndarray:
    """[K, 4] x [R, 4] -> [K, R, 4] log-relative geometry
    (nn.py:273-330; the self-relation case divides delta by the *query*
    width, the pair case by the reference width — both normalized here by
    the second argument's width like geometric_encoding_pair; for
    self-relation pass the same boxes twice, matching the reference's
    transpose formulation)."""
    cx1 = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy1 = (boxes[:, 1] + boxes[:, 3]) * 0.5
    w1 = boxes[:, 2] - boxes[:, 0]
    h1 = boxes[:, 3] - boxes[:, 1]
    cx2 = (ref_boxes[:, 0] + ref_boxes[:, 2]) * 0.5
    cy2 = (ref_boxes[:, 1] + ref_boxes[:, 3]) * 0.5
    w2 = ref_boxes[:, 2] - ref_boxes[:, 0]
    h2 = ref_boxes[:, 3] - ref_boxes[:, 1]
    dx = jnp.log(jnp.maximum(
        jnp.abs((cx1[:, None] - cx2[None, :]) / w2[None, :]), 1e-3))
    dy = jnp.log(jnp.maximum(
        jnp.abs((cy1[:, None] - cy2[None, :]) / w2[None, :]), 1e-3))
    dw = jnp.log(w1[:, None] / w2[None, :])
    dh = jnp.log(h1[:, None] / h2[None, :])
    return jnp.stack([dx, dy, dw, dh], axis=2)


def relation_attend(p, feat: jnp.ndarray, boxes: jnp.ndarray,
                    ref_feat: jnp.ndarray, ref_boxes: jnp.ndarray,
                    group: int = 16) -> jnp.ndarray:
    """Grouped attention [K, D] -> [K, D] over [R, D] references."""
    k, d = feat.shape
    r = ref_feat.shape[0]
    gd = d // group

    geo = geometric_encoding(boxes, ref_boxes)              # [K, R, 4]
    geo = jnp.tanh(dense(p["geo_emb"], geo.reshape(-1, 4)))
    geo = dense(p["geo_conv"], geo).reshape(k, r, group)    # [K, R, G]
    geo_w = jnp.maximum(jax.nn.relu(geo), 1e-6)
    geo_w = jnp.swapaxes(geo_w, 1, 2)                       # [K, G, R]

    q = (feat @ p["query_linear"]["W"]).reshape(k, group, gd)
    kk = (ref_feat @ p["key_linear"]["W"]).reshape(r, group, gd)
    logits = jnp.einsum("kgd,rgd->kgr", q, kk) / math.sqrt(gd)
    weighted = jax.nn.softmax(jnp.log(geo_w) + logits, axis=-1)  # [K, G, R]
    out = jnp.einsum("kgr,rd->kgd", weighted, ref_feat)          # [K, G, D]
    return out.reshape(k, group * d) @ p["output_linear"]["W"]


def relation_network(p, feat, boxes, group: int = 16):
    """Self-relation among one image's boxes (nn.py:115-190)."""
    return relation_attend(p, feat, boxes, feat, boxes, group)


def person_object_relation(p, feat, boxes, ref_boxes, ref_feat,
                           group: int = 16):
    return relation_attend(p, feat, boxes, ref_feat, ref_boxes, group)
