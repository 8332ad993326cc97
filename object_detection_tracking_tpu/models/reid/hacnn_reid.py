"""HACNN (Harmonious Attention CNN) ReID forward.

Architecture parity with torchreid/models/hacnn.py:9-414: fixed 160x64
input; three Inception(A+B) global blocks, each gated by a soft attention
map (spatial stream: channel-mean -> 3x3/2 conv -> x2 bilinear
(align_corners) -> 1x1 conv; channel stream: SE-style 1x1 pair; combined
through a sigmoid 1x1 conv) and paired with a hard attention that
predicts 4 vertical-part translations; a local branch spatially
transforms each part (affine_grid/grid_sample semantics,
align_corners=False, zero padding), resizes to a fixed size
(align_corners=True) and runs InceptionB towers with cross-block
accumulation. Output = concat of L2-normalized global and local
512-d embeddings. Params are flat torch-named dicts with HWIO kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import bn, conv, global_avg_pool, linear, max_pool

REGION_SCALE_Y = 0.25  # scale_factors: [[1, 0], [0, 0.25]] (hacnn.py:295-309)


def _convblock(p, pre, x, stride=1, padding=0):
    return jax.nn.relu(bn(p, pre + ".bn",
                          conv(p, pre + ".conv", x, stride=stride,
                               padding=padding)))


def _avg_pool_3_1_1(x):
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / 9.0


def _inception_a(p, pre, x):
    s1 = _convblock(p, pre + ".stream1.1",
                    _convblock(p, pre + ".stream1.0", x), padding=1)
    s2 = _convblock(p, pre + ".stream2.1",
                    _convblock(p, pre + ".stream2.0", x), padding=1)
    s3 = _convblock(p, pre + ".stream3.1",
                    _convblock(p, pre + ".stream3.0", x), padding=1)
    s4 = _convblock(p, pre + ".stream4.1", _avg_pool_3_1_1(x))
    return jnp.concatenate([s1, s2, s3, s4], axis=-1)


def _inception_b(p, pre, x):
    s1 = _convblock(p, pre + ".stream1.1",
                    _convblock(p, pre + ".stream1.0", x), stride=2,
                    padding=1)
    s2 = _convblock(p, pre + ".stream2.1",
                    _convblock(p, pre + ".stream2.0", x), padding=1)
    s2 = _convblock(p, pre + ".stream2.2", s2, stride=2, padding=1)
    s3 = _convblock(p, pre + ".stream3.1", max_pool(x, 3, 2, 1))
    return jnp.concatenate([s1, s2, s3], axis=-1)


def _resize_ac(x, out_h, out_w):
    """Bilinear resize with align_corners=True (torch F.upsample)."""

    def axis_weights(n_in, n_out):
        o = jnp.arange(n_out, dtype=jnp.float32)[:, None]
        i = jnp.arange(n_in, dtype=jnp.float32)[None, :]
        src = o * ((n_in - 1) / max(n_out - 1, 1))
        return jnp.maximum(0.0, 1.0 - jnp.abs(src - i))     # [out, in]

    wy = axis_weights(x.shape[1], out_h).astype(x.dtype)
    wx = axis_weights(x.shape[2], out_w).astype(x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wy, x)
    return jnp.einsum("ow,bhwc->bhoc", wx, x)


def _soft_attn(p, pre, x):
    # spatial stream (hacnn.py:91-112)
    s = x.mean(axis=-1, keepdims=True)
    s = _convblock(p, pre + ".spatial_attn.conv1", s, stride=2, padding=1)
    s = _resize_ac(s, s.shape[1] * 2, s.shape[2] * 2)
    s = _convblock(p, pre + ".spatial_attn.conv2", s)
    # channel stream (SE, hacnn.py:115-130)
    c = x.mean(axis=(1, 2), keepdims=True)
    c = _convblock(p, pre + ".channel_attn.conv1", c)
    c = _convblock(p, pre + ".channel_attn.conv2", c)
    y = s * c
    return jax.nn.sigmoid(bn(p, pre + ".conv.bn", conv(p, pre + ".conv.conv",
                                                       y)))


def _hard_attn(p, pre, x):
    v = global_avg_pool(x)
    theta = jnp.tanh(linear(p, pre + ".fc", v))
    return theta.reshape(-1, 4, 2)            # [B, region, (tx, ty)]


def _stn(x, tx, ty):
    """grid_sample(affine_grid([[1,0,tx],[0,0.25,ty]]), bilinear,
    zero padding, align_corners=False) — separable, so two per-batch
    hat-weight contractions (hacnn.py:311-320)."""
    b, h, w, _ = x.shape

    def axis_weights(n, scale, t):
        # output grid coord -> normalized -> source pixel coord
        o = jnp.arange(n, dtype=jnp.float32)[None, :, None]   # [1, out, 1]
        i = jnp.arange(n, dtype=jnp.float32)[None, None, :]   # [1, 1, in]
        norm = (2.0 * o + 1.0) / n - 1.0
        src_norm = scale * norm + t[:, None, None]            # [B, out, 1]
        src = ((src_norm + 1.0) * n - 1.0) / 2.0
        return jnp.maximum(0.0, 1.0 - jnp.abs(src - i))       # [B, out, in]

    wy = axis_weights(h, REGION_SCALE_Y, ty).astype(x.dtype)
    wx = axis_weights(w, 1.0, tx).astype(x.dtype)
    x = jnp.einsum("boh,bhwc->bowc", wy, x)
    return jnp.einsum("bow,bhwc->bhoc", wx, x)


def hacnn_reid_forward(p, images: jnp.ndarray,
                       variant: str = "hacnn") -> jnp.ndarray:
    """images: [B, 160, 64, 3] normalized RGB NHWC -> [B, 1024]."""
    del variant
    if images.shape[1:3] != (160, 64):
        raise ValueError("hacnn requires 160x64 input crops "
                         f"(got {images.shape[1:3]})")
    x = _convblock(p, "conv", images, stride=2, padding=1)

    local_sizes = [(24, 28), (12, 14), (6, 7)]
    cur = x
    locals_ = [None] * 4
    for blk in (1, 2, 3):
        g = _inception_a(p, f"inception{blk}.0", cur)
        g = _inception_b(p, f"inception{blk}.1", g)
        attn = _soft_attn(p, f"ha{blk}.soft_attn", g)
        theta = _hard_attn(p, f"ha{blk}.hard_attn", g)
        g_out = g * attn
        oh, ow = local_sizes[blk - 1]
        new_locals = []
        for r in range(4):
            t = _stn(cur, theta[:, r, 0], theta[:, r, 1])
            t = _resize_ac(t, oh, ow)
            if locals_[r] is not None:
                t = t + locals_[r]
            new_locals.append(_inception_b(p, f"local_conv{blk}", t))
        locals_ = new_locals
        cur = g_out

    v_g = global_avg_pool(cur)
    v_g = jnp.maximum(bn(p, "fc_global.1", linear(p, "fc_global.0", v_g)),
                      0.0)
    v_l = jnp.concatenate([global_avg_pool(t) for t in locals_], axis=-1)
    v_l = jnp.maximum(bn(p, "fc_local.1", linear(p, "fc_local.0", v_l)), 0.0)
    v_g = v_g / jnp.linalg.norm(v_g, axis=1, keepdims=True)
    v_l = v_l / jnp.linalg.norm(v_l, axis=1, keepdims=True)
    return jnp.concatenate([v_g, v_l], axis=-1).astype(jnp.float32)
