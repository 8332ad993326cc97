"""Functional NN layers over explicit parameter pytrees (NHWC).

Parameter names mirror the reference TF variable scopes (``W``/``b`` conv and
dense kernels, nested ``bn`` dicts) so the checkpoint converter is a
near-identity renamer (reference conv2d/dense: nn.py:337-430).

Layout: activations NHWC (TPU-native), conv kernels HWIO (same as the TF
checkpoints, no transpose needed on conversion). Compute dtype is the caller
choice: params live in f32; ``cast`` views them in bf16 for the conv path.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def _pair(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return p


# --------------------------------------------------------------------------
# init


def init_conv(rng, kernel: int, c_in: int, c_out: int, use_bias: bool = True,
              w_init: str = "msra", stddev: float = 0.01, groups: int = 1):
    """Conv kernel HWIO. w_init: msra (variance_scaling 2.0, the reference
    default), msra_fanout, normal (trunc-normal stddev), xavier1 (scale 1)."""
    shape = (kernel, kernel, c_in // groups, c_out)
    if w_init == "msra":
        init = jax.nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
    elif w_init == "msra_fanout":
        init = jax.nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
    elif w_init == "xavier1":
        init = jax.nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")
    elif w_init == "normal":
        init = jax.nn.initializers.normal(stddev)
    else:
        raise ValueError(w_init)
    p = {"W": init(rng, shape, jnp.float32)}
    if use_bias:
        p["b"] = jnp.zeros((c_out,), jnp.float32)
    return p


def init_dense(rng, d_in: int, d_out: int, w_init: str = "xavier1",
               stddev: float = 0.01):
    if w_init == "xavier1":
        init = jax.nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")
    elif w_init == "msra":
        init = jax.nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
    elif w_init == "normal":
        init = jax.nn.initializers.normal(stddev)
    else:
        raise ValueError(w_init)
    return {"W": init(rng, (d_in, d_out), jnp.float32),
            "b": jnp.zeros((d_out,), jnp.float32)}


# --------------------------------------------------------------------------
# apply


def conv2d(params, x: jnp.ndarray, stride: int = 1,
           padding="SAME", dilation: int = 1, groups: int = 1) -> jnp.ndarray:
    """NHWC conv. padding: 'SAME' | 'VALID' | explicit ((t,b),(l,r))."""
    w = params["W"].astype(x.dtype)
    if padding not in ("SAME", "VALID"):
        padding = tuple(tuple(p) for p in padding)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


def dense(params, x: jnp.ndarray) -> jnp.ndarray:
    """Dense over last axis; >2D inputs are flattened to [N, -1] first
    (reference dense flattens roi features, nn.py:730-760). NOTE: the
    flatten order here is NHWC-major — the weight converter permutes TF
    checkpoints' C-major fc6 rows accordingly."""
    if x.ndim > 2:
        x = x.reshape(x.shape[0], -1)
    out = jnp.dot(x, params["W"].astype(x.dtype),
                  preferred_element_type=x.dtype)
    return out + params["b"].astype(x.dtype)


def max_pool(x: jnp.ndarray, window: int, stride: int,
             padding="VALID") -> jnp.ndarray:
    """NHWC max pool; padding 'VALID'|'SAME'|explicit ((t,b),(l,r))."""
    if padding == "VALID":
        pad = ((0, 0), (0, 0))
    elif padding == "SAME":
        raise NotImplementedError("use explicit padding")
    else:
        pad = tuple(tuple(p) for p in padding)
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    if window > 1 and stride > 1:
        # Separable rows-then-cols pool: the fused 2D reduce_window ran
        # 2.00 ms for the backbone's 3x3/2 pool at 8x368x640x64 bf16,
        # the two-pass separable form 1.54 ms (A/B'd against strided-
        # slice max formulations too — those relayout on the W stride
        # and run 5+ ms). Max is associative so values are identical.
        r = jax.lax.reduce_window(
            x, neg, jax.lax.max, (1, window, 1, 1), (1, stride, 1, 1),
            ((0, 0), pad[0], (0, 0), (0, 0)))
        return jax.lax.reduce_window(
            r, neg, jax.lax.max, (1, 1, window, 1), (1, 1, stride, 1),
            ((0, 0), (0, 0), pad[1], (0, 0)))
    # NOTE: init must be -inf for JAX to specialize this to the
    # differentiable reduce_window_max primitive
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0),) + pad + ((0, 0),),
    )


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    return x.mean(axis=(1, 2))


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsampling, NHWC (fpn_model upsample2x,
    nn.py:950-975)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def deconv2d(params, x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """2x transposed conv (mask head deconv, nn.py:383-414). Kernel HWIO."""
    w = params["W"].astype(x.dtype)
    out = jax.lax.conv_transpose(
        x, w, strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out
