"""Pallas TPU ROIAlign: window-DMA + interpolation-matmul kernel.

Why: the XLA formulation (ops/roi_align.py) is a [N*2P*2P*4]-index gather,
which the TPU lowers to ~50 GB/s of serialized row fetches — 168 ms for
8x1000 ROIs on a 720p R50-FPN (the single hottest op in the detector).

Design:
  * all FPN levels are packed into one zero-padded HBM buffer
    [B*L, Hmax, Wmax, C];
  * each ROI reads one WIN_Y x WIN_X x C window via async DMA — ROIs are
    processed in blocks of BLK with double-buffered slots so the next
    block's DMAs overlap this block's compute;
  * the exact crop_and_resize fpcoor bilinear (sample k at
    y0 + sh*(k+0.5) - 0.5) becomes two batched matmuls with hat-function
    weight matrices W[k, r] = max(0, 1 - |sample_k - r|) masked by the
    in-image rule — followed by the 2x2 average pool, all in VMEM.

Exactness: identical to the XLA/TF semantics (f32: bit-level with HIGHEST
matmul precision) whenever all 2P samples fall inside the 48x56 window —
true for boxes with long/short aspect <= ~2.8 at their canonical FPN
level, since assignment bounds extent to [14, 28)*sqrt(aspect) px. More
elongated boxes DEMOTE to the coarsest level whose stride fits their long
side (multilevel_roi_align_pallas), so every sample is a true bilinear
read of scale-consistent FPN features instead of the round-1 behavior of
zeroing out-of-window samples (tested vs the exact path at the demoted
level and for approximation quality at the original level). Callers
wanting exact reference level selection for arbitrarily elongated boxes
use the XLA path. Pass bf16 features for half the DMA bytes; the matmuls
then run at bf16 input precision (matches the detector's bf16 path).

Perf study (round 2, v5e, 8000 ROIs @ 720p C=256 bf16, tunnel latency
subtracted; later remeasured with scalar-only readback — any MB-scale
device->host readback in a harness rides the ~25-75 MB/s tunnel and
dominates the timing, which inflated earlier numbers): the kernel is
~19-26 ms for 8x1000 ROIs (~2.5 us/ROI), insensitive to window bytes
(a WIN_Y=8 probe times the same), i.e. bound by per-ROI issue/loop
overhead + overlapped DMA, not bandwidth. Measured and REJECTED: deeper
DMA pipelining (NBUF 4/8), bigger blocks (BLK 4/8), a block-diagonal
fused y-matmul [BLK*14, BLK*48] (forces a window relayout), x-axis-first
contraction. The 2x2 avg pool is folded into the hat-weight matrices
(halves matmul FLOPs, exact). tools/roi_ab_bench.py re-runs the
interleaved A/B matrix via the ODT_ROI_* env overrides.

Mosaic gotchas encoded here (cost a debugging session):
  * W-dim DMA offsets must be multiples of the 8-sublane tile -> x origins
    are stored pre-divided by 8;
  * reshapes that merge the sublane dim into lanes ([Y, X, C]->[Y, X*C])
    silently scramble element order -> contractions use 3D dot_general;
  * SMEM operands are padded to 128 lanes on the minor dim -> meta arrays
    are fields-major [k, N];
  * f32 matmuls run single-pass bf16 unless Precision.HIGHEST.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# FPN level assignment puts a box's extent on its level in [14, 28) px for
# aspect 1 (canonical 224-px box -> 14 px on p4), times sqrt(aspect) on the
# long side. 48x56 covers aspect-stretch up to ~2.8 (tall persons included).
# The env overrides exist ONLY for kernel A/B timing experiments
# (tools/roi_ab_bench.py); the defaults are the supported configuration.
WIN_Y = int(os.environ.get("ODT_ROI_WIN_Y", 48))
WIN_X = int(os.environ.get("ODT_ROI_WIN_X", 56))  # W offsets align to the
#            8-sublane tile (up to 7 px slack)
BLK = int(os.environ.get("ODT_ROI_BLK", 2))   # ROIs per pipeline step
NBUF = int(os.environ.get("ODT_ROI_NBUF", 2))
MAX_ROIS_PER_CALL = 8192   # SMEM meta budget (36 B/roi of 1 MB)


def _kernel(meta_i_ref, meta_f_ref, levels_ref, out_ref,
            win_scratch, out_scratch, in_sems, out_sems,
            *, n_blocks: int, pool: int, c: int, exact: bool):
    s = pool * 2
    pool_pad = ((pool + 7) // 8) * 8
    precision = jax.lax.Precision.HIGHEST if exact else None

    def in_dma(slot, j, blk, r):
        i = blk * BLK + r
        xs = pl.multiple_of(meta_i_ref[2, i] * 8, 8)
        return pltpu.make_async_copy(
            levels_ref.at[meta_i_ref[0, i],
                          pl.ds(meta_i_ref[1, i], WIN_Y),
                          pl.ds(xs, WIN_X), :],
            win_scratch.at[slot, j],
            in_sems.at[slot, j])

    def start_block(slot, blk):
        for j in range(BLK):
            in_dma(slot, j, blk, j).start()

    def wait_block(slot, blk):
        for j in range(BLK):
            in_dma(slot, j, blk, j).wait()

    def out_dma(slot, blk):
        return pltpu.make_async_copy(
            out_scratch.at[slot],
            out_ref.at[pl.ds(blk * BLK, BLK)],
            out_sems.at[slot])

    start_block(0, 0)

    def weights(win, origin, start, spacing, extent):
        """Pool-folded interpolation weights [pool, win] for one axis: the
        2x2 average pool is absorbed by averaging each pair of adjacent
        sample rows of the hat-function matrix (exact — the pool is a mean
        over samples and the contraction is linear)."""
        # two explicit sample rows per pool cell (strided slices don't
        # lower in Mosaic, so build each half from its own iota)
        k = jax.lax.broadcasted_iota(jnp.int32, (pool, 1), 0)
        k = k.astype(jnp.float32)
        r = jax.lax.broadcasted_iota(jnp.int32, (pool, win), 1)
        r = r.astype(jnp.float32)

        def hat(abs_coord):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(abs_coord - origin - r))
            valid = (abs_coord >= 0.0) & (abs_coord <= extent - 1.0)
            return w * valid.astype(jnp.float32)

        a0 = start + spacing * (2.0 * k + 0.5) - 0.5        # [pool, 1]
        a1 = start + spacing * (2.0 * k + 1.5) - 0.5
        return 0.5 * (hat(a0) + hat(a1))                    # [pool, win]

    def body(blk, _):
        slot = blk % NBUF
        nxt = (blk + 1) % NBUF

        @pl.when(blk + 1 < n_blocks)
        def _():
            start_block(nxt, blk + 1)

        wait_block(slot, blk)

        wys, wxs = [], []
        for j in range(BLK):
            i = blk * BLK + j
            wys.append(weights(
                WIN_Y, meta_i_ref[1, i].astype(jnp.float32),
                meta_f_ref[0, i], meta_f_ref[2, i], meta_f_ref[4, i]))
            wxs.append(weights(
                WIN_X, (meta_i_ref[2, i] * 8).astype(jnp.float32),
                meta_f_ref[1, i], meta_f_ref[3, i], meta_f_ref[5, i]))
        wy = jnp.stack(wys)                                  # [BLK, pool, WY]
        wx = jnp.stack(wxs)                                  # [BLK, pool, WX]

        win = win_scratch[slot]                     # [BLK, WY, WX, C]
        dt = win.dtype
        # batched y-contraction; no reshapes (sublane/lane merging scrambles)
        tmp = jax.lax.dot_general(
            wy.astype(dt), win, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision)                    # [BLK, pool, WX, C]
        full = jax.lax.dot_general(
            wx.astype(dt), tmp.astype(dt), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision)                    # [BLK, px, py, C]
        pooled = jnp.swapaxes(full, 1, 2)           # [BLK, py, px, C]
        pooled = jnp.pad(
            pooled, ((0, 0), (0, 0), (0, pool_pad - pool), (0, 0)))

        @pl.when(blk >= NBUF)
        def _():
            out_dma(slot, blk - NBUF).wait()

        out_scratch[slot] = pooled.astype(out_scratch.dtype)
        out_dma(slot, blk).start()
        return ()

    jax.lax.fori_loop(0, n_blocks, body, (), unroll=False)
    last = n_blocks - 1

    @pl.when(n_blocks >= 2)
    def _():
        out_dma((last - 1) % NBUF, last - 1).wait()

    out_dma(last % NBUF, last).wait()


def _pad8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _roi_align_packed(packed: jnp.ndarray, meta_i: jnp.ndarray,
                      meta_f: jnp.ndarray, pool: int) -> jnp.ndarray:
    """packed [G, Hmax, Wmax, C]; meta_i [3, N] int32 (group, ys, xs/8);
    meta_f [6, N] f32 (y0, x0, sh, sw, h_ext, w_ext) -> [N, pool, pool, C].
    Meta arrays are fields-major: SMEM pads the minor dim to 128 lanes, so
    [N, k] layouts would blow the 1 MB SMEM budget at N=8000. N is padded
    to a multiple of BLK (padding rois have extent 0 -> all-zero output).
    """
    n = meta_i.shape[1]
    c = packed.shape[-1]
    # the prefetched meta arrays live in SMEM (1 MB budget): 9 fields x 4B
    # = 36 B/roi caps one call at ~8k ROIs; chunk bigger workloads (e.g.
    # B=32 x 1000 proposals) over multiple pallas calls on one packed buf
    max_n = MAX_ROIS_PER_CALL
    if n > max_n:
        outs = [
            _roi_align_packed(packed, meta_i[:, i:i + max_n],
                              meta_f[:, i:i + max_n], pool)
            for i in range(0, n, max_n)
        ]
        return jnp.concatenate(outs, axis=0)
    n_pad = ((n + BLK - 1) // BLK) * BLK
    if n_pad != n:
        meta_i = jnp.pad(meta_i, ((0, 0), (0, n_pad - n)))
        meta_f = jnp.pad(meta_f, ((0, 0), (0, n_pad - n)))
    exact = packed.dtype == jnp.float32
    kernel = functools.partial(_kernel, n_blocks=n_pad // BLK, pool=pool,
                               c=c, exact=exact)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((NBUF, BLK, WIN_Y, WIN_X, c), packed.dtype),
            pltpu.VMEM((NBUF, BLK, pool, _pad8(pool), c), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, BLK)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, pool, _pad8(pool), c),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        # CPU (tests / dev boxes) can only interpret Mosaic kernels
        interpret=jax.default_backend() == "cpu",
    )(meta_i, meta_f, packed)
    return out[:n, :, :pool, :]


def multilevel_roi_align_pallas(features: Sequence[jnp.ndarray],
                                boxes: jnp.ndarray,
                                strides: Sequence[int],
                                output_size: int,
                                levels: jnp.ndarray = None) -> jnp.ndarray:
    """Batched FPN ROIAlign. features: list of [B, H_l, W_l, C] (p2..p5);
    boxes [B, N, 4] image-coord x1y1x2y2. Returns [B, N, P, P, C] f32."""
    from ..roi_align import fpn_map_rois_to_levels

    b = boxes.shape[0]
    n = boxes.shape[1]
    L = len(features)
    c = features[0].shape[-1]
    # Mosaic layouts need a full 128-lane channel dim; pad narrow pyramids
    # (e.g. EfficientDet-d0's 64) and slice the output back
    c_pad = max(((c + 127) // 128) * 128, 128)
    if c_pad != c:
        features = [jnp.pad(f, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
                    for f in features]
    hmax = max(max(f.shape[1] for f in features), WIN_Y)
    wmax = max(max(f.shape[2] for f in features), WIN_X)
    padded = [
        jnp.pad(f, ((0, 0), (0, hmax - f.shape[1]), (0, wmax - f.shape[2]),
                    (0, 0))) for f in features
    ]
    # [B, L, Hmax, Wmax, C] -> [B*L, Hmax, Wmax, C]
    packed = jnp.stack(padded, axis=1).reshape(b * L, hmax, wmax, c_pad)

    flat_boxes = boxes.reshape(b * n, 4)
    if levels is None:
        lvl = fpn_map_rois_to_levels(flat_boxes)
        # Aspect-aware level demotion: the canonical FPN assignment bounds
        # a box's extent on its level to [14, 28)*sqrt(aspect) px, so very
        # elongated boxes (aspect > ~2.8) overflow the fixed window and
        # round 1 silently zeroed their out-of-window samples. Bump such
        # boxes to the coarsest level where the long side fits the window
        # — every sample is then a true bilinear read (of 2x-coarser FPN
        # features, which are scale-consistent by construction) instead
        # of zero. Boxes longer than fit*stride[-1] px still clip at the
        # top level (only near-image-diagonal boxes at >1.5k px).
        long_side = jnp.maximum(flat_boxes[:, 2] - flat_boxes[:, 0],
                                flat_boxes[:, 3] - flat_boxes[:, 1])
        # usable extent: window minus x-alignment slack (7) minus the
        # half-pixel sample overhang on each side
        fit = float(min(WIN_Y, WIN_X - 7) - 2)
        for li in range(L - 1):
            overflow = long_side > fit * strides[li]
            lvl = jnp.where((lvl == li) & overflow, li + 1, lvl)
    else:
        lvl = levels.reshape(b * n).astype(jnp.int32)
    lvl = jnp.clip(lvl, 0, L - 1)
    img = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    group = img * L + lvl

    stride = jnp.asarray(strides, jnp.float32)[lvl]
    fb = flat_boxes / stride[:, None]
    y0, x0 = fb[:, 1], fb[:, 0]
    sh = (fb[:, 3] - fb[:, 1]) / (output_size * 2)
    sw = (fb[:, 2] - fb[:, 0]) / (output_size * 2)

    # window origins: first sample's floor, clipped into the padded buffer;
    # x origin stored pre-divided by 8 (sublane-tile alignment for the DMA)
    ys = jnp.clip(jnp.floor(y0 + 0.5 * sh - 0.5), 0, hmax - WIN_Y)
    xs8 = jnp.clip(jnp.floor((x0 + 0.5 * sw - 0.5) / 8.0), 0,
                   (wmax - WIN_X) // 8)

    h_ext = jnp.asarray([f.shape[1] for f in features], jnp.float32)[lvl]
    w_ext = jnp.asarray([f.shape[2] for f in features], jnp.float32)[lvl]

    meta_i = jnp.stack(
        [group, ys.astype(jnp.int32), xs8.astype(jnp.int32)], axis=0)
    meta_f = jnp.stack([y0, x0, sh, sw, h_ext, w_ext], axis=0)

    out = _roi_align_packed(packed, meta_i, meta_f, output_size)
    out = out.reshape(b, n, output_size, output_size, c_pad)
    return out[..., :c]


def _xla_multilevel(features, boxes, strides, output_size):
    from ..roi_align import multilevel_roi_align
    f32 = [f.astype(jnp.float32) for f in features]
    return jax.vmap(lambda *a: multilevel_roi_align(
        list(a[:-1]), a[-1], strides, output_size))(*f32, boxes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def multilevel_roi_align_trainable(features, boxes, strides, output_size):
    """Differentiable ROIAlign: the Pallas window kernel runs the forward;
    the backward recomputes through the (differentiable) XLA gather
    formulation — fast inference-grade forward inside the training step,
    exact scatter-add gradients."""
    return multilevel_roi_align_pallas(list(features), boxes, strides,
                                       output_size)


def _mra_fwd(features, boxes, strides, output_size):
    out = multilevel_roi_align_pallas(list(features), boxes, strides,
                                      output_size)
    return out, (tuple(features), boxes)


def _mra_bwd(strides, output_size, res, g):
    features, boxes = res
    _, vjp = jax.vjp(
        lambda f, b: _xla_multilevel(f, b, strides, output_size),
        features, boxes)
    gf, gb = vjp(g)
    gf = tuple(x.astype(f.dtype) for x, f in zip(gf, features))
    return gf, gb


multilevel_roi_align_trainable.defvjp(_mra_fwd, _mra_bwd)
