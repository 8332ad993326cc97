"""Pallas TPU ROIAlign: window-DMA + interpolation-matmul kernel.

Why: the XLA formulation (ops/roi_align.py) is a [N*2P*2P*4]-index gather,
which the TPU lowers to ~50 GB/s of serialized row fetches — 168 ms for
8x1000 ROIs on a 720p R50-FPN (the single hottest op in the detector).

Design:
  * all FPN levels are packed into one zero-padded HBM buffer
    [B*L, Hmax, Wmax, C];
  * each ROI reads one window (up to WIN_Y x WIN_X x C; bucket-rounded
    to its actual support with ODT_ROI_BUCKETS=1, see YBUCKETS) via
    async DMA — ROIs are processed in blocks of BLK with double-buffered
    slots so the next block's DMAs overlap this block's compute;
  * the prologue sorts ROIs by (valid desc, level): invalid slots
    (NMS-suppressed) compact to the tail and the pipeline's trip count
    is DYNAMIC — only ceil(n_valid/BLK) blocks march. At realistic
    survivor fractions this dominates: 8x1000 slots at 30% valid run
    7.9 ms vs 17.0 with the static trip count, and the full 720p R50
    forward dropped 54.4 -> 39.4 ms/batch (B=8);
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

Perf study (rounds 2-3, v5e, 8000 ROIs @ 720p C=256 bf16, tunnel latency
subtracted; timing harnesses must reduce on device and read ONE scalar —
any MB-scale device->host readback rides the ~25-75 MB/s tunnel and
dominates). Round-3 ablation of the round-2 kernel (which built the
interpolation weights per ROI on the Mosaic scalar core): weight
construction 41% of kernel time, matmul issue 33%, DMA+loop 26%. The
weights are therefore precomputed for ALL ROIs in XLA (vectorized,
~free) and each block's rows ride one extra contiguous DMA — interleaved
A/B: 2.2x faster than the round-2 kernel, and an ABLATE_MM probe now
times the same as the full kernel, i.e. the matmuls are fully hidden
and the kernel is DMA-issue/loop bound (~1.1 us/ROI). BLK=4 beats 2 and
8; NBUF=4 still crashes this backend's Mosaic (INTERNAL). Also measured
and REJECTED: a fused two-contracting-dims dot_general (unsupported:
"lhs contracting dims must be of size 1"), block-diagonal fused
y-matmul (forces a window relayout), x-axis-first contraction, WIN_Y=8
window shrink (no change — not bandwidth bound). The 2x2 avg pool is
folded into the hat-weight matrices (halves matmul FLOPs, exact).
tools/roi_ab_bench.py re-runs the interleaved A/B matrix via the
ODT_ROI_* env overrides.

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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# FPN level assignment puts a box's extent on its level in [14, 28) px for
# aspect 1 (canonical 224-px box -> 14 px on p4), times sqrt(aspect) on the
# long side. 48x56 covers aspect-stretch up to ~2.8 (tall persons included).
# The env overrides exist ONLY for kernel A/B timing experiments
# (tools/roi_ab_bench.py); the defaults are the supported configuration.
WIN_Y = int(os.environ.get("ODT_ROI_WIN_Y", 40))
WIN_X = int(os.environ.get("ODT_ROI_WIN_X", 48))  # W offsets align to the
#            8-sublane tile (up to 7 px slack)
# Round-3 in-context finding: the isolated A/B below drew large boxes
# (tiny levels, cheap DMA), but the detector's proposals are p2-heavy and
# the kernel in the full forward runs ~43% bandwidth-bound (WIN_Y 48->32
# cut 8x1000-ROI time 20.0->17.2 ms in-context). 40x48 (was 48x56)
# trims window bytes 29% and lowers the demotion threshold fit 46->38 px
# (boxes with long side > 38*stride on their level bump one level —
# reaches ~aspect-1.84+ boxes at the top of their level's size band,
# instead of only >2.8 before).
BLK = int(os.environ.get("ODT_ROI_BLK", 4))   # ROIs per pipeline step
NBUF = int(os.environ.get("ODT_ROI_NBUF", 2))
# Bucketed window DMAs (ODT_ROI_BUCKETS=1, default OFF): a ROI whose
# nonzero-weight support spans fewer rows/cols than the full window only
# DMAs the bucket-rounded prefix of it (stale scratch beyond the prefix
# is killed by the zero hat weights, same mechanism as invalid-ROI
# skipping). Measured and REJECTED as the default: the kernel is
# DMA-issue-bound, not bandwidth-bound — isolated all-valid 8x1000 ROIs
# 17.0 -> 19.2 ms (the 3x3 predicate fan-out costs scalar-core issue
# time), in-context full forward 40.1 vs 39.4 ms without. Kept behind
# the env knob because the byte saving (~2.2x on p2-heavy mixes) may pay
# on bandwidth-contended shapes. X buckets stay multiples of 8 (sublane
# tile).
YBUCKETS = tuple(sorted({min(24, WIN_Y), min(32, WIN_Y), WIN_Y}))
XBUCKETS = tuple(sorted({min(24, WIN_X), min(32, WIN_X), WIN_X}))


def _bucket_lists():
    # CPU interpret mode evaluates every predicated DMA branch per block
    # (~10x slower with the 3x3 bucket fan-out), so it runs the
    # full-window single bucket; the partial-window path is covered by a
    # forced-bucket interpret test (test_pallas_roi_align.py) and by the
    # TPU-vs-XLA parity checks. ODT_ROI_BUCKETS=1 opts in on TPU (A/B
    # timing knob, tools/roi_ab_bench.py; see YBUCKETS note).
    if jax.default_backend() == "cpu" or not _USE_BUCKETS:
        return (WIN_Y,), (WIN_X,)
    return YBUCKETS, XBUCKETS


_USE_BUCKETS = int(os.environ.get("ODT_ROI_BUCKETS", "0"))
# timing-ablation switch (tools/roi_ab_bench.py only): ABLATE_MM skips
# the contraction entirely (isolates DMA+loop cost; wrong results).
# Historical A/B (round 3): in-kernel per-ROI weight construction was 41%
# of kernel time (scalar-core bound — SMEM reads + iota math per ROI);
# weights are now precomputed vectorized in XLA and DMA'd per block. A
# fused two-contracting-dims dot_general was tried and is NOT supported
# by Mosaic ("lhs contracting dims must be of size 1").
ABLATE_MM = int(os.environ.get("ODT_ROI_ABLATE_MM", "0"))
MAX_ROIS_PER_CALL = 8192   # SMEM meta budget (36 B/roi of 1 MB)


def _kernel(meta_i_ref, meta_b_ref, nvb_ref, *refs,
            n_levels: int, n_blocks: int, pool: int, c: int, exact: bool,
            ybuckets: tuple, xbuckets: tuple):
    level_refs = refs[:n_levels]
    wyx_ref = refs[n_levels]
    out_ref = refs[n_levels + 1]
    (win_scratch, w_scratch, out_scratch,
     in_sems, w_sems, out_sems) = refs[n_levels + 2:]
    pool_pad = ((pool + 7) // 8) * 8
    precision = jax.lax.Precision.HIGHEST if exact else None

    def in_dma(ref, slot, j, i, ry, rx):
        xs = pl.multiple_of(meta_i_ref[2, i] * 8, 8)
        return pltpu.make_async_copy(
            ref.at[meta_i_ref[0, i],
                   pl.ds(meta_i_ref[1, i], ry),
                   pl.ds(xs, rx), :],
            win_scratch.at[slot, j, pl.ds(0, ry), pl.ds(0, rx), :],
            in_sems.at[slot, j])

    def w_dma(slot, blk):
        # the whole block's precomputed interpolation weights ride ONE
        # contiguous DMA (rows blk*BLK..+BLK of the packed [N, pool, WP])
        return pltpu.make_async_copy(
            wyx_ref.at[pl.ds(blk * BLK, BLK)],
            w_scratch.at[slot],
            w_sems.at[slot])

    def _issue_roi(op, ref, slot, j, i, ry, rx):
        # Invalid ROIs (valid=0 — NMS-suppressed slots) fire nothing and
        # are pinned to zero output by their zeroed weights.
        @pl.when(meta_i_ref[3, i] != 0)
        def _():
            getattr(in_dma(ref, slot, j, i, ry, rx), op)()

    def _issue(op, slot, blk):
        # The FPN levels stay in their NATURAL per-level HBM buffers —
        # packing them into one padded [B*L, Hmax, Wmax, C] buffer (the
        # round-2 design) cost ~1 GB of XLA relayout copies per call,
        # which a prologue-only ablation showed was the ENTIRE cost of
        # the op. The prologue SORTS ROIs by (valid, level, y-bucket,
        # x-bucket), so nearly every BLK-block is uniform: its source ref
        # AND its DMA extent are picked by one predicate chain per block
        # (meta_b rows: level / y-bucket / x-bucket) instead of per ROI —
        # per-ROI level predication was part of the ~1.1 us/ROI issue
        # bound, and the bucket-rounded extents cut window bytes ~2x on
        # typical proposal mixes (stale scratch past the prefix is killed
        # by the zero hat weights). Blocks straddling a sort boundary
        # (meta_b[0] = -1; at most n_levels*NYB*NXB per call) take the
        # per-ROI-level full-window fallback; all-invalid blocks carry
        # level code n_levels and fire nothing. start/wait rebuild the
        # same descriptor from the same scalars, so the semaphore
        # accounting always matches.
        for li, ref in enumerate(level_refs):
            @pl.when(meta_b_ref[0, blk] == li)
            def _(ref=ref):
                for yi, ry in enumerate(ybuckets):
                    @pl.when(meta_b_ref[1, blk] == yi)
                    def _(ry=ry):
                        for xi, rx in enumerate(xbuckets):
                            @pl.when(meta_b_ref[2, blk] == xi)
                            def _(ry=ry, rx=rx):
                                for j in range(BLK):
                                    _issue_roi(op, ref, slot, j,
                                               blk * BLK + j, ry, rx)

        @pl.when(meta_b_ref[0, blk] < 0)
        def _():
            for j in range(BLK):
                i = blk * BLK + j
                for li, ref in enumerate(level_refs):
                    @pl.when(meta_i_ref[4, i] == li)
                    def _(ref=ref):
                        _issue_roi(op, ref, slot, j, i, WIN_Y, WIN_X)

    def start_block(slot, blk):
        _issue("start", slot, blk)
        w_dma(slot, blk).start()

    def wait_block(slot, blk):
        _issue("wait", slot, blk)
        w_dma(slot, blk).wait()

    def out_dma(slot, blk):
        return pltpu.make_async_copy(
            out_scratch.at[slot],
            out_ref.at[pl.ds(blk * BLK, BLK)],
            out_sems.at[slot])

    # Skipped (invalid) ROIs never DMA into their window slot; their
    # weights are zeroed host-side so the contraction yields exactly 0 —
    # but 0 x NaN = NaN, and first-use slots hold uninitialized VMEM
    # bits. One up-front scratch clear (a few us) makes every skipped
    # slot 0 x finite.
    win_scratch[...] = jnp.zeros(win_scratch.shape, win_scratch.dtype)

    # Dynamic trip count: the sort compacts valid ROIs to the front, so
    # the pipeline marches only ceil(n_valid/BLK) blocks — the static-
    # shape counterpart of the reference's dynamic NMS-survivor count
    # flowing into CUDA ROIAlign (1000 proposal SLOTS usually hold a few
    # hundred survivors; per-block overhead was ~9 us, so invalid blocks
    # dominated the kernel at low survivor counts). Rows past the last
    # valid block are never written; the XLA epilogue masks them to 0.
    nvb = jnp.minimum(nvb_ref[0], n_blocks)

    @pl.when(nvb > 0)
    def _():
        start_block(0, 0)

    def body(blk, _):
        slot = blk % NBUF
        nxt = (blk + 1) % NBUF

        @pl.when(blk + 1 < nvb)
        def _():
            start_block(nxt, blk + 1)

        wait_block(slot, blk)

        wblk = w_scratch[slot]                      # [BLK, pad8(pool), WP]
        wy = wblk[:, :pool, :WIN_Y]                 # [BLK, pool, WY]
        wx = wblk[:, :pool, WIN_Y:WIN_Y + WIN_X]    # [BLK, pool, WX]

        win = win_scratch[slot]                     # [BLK, WY, WX, C]
        dt = win.dtype
        if ABLATE_MM:
            pooled = win[:, :pool, :pool_pad, :].astype(jnp.float32)
        else:
            # batched y-contraction; no reshapes (sublane/lane merging
            # scrambles)
            tmp = jax.lax.dot_general(
                wy, win, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=precision)                # [BLK, pool, WX, C]
            full = jax.lax.dot_general(
                wx, tmp.astype(dt), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=precision)                # [BLK, px, py, C]
            pooled = jnp.swapaxes(full, 1, 2)       # [BLK, py, px, C]
        if pooled.shape[2] != pool_pad:
            pooled = jnp.pad(
                pooled, ((0, 0), (0, 0), (0, pool_pad - pool), (0, 0)))

        @pl.when(blk >= NBUF)
        def _():
            out_dma(slot, blk - NBUF).wait()

        out_scratch[slot] = pooled.astype(out_scratch.dtype)
        out_dma(slot, blk).start()
        return ()

    jax.lax.fori_loop(0, nvb, body, (), unroll=False)
    last = nvb - 1

    @pl.when(nvb >= 2)
    def _():
        out_dma((last - 1) % NBUF, last - 1).wait()

    @pl.when(nvb >= 1)
    def _():
        out_dma(last % NBUF, last).wait()


def _pad8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _interp_weights(origin, start, spacing, extent, win: int, pool: int):
    """Pool-folded interpolation weights, vectorized over all ROIs in XLA
    (the kernel used to build these per ROI on the Mosaic scalar core —
    41% of kernel time). [N] params -> [N, pool, win] f32: the 2x2
    average pool is absorbed by averaging each pair of adjacent sample
    rows of the hat-function matrix (exact — the pool is a mean over
    samples and the contraction is linear)."""
    k = jnp.arange(pool, dtype=jnp.float32)[None, :, None]
    r = jnp.arange(win, dtype=jnp.float32)[None, None, :]
    origin = origin[:, None, None]
    start = start[:, None, None]
    spacing = spacing[:, None, None]
    extent = extent[:, None, None]

    def hat(a):                                       # a [N, pool, 1]
        w = jnp.maximum(0.0, 1.0 - jnp.abs(a - origin - r))
        valid = (a >= 0.0) & (a <= extent - 1.0)
        return w * valid.astype(jnp.float32)

    a0 = start + spacing * (2.0 * k + 0.5) - 0.5
    a1 = start + spacing * (2.0 * k + 1.5) - 0.5
    return 0.5 * (hat(a0) + hat(a1))                  # [N, pool, win]


def _roi_align_levels(levels, meta_i: jnp.ndarray,
                      wyx: jnp.ndarray, pool: int) -> jnp.ndarray:
    """levels: list of [B, H_l, W_l, C] buffers (H_l >= WIN_Y, W_l >=
    WIN_X — the caller minimally pads coarse pyramid tops); meta_i
    [6, N] int32 (image, ys, xs/8, valid, level, sort code); wyx
    [N, pad8(pool),
    WP] precomputed interpolation weights (y block then x block along
    the last dim) -> [N, pool, pool, C]. meta_i is fields-major: SMEM
    pads the minor dim to 128 lanes, so [N, k] layouts would blow the
    1 MB SMEM budget at N=8000. N is padded to a multiple of BLK
    (padding rois get valid=0 -> DMA skipped, output 0).
    """
    n = meta_i.shape[1]
    c = levels[0].shape[-1]
    wp = wyx.shape[-1]
    # the prefetched meta array lives in SMEM (1 MB budget); chunk bigger
    # workloads (e.g. B=32 x 1000 proposals) over multiple pallas calls
    # on the same level buffers
    max_n = MAX_ROIS_PER_CALL
    if n > max_n:
        outs = [
            _roi_align_levels(levels, meta_i[:, i:i + max_n],
                              wyx[i:i + max_n], pool)
            for i in range(0, n, max_n)
        ]
        return jnp.concatenate(outs, axis=0)
    n_pad = ((n + BLK - 1) // BLK) * BLK
    if n_pad != n:
        # edge-pad so the tail block keeps the last ROI's level (stays on
        # the single-level fast path); padding slots are valid=0
        meta_i = jnp.pad(meta_i, ((0, 0), (0, n_pad - n)), mode="edge")
        meta_i = meta_i.at[3, n:].set(0)
        wyx = jnp.pad(wyx, ((0, n_pad - n), (0, 0), (0, 0)))
    # per-block (level, y-bucket, x-bucket) decoded from the sort code
    # shared by all BLK ROIs; level -1 marks the rare straddle block
    # (prologue sorts ROIs by code, so straddles only sit at code
    # boundaries). All-invalid blocks decode to level n_levels: no source
    # branch matches and the block fires no window DMAs at all.
    ybuckets, xbuckets = _bucket_lists()
    nyb, nxb = len(ybuckets), len(xbuckets)
    # valid ROIs are sorted to the front: the kernel marches only their
    # blocks (dynamic trip count) and the unwritten tail is masked here
    nvb = ((jnp.sum(meta_i[3]) + BLK - 1) // BLK).astype(jnp.int32)[None]
    code_blocks = meta_i[5].reshape(n_pad // BLK, BLK)
    uniform = jnp.all(code_blocks == code_blocks[:, :1], axis=1)
    c0 = code_blocks[:, 0]
    meta_b = jnp.stack([
        jnp.where(uniform, c0 // (nyb * nxb), -1),
        (c0 % (nyb * nxb)) // nxb,
        c0 % nxb,
    ]).astype(jnp.int32)
    dt = levels[0].dtype
    exact = dt == jnp.float32
    kernel = functools.partial(_kernel, n_levels=len(levels),
                               n_blocks=n_pad // BLK, pool=pool,
                               c=c, exact=exact,
                               ybuckets=ybuckets, xbuckets=xbuckets)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)
                  for _ in range(len(levels) + 1)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((NBUF, BLK, WIN_Y, WIN_X, c), dt),
            pltpu.VMEM((NBUF, BLK, wyx.shape[1], wp), dt),
            pltpu.VMEM((NBUF, BLK, pool, _pad8(pool), c), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, BLK)),
            pltpu.SemaphoreType.DMA((NBUF,)),
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
    )(meta_i, meta_b, nvb, *levels, wyx.astype(dt))
    # rows past the last valid block were never written (HBM garbage,
    # possibly NaN bit patterns — hence where, not multiply)
    written = jnp.arange(n_pad, dtype=jnp.int32) < nvb[0] * BLK
    out = jnp.where(written[:, None, None, None], out, 0.0)
    return out[:n, :, :pool, :]


def multilevel_roi_align_pallas(features: Sequence[jnp.ndarray],
                                boxes: jnp.ndarray,
                                strides: Sequence[int],
                                output_size: int,
                                levels: jnp.ndarray = None,
                                valid: jnp.ndarray = None) -> jnp.ndarray:
    """Batched FPN ROIAlign. features: list of [B, H_l, W_l, C] (p2..p5);
    boxes [B, N, 4] image-coord x1y1x2y2. Returns [B, N, P, P, C] f32.

    valid [B, N] bool (optional): invalid ROIs skip their window DMA on
    the scalar core (the kernel's bound) and return exactly zero — the
    static-shape equivalent of the reference's dynamic NMS-survivor
    count flowing into ROIAlign."""
    b, n = boxes.shape[0], boxes.shape[1]
    c = features[0].shape[-1]
    level_bufs, meta_i, wyx, c_pad, inv = _prepare_roi_align(
        features, boxes, strides, output_size, levels, valid)
    out = _roi_align_levels(level_bufs, meta_i, wyx, output_size)
    out = out[inv]  # undo the prologue's sort-by-level
    out = out.reshape(b, n, output_size, output_size, c_pad)
    return out[..., :c]


def _prepare_roi_align(features, boxes, strides, output_size,
                       levels=None, valid=None):
    """XLA prologue of the Pallas ROIAlign: level assignment (+aspect
    demotion), window origins, packed interpolation weights. Split out so
    tools/device_bench.py can time prologue vs kernel in context."""
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
    # Levels stay in their NATURAL per-level buffers (a packed
    # [B*L, Hmax, Wmax, C] buffer cost ~1 GB of relayout copies per call
    # — measured as the ENTIRE cost of the op); only pyramid tops
    # smaller than one DMA window get a minimal zero pad.
    h_ext = jnp.asarray([f.shape[1] for f in features], jnp.float32)
    w_ext = jnp.asarray([f.shape[2] for f in features], jnp.float32)
    level_bufs = [
        jnp.pad(f, ((0, 0), (0, max(WIN_Y - f.shape[1], 0)),
                    (0, max(WIN_X - f.shape[2], 0)), (0, 0)))
        if f.shape[1] < WIN_Y or f.shape[2] < WIN_X else f
        for f in features
    ]
    hpads = np.asarray([f.shape[1] for f in level_bufs], np.float32)
    wpads = np.asarray([f.shape[2] for f in level_bufs], np.float32)

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
    if valid is None:
        vflat = jnp.ones((b * n,), jnp.int32)
    else:
        vflat = valid.reshape(b * n).astype(jnp.int32)

    stride = jnp.asarray(strides, jnp.float32)[lvl]
    fb = flat_boxes / stride[:, None]
    y0, x0 = fb[:, 1], fb[:, 0]
    sh = (fb[:, 3] - fb[:, 1]) / (output_size * 2)
    sw = (fb[:, 2] - fb[:, 0]) / (output_size * 2)

    # window origins: first sample's floor, clipped into the ROI's own
    # level buffer; x origin stored pre-divided by 8 (sublane-tile
    # alignment for the DMA)
    ys = jnp.clip(jnp.floor(y0 + 0.5 * sh - 0.5), 0,
                  jnp.asarray(hpads, jnp.float32)[lvl] - WIN_Y)
    xs8 = jnp.clip(jnp.floor((x0 + 0.5 * sw - 0.5) / 8.0), 0,
                   jnp.floor((jnp.asarray(wpads, jnp.float32)[lvl]
                              - WIN_X) / 8.0))

    h_ext_r = h_ext[lvl]
    w_ext_r = w_ext[lvl]

    # Rows/cols of the window the nonzero hat weights actually touch
    # (the last sample's ceil+1, clamped by the in-image validity rule):
    # buckets round these up to the kernel's static DMA extents.
    a_last_y = y0 + sh * (2.0 * output_size - 0.5) - 0.5
    rows_need = (jnp.floor(jnp.minimum(a_last_y, h_ext_r - 1.0))
                 + 2.0 - ys)
    a_last_x = x0 + sw * (2.0 * output_size - 0.5) - 0.5
    cols_need = (jnp.floor(jnp.minimum(a_last_x, w_ext_r - 1.0))
                 + 2.0 - xs8 * 8.0)
    ybuckets, xbuckets = _bucket_lists()
    nyb, nxb = len(ybuckets), len(xbuckets)
    yb = sum((rows_need > t).astype(jnp.int32) for t in ybuckets[:-1])
    xb = sum((cols_need > t).astype(jnp.int32) for t in xbuckets[:-1])

    # Sort ROIs by (valid desc, level, y-bucket, x-bucket), stable —
    # same-code ROIs keep score order. Nearly every BLK-block is then
    # uniform, so the kernel issues its window DMAs behind one predicate
    # chain per block with bucket-sized extents, same-level windows land
    # adjacently for HBM locality, and invalid ROIs compact into
    # all-invalid blocks that fire no DMAs at all. The caller un-permutes
    # the kernel output with `inv`.
    code = lvl * (nyb * nxb) + yb * nxb + xb
    code = jnp.where(vflat != 0, code, L * nyb * nxb)
    order = jnp.argsort(code, stable=True)
    inv = jnp.argsort(order)
    code = code[order]
    lvl = lvl[order]
    img = img[order]
    vflat = vflat[order]
    ys, xs8 = ys[order], xs8[order]
    y0, sh, h_ext_r = y0[order], sh[order], h_ext_r[order]
    x0, sw, w_ext_r = x0[order], sw[order], w_ext_r[order]

    meta_i = jnp.stack(
        [img, ys.astype(jnp.int32), xs8.astype(jnp.int32), vflat, lvl,
         code],
        axis=0)
    wy = _interp_weights(ys, y0, sh, h_ext_r, WIN_Y, output_size)
    if valid is not None:
        # invalid ROIs' windows are never DMA'd; zero weights pin their
        # output to exactly 0 (see the scratch clear in _kernel)
        wy = wy * vflat[:, None, None].astype(jnp.float32)
    wx = _interp_weights(xs8 * 8.0, x0, sw, w_ext_r, WIN_X, output_size)
    # pack both axes' weights into one row per ROI so the kernel fetches
    # a block's weights in a single contiguous DMA; pad the packed dim to
    # the 128-lane tile and the pool dim to the 8-sublane tile (Mosaic
    # rejects DMA slices whose second-minor extent isn't tile-aligned)
    wp = ((WIN_Y + WIN_X + 127) // 128) * 128
    wyx = jnp.concatenate(
        [wy, wx, jnp.zeros((wy.shape[0], output_size,
                            wp - WIN_Y - WIN_X), jnp.float32)], axis=-1)
    wyx = jnp.pad(wyx, ((0, 0), (0, _pad8(output_size) - output_size),
                        (0, 0)))
    return level_bufs, meta_i, wyx, c_pad, inv


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
