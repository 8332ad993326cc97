"""Fused stride-1 bottleneck-stack Pallas kernel (inference).

Why: the narrow-channel ResNet groups are HBM-bound in XLA — every
bottleneck block round-trips its activations through HBM five times
(conv1 read/write, conv2, conv3, shortcut add), so c2 at 720p B=8
measures 4.8 ms against a ~1.6 ms single-pass roofline
(tools/backbone_bench.py / COMPONENTS.md perf table). The reference has
no analogue (TF1 fuses nothing here; its speed story is the frozen .pb,
models.py:134). This kernel keeps a whole stack of stride-1 bottleneck
blocks in VMEM: one HBM read of the group input, one write of its
output, every intermediate tensor stays on-chip.

Design (tpu-first, per /opt/skills/guides/pallas_guide.md):
  * grid (B, H/TR): each step produces TR output rows of one image at
    full width; the block chain needs `n_blocks` halo rows per side,
    which the caller supplies by zero-padding rows in XLA (so the
    kernel's window DMA is a single dynamic-offset slice, and row
    zero-padding semantics at image edges are exact for stage 0);
  * intermediate stages re-zero their out-of-image halo rows with an
    iota row mask (a block's 3x3 must see zeros outside the image, not
    conv(zeros)=bias);
  * 1x1 convs are plain dot_generals over the channel axis of
    [rows, W, C] tiles (no reshapes — Mosaic scrambles sublane->lane
    merges, see roi_align_pallas.py gotchas);
  * the 3x3 is an im2col matmul: 9 row/col-shifted copies of the
    (width-aligned, 64/128-lane) activation lane-concatenated to
    [rows, W, 9*width] — but built and contracted PER KERNEL ROW dr
    (three K=3*width dots accumulated) to cut peak VMEM by the 9x patch;
  * BatchNorm scales are folded into the conv kernels host-side
    (fold_bn_into_convs); offsets ride as f32 biases added in the
    matmul epilogue. f32 accumulation (preferred_element_type) — the
    XLA path accumulates bf16, so the kernel is slightly MORE precise;
  * residual adds in bf16, matching the XLA path's dtype.

Reference parity: the computation is bottleneck() of models/resnet.py
(itself matching the reference nn.py:471-566 geometry); this kernel is
numerically equivalent modulo bf16 accumulation order. Training and any
stride!=1 / dilated / SE / ResNeXt / deformable block falls back to the
XLA path (models/resnet.py gates on config).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ops.norm import BN_EPS


def _fold_bn(conv: Dict, compute_dtype) -> tuple:
    """Fold the frozen-BN affine into the conv kernel: returns
    (W * scale) cast to compute dtype and the f32 offset."""
    bn = conv["bn"]
    scale = bn["gamma"] / jnp.sqrt(bn["variance"] + BN_EPS)
    offset = bn["beta"] - bn["mean"] * scale
    w = (conv["W"] * scale).astype(compute_dtype)
    return w, offset.astype(jnp.float32)


def prepare_stage_weights(blocks: Sequence[Dict], compute_dtype=jnp.bfloat16):
    """Host/XLA-side weight prep for a stride-1 bottleneck stack.

    blocks: list of resnet bottleneck param dicts (conv1/conv2/conv3 and
    optionally convshortcut on the first). Returns a flat list of arrays
    in the kernel's argument order plus the per-block shapes."""
    args: List[jnp.ndarray] = []
    has_sc = []
    for blk in blocks:
        w1, b1 = _fold_bn(blk["conv1"], compute_dtype)
        w2, b2 = _fold_bn(blk["conv2"], compute_dtype)
        w3, b3 = _fold_bn(blk["conv3"], compute_dtype)
        width = w1.shape[-1]
        c_out = w3.shape[-1]
        args += [w1[0, 0], b1.reshape(1, 1, width),
                 # [3,3,W,W] -> [9W, W]: (dr, dc, c_in) major order — the
                 # kernel concatenates its shifted pieces in the same order
                 w2.reshape(9 * width, width), b2.reshape(1, 1, width),
                 w3[0, 0], b3.reshape(1, 1, c_out)]
        if "convshortcut" in blk:
            wsc, bsc = _fold_bn(blk["convshortcut"], compute_dtype)
            args += [wsc[0, 0], bsc.reshape(1, 1, c_out)]
            has_sc.append(True)
        else:
            has_sc.append(False)
    return args, has_sc


def _pick_tr(h: int, wd: int, c_in: int, width: int, c_out: int,
             n_blocks: int, budget_bytes: int = None) -> int:
    """Largest divisor of h whose working set fits the VMEM budget."""
    if budget_bytes is None:
        budget_bytes = int(os.environ.get("ODT_STAGE_VMEM",
                                          9 * 2 ** 20))
    best = 1
    for tr in range(1, min(h, 64) + 1):
        if h % tr:
            continue
        rows = tr + 2 * n_blocks
        est = rows * wd * 2 * (c_in + 4 * width + 2 * c_out)
        if est <= budget_bytes:
            best = tr
    return best


def fused_bottleneck_stage(blocks: Sequence[Dict], x: jnp.ndarray,
                           width: int, c_out: int) -> jnp.ndarray:
    """Run a stack of stride-1 bottleneck blocks fused in VMEM.

    x: [B, H, W, C_in] (bf16 for the fast path). Returns [B, H, W, c_out]
    in x.dtype. Supports an optional 1x1 convshortcut on the FIRST block
    only (later blocks must be identity-shortcut, i.e. C_in == c_out)."""
    b, h, wd, c_in = x.shape
    nb = len(blocks)
    dt = x.dtype
    args, has_sc = prepare_stage_weights(blocks, dt)
    assert not any(has_sc[1:]), "convshortcut only on the first block"
    # Mosaic DMA slices must be lane-tile aligned: an HBM buffer with
    # C=64 is stored lane-padded to 128, and a 64-channel window DMA out
    # of it is rejected ("Slice shape along dimension 3 must be aligned
    # to tiling (128)"). Zero-pad the stack input (c2's 64-ch case) and
    # the first block's input-side kernels to the 128 multiple.
    c_dma = -(-c_in // 128) * 128
    if c_dma != c_in and jax.default_backend() != "cpu":
        assert has_sc[0] and c_in != c_out, (
            "lane-padding needs the first-block shortcut conv to absorb "
            "the extra input channels")
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c_dma - c_in)))
        args[0] = jnp.pad(args[0], ((0, c_dma - c_in), (0, 0)))   # w1
        args[6] = jnp.pad(args[6], ((0, c_dma - c_in), (0, 0)))   # wsc
        c_in = c_dma
    tr = _pick_tr(h, wd, c_in, width, c_out, nb)
    halo = nb
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))

    def dg(t, w):
        # flatten [rows, wd, C] -> [rows*wd, C] for the MXU: merging a
        # leading dim into SUBLANES is layout-clean (wd is a multiple of
        # 8); only sublane->LANE merges scramble (roi_align gotchas). A
        # 3D dot_general lowers to per-row matmuls — measured 1.3x
        # slower end-to-end on this backend.
        m = t.shape[0] * t.shape[1]
        r = jax.lax.dot_general(
            t.reshape(m, t.shape[2]), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return r.reshape(t.shape[0], t.shape[1], w.shape[1])

    ablate = os.environ.get("ODT_STAGE_ABLATE", "")
    impl = os.environ.get("ODT_STAGE_IMPL", "concat")

    def kernel(xp_ref, *rest):
        wrefs = rest[:-3]
        out_ref, x_vmem, sem = rest[-3:]
        bi = pl.program_id(0)
        i = pl.program_id(1)
        dma = pltpu.make_async_copy(
            xp_ref.at[bi, pl.ds(i * tr, tr + 2 * halo)], x_vmem, sem)
        dma.start()
        dma.wait()
        buf = x_vmem[:]
        wi = 0
        for s in range(nb):
            w1, b1, w2, b2, w3, b3 = (wrefs[wi][:], wrefs[wi + 1][:],
                                      wrefs[wi + 2][:], wrefs[wi + 3][:],
                                      wrefs[wi + 4][:], wrefs[wi + 5][:])
            wi += 6
            rows = tr + 2 * (halo - s)   # current buf row count
            out_rows = rows - 2
            l1 = jnp.maximum(dg(buf, w1) + b1, 0.0).astype(dt)
            hh = halo - s
            if hh > 0:
                # conv2 zero-pads l1 at the image edge: out-of-image halo
                # rows must be ZERO, not relu(conv1(0)+b1)=relu(b1)
                row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
                glob = i * tr - hh + row
                l1 = jnp.where((glob >= 0) & (glob < h), l1,
                               jnp.zeros((), dt))
            # 3x3 as accumulated dots over the kernel taps. Two correct
            # formulations, selectable for on-hardware A/B
            # (ODT_STAGE_IMPL): "concat" (default) builds a K=3*width
            # patch per kernel row via lane-concat; "splitk" skips the
            # lane concats and runs 9 K=width dots. "noshift" is a
            # WRONG-RESULT ablation timing the dots without the
            # shifted-copy builds.
            acc = None
            if impl == "stackn":
                # ONE dot with N=3*width: D[r, :, dr*W:(dr+1)*W] holds
                # row r's contribution under kernel-row dr; the conv2
                # output is three shifted lane-slices of D summed. Full
                # MXU lanes on N (the per-dr form's N=width wastes them)
                # and one P build over all rows instead of three. The
                # dot accumulates bf16 like the XLA conv path (halves
                # the D buffer; the two shifted adds stay f32).
                zc = jnp.zeros((rows, 1, width), dt)
                p = jnp.concatenate(
                    [jnp.concatenate([zc, l1[:, :-1]], axis=1), l1,
                     jnp.concatenate([l1[:, 1:], zc], axis=1)], axis=2)
                wst = jnp.concatenate(
                    [w2[dr * 3 * width:(dr + 1) * 3 * width]
                     for dr in range(3)], axis=1)        # [3W, 3W]
                m = rows * wd
                dfull = jax.lax.dot_general(
                    p.reshape(m, 3 * width), wst,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=dt).reshape(
                        rows, wd, 3 * width)
                acc = (dfull[0:out_rows, :, :width].astype(jnp.float32)
                       + dfull[1:out_rows + 1, :, width:2 * width]
                       + dfull[2:out_rows + 2, :, 2 * width:])
            else:
                for dr in range(3):
                    t = l1[dr:dr + out_rows]
                    zc = jnp.zeros((out_rows, 1, width), dt)
                    if ablate == "noshift":
                        pieces = [t, t, t]
                    else:
                        pieces = [jnp.concatenate([zc, t[:, :-1]], axis=1),
                                  t,
                                  jnp.concatenate([t[:, 1:], zc], axis=1)]
                    if impl == "splitk":
                        for j, piece in enumerate(pieces):
                            k0 = (dr * 3 + j) * width
                            d = dg(piece, w2[k0:k0 + width])
                            acc = d if acc is None else acc + d
                    else:
                        p = jnp.concatenate(pieces, axis=2)
                        d = dg(p, w2[dr * 3 * width:(dr + 1) * 3 * width])
                        acc = d if acc is None else acc + d
            l2 = jnp.maximum(acc + b2, 0.0).astype(dt)
            l3 = (dg(l2, w3) + b3).astype(dt)
            res = buf[1:rows - 1]
            if s == 0 and has_sc[0]:
                wsc, bsc = wrefs[wi][:], wrefs[wi + 1][:]
                wi += 2
                sc = (dg(res, wsc) + bsc).astype(dt)
            else:
                sc = res
            # out-of-image halo rows of `out` are garbage here; every
            # consumer re-masks (the next stage's l1 mask above), and the
            # final stage has no halo rows, so no output mask is needed
            buf = jnp.maximum(l3 + sc, 0.0)
        out_ref[0] = buf

    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args]
    grid = (b, h // tr)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tr, wd, c_out),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, c_out), dt),
        scratch_shapes=[
            pltpu.VMEM((tr + 2 * halo, wd, c_in), dt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.default_backend() == "cpu",
    )(xp, *args)
