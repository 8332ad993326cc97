"""Pipelined detector execution: overlap H2D transfer, device compute, and
D2H readback.

This is the TPU replacement for the reference's threaded sess.run loop
(obj_detect_tracking_multi_queuer*.py): JAX dispatch is async, so the runner
keeps a small in-flight window — while batch i computes on device, batch
i+1's transfer is already enqueued and batch i-1's (small) outputs are being
read back. With the pooled 256-d embeddings the readback is a few hundred KB
per batch, so the pipeline bottleneck is max(decode, H2D, compute).
"""

from __future__ import annotations

from collections import deque
from typing import Dict, Iterable, Iterator, Tuple

import jax
import numpy as np


class DetectionRunner:
    """Wraps a jitted detector forward with software pipelining.

    Usage:
        runner = DetectionRunner(model, params)
        for host_out, meta in runner.run(batch_iter):  # meta passthrough
            ...
    """

    FETCH_KEYS = ("final_boxes", "final_labels", "final_probs",
                  "final_valid", "pooled_box_feat")

    def __init__(self, model, params, depth: int = 2,
                 temporal_delta: bool = True, emb_agg: str = "average",
                 mesh=None, ship_full_feat: bool = False):
        """mesh: optional jax.sharding.Mesh with a 'data' axis — the frame
        batch is sharded across every chip and XLA runs one program over
        the mesh (the reference scaled inference out as N independent
        single-GPU processes, SPEED.md:61; here it's one sharded jit)."""
        self.model = model
        self.params = params
        self.depth = max(1, depth)
        # tracking-embedding aggregation over the 7x7 ROI feature grid
        # (reference obj_detect_tracking_multi_queuer_tmot.py:512-525):
        # average (default) | max | spatial (channel-mean -> 49-d)
        if emb_agg in ("avg", "average"):
            emb_agg = "average"
        elif emb_agg not in ("max", "spatial"):
            raise ValueError(f"unknown emb_agg {emb_agg!r}")
        self.emb_agg = emb_agg
        # --get_box_feat mode (ref obj_detect_tracking.py:612-622): also
        # read back the FULL [R, 7, 7, C] ROI features (bf16 halves) so
        # the CLI can dump per-frame .npy feature files
        self.ship_full_feat = ship_full_feat
        # Lossless inter-frame delta transfer: the host ships uint8-
        # wraparound diffs; the device reconstructs exactly with a mod-256
        # cumsum inside the jit. The host->device link compresses its
        # stream, and consecutive surveillance frames differ in few
        # pixels, so deltas cut the effective transfer cost ~2-4x.
        # Bit-exact (mod-256 arithmetic). On the single-chip path the
        # device additionally carries the last reconstructed frame across
        # batches, so even each batch's FIRST frame ships as a sparse
        # diff (vs the previous batch's tail) instead of raw bytes.
        self.temporal_delta = temporal_delta
        # cross-batch carry needs a stable single-device carry buffer;
        # on a mesh the batch axis is sharded, keep intra-batch deltas.
        self.cross_batch_delta = bool(temporal_delta) and mesh is None
        self._host_prev = None   # last RAW frame shipped (host mirror)
        self._dev_carry = None   # same frame, reconstructed on device
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import (batch_sharding, param_shardings,
                                         shard_params)
            self.params = shard_params(params, mesh)
            self._data_sh = batch_sharding(mesh)
            self._fn = jax.jit(
                self._fetch_forward,
                in_shardings=(param_shardings(self.params, mesh),
                              self._data_sh),
                out_shardings=self._data_sh)
        else:
            self._fn = jax.jit(self._fetch_forward)
            if self.cross_batch_delta:
                self._carry_fn = jax.jit(self._carry_forward,
                                         donate_argnums=(2,))

    @staticmethod
    def encode_delta(images: np.ndarray) -> np.ndarray:
        """[B, ...] uint8 -> frame0 + wraparound diffs along axis 0.

        Single-write: subtract straight into the output buffer. The
        previous temp-then-concatenate doubled the memory traffic, and on
        the 1-core bench host every host-CPU ms is on the pipeline's
        critical path (tools/profile_host.py: delta was 0.45 s of a
        2.15 s wall at 8x8-frame 720p batches)."""
        if images.shape[0] <= 1:
            return images
        out = np.empty_like(images)
        out[0] = images[0]
        np.subtract(images[1:], images[:-1], out=out[1:])  # uint8 wraps
        return out

    def _carry_forward(self, params, deltas, carry):
        """Cross-batch variant: every row of `deltas` is a wraparound diff
        (row 0 vs `carry` = previous batch's last frame). Returns
        (packed_outputs, new_carry); the carry round-trips as a device
        array so no extra host transfer happens."""
        import jax.numpy as jnp
        recon = ((carry.astype(jnp.uint32)[None]
                  + jnp.cumsum(deltas.astype(jnp.uint32), axis=0))
                 % 256).astype(jnp.uint8)
        return self._pack_outputs(params, recon), recon[-1]

    def _fetch_forward(self, params, images):
        """Forward + pack every fetched output into ONE [B, R, 14+C(+784)]
        uint16 tensor: the tunneled device->host link is latency-bound AND
        bandwidth-starved, so one readback per batch, with boxes/labels/
        probs/valid kept bit-exact as f32 halves and the 256-d tracking
        embeddings (+ mask probabilities) downcast to bf16 — a 1.9x
        readback-byte cut with no effect on box outputs and <=0.4% relative
        rounding on cosine/euclidean embedding distances."""
        import jax.numpy as jnp
        if self.temporal_delta and images.shape[0] > 1 and \
                images.dtype == jnp.uint8:
            images = (jnp.cumsum(images.astype(jnp.uint32), axis=0)
                      % 256).astype(jnp.uint8)
        return self._pack_outputs(params, images)

    def _pack_outputs(self, params, images):
        import jax.numpy as jnp
        out = self.model.forward(params, images)
        b, r = out["final_boxes"].shape[:2]
        if self.emb_agg != "average" and "fpn_box_feat" not in out:
            raise ValueError(
                f"emb_agg={self.emb_agg!r} needs the model to output the "
                "full 7x7 ROI features (fpn_box_feat); this detector only "
                "provides mean-pooled embeddings")
        if self.emb_agg == "max":
            out["pooled_box_feat"] = out["fpn_box_feat"].max(axis=(2, 3))
        elif self.emb_agg == "spatial":
            out["pooled_box_feat"] = out["fpn_box_feat"].mean(
                axis=-1).reshape(b, r, -1)
        small = jnp.concatenate([
            out["final_boxes"],
            out["final_labels"][..., None].astype(jnp.float32),
            out["final_probs"][..., None],
            out["final_valid"][..., None].astype(jnp.float32),
        ], axis=-1)                                      # [B, R, 7] f32
        parts = [
            jax.lax.bitcast_convert_type(
                small, jnp.uint16).reshape(b, r, 14),
            jax.lax.bitcast_convert_type(
                out["pooled_box_feat"].astype(jnp.bfloat16), jnp.uint16),
        ]
        if self.ship_full_feat:
            if "fpn_box_feat" not in out:
                raise ValueError(
                    "ship_full_feat needs the model to output the full "
                    "7x7 ROI features (fpn_box_feat)")
            parts.append(jax.lax.bitcast_convert_type(
                out["fpn_box_feat"].astype(jnp.bfloat16),
                jnp.uint16).reshape(b, r, -1))
        if "final_masks" in out:
            parts.append(jax.lax.bitcast_convert_type(
                out["final_masks"].astype(jnp.bfloat16),
                jnp.uint16).reshape(b, r, -1))
        return jnp.concatenate(parts, axis=-1)

    @staticmethod
    def _bf16_bits_to_f32(u16: np.ndarray) -> np.ndarray:
        return (u16.astype(np.uint32) << 16).view(np.float32)

    def _unpack(self, packed: np.ndarray) -> Dict[str, np.ndarray]:
        has_masks = getattr(self.model.config, "add_mask", False)
        b, r = packed.shape[:2]
        mask_dim = 784 if has_masks else 0
        body = packed.shape[-1] - 14 - mask_dim
        full_dim = 0
        if self.ship_full_feat:
            full_dim = 49 * getattr(self.model.config, "fpn_num_channel")
        feat_end = 14 + body - full_dim
        small = np.ascontiguousarray(
            packed[..., :14]).view(np.float32)           # [B, R, 7]
        feats = self._bf16_bits_to_f32(packed[..., 14:feat_end])
        out = {
            "final_boxes": small[..., 0:4],
            "final_labels": small[..., 4].astype(np.int32),
            "final_probs": small[..., 5],
            "final_valid": small[..., 6] > 0.5,
            "pooled_box_feat": feats,
        }
        if full_dim:
            c = full_dim // 49
            out["fpn_box_feat"] = self._bf16_bits_to_f32(
                packed[..., feat_end:feat_end + full_dim]
            ).reshape(b, r, 7, 7, c)
        if has_masks:
            out["final_masks"] = self._bf16_bits_to_f32(
                packed[..., -mask_dim:]).reshape(b, r, 28, 28)
        return out

    def run(self, batches: Iterable[Tuple[np.ndarray, object]]
            ) -> Iterator[Tuple[Dict[str, np.ndarray], object]]:
        """batches yields (images [B, H, W, 3] uint8, meta). Yields
        (host numpy outputs, meta) in order.

        H2D transfers run on a dedicated thread (device_put can block on
        some backends, e.g. the tunneled one) so upload of batch i+1
        overlaps compute of batch i and tracking of batch i-1."""
        done = False
        try:
            yield from self._run(batches)
            done = True
        finally:
            if not done:
                # abandoned mid-stream: the device carry no longer matches
                # the host mirror — reset so the next run() re-seeds both
                self._host_prev = None
                self._dev_carry = None

    def _run(self, batches):
        from concurrent.futures import ThreadPoolExecutor

        inflight: deque = deque()
        with ThreadPoolExecutor(max_workers=1) as pool:
            puts: deque = deque()

            def fill(it):
                try:
                    images, meta = next(it)
                except StopIteration:
                    return False
                carried = self.cross_batch_delta and images.dtype == np.uint8
                if carried:
                    # one runner serves every video in a --video_lst_file;
                    # a resolution change invalidates the carry (the diff
                    # below would broadcast-fail) — re-seed from zeros
                    if (self._host_prev is not None
                            and images.shape[1:] != self._host_prev.shape):
                        self._host_prev = None
                        self._dev_carry = None
                    if self._host_prev is None:
                        self._host_prev = np.zeros(images.shape[1:],
                                                   np.uint8)
                        self._dev_carry = jax.device_put(self._host_prev)
                    out = np.empty_like(images)
                    np.subtract(images[0], self._host_prev, out=out[0])
                    np.subtract(images[1:], images[:-1], out=out[1:])
                    self._host_prev = images[-1].copy()  # uint8 wraps
                    images = out
                elif self.temporal_delta and images.dtype == np.uint8:
                    images = self.encode_delta(images)
                sh = self._data_sh if self.mesh is not None else None
                puts.append((pool.submit(jax.device_put, images, sh),
                             meta, carried))
                return True

            it = iter(batches)
            more = True
            for _ in range(self.depth + 1):
                more = fill(it)
                if not more:
                    break
            while puts:
                fut, meta, carried = puts.popleft()
                if carried:
                    out, self._dev_carry = self._carry_fn(
                        self.params, fut.result(), self._dev_carry)
                else:
                    out = self._fn(self.params, fut.result())
                # start the D2H copy now so it overlaps the host-side
                # tracking of earlier batches (np.asarray would otherwise
                # serialize a ~20 ms tunnel readback into the consume loop)
                try:
                    out.copy_to_host_async()
                except AttributeError:
                    pass
                inflight.append((out, meta))
                if more:
                    more = fill(it)
                if len(inflight) >= self.depth:
                    yield self._to_host(*inflight.popleft())
            while inflight:
                yield self._to_host(*inflight.popleft())

    def _to_host(self, out, meta):
        return self._unpack(np.asarray(out)), meta
