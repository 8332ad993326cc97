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

    def __init__(self, model, params, depth: int = 2):
        self.model = model
        self.params = params
        self.depth = max(1, depth)
        self._fn = jax.jit(self._fetch_forward)

    def _fetch_forward(self, params, images):
        """Forward + pack every fetched output into ONE [B, R, 3+1+C(+784)]
        f32 tensor: the tunneled device->host link is latency-bound, so one
        readback per batch instead of five. Mask models append the flattened
        28x28 sigmoid masks."""
        import jax.numpy as jnp
        out = self.model.forward(params, images)
        parts = [
            out["final_boxes"],
            out["final_labels"][..., None].astype(jnp.float32),
            out["final_probs"][..., None],
            out["final_valid"][..., None].astype(jnp.float32),
            out["pooled_box_feat"],
        ]
        if "final_masks" in out:
            b, r = out["final_masks"].shape[:2]
            parts.append(out["final_masks"].reshape(b, r, -1))
        return jnp.concatenate(parts, axis=-1)

    def _unpack(self, packed: np.ndarray) -> Dict[str, np.ndarray]:
        has_masks = getattr(self.model.config, "add_mask", False)
        feat_end = packed.shape[-1] - (784 if has_masks else 0)
        out = {
            "final_boxes": packed[..., 0:4],
            "final_labels": packed[..., 4].astype(np.int32),
            "final_probs": packed[..., 5],
            "final_valid": packed[..., 6] > 0.5,
            "pooled_box_feat": packed[..., 7:feat_end],
        }
        if has_masks:
            b, r = packed.shape[:2]
            out["final_masks"] = packed[..., feat_end:].reshape(b, r, 28, 28)
        return out

    def run(self, batches: Iterable[Tuple[np.ndarray, object]]
            ) -> Iterator[Tuple[Dict[str, np.ndarray], object]]:
        """batches yields (images [B, H, W, 3] uint8, meta). Yields
        (host numpy outputs, meta) in order.

        H2D transfers run on a dedicated thread (device_put can block on
        some backends, e.g. the tunneled one) so upload of batch i+1
        overlaps compute of batch i and tracking of batch i-1."""
        from concurrent.futures import ThreadPoolExecutor

        inflight: deque = deque()
        with ThreadPoolExecutor(max_workers=1) as pool:
            puts: deque = deque()

            def fill(it):
                try:
                    images, meta = next(it)
                except StopIteration:
                    return False
                puts.append((pool.submit(jax.device_put, images), meta))
                return True

            it = iter(batches)
            more = True
            for _ in range(self.depth + 1):
                more = fill(it)
                if not more:
                    break
            while puts:
                fut, meta = puts.popleft()
                out = self._fn(self.params, fut.result())
                inflight.append((out, meta))
                if more:
                    more = fill(it)
                if len(inflight) >= self.depth:
                    yield self._to_host(*inflight.popleft())
            while inflight:
                yield self._to_host(*inflight.popleft())

    def _to_host(self, out, meta):
        return self._unpack(np.asarray(out)), meta
