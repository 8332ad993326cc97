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
from typing import Callable, Dict, Iterable, Iterator, Optional, Tuple

import jax
import numpy as np


class DetectionRunner:
    """Wraps a jitted detector forward with software pipelining.

    Usage:
        runner = DetectionRunner(model, params)
        for host_out, meta in runner.run(batch_iter):  # meta passthrough
            ...
    """

    def __init__(self, model, params, depth: int = 2,
                 fetch_keys: Tuple[str, ...] = (
                     "final_boxes", "final_labels", "final_probs",
                     "final_valid", "pooled_box_feat")):
        self.model = model
        self.params = params
        self.fetch_keys = fetch_keys
        self.depth = max(1, depth)
        self._fn = jax.jit(self._fetch_forward)

    def _fetch_forward(self, params, images):
        out = self.model.forward(params, images)
        return {k: out[k] for k in self.fetch_keys if k in out}

    def run(self, batches: Iterable[Tuple[np.ndarray, object]]
            ) -> Iterator[Tuple[Dict[str, np.ndarray], object]]:
        """batches yields (images [B, H, W, 3] uint8, meta). Yields
        (host numpy outputs, meta) in order."""
        inflight: deque = deque()
        for images, meta in batches:
            dev_images = jax.device_put(images)
            out = self._fn(self.params, dev_images)
            inflight.append((out, meta))
            if len(inflight) >= self.depth:
                yield self._to_host(*inflight.popleft())
        while inflight:
            yield self._to_host(*inflight.popleft())

    @staticmethod
    def _to_host(out, meta):
        host = {k: np.asarray(v) for k, v in out.items()}
        return host, meta
