"""Host observability: background utilization sampler + summaries.

Reference PerformanceLogger (utils.py:252-293) polls nvidia-smi + psutil;
here we sample host CPU/RSS and JAX device memory stats, and expose hooks
into jax.profiler for op-level traces (the reference has no op-level
tracer at all).
"""

from __future__ import annotations

import json
import threading
import time
from typing import Dict, List, Optional

import numpy as np

try:
    import psutil
except ImportError:  # pragma: no cover
    psutil = None

import jax


class PerformanceLogger:
    def __init__(self, interval: float = 10.0):
        self.interval = interval
        self.series: Dict[str, List[float]] = {
            "time": [], "cpu_percent": [], "rss_mb": [], "device_bytes": []}
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _sample(self):
        self.series["time"].append(time.time())
        if psutil is not None:
            p = psutil.Process()
            self.series["cpu_percent"].append(psutil.cpu_percent())
            self.series["rss_mb"].append(p.memory_info().rss / 1e6)
        else:
            self.series["cpu_percent"].append(0.0)
            self.series["rss_mb"].append(0.0)
        dev_bytes = 0.0
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats:
                dev_bytes = float(stats.get("bytes_in_use", 0))
        except Exception:
            pass
        self.series["device_bytes"].append(dev_bytes)

    def _run(self):
        while not self._stop.wait(self.interval):
            try:
                self._sample()
            except Exception:
                pass

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def end(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2)

    def summary(self) -> Dict[str, float]:
        out = {}
        for k in ("cpu_percent", "rss_mb", "device_bytes"):
            vals = self.series[k]
            if vals:
                out[f"{k}_median"] = float(np.median(vals))
                out[f"{k}_max"] = float(np.max(vals))
        return out

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(self.series, f)


def start_trace(log_dir: str):
    """Op-level device trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)


def stop_trace():
    jax.profiler.stop_trace()
