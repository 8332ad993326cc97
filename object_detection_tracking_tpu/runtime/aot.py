"""Compilation caching + AOT packing.

The reference ships frozen .pb graphs and TensorRT engines to cut startup
and get +30% runtime (models.py:134 pack, tensorrt_optimize.py, SPEED.md).
The XLA-native equivalents here:

  * persistent compilation cache: every jit executable is serialized to
    disk keyed by HLO fingerprint — second process start skips the 30-90 s
    compile entirely (``enable_persistent_cache``);
  * explicit AOT: ``aot_compile`` lowers+compiles a forward for a fixed
    shape and returns the serialized executable for shipping.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax


def enable_persistent_cache(cache_dir: Optional[str] = None):
    """Turn on the on-disk XLA executable cache (idempotent)."""
    cache_dir = cache_dir or os.environ.get(
        "ODT_COMPILE_CACHE", os.path.expanduser("~/.cache/odt_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def aot_compile(fn: Callable, *example_args: Any):
    """Lower + compile ``fn`` for the exact example shapes; returns the
    compiled executable (callable). Use ``.serialize()`` /
    ``jax.export`` for shipping across processes."""
    return jax.jit(fn).lower(*example_args).compile()
