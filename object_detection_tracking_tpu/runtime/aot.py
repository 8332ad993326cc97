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
    """Turn on the on-disk XLA executable cache (idempotent).

    jax LATCHES the cache object at its first use: once any compile has
    initialized the cache, later ``jax_compilation_cache_dir`` updates
    are silently ignored (writes keep going to the first directory).
    Callers that repoint mid-process (``cli.main pack`` shipping its
    executable inside the pack) need the latch dropped, so when the
    requested dir differs from the latched one we reset the cache state
    (jax._src.compilation_cache.reset_cache — pristine-state helper)."""
    cache_dir = cache_dir or os.environ.get(
        "ODT_COMPILE_CACHE", os.path.expanduser("~/.cache/odt_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        from jax._src import compilation_cache as _cc
        latched = getattr(_cc, "_cache", None)
        if latched is not None and getattr(latched, "_path", None) is not None \
                and str(latched._path) != cache_dir:
            _cc.reset_cache()
    except Exception:
        pass  # private API moved — stale-latch repoint degrades gracefully
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # jax's default also turns on XLA's gpu per-fusion autotune cache and
    # embeds the cache DIRECTORY PATH into debug_options, which IS hashed
    # into the compile-cache key (cache_key.py zeroes the dump options but
    # not this one). Net effect: two processes with different cache dirs
    # compute different keys for the same program, so executables shipped
    # inside a pack (cli.main pack -> load_packed) could never hit. The
    # autotune cache is GPU-only — disable it so keys are path-independent.
    jax.config.update("jax_persistent_cache_enable_xla_caches", "")
    return cache_dir


def aot_compile(fn: Callable, *example_args: Any):
    """Lower + compile ``fn`` for the exact example shapes; returns the
    compiled executable (callable). Use ``.serialize()`` /
    ``jax.export`` for shipping across processes."""
    return jax.jit(fn).lower(*example_args).compile()


def export_serialized(fn: Callable, *example_args: Any) -> bytes:
    """Serialize ``fn`` (StableHLO via jax.export) for the example shapes —
    the portable artifact the reference's frozen .pb provided
    (models.py:134-191): another process loads and runs it without
    retracing any Python model code."""
    from jax import export as jexport
    specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x),
                                       jax.numpy.result_type(x)),
        example_args)
    return jexport.export(jax.jit(fn))(*specs).serialize()


def load_exported(blob: bytes) -> Callable:
    """Deserialize an ``export_serialized`` artifact into a callable.
    The call jit-compiles the embedded StableHLO for the local backend
    (hitting the persistent compile cache when warm) — no model Python
    needed."""
    from jax import export as jexport
    exp = jexport.deserialize(blob)
    return jax.jit(exp.call)


def device_put_tree_batched(params):
    """Upload a param pytree as ONE host->device transfer per dtype.

    Per-leaf ``device_put`` issues one tunnel round trip per array —
    550 round trips for an R50-FPN tree, which dominates cold start
    whenever the link RTT is congested (measured 10 s..250 s for the
    same 242 MB). Concatenating on host (~0.3 s memcpy) collapses that
    to one bulk transfer per dtype; a single jitted slice+reshape fans
    the buffer back out into leaves on device."""
    import numpy as np

    leaves, treedef = jax.tree.flatten(params)
    leaves = [np.asarray(x) for x in leaves]
    groups = {}
    for i, x in enumerate(leaves):
        groups.setdefault(x.dtype.str, []).append(i)
    out = [None] * len(leaves)
    for idxs in groups.values():
        flat = [leaves[i].ravel() for i in idxs]
        sizes = tuple(int(f.size) for f in flat)
        shapes = tuple(leaves[i].shape for i in idxs)
        dbuf = jax.device_put(np.concatenate(flat)
                              if len(flat) > 1 else flat[0])

        def split(b, sizes=sizes, shapes=shapes):
            parts, off = [], 0
            for n, sh in zip(sizes, shapes):
                parts.append(jax.lax.slice(b, (off,), (off + n,))
                             .reshape(sh))
                off += n
            return parts
        for i, p in zip(idxs, jax.jit(split)(dbuf)):
            out[i] = p
    return jax.tree.unflatten(treedef, out)


def load_packed(pack_dir: str):
    """Load a ``cli.main pack`` directory: (config, params, forward_fn).
    ``forward_fn(params, images)`` runs the exported graph; the packed
    batch shape is fixed (static shapes)."""
    import json

    import numpy as np

    from ..config import DetectorConfig

    with open(os.path.join(pack_dir, "config.json")) as f:
        raw = json.load(f)
    field_names = {f.name for f in
                   __import__("dataclasses").fields(DetectorConfig)}
    raw = {k: (tuple(v) if isinstance(v, list) else v)
           for k, v in raw.items() if k in field_names}
    cfg = DetectorConfig(**raw)
    from ..utils.weights import load_npz_tree
    params = load_npz_tree(os.path.join(pack_dir, "params.npz"))
    # start the params host->device transfer NOW (async, one bulk
    # transfer per dtype) so the upload overlaps the exported graph's
    # deserialize+compile below
    params = device_put_tree_batched(params)
    # merge the pack's shipped executable cache (written by cli.main
    # pack) into the active persistent cache so the compile below is a
    # disk hit on a matching backend — the frozen-.pb "load in seconds"
    # behavior (reference SPEED.md:65-66) without retrace or recompile
    pack_cache = os.path.join(pack_dir, "xla_cache")
    if os.path.isdir(pack_cache):
        import shutil
        dst = jax.config.jax_compilation_cache_dir
        if not dst:
            dst = enable_persistent_cache()
        os.makedirs(dst, exist_ok=True)
        for name in os.listdir(pack_cache):
            target = os.path.join(dst, name)
            if not os.path.exists(target):
                shutil.copy(os.path.join(pack_cache, name), target)
    with open(os.path.join(pack_dir, "forward.jaxexport"), "rb") as f:
        fn = load_exported(f.read())
    return cfg, params, fn
