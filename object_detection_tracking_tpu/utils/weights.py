"""Checkpoint conversion: reference TF/tensorpack weights -> our pytrees.

The reference loads three formats (models.py:3489-3595): TF ckpt dirs,
single .ckpt, and tensorpack-style .npz dicts keyed by TF variable names
("group0/block0/conv1/W:0", BN stats as ".../bn/mean/EMA:0"). Without
TensorFlow in this image we support:

  * .npz with TF variable names  -> ``load_reference_npz``
  * .npz / .orbax saved from this framework -> identity load

Layout notes:
  * conv kernels are HWIO in both stacks — no transpose;
  * our activations are NHWC while the reference ran NCHW; the only
    layout-sensitive weights are dense layers consuming flattened conv
    maps: fc6 rows must be permuted (C,7,7) -> (7,7,C) (models.py:1030
    dense-on-roi flatten order);
  * BN: gamma/beta/mean/EMA/variance/EMA -> gamma/beta/mean/variance.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import numpy as np


def _set_path(tree: Dict, path, value, strict: bool = True) -> bool:
    node = tree
    for k in path[:-1]:
        if not isinstance(node, dict) or k not in node:
            if strict:
                raise KeyError("/".join(path))
            return False
        node = node[k]
    k = path[-1]
    if not isinstance(node, dict) or k not in node:
        if strict:
            raise KeyError("/".join(path))
        return False
    old = node[k]
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: "
            f"{tuple(old.shape)} vs {tuple(value.shape)}")
    node[k] = value.astype(np.float32)
    return True


def _map_tf_name(name: str) -> Tuple[Tuple[str, ...], str]:
    """TF variable name -> (path in our pytree, kind).

    kind is "plain" or "fc6" (needs C-major -> HWC-major row permutation).
    """
    name = name.split(":")[0]
    parts = name.split("/")

    # BN stats: .../bn/mean/EMA -> .../bn/mean
    if len(parts) >= 3 and parts[-1] == "EMA":
        parts = parts[:-2] + [parts[-2]]
    if parts[-1] == "variance":
        pass

    top = parts[0]
    if top in ("fpn", "rpn"):
        return tuple(parts), "plain"
    if top == "fastrcnn":
        kind = "fc6" if (len(parts) >= 2 and parts[1] == "fc6"
                         and parts[-1] == "W") else "plain"
        return tuple(parts), kind
    if top == "maskrcnn":
        return tuple(parts), "plain"
    # backbone names live at root scope in the reference (conv0, group0..)
    return tuple(["resnet"] + parts), "plain"


def _permute_fc6_rows(w: np.ndarray, feat_dim: int = 256,
                      pool: int = 7) -> np.ndarray:
    """[(C*7*7), D] C-major rows -> [(7*7*C), D] HWC-major rows."""
    d = w.shape[1]
    w = w.reshape(feat_dim, pool, pool, d)
    w = np.transpose(w, (1, 2, 0, 3))
    return w.reshape(pool * pool * feat_dim, d)


def load_reference_npz(path: str, model) -> Dict:
    """Load a tensorpack/TF-named .npz into the model's parameter pytree."""
    return load_reference_dict(dict(np.load(path)), model, source=path)


def load_reference_dict(weights: Dict[str, np.ndarray], model,
                        source: str = "<dict>") -> Dict:
    """Load a dict of TF-named arrays into the model's parameter pytree.

    Unknown keys are reported; missing model params keep their random init
    (mirrors the reference's partial-restore behavior)."""
    import jax.random
    params = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(np.asarray, params)

    loaded, skipped = [], []
    for name, value in weights.items():
        base = name.split(":")[0]
        leaf = base.split("/")[-1]
        if "global_step" in base or leaf in (
                "Adam", "Adam_1", "Momentum", "Adadelta", "Adadelta_1",
                "beta1_power", "beta2_power"):
            continue
        path_t, kind = _map_tf_name(name)
        if kind == "fc6":
            value = _permute_fc6_rows(
                value, model.config.fpn_num_channel, 7)
        try:
            ok = _set_path(params, path_t, value, strict=False)
        except ValueError as e:
            raise ValueError(f"converting {name}: {e}") from None
        (loaded if ok else skipped).append(name)

    if skipped:
        print(f"warning: {len(skipped)}/{len(weights)} arrays not "
              f"mapped: {sorted(skipped)[:8]}...")
    print(f"loaded {len(loaded)} arrays from {source}")
    return jax.tree.map(jax.numpy.asarray, params)


def save_npz(path: str, params: Dict):
    """Save a pytree as flat slash-named npz (our native format)."""
    flat = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, prefix + [k])
        else:
            flat["/".join(prefix)] = np.asarray(node)

    rec(params, [])
    np.savez(path, **flat)


def load_npz_tree(path: str) -> Dict:
    """Rebuild the nested param dict from a flat slash-named npz WITHOUT
    model code — the load side of a packed artifact (runtime.aot
    load_packed), mirroring how the reference loads a frozen .pb with no
    model class (models.py:134-191). Leaves stay HOST numpy: the caller
    picks the upload strategy (load_packed batches the whole tree into
    one transfer per dtype — 550 per-leaf transfers each pay a tunnel
    round trip, which dominates cold start when the link is congested)."""
    out: Dict = {}
    for name, value in np.load(path).items():
        node = out
        parts = name.split("/")
        for k in parts[:-1]:
            node = node.setdefault(k, {})
        node[parts[-1]] = value
    return out


def load_npz(path: str, model, ignore_vars: str = None) -> Dict:
    """Load our native flat slash-named npz."""
    import jax.random
    params = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(np.asarray, params)
    weights = _filter_ignored(dict(np.load(path)), ignore_vars)
    for name, value in weights.items():
        _set_path(params, tuple(name.split("/")), value, strict=True)
    return jax.tree.map(jax.numpy.asarray, params)


def _is_efficientdet(model) -> bool:
    return hasattr(model, "fpn_repeats") and hasattr(model, "backbone_name")


def _filter_ignored(weights: Dict[str, np.ndarray], ignore_vars):
    """Drop tensors whose name contains any ':'-separated substring
    (reference --ignore_vars, models.py:3507-3525); dropped params keep
    their fresh init — the fine-tune-with-new-heads workflow."""
    if not ignore_vars:
        return weights
    subs = [s for s in ignore_vars.split(":") if s]
    kept = {}
    for k, v in weights.items():
        if any(sub in k for sub in subs):
            print(f"ignored {k}")
        else:
            kept[k] = v
    return kept


def load_weights(path: str, model, ignore_vars: str = None) -> Dict:
    """Dispatch on checkpoint flavor (reference initialize,
    models.py:3489-3595 handles ckpt dir / single .ckpt / .npz; automl
    EfficientDet ckpts per efficientdet_wrapper.py). ignore_vars: ':'-
    separated name substrings excluded from the restore."""
    if path.endswith(".npz"):
        keys = np.load(path).files
        if _is_efficientdet(model) and any(
                k.split(":")[0].startswith(
                    ("efficientnet-", "fpn_cells/", "resample_p6/"))
                for k in keys[:80]):
            from .effdet_weights import load_effdet_reference
            return load_effdet_reference(
                _filter_ignored(dict(np.load(path)), ignore_vars), model,
                source=path)
        if any(k.endswith(":0") or k.startswith(
                ("group0/", "conv0/", "fpn/", "rpn/", "fastrcnn/"))
               and "resnet/" not in k for k in keys[:50]):
            # TF-named checkpoint unless it already uses our "resnet/" root
            if not any(k.startswith("resnet/") for k in keys):
                return load_reference_dict(
                    _filter_ignored(dict(np.load(path)), ignore_vars),
                    model, source=path)
        return load_npz(path, model, ignore_vars=ignore_vars)
    # TF V2 checkpoint: a prefix/.index path or a directory with a
    # 'checkpoint' state file — read TF-free via the tensor-bundle parser
    if (os.path.isdir(path) or path.endswith(".index") or
            os.path.exists(path + ".index")):
        from .tf_ckpt import load_tf_checkpoint
        tensors = _filter_ignored(load_tf_checkpoint(path), ignore_vars)
        if _is_efficientdet(model):
            from .effdet_weights import load_effdet_reference
            return load_effdet_reference(tensors, model, source=path)
        return load_reference_dict(tensors, model, source=path)
    raise ValueError(f"unsupported checkpoint format: {path} "
                     "(expected .npz, a TF ckpt prefix/.index, or a ckpt "
                     "directory)")
