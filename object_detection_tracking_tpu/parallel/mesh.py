"""Device mesh + sharding rules for train and inference.

Parallelism mapping (SURVEY.md §2.7 -> TPU):
  * DP: batch dim sharded over the 'data' axis; grad all-reduce by GSPMD.
  * TP: the Fast-RCNN head's big dense kernels ([12544, 1024] fc6 etc.) are
    sharded over the 'model' axis on their output dim — the matmul becomes
    a local matmul + all-gather/all-reduce placed by XLA.
  * Inference fan-out: the same mesh machinery shards the frame batch over
    all chips (the reference ran N separate single-GPU processes instead).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    assert n_data * n_model == n_total, \
        f"mesh {n_data}x{n_model} != {n_total} devices"
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def _is_tp_dense(path, leaf) -> bool:
    """Shard dense kernels with large output dims over 'model'."""
    keys = [getattr(k, "key", None) for k in path]
    if keys[-1] != "W" or leaf.ndim != 2:
        return False
    return leaf.shape[-1] % 8 == 0 and leaf.shape[-1] >= 1024


def param_shardings(params, mesh: Mesh):
    """Replicate everything except TP-sharded dense kernels."""
    def rule(path, leaf):
        if mesh.shape["model"] > 1 and _is_tp_dense(path, leaf):
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def make_sharded_train_step(trainer, params, mesh: Mesh):
    """Shard params (DP-replicated + TP dense kernels) and return
    (state, step_fn). The step shards each batch over the 'data' axis;
    optimizer slots inherit the param shardings through optax's
    zeros_like init; GSPMD derives the gradient all-reduce.

    step_fn(state, images, gt_boxes, gt_labels, gt_valid, rng); the batch
    dim must be divisible by the data axis size."""
    state = trainer.init_state(shard_params(params, mesh))
    raw_step = jax.jit(trainer.make_step_fn(), donate_argnums=(0,))
    data_sh = batch_sharding(mesh)

    def step_fn(state, images, gt_boxes, gt_labels, gt_valid, rng,
                gt_masks=None):
        images = jax.device_put(images, data_sh)
        gt_boxes = jax.device_put(gt_boxes, data_sh)
        gt_labels = jax.device_put(gt_labels, data_sh)
        gt_valid = jax.device_put(gt_valid, data_sh)
        rng = jax.device_put(rng, replicated(mesh))
        if gt_masks is not None:
            gt_masks = jax.device_put(gt_masks, data_sh)
        return raw_step(state, images, gt_boxes, gt_labels, gt_valid, rng,
                        gt_masks)

    return state, step_fn


def make_sharded_infer_fn(model, params, mesh: Mesh):
    """Batched inference sharded over every chip in the mesh."""
    params = shard_params(params, mesh)

    fn = jax.jit(
        model.forward,
        in_shardings=(param_shardings(params, mesh), batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )
    return params, fn
