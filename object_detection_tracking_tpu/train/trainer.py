"""Optimizer, LR schedule, and the data-parallel train step.

Reference Trainer (trainer.py:41-215) builds per-GPU towers and averages
gradients on a parameter server. TPU-native: one jit-compiled train step
whose batch is sharded over the mesh's data axis and whose large dense
kernels are sharded over the model axis (parallel/mesh.py); XLA inserts the
gradient all-reduce over ICI automatically from the shardings.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig


def make_lr_schedule(cfg: TrainConfig) -> Callable:
    """Linear warmup -> hold -> cosine/exp decay (trainer.py:49-86)."""
    def schedule(step):
        step = step.astype(jnp.float32) if hasattr(step, "astype") else \
            jnp.asarray(step, jnp.float32)
        warm = cfg.warmup_init_lr + (cfg.init_lr - cfg.warmup_init_lr) * \
            (step / max(cfg.warmup_steps, 1))
        if cfg.lr_schedule == "cosine":
            t = jnp.clip((step - cfg.warmup_steps) /
                         max(cfg.total_steps - cfg.warmup_steps, 1), 0, 1)
            decayed = cfg.init_lr * 0.5 * (1 + jnp.cos(jnp.pi * t))
        elif cfg.lr_schedule == "exp":
            t = jnp.clip((step - cfg.warmup_steps) /
                         max(cfg.total_steps - cfg.warmup_steps, 1), 0, 1)
            decayed = cfg.init_lr * jnp.power(0.01, t)
        else:
            decayed = jnp.asarray(cfg.init_lr)
        return jnp.where(step < cfg.warmup_steps, warm, decayed)
    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg)
    if cfg.optimizer == "momentum":
        opt = optax.sgd(schedule, momentum=cfg.momentum)
    elif cfg.optimizer == "adam":
        opt = optax.adam(schedule)
    elif cfg.optimizer == "adadelta":
        opt = optax.adadelta(schedule)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(schedule)
    else:
        raise ValueError(cfg.optimizer)
    chain = []
    if cfg.clip_gradient_norm:
        chain.append(optax.clip_by_global_norm(cfg.clip_gradient_norm))
    if cfg.wd:
        # reference wd_cost applies to conv/dense kernels only (nn.py:51)
        def mask(params):
            return jax.tree.map_with_path(
                lambda path, _: any(
                    getattr(k, "key", None) == "W" for k in path), params)
        chain.append(optax.add_decayed_weights(cfg.wd, mask=mask))
    chain.append(opt)
    return optax.chain(*chain)


class Trainer:
    """Holds optimizer state and the jitted train step."""

    def __init__(self, model, train_cfg: TrainConfig,
                 mesh: Optional[jax.sharding.Mesh] = None):
        self.model = model
        self.cfg = train_cfg
        self.tx = make_optimizer(train_cfg)
        self.mesh = mesh
        self._step_fn = None

    def init_state(self, params) -> Dict[str, Any]:
        return {
            "params": params,
            "opt": self.tx.init(params),
            "step": jnp.zeros((), jnp.int32),
        }

    def make_step_fn(self):
        model, tx = self.model, self.tx

        def train_step(state, images, gt_boxes, gt_labels, gt_valid, rng,
                       gt_masks=None):
            def loss_fn(params):
                losses = model.forward_train(
                    params, images, gt_boxes, gt_labels, gt_valid, rng,
                    gt_masks=gt_masks)
                return losses["total_loss"], losses

            grads, losses = jax.grad(loss_fn, has_aux=True)(state["params"])
            updates, new_opt = tx.update(grads, state["opt"],
                                         state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            new_state = {"params": new_params, "opt": new_opt,
                         "step": state["step"] + 1}
            return new_state, losses

        return train_step

    def step_fn(self):
        if self._step_fn is None:
            self._step_fn = jax.jit(self.make_step_fn(), donate_argnums=(0,))
        return self._step_fn
