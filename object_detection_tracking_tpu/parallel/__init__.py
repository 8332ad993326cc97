"""Mesh/sharding layer: scale-out via jax.sharding + XLA collectives.

The reference's distribution story is in-graph tower DP with a CPU
parameter server (models.py:67-87, trainer.py:10-39) plus process-level
inference fan-out (SPEED.md:61). Here: one ('data', 'model') mesh; batches
shard over 'data', large dense kernels over 'model'; gradient all-reduce
and activation collectives are inserted by GSPMD and ride ICI.
"""

from .mesh import (  # noqa: F401
    make_mesh, param_shardings, make_sharded_train_step,
    make_sharded_infer_fn)
