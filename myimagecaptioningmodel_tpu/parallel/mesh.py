"""Device mesh + sharding rules.

Replaces the reference's ``fluid.ParallelExecutor`` data parallelism
(program replication + NCCL gradient AllReduce, train.py:119-127) with the
JAX mechanism: a ``jax.sharding.Mesh``, batch inputs sharded over the
``data`` axis, params/state replicated, and XLA GSPMD inserting the gradient
``psum`` over ICI (SURVEY §2.5, §5.8). Eval shares parameters with training
trivially — one replicated pytree feeds both the train-step and decode jits
(the reference needed ``share_vars_from``).

The mesh is (data, model): ``model`` is reserved for optional tensor
parallelism of the vocab-sized head and defaults to size 1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence] = None,
    model_parallel: int = 1,
) -> Mesh:
    """1-D data mesh by default; (data, model) when model_parallel > 1."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device_put host batches with the batch axis sharded over ``data``."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]
