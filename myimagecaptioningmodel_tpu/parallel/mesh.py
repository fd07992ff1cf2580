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


def param_shardings(mesh: Mesh, params):
    """Sharding pytree for the model params: tensor-parallel vocab head.

    When the mesh has a ``model`` axis of size > 1, the tied embedding table
    [V, E] and the output bias [V] are sharded over the vocab dimension;
    everything else is replicated. GSPMD then partitions the tied-head
    matmul, the cross-entropy logsumexp, and the decode argmax across the
    ``model`` axis, inserting the collectives (this model's only
    vocab-sized tensors — TP beyond the head is out of scope, SURVEY §2.5).
    """
    repl = NamedSharding(mesh, P())
    shardings = jax.tree_util.tree_map(lambda _: repl, params)
    if mesh.shape[MODEL_AXIS] > 1 and "decoder" in params:
        dec = shardings["decoder"]
        dec["embedding"]["table"] = NamedSharding(mesh, P(MODEL_AXIS, None))
        dec["out_bias"] = NamedSharding(mesh, P(MODEL_AXIS))
    return shardings


def opt_state_shardings(mesh: Mesh, opt_state, params, p_shardings):
    """Match optimizer-state leaves that mirror param shapes to the param
    shardings (Adam's m/v mirror params); everything else replicated."""
    repl = NamedSharding(mesh, P())
    flat_params, _ = jax.tree_util.tree_flatten(params)
    flat_shard, _ = jax.tree_util.tree_flatten(p_shardings)
    by_shape = {}
    for p, s in zip(flat_params, flat_shard):
        by_shape.setdefault((p.shape, p.dtype), s)

    def pick(leaf):
        if hasattr(leaf, "shape"):
            return by_shape.get((leaf.shape, leaf.dtype), repl)
        return repl

    return jax.tree_util.tree_map(pick, opt_state)
