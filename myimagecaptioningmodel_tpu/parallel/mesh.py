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
    """Match optimizer-state leaves that mirror the param pytree (Adam's m/v)
    to the param shardings by TREE PATH, not by shape: optax moment states
    embed the param tree verbatim, so an opt-state leaf whose key path ends
    with a param's full key path is that param's moment. Shape-based matching
    would silently missharding any future param that happens to share
    shape/dtype with a TP-sharded tensor. Non-mirroring leaves (step counts
    etc.) are replicated."""
    repl = NamedSharding(mesh, P())
    flat = jax.tree_util.tree_flatten_with_path(p_shardings)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    by_suffix = {}
    for (path, s), (_, p) in zip(flat, flat_p):
        by_suffix[jax.tree_util.keystr(path)] = (s, p.shape, p.dtype)

    def pick(path, leaf):
        if not hasattr(leaf, "shape"):
            return repl
        ks = jax.tree_util.keystr(path)
        best = None
        for suffix, (s, shape, dtype) in by_suffix.items():
            if ks.endswith(suffix) and (best is None or len(suffix) > len(best[0])):
                best = (suffix, s, shape)
        if best is None:
            return repl
        _, s, shape = best
        if tuple(leaf.shape) != tuple(shape):  # mirrors structure, not shape
            return repl
        return s

    return jax.tree_util.tree_map_with_path(pick, opt_state)
