"""Multi-host initialization (SURVEY §5.8).

Within one slice, DP gradients ride ICI via the mesh in ``parallel/mesh.py``;
across hosts/slices, JAX needs ``jax.distributed.initialize`` before any
backend use so every process sees the global device set. The reference has
no multi-node story at all (single-host ParallelExecutor only) — this is the
rebuild's scale-out entry point.

Typical use (same program on every host, e.g. under GKE/TPU-VM launchers)::

    from myimagecaptioningmodel_tpu.parallel import distributed
    distributed.initialize()          # env-driven (TPU pods: fully automatic)
    mesh = mesh_mod.make_mesh()       # now spans all hosts' devices

Per-host data sharding: each host feeds only its addressable shard of the
global batch; use ``host_local_slice`` to carve a host's portion from a
global index space.
"""

from __future__ import annotations

from typing import Optional, Tuple


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent ``jax.distributed.initialize`` (no-op if already up or
    single-process). On TPU pods all arguments are discovered from the
    environment."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized


def host_local_slice(total: int) -> Tuple[int, int]:
    """(start, size) of this host's contiguous shard of ``total`` samples."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    base = total // n
    rem = total % n
    start = i * base + min(i, rem)
    size = base + (1 if i < rem else 0)
    return start, size


def put_tree(tree, shardings):
    """Place a host pytree onto a (possibly multi-process) mesh.

    ``shardings`` is a matching pytree of NamedShardings or a single
    sharding applied to every leaf. Uses ``jax.make_array_from_callback``,
    which works when the sharding's devices span processes (plain
    ``jax.device_put`` requires addressable devices); every process must
    hold the same host values for replicated leaves."""
    import jax
    import numpy as np

    is_leaf_sh = hasattr(shardings, "addressable_devices")

    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    if is_leaf_sh:
        return jax.tree_util.tree_map(lambda x: put(x, shardings), tree)
    return jax.tree_util.tree_map(put, tree, shardings)


def is_main_process() -> bool:
    """True on the one process that owns filesystem side effects
    (checkpoints, exports, log files) in a multi-host run."""
    import jax

    return jax.process_index() == 0


def local_rows(arr) -> "np.ndarray":
    """This process's rows of a batch-sharded global jax.Array, in global
    row order — the multi-host analog of ``jax.device_get`` on an output
    whose shards live partly on other hosts (which raises)."""
    import numpy as np

    shards = sorted(
        arr.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def sum_across_processes(values) -> "np.ndarray":
    """Elementwise sum of a float vector over all processes (allgather over
    DCN; single-process: identity)."""
    import jax
    import numpy as np

    vals = np.asarray(values, np.float32)
    if jax.process_count() == 1:
        return vals
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(vals)).sum(axis=0)


def global_distinct_count(sentences) -> int:
    """|union over processes| of per-process sentence sets, without shipping
    strings: each sentence becomes a 64-bit blake2b hash (as two int32
    lanes, since allgather arrays are 32-bit under JAX defaults), hash
    arrays are padded to the max per-process count and allgathered, and the
    union of hashes is counted. Collision odds at dev-set scale (~1e5
    sentences) are ~1e-9."""
    import hashlib

    import jax
    import numpy as np

    if jax.process_count() == 1:
        return len(sentences)
    from jax.experimental import multihost_utils

    h = np.zeros((len(sentences), 2), np.int32)
    for i, s in enumerate(sorted(sentences)):
        d = hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest()
        h[i] = np.frombuffer(d, np.int32)
    counts = np.asarray(
        multihost_utils.process_allgather(np.asarray([len(sentences)], np.int32))
    ).reshape(-1)
    m = int(counts.max())
    if m == 0:
        return 0
    padded = np.zeros((m, 2), np.int32)
    padded[: len(sentences)] = h
    gathered = np.asarray(multihost_utils.process_allgather(padded))  # [P, m, 2]
    pairs = set()
    for p, c in enumerate(counts):
        for row in gathered[p, :c]:
            pairs.add((int(row[0]), int(row[1])))
    return len(pairs)
