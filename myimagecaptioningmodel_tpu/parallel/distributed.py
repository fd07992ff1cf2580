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
