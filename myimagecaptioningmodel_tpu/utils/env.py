"""Host-environment helpers: forcing the CPU JAX backend.

This environment may pre-register a TPU platform at interpreter start (a
sitecustomize hook), so plain ``JAX_PLATFORMS=cpu`` set after startup is too
late for the current process, and a child process additionally needs the
TPU/AXON discovery variables stripped. These helpers are the single home of
that recipe (previously copy-pasted across the driver entry, benchmarks and
tests — see .claude/skills/verify/SKILL.md "Gotchas").
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

_TPU_ENV_PREFIXES = ("PALLAS_AXON", "AXON", "TPU", "LIBTPU", "JAX_PLATFORMS")
_DEVCOUNT_RE = r"--xla_force_host_platform_device_count=\d+"


def cpu_subprocess_env(
    n_devices: Optional[int] = None,
    base: Optional[Dict[str, str]] = None,
) -> Dict[str, str]:
    """Environment for a child process that must run JAX on CPU.

    Strips TPU/AXON discovery vars, pins ``JAX_PLATFORMS=cpu`` and, when
    ``n_devices`` is given, REPLACES any inherited
    ``--xla_force_host_platform_device_count`` flag (an inherited smaller
    count would starve the child of virtual devices). The child should still
    run ``jax.config.update('jax_platforms', 'cpu')`` right after
    ``import jax`` in case a sitecustomize pre-registered a TPU backend.
    """
    env = {
        k: v
        for k, v in (base if base is not None else os.environ).items()
        if not k.startswith(_TPU_ENV_PREFIXES)
    }
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(_DEVCOUNT_RE, "", env.get("XLA_FLAGS", ""))
    if n_devices:
        flags += f" --xla_force_host_platform_device_count={int(n_devices)}"
    env["XLA_FLAGS"] = flags.strip()
    return env


def force_cpu_inprocess() -> None:
    """Make THIS process use the CPU backend. Call before ``import jax``."""
    for k in list(os.environ):
        if k.startswith(_TPU_ENV_PREFIXES):
            del os.environ[k]
    os.environ["JAX_PLATFORMS"] = "cpu"


def enable_compilation_cache(directory: Optional[str] = None) -> Optional[str]:
    """Turn on JAX's persistent XLA compilation cache for this process.

    First compiles of the full model are 20-40 s on TPU; the cache makes
    every subsequent CLI invocation start hot. ``directory`` defaults to
    ``$JAX_COMPILATION_CACHE_DIR`` or ``~/.cache/myimagecaptioningmodel_tpu/xla``.
    Returns the directory used, or None if the cache could not be enabled
    (old jax); never raises.
    """
    directory = (
        directory
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "myimagecaptioningmodel_tpu", "xla"
        )
    )
    try:
        import jax

        os.makedirs(directory, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", directory)
        # cache even fast compiles: CLI processes are short-lived
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return directory
    except Exception:
        return None
