"""Multi-host smoke test: two real processes join a jax.distributed cluster
(CPU backend), see the global device set, split data by host, and exchange
values via an allgather — the rebuild's scale-out entry point
(parallel/distributed.py; the reference has no multi-node story at all)."""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from myimagecaptioningmodel_tpu.parallel import distributed

    pid = int(sys.argv[1])
    port = sys.argv[2]
    distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    assert jax.process_count() == 2, jax.process_count()
    start, size = distributed.host_local_slice(10)
    assert (start, size) == ((0, 5) if pid == 0 else (5, 5)), (start, size)
    x = jnp.ones((1,)) * (pid + 1)
    total = multihost_utils.process_allgather(x)
    assert float(total.sum()) == 3.0, total
    print(f"proc {pid} OK", flush=True)
    """
)


def test_two_process_cluster(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON", "TPU", "LIBTPU"))
    }
    env.update(JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    port = "12789"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"proc {pid} OK" in out
