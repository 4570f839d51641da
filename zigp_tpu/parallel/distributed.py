"""Multi-host (multi-process) bootstrap and DCN-aware meshes.

Single-host training covers every experiment in the reference (which is a
single tf.Session, scripts/onoff.py:357); this module is the scale-out
scaffolding for real TPU pods, where one Python process runs per host and
devices within a host/slice are joined by ICI while hosts are joined by DCN.

Design (the "How to Scale Your Model" recipe): put the **data** axis across
hosts — pure data parallelism needs exactly one gradient all-reduce per step,
the only collective that then rides DCN — and keep the **model**
(tensor-parallel inducing-row) axis inside a host so its per-conditional
collectives stay on ICI.

On this machine real multi-host is untestable (one chip through a tunnel);
the API is smoke-tested with multi-process CPU under an env guard
(tests/test_multihost.py, ZIGP_MULTIHOST_SMOKE=1) and single-host behavior is
verified unguarded (initialize() is a no-op, meshes fall back to
parallel.make_mesh).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh

from .mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Bootstrap ``jax.distributed`` when running multi-process; no-op
    single-host. Returns True iff distributed mode was initialized.

    Arguments may be omitted on launchers that set the standard environment
    (Cloud TPU pods, SLURM, ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID``) — ``jax.distributed.initialize`` auto-detects them.
    Call this before the first backend use; calling again is a no-op.
    """
    explicit = coordinator_address is not None or num_processes not in (None, 1)
    env = any(
        k in os.environ
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "SLURM_JOB_ID")
    )
    if not explicit and not env:
        return False
    # Idempotence must be checked WITHOUT touching the backend:
    # jax.process_count() initializes XLA, after which
    # jax.distributed.initialize() unconditionally raises ("must be called
    # before any JAX calls that might initialise the XLA backend").
    if jax.distributed.is_initialized():
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_multihost_mesh(n_data: Optional[int] = None, n_model: int = 1) -> Mesh:
    """('data', 'model') mesh for multi-process runs, laid out so that the
    'model' axis never crosses a host boundary (its collectives run per
    conditional and must ride ICI) and the 'data' axis is hierarchical —
    within-host ICI × across-host DCN — so the per-step gradient psum does one
    DCN hop. Falls back to ``make_mesh`` when single-process.
    """
    nproc = jax.process_count()
    if nproc == 1:
        return make_mesh(n_data, n_model)
    local = jax.local_device_count()
    if local % n_model:
        raise ValueError(
            f"n_model={n_model} must divide the per-host device count {local} "
            "(the model axis cannot cross a DCN boundary)"
        )
    ici_data = local // n_model
    total_data = ici_data * nproc
    if n_data is not None and n_data != total_data:
        raise ValueError(
            f"n_data={n_data} inconsistent with {nproc} processes × "
            f"{ici_data} per-host data shards = {total_data}"
        )
    n_slices = len({getattr(d, "slice_index", 0) for d in jax.devices()})
    try:
        # Topology-aware layout in both pod shapes: multislice (one slice per
        # DCN granule) or a single slice spanning hosts (process per granule).
        # create_hybrid_device_mesh applies create_device_mesh's torus-aware
        # ordering within each granule, which matters for ICI collective
        # throughput on real TPU topologies.
        from jax.experimental import mesh_utils

        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(ici_data, n_model),
            dcn_mesh_shape=(nproc, 1),
            process_is_granule=(n_slices != nproc),
        )
    except (ValueError, AssertionError, NotImplementedError):
        # Backends without usable topology info (the multi-process CPU smoke
        # test): group by process manually — host-major data axis, model
        # axis contiguous within a host — the same granule layout, without
        # the in-granule torus ordering (meaningless on CPU).
        import numpy as np

        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        devices = np.array(devs).reshape(nproc * ici_data, n_model)
    return Mesh(devices, axis_names=("data", "model"))
