"""Device mesh and sharding helpers.

The reference has no distributed backend at all (single tf.Session,
scripts/onoff.py:357). Here parallelism is first-class but tiny in surface
area, the TPU way: declare a ``jax.sharding.Mesh``, annotate shardings, and
let XLA insert the collectives over ICI.

Axes:
- ``data``: minibatch rows. The ELBO's Σ var_exp over the batch becomes an
  XLA all-reduce of per-device partial sums; parameters stay replicated and
  gradient contributions are psum'd automatically.
- ``model``: reserved axis for sharding the temporal Kronecker factor of the
  inducing grid (M_t) when scaling the grid beyond one chip's HBM.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh needs {n_data}×{n_model} = {n_data * n_model} devices but "
            f"only {len(devices)} are available "
            f"({[d.platform for d in devices[:4]]}...)"
        )
    use = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Rows of an (N, D) batch split across the data axis."""
    return NamedSharding(mesh, P("data", None))


def shard_batch(mesh: Mesh, *arrays):
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
