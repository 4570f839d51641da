"""Failure detection / elastic recovery: checkpoint cadence inside fit() and
restore-from-latest on a non-finite loss."""

import os

import numpy as np
import jax.numpy as jnp

from zigp_tpu.io.checkpoint import CheckpointManager
from zigp_tpu.likelihoods import Gaussian
from zigp_tpu.models import KronSVGP
from zigp_tpu.ops.kernels import RBF
from zigp_tpu.training import DataSet, fit


def _model(rng, N):
    Zs = [rng.rand(3, 2), np.linspace(0, 1, 5)[:, None]]
    ks = [RBF.create([1.0, 1.0], 1.0), RBF.create([0.3], 1.0)]
    return KronSVGP.create(ks, Zs, Gaussian.create(0.1), num_data=N, jitter=1e-6)


def test_fit_writes_checkpoints(rng, tmp_path):
    N = 30
    X = rng.rand(N, 3)
    Y = rng.rand(N, 1)
    mgr = CheckpointManager(str(tmp_path / "ck"), every=5)
    model = _model(rng, N)
    fit(model, DataSet(X, Y), num_iter=12, batch_size=N, log_every=0,
        ckpt_manager=mgr, log_fn=lambda s: None)
    # cadence saves at 5 and 10, plus the final save at completion (step 12)
    # so restore-and-predict sees the fully trained state
    assert mgr.latest_step() == 12
    assert os.path.isdir(mgr._path(10))


def test_fit_recovers_from_nan_loss(rng, tmp_path):
    N = 20
    X = rng.rand(N, 3)
    Y = rng.rand(N, 1)
    mgr = CheckpointManager(str(tmp_path / "ck"), every=2)
    model = _model(rng, N)

    # poison the data stream — a DataSet whose 7th batch contains NaN
    class Poisoned(DataSet):
        def __init__(self, x, y):
            super().__init__(x, y, seed=0)
            self.calls = 0

        def next_batch(self, b, shuffle=True):
            self.calls += 1
            bx, by = super().next_batch(b, shuffle)
            if self.calls == 7:
                by = by.copy()
                by[0, 0] = np.nan
            return bx, by

    logs = []
    res = fit(model, Poisoned(X, Y), num_iter=10, batch_size=N, log_every=1,
              ckpt_manager=mgr, log_fn=logs.append)
    joined = "\n".join(logs)
    assert "NON-FINITE" in joined
    assert "restored from checkpoint" in joined
    # run ends with finite parameters
    import jax

    assert all(
        np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(res.model)
    )
