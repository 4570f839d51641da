"""Production machinery for the natural-gradient trainer (VERDICT r2 #3):
checkpoint/resume, NaN recovery, metric logging, device sampler, and
interrupt handling must meet the same bar as the Adam path
(test_scan_production.py); reference Saver cadence: scripts/onoff.py:390-392.
"""

import json
import os

import numpy as np
import jax
import pytest

from zigp_tpu.io.checkpoint import CheckpointManager
from zigp_tpu.likelihoods import Gaussian
from zigp_tpu.models import KronSVGP
from zigp_tpu.ops.kernels import RBF
from zigp_tpu.training import DataSet
from zigp_tpu.training.natgrad import fit_natgrad_scanned
from zigp_tpu.utils.logging import MetricLogger


def _model(rng, N, seed=0):
    Zs = [rng.rand(3, 2), np.linspace(0, 1, 5)[:, None]]
    ks = [RBF.create([1.0, 1.0], 1.0), RBF.create([0.3], 1.0)]
    return KronSVGP.create(ks, Zs, Gaussian.create(0.1), num_data=N, jitter=1e-6, seed=seed)


def _leaves_close(a, b, rtol=1e-6):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    return all(np.allclose(np.asarray(x), np.asarray(y), rtol=rtol) for x, y in zip(la, lb))


KW = dict(batch_size=16, num_inner=5, gamma=0.01, gamma_warmup=0,
          adam_warmup=0, log_fn=lambda s: None)


def test_natgrad_writes_checkpoints_and_metrics(rng, tmp_path):
    N = 40
    X, Y = rng.rand(N, 3), rng.rand(N, 1)
    mgr = CheckpointManager(str(tmp_path / "ck"), every=10)
    mpath = str(tmp_path / "metrics.jsonl")
    logger = MetricLogger(mpath)
    model = _model(rng, N)
    fit_natgrad_scanned(
        model, DataSet(X, Y), num_iter=20, ckpt_manager=mgr,
        metric_logger=logger, log_every_blocks=1, **KW,
    )
    logger.close()
    assert mgr.latest_step() == 20
    records = [json.loads(l) for l in open(mpath)]
    scalar_recs = [r for r in records if "loss" in r]
    assert scalar_recs and all("gamma" in r and "elbo" in r for r in scalar_recs)


def test_natgrad_recovers_from_nan(rng, tmp_path):
    N = 30
    X, Y = rng.rand(N, 3), rng.rand(N, 1)
    mgr = CheckpointManager(str(tmp_path / "ck"), every=5)
    model = _model(rng, N)

    class Poisoned(DataSet):
        def __init__(self, x, y):
            super().__init__(x, y, seed=0)
            self.calls = 0

        def next_batch(self, b, shuffle=True):
            self.calls += 1
            bx, by = super().next_batch(b, shuffle)
            if self.calls == 15:  # poison the last batch of the 3rd block
                by = by.copy()
                by[0, 0] = np.nan
            return bx, by

    logs = []
    res = fit_natgrad_scanned(
        model, Poisoned(X, Y), num_iter=30, ckpt_manager=mgr,
        log_every_blocks=1, **{**KW, "log_fn": logs.append},
    )
    joined = "\n".join(logs)
    assert "NON-FINITE" in joined
    assert "restored from checkpoint" in joined
    assert all(
        np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(res.model)
    )
    # poisoned state never checkpointed
    from zigp_tpu.io.checkpoint import restore

    for step_dir in os.listdir(mgr.directory):
        m, _, _ = restore(
            os.path.join(mgr.directory, step_dir), res.model, res.opt_state
        )
        assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(m))


@pytest.mark.parametrize("sampler", ["host", "device"])
def test_natgrad_resume_reproduces_uninterrupted_run(rng, tmp_path, sampler):
    """Kill at step 20 of 40, resume=True from the checkpoint, and land on
    the same parameters as the uninterrupted run — for both the host
    (shuffled-epoch, ds.skip fast-forward) and device (key-derived) samplers."""
    N = 50
    X, Y = rng.rand(N, 3), rng.rand(N, 1)
    kw = {**KW, "sampler": sampler, "sampler_seed": 5}

    def make_parts():
        return _model(np.random.RandomState(0), N), DataSet(X, Y, seed=7)

    model, ds = make_parts()
    full = fit_natgrad_scanned(model, ds, num_iter=40, **kw)

    model, ds = make_parts()
    mgr = CheckpointManager(str(tmp_path / "ck"), every=20)
    fit_natgrad_scanned(model, ds, num_iter=20, ckpt_manager=mgr, **kw)
    assert mgr.latest_step() == 20

    model2, ds2 = make_parts()
    resumed = fit_natgrad_scanned(
        model2, ds2, num_iter=40, ckpt_manager=mgr, resume=True, **kw
    )
    assert _leaves_close(full.model, resumed.model)


def test_natgrad_device_sampler_is_deterministic(rng):
    import jax.numpy as jnp

    N = 80
    X, Y = rng.rand(N, 3), rng.rand(N, 1)
    model0 = _model(rng, N)

    def run():
        model = jax.tree_util.tree_map(jnp.array, model0)
        return fit_natgrad_scanned(
            model, DataSet(X, Y, seed=3), num_iter=40, log_every_blocks=1,
            **{**KW, "sampler": "device", "sampler_seed": 7},
        )

    r1, r2 = run(), run()
    assert np.isfinite(r1.losses).all()
    np.testing.assert_allclose(r1.losses, r2.losses, rtol=0, atol=0)


def test_natgrad_interrupt_checkpoints_and_flags(rng, tmp_path):
    N = 50
    X, Y = rng.rand(N, 3), rng.rand(N, 1)
    model = _model(np.random.RandomState(0), N)
    mgr = CheckpointManager(str(tmp_path / "ck"), every=1000)  # never due

    calls = {"n": 0}

    def exploding_log(msg):
        if "loss" in msg:
            calls["n"] += 1
            if calls["n"] == 3:
                raise KeyboardInterrupt
        calls["last"] = msg

    res = fit_natgrad_scanned(
        model, DataSet(X, Y, seed=7), num_iter=50, ckpt_manager=mgr,
        log_every_blocks=1, **{**KW, "log_fn": exploding_log},
    )
    assert mgr.latest_step() == 15
    assert "interrupted" in calls["last"]
    assert res.interrupted is True


def test_natgrad_raises_on_silent_nan(rng):
    """log_every_blocks=0 + no ckpt manager: a poisoned run must still fail
    loudly at the end (same closure as fit_scanned's)."""
    N = 30
    X = rng.rand(N, 3)
    Y = np.full((N, 1), np.nan)
    model = _model(rng, N)
    with pytest.raises(FloatingPointError, match="non-finite"):
        fit_natgrad_scanned(
            model, DataSet(X, Y), num_iter=10,
            **{**KW, "log_fn": lambda s: None}, log_every_blocks=0,
        )


def test_runner_natgrad_threads_machinery(rng, tmp_path):
    """The CLI/runner path gives natgrad the same workdir machinery as Adam
    (ADVICE r2 low: --sampler was silently ignored with natgrad)."""
    import dataclasses

    from zigp_tpu.experiments.configs import OnOffPptrConfig
    from zigp_tpu.experiments.runners import run_onoff
    from zigp_tpu.io.datasets import Split

    N = 60
    X = np.column_stack([rng.rand(N), rng.rand(N), np.linspace(0, 1, N)])
    Y = np.maximum(rng.rand(N, 1) - 0.4, 0.0)
    split = Split(X, Y, X[:10], Y[:10])
    cfg = OnOffPptrConfig(
        num_iter=20, batch_size=16, scan_inner=5, ckpt_every=10, log_every=5,
        monitor_every=0, optimizer="natgrad", natgrad_adam_warmup=0,
        natgrad_warmup=0, sampler="device",
        grid=dataclasses.replace(OnOffPptrConfig().grid, num_spatial=3, num_temporal=4),
    )
    wd = str(tmp_path / "run")
    run_onoff(split, cfg, workdir=wd, log_fn=lambda s: None)
    assert os.path.exists(os.path.join(wd, "metrics_onoff.jsonl"))
    mgr = CheckpointManager(os.path.join(wd, "ckpt_onoff"), every=10)
    assert mgr.latest_step() == 20


def test_natgrad_resume_completed_run_is_noop(rng, tmp_path):
    """--resume on a run whose checkpoint already sits at num_iter must not
    train further (the budget is a target, not an increment): training past
    it would advance the checkpoint and make --resume non-idempotent."""
    N = 40
    X, Y = rng.rand(N, 3), rng.rand(N, 1)
    mgr = CheckpointManager(str(tmp_path / "ck"), every=10)
    model = _model(rng, N)
    first = fit_natgrad_scanned(
        model, DataSet(X, Y), num_iter=20, ckpt_manager=mgr, **KW,
    )
    assert mgr.latest_step() == 20

    logs = []
    again = fit_natgrad_scanned(
        _model(np.random.RandomState(0), N), DataSet(X, Y), num_iter=20,
        ckpt_manager=mgr, resume=True, **{**KW, "log_fn": logs.append},
    )
    assert any("nothing to train" in l for l in logs)
    assert mgr.latest_step() == 20  # checkpoint not advanced
    assert _leaves_close(first.model, again.model)
    # the no-op path still populates the health signal (evaluated on the
    # restored state), so ensemble-style consumers don't see NaN-unknown
    assert np.isfinite(again.final_loss)


@pytest.mark.parametrize("kron_joint", [False, True])
def test_natgrad_hyper_every_block_coordinate(rng, kron_joint):
    """Block-coordinate natgrad (hyper_every=K): within each group only the
    first step touches the hyper partition (kernels/likelihood), the natural
    q-steps between move the variational parameters at frozen hypers with
    the factorization injected, and the run trains."""
    from zigp_tpu.training.alternating import partition_model

    N = 48
    X, Y = rng.rand(N, 3), np.maximum(rng.randn(N, 1), 0.0)

    def build(seed=0):
        Zs = [rng_const.rand(3, 2), np.linspace(0, 1, 5)[:, None]]
        ks = [RBF.create([1.0, 1.0], 1.0), RBF.create([0.3], 1.0)]
        return KronSVGP.create(
            ks, Zs, Gaussian.create(0.1), num_data=N, jitter=1e-6,
            seed=seed, whiten=True, q_cov="kron" if kron_joint else "diag",
        )

    rng_const = np.random.RandomState(7)
    model = build()
    _, h0, _ = partition_model(model)
    h0 = [np.asarray(p.raw).copy() for p in h0]

    res = fit_natgrad_scanned(
        model, DataSet(X, Y), num_iter=8, batch_size=16, num_inner=4,
        gamma=0.01, gamma_warmup=0, adam_warmup=0, sampler="device",
        hyper_every=4, kron_joint=kron_joint, log_fn=lambda s: None,
        log_every_blocks=1,
    )
    assert np.isfinite(res.final_loss)
    q1, h1, _ = partition_model(res.model)
    # hypers moved (once per group), q moved (every step)
    assert any(
        not np.array_equal(a, np.asarray(p.raw)) for a, p in zip(h0, h1)
    )
    # clear errors for the unsupported combinations
    with pytest.raises(ValueError, match="sampler='device'"):
        fit_natgrad_scanned(
            build(1), DataSet(X, Y), num_iter=8, batch_size=16, num_inner=4,
            gamma=0.01, gamma_warmup=0, adam_warmup=0, hyper_every=4,
            log_fn=lambda s: None,
        )
    with pytest.raises(ValueError, match="divide"):
        fit_natgrad_scanned(
            build(2), DataSet(X, Y), num_iter=10, batch_size=16, num_inner=5,
            gamma=0.01, gamma_warmup=0, adam_warmup=0, sampler="device",
            hyper_every=4, log_fn=lambda s: None,
        )


def test_natgrad_hyper_every_rejects_dense_models(rng):
    """Dense (non-Kron) models get a clear error, not an AttributeError."""
    from zigp_tpu.likelihoods import OnOffGaussian
    from zigp_tpu.models import OnOffSVGP

    N = 24
    X, Y = rng.rand(N, 1), rng.rand(N, 1)
    Z = np.linspace(0, 1, 4)[:, None]
    dense = OnOffSVGP.create(
        RBF.create([1.0], 1.0), RBF.create([1.0], 1.0),
        OnOffGaussian.create(0.01), Z, Z, num_data=N,
    )
    with pytest.raises(ValueError, match="Kron-family"):
        fit_natgrad_scanned(
            dense, DataSet(X, Y), num_iter=8, batch_size=8, num_inner=4,
            gamma=0.01, gamma_warmup=0, adam_warmup=0, sampler="device",
            hyper_every=4, log_fn=lambda s: None,
        )
