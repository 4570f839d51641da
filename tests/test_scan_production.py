"""Production (scanned) training path: checkpoint/resume, NaN recovery, and
JSONL metric logging — the wiring the reference runs with
(scripts/onoff.py:290-303,341-342,390-392)."""

import dataclasses
import json
import os

import numpy as np
import jax
import pytest

from zigp_tpu.io.checkpoint import CheckpointManager
from zigp_tpu.io.datasets import Split
from zigp_tpu.likelihoods import Gaussian
from zigp_tpu.models import KronSVGP
from zigp_tpu.ops.kernels import RBF
from zigp_tpu.training import DataSet, fit_scanned
from zigp_tpu.training.optim import make_optimizer
from zigp_tpu.utils.logging import MetricLogger


def _model(rng, N, seed=0):
    Zs = [rng.rand(3, 2), np.linspace(0, 1, 5)[:, None]]
    ks = [RBF.create([1.0, 1.0], 1.0), RBF.create([0.3], 1.0)]
    return KronSVGP.create(ks, Zs, Gaussian.create(0.1), num_data=N, jitter=1e-6, seed=seed)


def _leaves_close(a, b, rtol=1e-6):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    return all(np.allclose(np.asarray(x), np.asarray(y), rtol=rtol) for x, y in zip(la, lb))


def test_fit_scanned_writes_checkpoints_and_metrics(rng, tmp_path):
    N = 40
    X, Y = rng.rand(N, 3), rng.rand(N, 1)
    mgr = CheckpointManager(str(tmp_path / "ck"), every=10)
    mpath = str(tmp_path / "metrics.jsonl")
    logger = MetricLogger(mpath)
    model = _model(rng, N)
    fit_scanned(
        model, DataSet(X, Y), num_iter=20, batch_size=N, num_inner=5,
        log_fn=lambda s: None, ckpt_manager=mgr, metric_logger=logger,
        hist_every=10,
    )
    logger.close()
    assert mgr.latest_step() == 20
    records = [json.loads(l) for l in open(mpath)]
    scalar_recs = [r for r in records if "loss" in r]
    assert scalar_recs and all("kl" in r and "var_exp" in r for r in scalar_recs)
    # histogram records for params AND grads at the hist cadence
    hist_keys = [k for r in records for k in r if k.startswith("hist/")]
    assert any(k.startswith("hist/param") for k in hist_keys)
    assert any(k.startswith("hist/grad") for k in hist_keys)


def test_fit_scanned_recovers_from_nan(rng, tmp_path):
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
                # (the block's final loss is the value the NaN check reads;
                # an earlier in-block NaN is already absorbed by zero_nans)
                by = by.copy()
                by[0, 0] = np.nan
            return bx, by

    logs = []
    res = fit_scanned(
        model, Poisoned(X, Y), num_iter=30, batch_size=N, num_inner=5,
        log_fn=logs.append, ckpt_manager=mgr,
    )
    joined = "\n".join(logs)
    assert "NON-FINITE" in joined
    assert "restored from checkpoint" in joined
    assert all(
        np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(res.model)
    )
    # poisoned state never checkpointed: every saved checkpoint restores finite
    for step_dir in os.listdir(mgr.directory):
        step = int(step_dir.split("_")[1])
        m, _, _ = __import__("zigp_tpu.io.checkpoint", fromlist=["restore"]).restore(
            os.path.join(mgr.directory, step_dir), res.model, res.opt_state
        )
        assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(m))


def test_scanned_resume_reproduces_uninterrupted_run(rng, tmp_path):
    """Kill at step 20 of 40, resume from the checkpoint, and land on the
    same parameters as the uninterrupted run (same batches via ds.skip)."""
    N = 50
    X, Y = rng.rand(N, 3), rng.rand(N, 1)

    def make_parts():
        return _model(np.random.RandomState(0), N), DataSet(X, Y, seed=7)

    # uninterrupted 40 steps
    model, ds = make_parts()
    opt = make_optimizer(model, default_lr=1e-2)
    full = fit_scanned(model, ds, num_iter=40, batch_size=16, num_inner=5,
                       optimizer=opt, log_fn=lambda s: None)

    # interrupted: 20 steps with checkpointing...
    model, ds = make_parts()
    opt = make_optimizer(model, default_lr=1e-2)
    mgr = CheckpointManager(str(tmp_path / "ck"), every=20)
    fit_scanned(model, ds, num_iter=20, batch_size=16, num_inner=5,
                optimizer=opt, ckpt_manager=mgr, log_fn=lambda s: None)
    assert mgr.latest_step() == 20

    # ...then a fresh process restores and continues with the same stream
    model2, ds2 = make_parts()
    opt2 = make_optimizer(model2, default_lr=1e-2)
    opt_state2 = opt2.init(model2)
    model2, opt_state2, start = mgr.restore_latest(model2, opt_state2)
    assert start == 20
    ds2.skip(16, start)
    resumed = fit_scanned(model2, ds2, num_iter=20, batch_size=16, num_inner=5,
                          optimizer=opt2, opt_state=opt_state2, start_step=start,
                          log_fn=lambda s: None)
    assert _leaves_close(full.model, resumed.model)


def test_runner_resume_cli_path(rng, tmp_path):
    """run_svgp with workdir writes checkpoints + metrics; resume=True on a
    finished run restores and trains 0 further steps."""
    from zigp_tpu.experiments.configs import SvgpPptrConfig
    from zigp_tpu.experiments.runners import run_svgp

    N = 60
    X = np.column_stack([rng.rand(N), rng.rand(N), np.linspace(0, 1, N)])
    Y = rng.rand(N, 1)
    split = Split(X, Y, X[:10], Y[:10])
    cfg = SvgpPptrConfig(
        num_iter=20, batch_size=16, scan_inner=5, ckpt_every=10, log_every=5,
        grid=dataclasses.replace(SvgpPptrConfig().grid, num_spatial=3, num_temporal=4),
    )
    wd = str(tmp_path / "run")
    r1 = run_svgp(split, cfg, workdir=wd, log_fn=lambda s: None)
    assert os.path.exists(os.path.join(wd, "metrics_svgp.jsonl"))
    mgr = CheckpointManager(os.path.join(wd, "ckpt_svgp"), every=10)
    assert mgr.latest_step() == 20

    logs = []
    r2 = run_svgp(split, cfg, workdir=wd, log_fn=logs.append, resume=True)
    assert any("resumed from checkpoint at step 20" in l for l in logs)
    assert any("nothing to train" in l for l in logs)
    assert np.allclose(r1["test_rmse"], r2["test_rmse"], rtol=1e-6)


def test_native_and_numpy_skip_equivalence(rng):
    """skip(b, k) leaves the stream exactly where k drawn batches would."""
    from zigp_tpu.io import native as zn

    N = 37
    X, Y = rng.rand(N, 3), rng.rand(N, 1)

    d1 = DataSet(X, Y, seed=3)
    d2 = DataSet(X, Y, seed=3)
    for _ in range(5):
        d1.next_batch(8)
    d2.skip(8, 5)
    a, b = d1.next_batch(8), d2.next_batch(8)
    np.testing.assert_array_equal(a[0], b[0])

    if not zn.available():
        pytest.skip("native batcher unavailable")
    n1 = zn.NativeDataSet(X, Y, seed=3)
    n2 = zn.NativeDataSet(X, Y, seed=3)
    for _ in range(5):
        n1.next_batch(8)
    n2.skip(8, 5)
    a, b = n1.next_batch(8), n2.next_batch(8)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_device_sampler_trains_and_is_deterministic(tmp_path, rng):
    """sampler='device': HBM-resident data with in-step uniform sampling —
    loss decreases, and the same sampler_seed reproduces the trajectory."""
    import jax.numpy as jnp

    N = 200
    X = np.concatenate([rng.rand(N, 2), rng.rand(N, 1)], axis=1)
    Y = np.sin(6 * X[:, 2:3]) + 0.05 * rng.randn(N, 1)
    model0 = _model(rng, N)

    def run():
        # copy: the scanned step donates its buffers
        model = jax.tree_util.tree_map(jnp.array, model0)
        ds = DataSet(X, Y, seed=3)
        res = fit_scanned(
            model, ds, num_iter=200, batch_size=32, num_inner=50,
            learning_rate=1e-2, log_every_blocks=1, log_fn=lambda s: None,
            sampler="device", sampler_seed=7,
        )
        return res

    r1, r2 = run(), run()
    assert np.isfinite(r1.losses).all()
    assert r1.losses[-1] < r1.losses[0]
    np.testing.assert_allclose(r1.losses, r2.losses, rtol=0, atol=0)


def test_device_sampler_staged_gather_is_rank_agnostic(rng):
    """The one-gather-per-dispatch staging must preserve arbitrary trailing
    dims (library use: 1-D targets with a custom loss_fn), like the per-step
    ``Ytrain[idx]`` gather it replaced."""
    import jax.numpy as jnp
    import optax

    from zigp_tpu.training.scan import make_device_sampling_scan_step

    N = 64
    X = jnp.asarray(rng.rand(N, 3), jnp.float32)
    y = jnp.asarray(rng.rand(N), jnp.float32)  # rank-1 targets

    def loss_fn(params, Xb, Yb):
        assert Yb.ndim == 1
        return jnp.mean((Xb @ params["w"] - Yb) ** 2)

    optimizer = optax.adam(1e-2)
    params = {"w": jnp.zeros((3,), jnp.float32)}
    step = make_device_sampling_scan_step(optimizer, X, y, 16, loss_fn)
    key = jax.random.PRNGKey(0)
    params, _, losses = step(params, optimizer.init(params), key, 20)
    assert losses.shape == (20,)
    assert np.isfinite(np.asarray(losses)).all()
    assert losses[-1] < losses[0]


def test_device_sampler_resume_reproduces_uninterrupted_run(rng, tmp_path):
    """sampler='device': block keys derive from (sampler_seed, step//inner),
    so a kill-and-resume run must reproduce the uninterrupted trajectory
    with no stream fast-forwarding at all."""
    N = 60
    X, Y = rng.rand(N, 3), rng.rand(N, 1)

    def make_parts():
        return _model(np.random.RandomState(0), N), DataSet(X, Y, seed=7)

    kw = dict(batch_size=16, num_inner=5, log_fn=lambda s: None,
              sampler="device", sampler_seed=5)

    model, ds = make_parts()
    opt = make_optimizer(model, default_lr=1e-2)
    full = fit_scanned(model, ds, num_iter=40, optimizer=opt, **kw)

    model, ds = make_parts()
    opt = make_optimizer(model, default_lr=1e-2)
    mgr = CheckpointManager(str(tmp_path / "ck"), every=20)
    fit_scanned(model, ds, num_iter=20, optimizer=opt, ckpt_manager=mgr, **kw)
    assert mgr.latest_step() == 20

    model2, ds2 = make_parts()
    opt2 = make_optimizer(model2, default_lr=1e-2)
    opt_state2 = opt2.init(model2)
    model2, opt_state2, start = mgr.restore_latest(model2, opt_state2)
    resumed = fit_scanned(model2, ds2, num_iter=20, optimizer=opt2,
                          opt_state=opt_state2, start_step=start, **kw)
    assert _leaves_close(full.model, resumed.model)


def test_keyboard_interrupt_checkpoints_for_resume(rng, tmp_path):
    """Ctrl-C mid-run checkpoints at the interrupted step (the reference's
    break-and-save, scripts/onoff.py:425-430) so --resume can continue."""
    N = 50
    X, Y = rng.rand(N, 3), rng.rand(N, 1)
    model = _model(np.random.RandomState(0), N)
    ds = DataSet(X, Y, seed=7)
    opt = make_optimizer(model, default_lr=1e-2)
    mgr = CheckpointManager(str(tmp_path / "ck"), every=1000)  # never due

    calls = {"n": 0}

    def exploding_log(msg):
        if "loss" in msg:
            calls["n"] += 1
            if calls["n"] == 3:
                raise KeyboardInterrupt
        calls["last"] = msg

    res = fit_scanned(model, ds, num_iter=50, batch_size=16, num_inner=5,
                      optimizer=opt, ckpt_manager=mgr, log_fn=exploding_log,
                      log_every_blocks=1)
    # interrupted at the 3rd log point = step 15; checkpoint written there
    assert mgr.latest_step() == 15
    assert "interrupted" in calls["last"]
    assert res.model is not None
    # the interruption is surfaced so multi-run callers (CV) can abort
    # instead of recording this partial run as fully trained
    assert res.interrupted is True


def test_fit_scanned_completed_run_not_marked_interrupted(rng):
    N = 30
    X, Y = rng.rand(N, 3), rng.rand(N, 1)
    model = _model(rng, N)
    res = fit_scanned(model, DataSet(X, Y), num_iter=10, batch_size=16,
                      num_inner=5, log_fn=lambda s: None)
    assert res.interrupted is False


def test_trainers_populate_final_loss(rng):
    """FitResult.final_loss is the ensemble health signal — every trainer
    must populate it regardless of log cadence, not just the batched ones."""
    from zigp_tpu.training import fit
    from zigp_tpu.training.natgrad import fit_natgrad_scanned

    N = 30
    X, Y = rng.rand(N, 3), rng.rand(N, 1)
    kw = dict(batch_size=16, log_fn=lambda s: None)

    res = fit_scanned(_model(rng, N), DataSet(X, Y), num_iter=10,
                      num_inner=5, log_every_blocks=0, **kw)
    assert np.isfinite(res.final_loss)
    res = fit(_model(rng, N), DataSet(X, Y), num_iter=3, log_every=0, **kw)
    assert np.isfinite(res.final_loss)
    res = fit_natgrad_scanned(_model(rng, N), DataSet(X, Y), num_iter=8,
                              num_inner=4, log_every_blocks=0, **kw)
    assert np.isfinite(res.final_loss)


def test_fit_scanned_raises_on_silent_nan(rng):
    """VERDICT r2 weak #4: with log_every=0 and no checkpoint manager there
    is no mid-run finiteness sync at all — a poisoned run must still fail
    loudly at the end instead of returning NaN state as success."""
    N = 30
    X, Y = rng.rand(N, 3), rng.rand(N, 1)
    model = _model(rng, N)

    def poisoned_loss(m, bx, by):
        return m.loss(bx, by) * np.nan

    with pytest.raises(FloatingPointError, match="non-finite"):
        fit_scanned(
            model, DataSet(X, Y), num_iter=10, batch_size=16, num_inner=5,
            log_every_blocks=0, log_fn=lambda s: None, loss_fn=poisoned_loss,
        )


def test_cv_driver_aborts_on_interrupted_fold(rng, tmp_path, monkeypatch):
    """ADVICE r2 medium: a Ctrl-C inside fold k must abort the whole CV sweep
    (propagated as KeyboardInterrupt), not record fold k as fully trained and
    continue with fold k+1."""
    from zigp_tpu.experiments import cv as cv_mod

    calls = {"n": 0}

    def fake_run_onoff(split, cfg=None, *, workdir=None, log_fn=print, **kw):
        calls["n"] += 1
        return {"test_rmse": 1.0, "test_mae": 1.0, "steps_per_sec": 1.0,
                "interrupted": calls["n"] == 2}

    monkeypatch.setattr(cv_mod, "run_onoff", fake_run_onoff)
    X = rng.rand(20, 3)
    Y = rng.rand(20, 1)
    splits = [Split(X, Y, X[:5], Y[:5]) for _ in range(4)]
    with pytest.raises(KeyboardInterrupt):
        cv_mod.run_cv(["onoff"], splits=splits, log_fn=lambda s: None)
    assert calls["n"] == 2  # folds 3-4 never ran


def test_last_block_nan_restore_not_restamped(rng, tmp_path):
    """A NaN in the FINAL block restores from the last good checkpoint, and
    completion must not re-stamp that older state at steps_done — doing so
    would present a half-trained model as fully trained to restore-and-predict.
    The final_loss also cannot describe the restored model, so it reads NaN."""
    N = 30
    X, Y = rng.rand(N, 3), rng.rand(N, 1)
    mgr = CheckpointManager(str(tmp_path / "ck"), every=5)
    model = _model(rng, N)

    class PoisonLast(DataSet):
        def __init__(self, x, y):
            super().__init__(x, y, seed=0)
            self.calls = 0

        def next_batch(self, b, shuffle=True):
            self.calls += 1
            bx, by = super().next_batch(b, shuffle)
            if self.calls == 15:  # final batch of the FINAL (3rd) block
                by = by.copy()
                by[0, 0] = np.nan
            return bx, by

    logs = []
    res = fit_scanned(
        model, PoisonLast(X, Y), num_iter=15, batch_size=N, num_inner=5,
        log_fn=logs.append, ckpt_manager=mgr,
    )
    joined = "\n".join(logs)
    assert "restored from checkpoint" in joined
    assert "final checkpoint stays" in joined
    # the restored (older) state is NOT re-stamped at step 15
    assert mgr.latest_step() == 10
    # the pre-restore block's loss does not describe the returned model
    assert np.isnan(res.final_loss)
    # and the run did not raise: the restored state is finite and usable
    assert all(
        np.all(np.isfinite(np.asarray(l)))
        for l in jax.tree_util.tree_leaves(res.model)
    )
