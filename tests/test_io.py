import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zigp_tpu.io import checkpoint
from zigp_tpu.likelihoods import Gaussian
from zigp_tpu.models import KronSVGP
from zigp_tpu.ops.kernels import RBF
from zigp_tpu.training import make_optimizer


def _model(rng):
    Zs = [rng.rand(3, 2), rng.rand(5, 1)]
    ks = [RBF.create([1.0, 1.0], 1.0), RBF.create([0.5], 1.0)]
    return KronSVGP.create(ks, Zs, Gaussian.create(0.1), num_data=50, jitter=1e-6)


def test_checkpoint_roundtrip(rng, tmp_path):
    model = _model(rng)
    opt = make_optimizer(model)
    state = opt.init(model)
    path = checkpoint.save(str(tmp_path / "ckpt"), model, state, step=7)

    fresh = _model(np.random.RandomState(99))  # different init
    restored, rstate, step = checkpoint.restore(path, fresh, opt.init(fresh))
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(model), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    X = rng.rand(10, 3)
    Y = rng.rand(10, 1)
    np.testing.assert_allclose(
        float(restored.loss(jnp.asarray(X), jnp.asarray(Y))),
        float(model.loss(jnp.asarray(X), jnp.asarray(Y))),
        rtol=1e-12,
    )


def test_checkpoint_manager_latest(rng, tmp_path):
    model = _model(rng)
    mgr = checkpoint.CheckpointManager(str(tmp_path / "ckpts"), every=5)
    assert mgr.maybe_save(3, model) is None
    assert mgr.maybe_save(5, model) is not None
    assert mgr.maybe_save(10, model) is not None
    assert mgr.latest_step() == 10
    out = mgr.restore_latest(_model(np.random.RandomState(98)))
    assert out is not None
    restored, _, step = out
    assert step == 10
    for a, b in zip(jax.tree_util.tree_leaves(model), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_metric_logger_jsonl(tmp_path):
    import json

    from zigp_tpu.utils.logging import MetricLogger

    log = MetricLogger(str(tmp_path / "metrics.jsonl"))
    log.log(0, scalars={"loss": 1.5, "kl": 0.3})
    log.log(1, scalars={"loss": 1.2}, histograms={"g": np.arange(100)})
    log.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 1.5
    assert "hist/g" in lines[1]
    assert lines[1]["hist/g"]["p50"] == pytest.approx(49.5)


def test_plot_onoff_1d_smoke(rng, tmp_path):
    from zigp_tpu.experiments.toy import build_toy_model
    from zigp_tpu.utils.plotting import plot_onoff_1d

    x = np.linspace(0, 10, 50)[:, None]
    y = np.sin(x)
    model, x, y = build_toy_model(x=x, y=y)
    out = plot_onoff_1d(model, x, y, save_path=str(tmp_path / "p.png"))
    assert (tmp_path / "p.png").exists()
    # the dense model gets the full panel set including the kernel heatmaps;
    # heatmaps=False yields the 4 time-series panels only
    fig = plot_onoff_1d(model, x, y)
    assert len(fig.axes) >= 8  # 4 main + 4 heatmap (+ colorbars)
    import matplotlib.pyplot as plt

    plt.close(fig)
    fig = plot_onoff_1d(model, x, y, heatmaps=False)
    assert len(fig.axes) == 4
    plt.close(fig)


def test_plot_inducing_monitor_smoke(rng, tmp_path):
    from zigp_tpu.likelihoods import OnOffGaussian
    from zigp_tpu.models import KronOnOffSVGP
    from zigp_tpu.utils.plotting import plot_inducing_monitor

    Zs = [rng.rand(3, 2), rng.rand(5, 1)]
    ks = [RBF.create([1.0, 1.0], 1.0), RBF.create([0.5], 1.0)]
    model = KronOnOffSVGP.create(ks, Zs, ks, Zs, OnOffGaussian.create(), num_data=40)
    X = rng.rand(40, 3)
    Y = rng.rand(40, 1)
    plot_inducing_monitor(model, X, Y, save_path=str(tmp_path / "m.png"))
    assert (tmp_path / "m.png").exists()
