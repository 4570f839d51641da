"""Integration tests of the experiment runners on a small synthetic
zero-inflated spatio-temporal dataset (same structure as pptr: X=[lat,lon,t],
~60% exact zeros)."""

import numpy as np
import pytest

from zigp_tpu.experiments import (
    ClassifierPptrConfig,
    KronGridConfig,
    OnOffPptrConfig,
    SvgpPptrConfig,
    run_classifier,
    run_hurdle,
    run_onoff,
    run_svgp,
    run_zero_inflated,
)
from zigp_tpu.io.datasets import Split


def _synthetic_split(rng, Ntrain=400, Ntest=100):
    def gen(N):
        X = rng.rand(N, 3)
        signal = 2.0 * np.sin(3 * X[:, 2:3]) + X[:, 0:1]
        gate = (np.cos(5 * X[:, 2:3]) + 0.3 * rng.randn(N, 1)) > 0
        Y = np.maximum(signal * gate, 0.0)
        return X, Y

    Xtr, Ytr = gen(Ntrain)
    Xte, Yte = gen(Ntest)
    return Split(Xtr, Ytr, Xte, Yte)


def _tiny_grid():
    return KronGridConfig(num_spatial=3, num_temporal=8)


def test_run_onoff_end_to_end(rng, tmp_path):
    split = _synthetic_split(rng)
    cfg = OnOffPptrConfig(num_iter=30, batch_size=100, grid=_tiny_grid(), log_every=0)
    res = run_onoff(split, cfg, workdir=str(tmp_path), log_fn=lambda s: None)
    assert np.isfinite(res["test_rmse"])
    assert res["pred_test"]["gfmean"].shape == (100, 1)
    assert (tmp_path / "results_onoff.pickle").exists()
    # rmse should at least beat the trivial max-scale predictor
    assert res["test_rmse"] < float(np.abs(split.Ytest).max())


def test_run_onoff_three_factor_grid(rng, tmp_path):
    """spatial_factors=(n_lat, n_lon): the lat⊗lon⊗time decomposition the
    reference's two-factor graph cannot express — full train/predict path."""
    from zigp_tpu.experiments.builders import build_onoff_pptr

    split = _synthetic_split(rng)
    grid = KronGridConfig(spatial_factors=(3, 4), num_temporal=8)
    cfg = OnOffPptrConfig(num_iter=30, batch_size=100, grid=grid, log_every=0)

    model = build_onoff_pptr(cfg, split)
    assert len(model.f.Zs) == 3 and len(model.f.kernels) == 3
    assert model.f.input_masks == ((0,), (1,), (2,))  # lat, lon, time columns
    assert model.f.factor_sizes == (3, 4, 8)

    res = run_onoff(split, cfg, workdir=str(tmp_path), log_fn=lambda s: None)
    assert np.isfinite(res["test_rmse"])
    assert res["test_rmse"] < float(np.abs(split.Ytest).max())


def test_cli_grid_spec_parses():
    from zigp_tpu.experiments.cli import _parse_grid

    g2 = _parse_grid("10x100")
    assert (g2.num_spatial, g2.num_temporal, g2.spatial_factors) == (10, 100, None)
    g3 = _parse_grid("6x6x100")
    assert g3.spatial_factors == (6, 6) and g3.num_temporal == 100
    import pytest

    with pytest.raises(SystemExit):
        _parse_grid("banana")


def test_classifier_svgp_hurdle_zi_pipeline(rng, tmp_path):
    split = _synthetic_split(rng)
    clf_cfg = ClassifierPptrConfig(num_iter=40, batch_size=100, grid=_tiny_grid(), log_every=0)
    clf = run_classifier(split, clf_cfg, workdir=str(tmp_path), log_fn=lambda s: None)
    assert 0.0 <= clf["test_accuracy"] <= 1.0
    assert clf["pred_test"]["pfmean"].shape == (100, 1)
    assert np.all(clf["pred_test"]["pfmean"] >= 0) and np.all(clf["pred_test"]["pfmean"] <= 1)

    reg_cfg = SvgpPptrConfig(num_iter=30, batch_size=100, grid=_tiny_grid(), log_every=0)
    reg = run_svgp(split, reg_cfg, workdir=str(tmp_path), log_fn=lambda s: None)
    assert np.isfinite(reg["test_rmse"])

    hur = run_hurdle(split, clf, reg_cfg, workdir=str(tmp_path), log_fn=lambda s: None)
    assert np.isfinite(hur["test_hurdle_comb_rmse"])
    assert hur["test_pred_hurdle_comb"].shape == split.Ytest.shape

    zi = run_zero_inflated(split, clf, reg, workdir=str(tmp_path), log_fn=lambda s: None)
    assert np.isfinite(zi["test_zi_prob_reg_rmse"])
    assert zi["pred_test_zi_prob"].shape == split.Ytest.shape
    # product-composite prediction is zero wherever the classifier says off
    off = (clf["pred_test"]["pfmean"] <= 0.5).reshape(-1)
    assert np.allclose(zi["pred_test_zi_indc"].reshape(-1)[off], 0.0)
    # round 4: the Gaussian-head svgp stamps noise_variance, and zi scores
    # its implied mixed measure (atom at 0 + Gaussian amount) properly
    assert "noise_variance" in reg and reg["noise_variance"] > 0
    assert np.isfinite(zi["test_crps"])
    assert set(zi["test_exceedance"]) == {"0.1", "1.0", "5.0"}
    for s in zi["test_exceedance"].values():
        assert np.isfinite(s["brier"])


def test_predict_batched_padding(rng):
    from zigp_tpu.experiments.runners import predict_batched
    import jax.numpy as jnp

    def predict(X):
        return {"out": X * 2.0}

    X = rng.randn(103, 3)
    res = predict_batched(predict, X, batch=16)
    np.testing.assert_allclose(res["out"], X * 2.0)


def test_cv_splits_match_reference_protocol():
    from zigp_tpu.io.datasets import make_cv_splits

    rng = np.random.RandomState(7)
    split = _synthetic_split(rng, 80, 20)
    splits = make_cv_splits(split, n_splits=5)
    assert len(splits) == 5
    total = sum(s.Xtest.shape[0] for s in splits)
    assert total == 100
    # folds are disjoint: reassemble all test Xs and compare against the pool
    Xall = np.concatenate([split.Xtrain, split.Xtest])
    Xall = Xall.copy()
    Xall[:, 2] /= 1000.0
    Xcat = np.concatenate([s.Xtest for s in splits])
    assert Xcat.shape == Xall.shape
    np.testing.assert_allclose(np.sort(Xcat.ravel()), np.sort(Xall.ravel()))


def test_forecast_splits_are_leakage_free_and_tile_the_horizon():
    from zigp_tpu.io.datasets import make_forecast_splits

    rng = np.random.RandomState(8)
    split = _synthetic_split(rng, 400, 100)
    splits = make_forecast_splits(split, 5)
    assert len(splits) == 5
    prev_train = 0
    for s in splits:
        # strict temporal ordering: every training point precedes every test
        # point (the defining property of a forecast protocol)
        assert s.Xtrain[:, 2].max() < s.Xtest[:, 2].min()
        # expanding window: each origin trains on at least as much history
        assert s.Xtrain.shape[0] >= prev_train
        prev_train = s.Xtrain.shape[0]
    # the test windows are disjoint and tile [start_frac, 1] of the range
    t_all = np.concatenate([split.Xtrain, split.Xtest])[:, 2] / 1000.0
    lo, hi = t_all.min(), t_all.max()
    t_test = np.concatenate([s.Xtest[:, 2] for s in splits])
    assert t_test.shape[0] == np.sum(t_all >= lo + 0.5 * (hi - lo))
    # disjoint windows: each test time lands in exactly one fold, and the
    # times are on the ÷1000 (kfold-convention) scale
    assert t_test.shape[0] == np.unique(t_test).shape[0]
    assert t_test.max() <= hi and t_test.min() >= lo


def test_forecast_splits_reject_empty_windows():
    from zigp_tpu.io.datasets import make_forecast_splits

    rng = np.random.RandomState(9)
    split = _synthetic_split(rng, 40, 10)
    with np.testing.assert_raises(ValueError):
        # start beyond the data range leaves every window empty
        make_forecast_splits(split, 2, start_frac=1.5)


def test_gaussian_nlpd_closed_form():
    """NLPD of N(0,1) at y=0 is ½log(2π); at y=1 adds ½."""
    from zigp_tpu.utils.metrics import gaussian_nlpd

    want0 = 0.5 * np.log(2 * np.pi)
    assert np.isclose(gaussian_nlpd([0.0], [1.0], [0.0]), want0, rtol=1e-12)
    assert np.isclose(gaussian_nlpd([0.0], [1.0], [1.0]), want0 + 0.5, rtol=1e-12)
    # noise_var folds into the predictive variance
    assert np.isclose(
        gaussian_nlpd([0.0], [0.5], [0.0], noise_var=0.5), want0, rtol=1e-12
    )
    # overconfident variance is penalized more than calibrated at the same error
    assert gaussian_nlpd([0.0], [0.01], [1.0]) > gaussian_nlpd([0.0], [1.0], [1.0])


def test_run_predict_restores_and_reproduces(rng, tmp_path):
    """run_predict (CLI `predict`) rebuilds the model, restores the latest
    checkpoint, and reproduces the training run's final test metrics exactly
    — the reference's standalone restore-and-predict workflow
    (onofftf/onoffpred.py:15) without the graph-rebuild dance."""
    from zigp_tpu.experiments import run_predict

    split = _synthetic_split(rng)
    cfg = OnOffPptrConfig(
        num_iter=200, batch_size=100, scan_inner=50, ckpt_every=100,
        grid=_tiny_grid(), log_every=0,
    )
    trained = run_onoff(split, cfg, workdir=str(tmp_path), log_fn=lambda s: None)

    res = run_predict(split, "onoff", cfg, workdir=str(tmp_path), log_fn=lambda s: None)
    assert res["restored_step"] == 200
    np.testing.assert_allclose(res["test_rmse"], trained["test_rmse"], rtol=1e-7)
    np.testing.assert_allclose(
        res["pred_test"]["gfmean"], trained["pred_test"]["gfmean"], rtol=1e-6, atol=1e-7
    )
    assert (tmp_path / "predictions_onoff.pickle").exists()

    # missing checkpoint -> clean error
    with pytest.raises(SystemExit, match="no checkpoint"):
        run_predict(split, "onoff", cfg, workdir=str(tmp_path / "empty"),
                    log_fn=lambda s: None)


def test_run_predict_from_natgrad_checkpoint(rng, tmp_path):
    """Model-only restore must work regardless of which optimizer wrote the
    checkpoint — natgrad's trainer state differs structurally from Adam's."""
    from zigp_tpu.experiments import run_predict

    split = _synthetic_split(rng)
    cfg = OnOffPptrConfig(
        num_iter=100, batch_size=100, scan_inner=50, ckpt_every=50,
        grid=_tiny_grid(), log_every=0, optimizer="natgrad",
        natgrad_warmup=20, natgrad_adam_warmup=10,
    )
    trained = run_onoff(split, cfg, workdir=str(tmp_path), log_fn=lambda s: None)
    res = run_predict(split, "onoff", cfg, workdir=str(tmp_path), log_fn=lambda s: None)
    # warmup 10 + ceil(90/50)=2 natgrad blocks: the scanned loop rounds UP to
    # whole blocks, never below the requested count
    assert res["restored_step"] >= cfg.num_iter
    np.testing.assert_allclose(res["test_rmse"], trained["test_rmse"], rtol=1e-7)


def test_recalibrate_noise_moment_matching(rng, tmp_path):
    """recalibrate_noise sets σ² to mean((y−m̂)² − v̂) over train (clipped),
    improving NLPD when the trained noise under-covers the residuals, and
    the CLI flag threads through an onoff run."""
    import numpy as np

    from zigp_tpu.experiments.builders import build_onoff_pptr
    from zigp_tpu.experiments.runners import (
        _eval_onoff,
        predict_batched,
        recalibrate_noise,
        run_onoff,
    )

    split = _synthetic_split(rng)
    cfg = OnOffPptrConfig(grid=_tiny_grid(), noise_variance=1e-4)
    model = build_onoff_pptr(cfg, split)

    before = _eval_onoff(model, split, lambda s: None)
    recal = recalibrate_noise(model, split, "onoff", log_fn=lambda s: None)
    after = _eval_onoff(recal, split, lambda s: None)

    # closed form check
    pt = predict_batched(lambda X: model.predict(X), split.Xtrain)
    want = max(
        float(np.mean((split.Ytrain - pt["gfmean"]) ** 2 - pt["gfvar"] - pt["gfmeanu"])),
        1e-6,
    )
    got = float(np.asarray(recal.likelihood.variance.value))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # the under-covering 1e-4 noise is replaced; density improves, points don't move
    assert after["test_nlpd"] < before["test_nlpd"]
    assert after["test_rmse"] == before["test_rmse"]

    res = run_onoff(
        split,
        OnOffPptrConfig(grid=_tiny_grid(), num_iter=10, batch_size=32,
                        scan_inner=0, log_every=0, ckpt_every=0,
                        monitor_every=0, recalibrate_noise=True),
        log_fn=lambda s: None,
    )
    assert np.isfinite(res["test_nlpd"])
