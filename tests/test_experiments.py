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
