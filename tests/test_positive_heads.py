"""Positive-support regression heads (LogNormal / Gamma) for the hurdle's
conditional amount model y | y>0.

The reference has no counterpart — it models the strictly-positive rain
amounts with a Gaussian and clips predictions at zero post hoc
(scripts/hurdle.py:338-377). These tests pin the heads' closed-form
variational expectations and predictive moments to brute-force numpy
quadrature oracles, and exercise the hurdle wiring end-to-end.
"""

import numpy as np
import pytest
from scipy.special import gammaln as sp_gammaln

import jax.numpy as jnp

from zigp_tpu.likelihoods import Gamma, Gaussian, LogNormal
from zigp_tpu.utils import metrics


def _gh(n=160):
    x, w = np.polynomial.hermite.hermgauss(n)
    return x * np.sqrt(2.0), w / np.sqrt(np.pi)


def _quad_var_exp(logpdf, Fmu, Fvar, Y):
    """E_{f~N(Fmu,Fvar)}[log p(y|f)] by high-order Gauss-Hermite (float64)."""
    x, w = _gh()
    f = Fmu[:, None] + np.sqrt(Fvar)[:, None] * x[None, :]
    return (logpdf(f, Y[:, None]) * w[None, :]).sum(axis=1)


@pytest.fixture
def fq(rng):
    Fmu = rng.randn(40) * 1.5
    Fvar = rng.rand(40) * 2.0 + 0.05
    Y = np.exp(rng.randn(40) * 0.7)  # strictly positive
    return Fmu, Fvar, Y


def test_lognormal_var_exp_matches_quadrature(fq):
    Fmu, Fvar, Y = fq
    sigma2 = 0.37
    lik = LogNormal.create(sigma2)

    def logpdf(f, y):
        return (
            -np.log(y)
            - 0.5 * np.log(2 * np.pi * sigma2)
            - 0.5 * (np.log(y) - f) ** 2 / sigma2
        )

    want = _quad_var_exp(logpdf, Fmu, Fvar, Y)
    got = np.asarray(
        lik.variational_expectations(jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y))
    )
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_gamma_var_exp_matches_quadrature(fq):
    Fmu, Fvar, Y = fq
    a = 1.7
    lik = Gamma.create(a)

    def logpdf(f, y):
        # Gamma(shape a, rate a e^{-f}): mean e^f
        return (
            a * np.log(a)
            - a * f
            - sp_gammaln(a)
            + (a - 1.0) * np.log(y)
            - a * y * np.exp(-f)
        )

    want = _quad_var_exp(logpdf, Fmu, Fvar, Y)
    got = np.asarray(
        lik.variational_expectations(jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y))
    )
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_lognormal_predictive_moments_exact(fq):
    """The posterior predictive is exactly LogNormal(Fmu, Fvar+σ²):
    mean/var against the textbook formulas evaluated by quadrature."""
    Fmu, Fvar, Y = fq
    sigma2 = 0.2
    lik = LogNormal.create(sigma2)
    mean, var = map(np.asarray, lik.predict_mean_and_var(jnp.asarray(Fmu), jnp.asarray(Fvar)))

    # quadrature over the predictive log y ~ N(Fmu, Fvar + σ²)
    x, w = _gh()
    s = np.sqrt(Fvar + sigma2)
    ys = np.exp(Fmu[:, None] + s[:, None] * x[None, :])
    m_q = (ys * w[None, :]).sum(axis=1)
    v_q = ((ys - m_q[:, None]) ** 2 * w[None, :]).sum(axis=1)
    np.testing.assert_allclose(mean, m_q, rtol=1e-6)
    np.testing.assert_allclose(var, v_q, rtol=1e-4)

    med = np.asarray(lik.predict_median(jnp.asarray(Fmu), jnp.asarray(Fvar)))
    np.testing.assert_allclose(med, np.exp(Fmu), rtol=1e-12)


def test_gamma_predictive_moments_match_quadrature(fq):
    Fmu, Fvar, Y = fq
    a = 2.3
    lik = Gamma.create(a)
    mean, var = map(np.asarray, lik.predict_mean_and_var(jnp.asarray(Fmu), jnp.asarray(Fvar)))

    # E[y] = E_f[e^f]; Var[y] = E_f[e^{2f}/a] + Var_f[e^f]
    x, w = _gh()
    f = Fmu[:, None] + np.sqrt(Fvar)[:, None] * x[None, :]
    m_q = (np.exp(f) * w[None, :]).sum(axis=1)
    ey2 = ((np.exp(2 * f) / a + np.exp(2 * f)) * w[None, :]).sum(axis=1)
    v_q = ey2 - m_q**2
    np.testing.assert_allclose(mean, m_q, rtol=1e-6)
    np.testing.assert_allclose(var, v_q, rtol=1e-6)


def test_lognormal_nlpd_is_exact_density(fq):
    Fmu, Fvar, Y = fq
    sigma2 = 0.41
    lik = LogNormal.create(sigma2)
    got = np.asarray(lik.nlpd(jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))
    s2 = Fvar + sigma2
    want = (
        np.log(Y) + 0.5 * np.log(2 * np.pi * s2) + 0.5 * (np.log(Y) - Fmu) ** 2 / s2
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # and the numpy metrics helper agrees (mean over points)
    np.testing.assert_allclose(
        metrics.lognormal_nlpd(Fmu, Fvar, Y, noise_var=sigma2),
        float(want.mean()),
        rtol=1e-12,
    )


def test_gamma_nlpd_quadrature_agreement(fq):
    """likelihood.Gamma.nlpd (jax GH) ≡ metrics.gamma_nlpd (numpy GH) and both
    converge to the analytically-known Fvar→0 limit."""
    Fmu, Fvar, Y = fq
    a = 1.3
    lik = Gamma.create(a)
    got = np.asarray(lik.nlpd(jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y), num_gh=64))
    want = metrics.gamma_nlpd(Fmu, Fvar, Y, shape=a, num_gh=64)
    np.testing.assert_allclose(float(got.mean()), want, rtol=1e-8)

    # Fvar → 0: −log Gamma(y; a, a e^{−Fmu}) exactly
    z = np.zeros_like(Fvar)
    got0 = metrics.gamma_nlpd(Fmu, z, Y, shape=a)
    exact = -(
        a * np.log(a) - a * Fmu - sp_gammaln(a) + (a - 1) * np.log(Y) - a * Y * np.exp(-Fmu)
    )
    np.testing.assert_allclose(got0, float(exact.mean()), rtol=1e-10)


def test_make_regression_likelihood_dispatch():
    from zigp_tpu.experiments.builders import make_regression_likelihood
    from zigp_tpu.experiments.configs import SvgpPptrConfig

    Ypos = np.array([0.5, 2.0, 1.5])
    lik, mc = make_regression_likelihood(SvgpPptrConfig(), Ypos)
    assert isinstance(lik, Gaussian) and mc is None

    cfg = SvgpPptrConfig(likelihood="lognormal")
    lik, mc = make_regression_likelihood(cfg, Ypos)
    assert isinstance(lik, LogNormal)
    np.testing.assert_allclose(mc, np.mean(np.log(Ypos)))

    cfg = SvgpPptrConfig(likelihood="gamma")
    lik, mc = make_regression_likelihood(cfg, Ypos)
    assert isinstance(lik, Gamma)
    np.testing.assert_allclose(mc, np.log(np.mean(Ypos)))

    with pytest.raises(ValueError, match="strictly positive"):
        make_regression_likelihood(cfg, np.array([0.0, 1.0]))
    with pytest.raises(ValueError, match="unknown regression likelihood"):
        make_regression_likelihood(SvgpPptrConfig(likelihood="weibull"), Ypos)


def _split_and_clf(rng):
    """Tiny zero-inflated split + a fake classifier result (thresholded truth
    with some miscalls so the 'on' subsets contain exact zeros)."""
    from zigp_tpu.io.datasets import Split

    def gen(N):
        X = rng.rand(N, 3)
        gate = (np.cos(5 * X[:, 2:3]) + 0.3 * rng.randn(N, 1)) > 0
        Y = np.maximum((1.0 + np.sin(3 * X[:, 2:3]) + X[:, 0:1]) * gate, 0.0)
        return X, Y

    Xtr, Ytr = gen(300)
    Xte, Yte = gen(80)
    split = Split(Xtr, Ytr, Xte, Yte)

    def fake_prob(Y):
        p = np.where(Y.reshape(-1) > 0, 0.9, 0.1)
        flip = rng.rand(p.size) < 0.15  # miscalls → zeros inside 'on'
        return np.where(flip, 1.0 - p, p).reshape(-1, 1)

    clf = {
        "pred_train": {"pfmean": fake_prob(Ytr)},
        "pred_test": {"pfmean": fake_prob(Yte)},
    }
    return split, clf


def test_hurdle_nlpd_hand_check():
    """metrics.hurdle_nlpd against a by-hand evaluation of the mixed measure."""
    p = np.array([0.8, 0.3, 0.6])
    y = np.array([2.0, 0.0, 0.0])
    cond = np.array([1.5])  # −log q(2.0) at the single positive row
    want = np.mean([-np.log(0.8) + 1.5, -np.log(1 - 0.3), -np.log(1 - 0.6)])
    np.testing.assert_allclose(metrics.hurdle_nlpd(p, cond, y), want, rtol=1e-12)

    # clipping guards p = 0/1; mismatched cond length is an error
    assert np.isfinite(metrics.hurdle_nlpd(np.array([1.0]), np.array([0.5]), np.array([3.0])))
    with pytest.raises(ValueError, match="strictly-positive entries"):
        metrics.hurdle_nlpd(p, np.array([1.0, 2.0]), y)


def test_hurdle_nlpd_proper_score(rng):
    """Sampling from the true mixed measure, the true parameters score better
    than miscalibrated ones (propriety of the log score)."""
    N = 4000
    p_true, mu_true, s2 = 0.7, 0.4, 0.25
    on = rng.rand(N) < p_true
    y = np.where(on, np.exp(mu_true + np.sqrt(s2) * rng.randn(N)), 0.0)
    pos = y > 0

    def score(p, mu):
        cond = metrics.lognormal_nlpd_pointwise(
            np.full(pos.sum(), mu), np.zeros(pos.sum()), y[pos], noise_var=s2
        )
        return metrics.hurdle_nlpd(np.full(N, p), cond, y)

    true_score = score(p_true, mu_true)
    assert true_score < score(0.4, mu_true)
    assert true_score < score(0.95, mu_true)
    assert true_score < score(p_true, mu_true + 1.0)


@pytest.mark.parametrize("head", ["lognormal", "gamma"])
def test_hurdle_with_positive_head(rng, tmp_path, head):
    """run_hurdle with a positive-support head: fits on the strictly-positive
    'on' points, recombines with the y-scale predictive mean, and the
    combined prediction is non-negative by construction."""
    from zigp_tpu.experiments import KronGridConfig, SvgpPptrConfig, run_hurdle

    split, clf = _split_and_clf(rng)
    cfg = SvgpPptrConfig(
        num_iter=30, batch_size=64, likelihood=head,
        grid=KronGridConfig(num_spatial=3, num_temporal=6), log_every=0,
    )
    res = run_hurdle(split, clf, cfg, workdir=str(tmp_path), log_fn=lambda s: None)
    assert np.isfinite(res["test_hurdle_comb_rmse"])
    comb = res["test_pred_hurdle_comb"]
    assert comb.shape == split.Ytest.shape
    assert (np.asarray(comb) >= 0.0).all()  # exp-link mean: no clipping needed
    # the inner regression's metric block reported y-scale numbers
    assert np.isfinite(res["test_hurdle_reg_rmse"])
    # the composite's mixed-measure predictive NLPD (full test set)
    assert np.isfinite(res["test_hurdle_nlpd"])


def test_hurdle_nlpd_gaussian_head(rng, tmp_path):
    """The mixed-measure NLPD is also defined for the reference's Gaussian
    amount head (its conditional density on ℝ)."""
    from zigp_tpu.experiments import KronGridConfig, SvgpPptrConfig, run_hurdle

    split, clf = _split_and_clf(rng)
    cfg = SvgpPptrConfig(
        num_iter=30, batch_size=64,
        grid=KronGridConfig(num_spatial=3, num_temporal=6), log_every=0,
    )
    res = run_hurdle(split, clf, cfg, workdir=str(tmp_path), log_fn=lambda s: None)
    assert np.isfinite(res["test_hurdle_nlpd"])


def test_svgp_metrics_lognormal_extras(rng):
    """_svgp_metrics stamps ymean/yvar (+ median extras for lognormal) and
    computes NLPD over the true positives only."""
    from zigp_tpu.experiments import KronGridConfig, SvgpPptrConfig, run_svgp
    from zigp_tpu.io.datasets import Split

    X = rng.rand(200, 3)
    Y = np.exp(0.5 * rng.randn(200, 1))
    split = Split(X[:150], Y[:150], X[150:], Y[150:])
    cfg = SvgpPptrConfig(
        num_iter=20, batch_size=50, likelihood="lognormal",
        grid=KronGridConfig(num_spatial=3, num_temporal=5), log_every=0,
    )
    res = run_svgp(split, cfg, log_fn=lambda s: None)
    for k in ("ymean", "yvar", "ymedian"):
        assert k in res["pred_test"], k
    assert "test_rmse_median" in res and np.isfinite(res["test_rmse_median"])
    assert np.isfinite(res["test_nlpd"])
    # predictive mean exceeds the median under the lognormal's right skew
    assert (res["pred_test"]["ymean"] >= res["pred_test"]["ymedian"] - 1e-12).all()
    # round 4: positive heads report sample-based proper scores too
    assert np.isfinite(res["test_crps"])
    assert set(res["test_exceedance"]) == {"0.1", "1.0", "5.0"}
