"""Proper-scoring metrics: CRPS (closed-form Gaussian + sample estimator),
host-side predictive samplers, and exceedance-probability scores.

The reference reports clipped point metrics only (scripts/onoff.py:471-481);
these are the probabilistic scores its application domain (precipitation
forecasting) actually uses. Ground truth here: numerical integration of the
CRPS definition, brute-force pairwise sums, and closed-form moments.
"""

import numpy as np
import pytest
from scipy.special import ndtr

from zigp_tpu.utils import metrics


def _crps_numeric(mu, sigma, y, lo=-30.0, hi=30.0, n=400001):
    """∫ (F(t) − 1{t ≥ y})² dt on a fine grid for F = N(mu, sigma²)."""
    t = np.linspace(lo, hi, n)
    F = ndtr((t - mu) / sigma)
    H = (t >= y).astype(np.float64)
    return np.trapezoid((F - H) ** 2, t)


class TestCrpsGaussian:
    def test_matches_numerical_integration(self):
        for mu, sigma, y in [(0.0, 1.0, 0.3), (1.5, 0.5, -0.2), (-2.0, 3.0, 4.0)]:
            got = metrics.crps_gaussian_pointwise([mu], [sigma**2], [y])[0]
            want = _crps_numeric(mu, sigma, y)
            # the grid integration's own error at the step discontinuity
            # is ~2e-5; the closed form is exact
            assert abs(got - want) < 1e-4, (mu, sigma, y)

    def test_zero_variance_limit_is_absolute_error(self):
        got = metrics.crps_gaussian_pointwise([1.0, -2.0], [0.0, 0.0], [3.0, -2.5])
        np.testing.assert_allclose(got, [2.0, 0.5])

    def test_noise_var_adds_to_variance(self):
        a = metrics.crps_gaussian([0.0], [1.0], [0.5], noise_var=0.5)
        b = metrics.crps_gaussian([0.0], [1.5], [0.5])
        assert a == pytest.approx(b)

    def test_proper_score_minimized_at_truth(self):
        # predicting the right mean scores better than a shifted one
        rng = np.random.RandomState(0)
        y = rng.randn(4000)
        good = metrics.crps_gaussian(np.zeros_like(y), np.ones_like(y), y)
        bad = metrics.crps_gaussian(np.ones_like(y), np.ones_like(y), y)
        assert good < bad


class TestCrpsFromSamples:
    def test_matches_bruteforce_pairwise(self):
        rng = np.random.RandomState(1)
        x = rng.randn(17, 3) * 2.0 + 0.3
        y = rng.randn(3)
        got = metrics.crps_from_samples_pointwise(x, y)
        S = x.shape[0]
        for i in range(3):
            t1 = np.mean(np.abs(x[:, i] - y[i]))
            t2 = np.abs(x[:, i][:, None] - x[:, i][None, :]).sum() / (2 * S * (S - 1))
            assert got[i] == pytest.approx(t1 - t2, rel=1e-12)

    def test_converges_to_gaussian_closed_form(self):
        rng = np.random.RandomState(2)
        mu, sigma, y = 0.7, 1.3, 1.1
        x = mu + sigma * rng.randn(40000, 1)
        got = metrics.crps_from_samples(x, [y])
        want = metrics.crps_gaussian([mu], [sigma**2], [y])
        assert got == pytest.approx(want, rel=2e-2)

    def test_identical_samples_give_absolute_error(self):
        x = np.full((8, 2), 1.5)
        got = metrics.crps_from_samples_pointwise(x, [0.5, 1.5])
        np.testing.assert_allclose(got, [1.0, 0.0])

    def test_accepts_trailing_singleton_axis(self):
        rng = np.random.RandomState(3)
        x = rng.randn(9, 4)
        a = metrics.crps_from_samples_pointwise(x, np.zeros(4))
        b = metrics.crps_from_samples_pointwise(x[:, :, None], np.zeros((4, 1)))
        np.testing.assert_allclose(a, b)

    def test_needs_two_samples(self):
        with pytest.raises(ValueError):
            metrics.crps_from_samples(np.zeros((1, 4)), np.zeros(4))


class TestPredictiveSamplers:
    def test_gated_sampler_moments(self):
        # one point with a confident 'on' gate: y ≈ Φ(g)·f + ε ≈ f + ε
        pred = {
            "fmean": np.array([[2.0]]),
            "fvar": np.array([[0.04]]),
            "gmean": np.array([[8.0]]),
            "gvar": np.array([[1e-6]]),
        }
        x = metrics.sample_gated_predictive(pred, noise_var=0.01, num_samples=60000)
        assert x.shape == (60000, 1)
        assert np.mean(x) == pytest.approx(2.0, abs=0.01)
        assert np.var(x) == pytest.approx(0.05, rel=0.1)

    def test_gated_sampler_off_gate_is_noise(self):
        pred = {
            "fmean": np.array([[5.0]]),
            "fvar": np.array([[1.0]]),
            "gmean": np.array([[-12.0]]),
            "gvar": np.array([[1e-8]]),
        }
        x = metrics.sample_gated_predictive(pred, noise_var=0.01, num_samples=20000)
        assert np.mean(x) == pytest.approx(0.0, abs=0.01)

    def test_hurdle_sampler_zero_atom_and_positivity(self):
        p = np.array([0.25, 0.9])
        x = metrics.sample_hurdle_predictive(
            p, np.array([0.0, 1.0]), np.array([0.1, 0.2]),
            head="lognormal", noise_var=0.05, num_samples=40000,
        )
        frac_zero = np.mean(x == 0.0, axis=0)
        np.testing.assert_allclose(frac_zero, 1.0 - p, atol=0.01)
        assert np.all(x >= 0.0)

    def test_hurdle_gaussian_head_mean(self):
        # E[y] = p · fmean for the Gaussian amount head
        x = metrics.sample_hurdle_predictive(
            np.array([0.5]), np.array([2.0]), np.array([0.01]),
            head="gaussian", noise_var=0.01, num_samples=80000,
        )
        assert np.mean(x) == pytest.approx(1.0, abs=0.02)

    def test_hurdle_gamma_head_mean(self):
        # amount | f ~ Gamma(a, rate a e^{-f}) has mean e^f; with fvar=0,
        # E[y] = p·e^{fmean}
        x = metrics.sample_hurdle_predictive(
            np.array([0.8]), np.array([0.5]), np.array([0.0]),
            head="gamma", shape=2.0, num_samples=80000,
        )
        assert np.mean(x) == pytest.approx(0.8 * np.exp(0.5), rel=0.02)

    def test_hurdle_full_gate_gaussian_matches_closed_form_crps(self):
        rng = np.random.RandomState(4)
        mu = rng.randn(5)
        v = rng.rand(5) * 0.5 + 0.1
        y = rng.randn(5)
        x = metrics.sample_hurdle_predictive(
            np.ones(5), mu, v, head="gaussian", noise_var=0.2, num_samples=40000
        )
        got = metrics.crps_from_samples_pointwise(x, y)
        want = metrics.crps_gaussian_pointwise(mu, v, y, noise_var=0.2)
        np.testing.assert_allclose(got, want, rtol=0.05, atol=5e-3)

    def test_unknown_head_raises(self):
        with pytest.raises(ValueError):
            metrics.sample_hurdle_predictive(
                np.ones(1), np.zeros(1), np.ones(1), head="weibull"
            )


class TestExceedance:
    def test_brier(self):
        assert metrics.brier([1.0, 0.0], [1, 0]) == 0.0
        assert metrics.brier([0.5, 0.5], [1, 0]) == pytest.approx(0.25)

    def test_summary_from_hand_built_samples(self):
        # 4 samples per point; point 0 exceeds 1.0 in 2/4 draws, point 1 never
        x = np.array([[0.0, 0.0], [2.0, 0.5], [3.0, 0.2], [0.5, 0.0]])
        y = np.array([2.5, 0.0])
        out = metrics.exceedance_summary(x, y, thresholds=(1.0,))
        s = out["1.0"]
        assert s["base_rate"] == pytest.approx(0.5)
        # p_hat = [0.5, 0.0], events = [1, 0]
        assert s["brier"] == pytest.approx(np.mean([(0.5 - 1) ** 2, 0.0]))
        assert s["auc"] == 1.0

    def test_gaussian_summary_matches_sampled(self):
        rng = np.random.RandomState(5)
        mu = rng.randn(2000)
        v = rng.rand(2000) * 0.5 + 0.2
        y = mu + np.sqrt(v) * rng.randn(2000)
        exact = metrics.exceedance_summary_gaussian(mu, v, y, thresholds=(0.5,))
        x = mu[None] + np.sqrt(v)[None] * rng.randn(400, 2000)
        sampled = metrics.exceedance_summary(x, y, thresholds=(0.5,))
        assert exact["0.5"]["brier"] == pytest.approx(sampled["0.5"]["brier"], abs=5e-3)
        assert exact["0.5"]["auc"] == pytest.approx(sampled["0.5"]["auc"], abs=2e-2)

    def test_perfect_forecast_beats_climatology(self):
        # scoring sanity: the true exceedance probability has a lower Brier
        # score than the base-rate (climatology) forecast
        rng = np.random.RandomState(6)
        mu = rng.randn(4000)
        y = mu + 0.5 * rng.randn(4000)
        out = metrics.exceedance_summary_gaussian(
            mu, np.full_like(mu, 0.25), y, thresholds=(0.0,)
        )
        event = (y > 0).astype(float)
        clim = metrics.brier(np.full_like(y, event.mean()), event)
        assert out["0.0"]["brier"] < clim


class TestExactTails:
    """Round 4: exact exceedance tails (GH/closed-form) vs large-sample MC."""

    def test_gated_tail_matches_mc(self):
        rng = np.random.RandomState(7)
        n = 1500
        pred = {
            "fmean": rng.randn(n) * 2 + 1,
            "fvar": rng.rand(n) * 0.5,
            "gmean": rng.randn(n),
            "gvar": rng.rand(n) * 0.8,
        }
        noise = 0.04
        S = 4000
        f = pred["fmean"][None] + np.sqrt(pred["fvar"])[None] * rng.randn(S, n)
        g = pred["gmean"][None] + np.sqrt(pred["gvar"])[None] * rng.randn(S, n)
        y = ndtr(g) * f + np.sqrt(noise) * rng.randn(S, n)
        for tau in (0.1, 1.0):
            exact = metrics.gated_exceedance_prob(pred, tau, noise_var=noise)
            mc = np.mean(y > tau, axis=0)
            assert np.max(np.abs(exact - mc)) < 0.03, tau

    def test_gated_mixture_is_mean_of_member_tails(self):
        rng = np.random.RandomState(8)
        n = 50
        members = [
            {"fmean": rng.randn(n), "fvar": rng.rand(n) * 0.3,
             "gmean": rng.randn(n), "gvar": rng.rand(n) * 0.3}
            for _ in range(3)
        ]
        y = rng.rand(n)
        out = metrics.exceedance_summary_gated(members, y, thresholds=(0.5,), noise_var=0.01)
        tails = np.mean(
            [metrics.gated_exceedance_prob(m, 0.5, noise_var=0.01) for m in members], axis=0
        )
        event = (y > 0.5).astype(float)
        assert out["0.5"]["brier"] == pytest.approx(metrics.brier(tails, event))

    @pytest.mark.parametrize(
        "head,kw",
        [("gaussian", {"noise_var": 0.09}),
         ("lognormal", {"noise_var": 0.25}),
         ("gamma", {"shape": 2.0})],
    )
    def test_hurdle_tail_matches_sampler(self, head, kw):
        rng = np.random.RandomState(9)
        n = 800
        p = rng.rand(n)
        mu = rng.randn(n) * 0.5
        v = rng.rand(n) * 0.3
        exact = metrics.hurdle_exceedance_prob(p, mu, v, 1.0, head=head, **kw)
        samples = metrics.sample_hurdle_predictive(
            p, mu, v, head=head, num_samples=4000, seed=1, **kw
        )
        mc = np.mean(samples > 1.0, axis=0)
        assert np.max(np.abs(exact - mc)) < 0.035, head
        # the zero atom caps the tail at p_on
        assert np.all(exact <= p + 1e-12)

    def test_gated_tail_resolves_rare_threshold(self):
        # the round-4 motivation: a 256-draw estimate of P(y > 5) is exactly
        # 0 for every point when the tail is ~1e-4; the GH tail still ranks
        rng = np.random.RandomState(10)
        n = 300
        pred = {
            "fmean": rng.rand(n) * 1.0,
            "fvar": np.full(n, 1.0),
            "gmean": rng.randn(n) * 0.5,
            "gvar": np.full(n, 0.2),
        }
        exact = metrics.gated_exceedance_prob(pred, 5.0, noise_var=0.01)
        assert np.all(exact >= 0) and np.all(exact <= 1)
        assert np.unique(exact).size > n // 2  # informative, not constant
