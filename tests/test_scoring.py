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


class TestExactCrps:
    """Round 5 (VERDICT r4 #2): exact closed-form CRPS for the gated and
    mixed-measure predictives, validated against dense numerical integration
    of the CRPS definition and against the fair sample estimator."""

    @staticmethod
    def _crps_mixture_numeric(w, mu, s2, y, n=200001):
        """∫ (F(t) − 1{t ≥ y})² dt for a Gaussian mixture, dense grid."""
        s = np.sqrt(np.maximum(s2, 0.0))
        lo = float(np.min(mu - 9 * s)) - abs(y) - 1
        hi = float(np.max(mu + 9 * s)) + abs(y) + 1
        t = np.linspace(lo, hi, n)
        F = np.zeros_like(t)
        for wk, mk, sk in zip(w, mu, s):
            F += wk * (ndtr((t - mk) / sk) if sk > 0 else (t >= mk).astype(float))
        H = (t >= y).astype(np.float64)
        return np.trapezoid((F - H) ** 2, t)

    def test_mixture_matches_numeric_integration(self):
        w = np.array([0.2, 0.5, 0.3])
        mu = np.array([-1.0, 0.5, 3.0])
        s2 = np.array([0.25, 1.0, 0.04])
        for y in (-0.5, 0.0, 2.9):
            got = metrics.crps_gaussian_mixture_pointwise(
                w, mu[None, :], s2[None, :], [y]
            )[0]
            want = self._crps_mixture_numeric(w, mu, s2, y)
            assert abs(got - want) < 1e-4, y

    def test_mixture_with_atom_component(self):
        # a zero-variance component is a point mass — the hurdle's atom
        w = np.array([0.6, 0.4])
        mu = np.array([0.0, 2.0])
        s2 = np.array([0.0, 0.5])
        for y in (0.0, 1.0, 2.5):
            got = metrics.crps_gaussian_mixture_pointwise(
                w, mu[None, :], s2[None, :], [y]
            )[0]
            want = self._crps_mixture_numeric(w, mu, s2, y)
            assert abs(got - want) < 1e-4, y

    def test_single_component_reduces_to_gaussian_closed_form(self):
        got = metrics.crps_gaussian_mixture_pointwise(
            np.ones(1), np.array([[0.7]]), np.array([[1.3]]), [0.2]
        )
        want = metrics.crps_gaussian_pointwise([0.7], [1.3], [0.2])
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_gated_matches_large_sample_mc(self):
        rng = np.random.RandomState(11)
        n = 120
        pred = {
            "fmean": rng.randn(n) * 2 + 1,
            "fvar": rng.rand(n) * 0.5,
            "gmean": rng.randn(n),
            "gvar": rng.rand(n) * 0.8,
        }
        noise, y = 0.04, np.maximum(rng.randn(n), 0.0)
        exact = metrics.crps_gated_pointwise(pred, y, noise_var=noise)
        samples = metrics.sample_gated_predictive(
            pred, noise_var=noise, num_samples=20000, seed=3
        )
        mc = metrics.crps_from_samples_pointwise(samples, y)
        # fair estimator @ 20k draws: sampling s.e. ~ 5e-3 per point
        assert np.max(np.abs(exact - mc)) < 0.02
        assert abs(np.mean(exact) - np.mean(mc)) < 2e-3

    def test_gated_sharp_gate_regime(self):
        # ADVICE r4's GH failure regime: large gate variance + sharp
        # transition. The stratified mixture must track the dense oracle.
        from scipy.special import ndtri

        for fm, fv, gm, gv, nv, y in [
            (5.2, 0.01, 0.0, 9.0, 0.01, 4.9),
            (10.0, 0.001, -2.0, 4.0, 0.01, 0.05),
            (6.0, 1.0, 0.0, 9.0, 0.09, 2.0),
        ]:
            pred = {"fmean": [fm], "fvar": [fv], "gmean": [gm], "gvar": [gv]}
            got = metrics.crps_gated_pointwise(pred, [y], noise_var=nv)[0]
            # dense oracle: 8001-node stratified gate grid
            u = (np.arange(8001) + 0.5) / 8001
            a = ndtr(gm + np.sqrt(gv) * ndtri(u))
            want = self._crps_mixture_numeric(
                np.full(8001, 1 / 8001), a * fm, a**2 * fv + nv, y
            )
            assert abs(got - want) < 1e-3, (fm, gv)

    def test_gated_ensemble_concatenates_members(self):
        rng = np.random.RandomState(12)
        n = 40
        members = [
            {"fmean": rng.randn(n), "fvar": rng.rand(n) * 0.3,
             "gmean": rng.randn(n), "gvar": rng.rand(n) * 0.3}
            for _ in range(3)
        ]
        y = np.maximum(rng.randn(n), 0.0)
        exact = metrics.crps_gated_pointwise(members, y, noise_var=0.01)
        samples = metrics.sample_gated_mixture(
            members, noise_var=0.01, num_samples=20000, seed=4
        )
        mc = metrics.crps_from_samples_pointwise(samples, y)
        assert np.max(np.abs(exact - mc)) < 0.02

    @pytest.mark.parametrize(
        "head,kw",
        [("gaussian", {"noise_var": 0.09}),
         ("lognormal", {"noise_var": 0.25}),
         ("gamma", {"shape": 2.0})],
    )
    def test_hurdle_matches_large_sample_mc(self, head, kw):
        rng = np.random.RandomState(13)
        n = 150
        p = rng.rand(n)
        mu = rng.randn(n) * 0.5
        v = rng.rand(n) * 0.3
        y = np.where(rng.rand(n) < 0.5, 0.0, np.abs(rng.randn(n)))
        exact = metrics.crps_hurdle_pointwise(p, mu, v, y, head=head, **kw)
        samples = metrics.sample_hurdle_predictive(
            p, mu, v, head=head, num_samples=20000, seed=5, **kw
        )
        mc = metrics.crps_from_samples_pointwise(samples, y)
        assert np.max(np.abs(exact - mc)) < 0.03, head
        assert abs(np.mean(exact) - np.mean(mc)) < 3e-3, head

    def test_hurdle_gaussian_degenerate_gate_limits(self):
        # p_on = 1 reduces to the Gaussian closed form; p_on = 0 to |y|
        y = np.array([0.0, 0.7, 2.0])
        mu = np.array([0.5, 0.5, 0.5])
        v = np.array([0.2, 0.2, 0.2])
        full = metrics.crps_hurdle_pointwise(
            np.ones(3), mu, v, y, head="gaussian", noise_var=0.05
        )
        want = metrics.crps_gaussian_pointwise(mu, v, y, noise_var=0.05)
        np.testing.assert_allclose(full, want, atol=1e-10)
        off = metrics.crps_hurdle_pointwise(
            np.zeros(3), mu, v, y, head="gaussian", noise_var=0.05
        )
        np.testing.assert_allclose(off, np.abs(y), atol=1e-10)

    def test_hurdle_unknown_head_raises(self):
        with pytest.raises(ValueError):
            metrics.crps_hurdle_pointwise(
                [0.5], [0.0], [1.0], [1.0], head="weibull"
            )

    def test_crps_proper_prefers_truth_gated(self):
        # scoring sanity: the data-generating predictive beats a distorted one
        rng = np.random.RandomState(14)
        n = 4000
        pred = {"fmean": np.full(n, 2.0), "fvar": np.full(n, 0.3),
                "gmean": np.full(n, 0.2), "gvar": np.full(n, 0.5)}
        y = metrics.sample_gated_predictive(pred, noise_var=0.04, num_samples=1, seed=6)[0]
        good = float(np.mean(metrics.crps_gated_pointwise(pred, y, noise_var=0.04)))
        shifted = dict(pred, fmean=np.full(n, 3.0))
        bad = float(np.mean(metrics.crps_gated_pointwise(shifted, y, noise_var=0.04)))
        assert good < bad


class TestSharpGateTails:
    """ADVICE r4: the GH tail under-resolved sharp gate transitions at
    gvar 4-10 (measured 1.6e-2 at gvar=4, 4.9e-2 at gvar=9). The
    transition-aware quadrature must hold ≤1e-3 there."""

    @staticmethod
    def _tail_oracle(fm, fv, gm, gv, tau, nv, K=100001):
        s = np.sqrt(gv)
        g = np.linspace(gm - 10 * s, gm + 10 * s, K)
        a = ndtr(g)
        sy = np.sqrt(a**2 * fv + nv)
        pdf = np.exp(-0.5 * ((g - gm) / s) ** 2) / (s * np.sqrt(2 * np.pi))
        return float(np.trapezoid(ndtr((a * fm - tau) / sy) * pdf, g))

    @pytest.mark.parametrize("gv", [0.8, 4.0, 9.0, 16.0])
    def test_gated_tail_sharp_regime(self, gv):
        for fm, fv, nv, gm, tau in [
            (5.2, 0.01, 0.01, 0.0, 5.0),
            (10.0, 0.001, 0.01, -2.0, 0.1),
            (5.05, 0.001, 0.001, 2.0, 5.0),
            (6.0, 1.0, 0.09, 0.0, 1.0),
        ]:
            pred = {"fmean": [fm], "fvar": [fv], "gmean": [gm], "gvar": [gv]}
            got = float(metrics.gated_exceedance_prob(pred, tau, noise_var=nv)[0])
            want = self._tail_oracle(fm, fv, gm, gv, tau, nv)
            assert abs(got - want) < 1e-3, (fm, fv, nv, gm, tau, gv)
