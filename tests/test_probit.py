import numpy as np
import jax.numpy as jnp
from scipy.special import owens_t as scipy_owens_t

from zigp_tpu.ops import probit
from .oracles import probit_expectations_np


def test_probit_expectations_match_reference_oracle(rng):
    gmean = rng.randn(100, 1) * 3
    gvar = np.abs(rng.randn(100, 1)) * 2 + 1e-3
    got = probit.probit_expectations(jnp.asarray(gmean), jnp.asarray(gvar))
    want = probit_expectations_np(gmean, gvar)
    np.testing.assert_allclose(np.asarray(got.e_phi), want[0], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got.e_phi_sq), want[1], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got.var_phi), want[2], rtol=1e-10)


def test_owen_t_bound_is_lower_bound():
    h = np.linspace(-4, 4, 41)
    a = np.full_like(h, 0.7)
    bound = np.asarray(probit.owen_t_bound(jnp.asarray(h), jnp.asarray(a)))
    exact = scipy_owens_t(np.abs(h), a)
    assert np.all(bound <= exact + 1e-12)


def test_owen_t_exact_matches_scipy():
    h = np.abs(np.linspace(-5, 5, 31))
    a = np.linspace(0.01, 1.0, 31)
    got = np.asarray(probit.owen_t_exact(jnp.asarray(h), jnp.asarray(a)))
    want = scipy_owens_t(h, a)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-12)


def test_probit_expectations_exact_mode_sane(rng):
    # exact Owen's T: E[Φ²] ∈ [E[Φ]², E[Φ]] and Var ≥ 0
    gmean = rng.randn(200) * 2
    gvar = np.abs(rng.randn(200)) + 1e-3
    e1, e2, v = probit.probit_expectations(jnp.asarray(gmean), jnp.asarray(gvar), exact=True)
    e1, e2, v = np.asarray(e1), np.asarray(e2), np.asarray(v)
    assert np.all(v >= 0)
    assert np.all(e2 <= e1 + 1e-9)
    assert np.all(e2 >= e1**2 - 1e-9)


def test_monte_carlo_agreement():
    # the exact-T expectations should match Monte Carlo closely
    rng = np.random.RandomState(3)
    mu, var = 0.4, 1.7
    g = rng.randn(2_000_000) * np.sqrt(var) + mu
    from scipy.stats import norm

    phi = norm.cdf(g) * (1 - 2e-3) + 1e-3
    e1, e2, v = probit.probit_expectations(
        jnp.asarray([mu]), jnp.asarray([var]), exact=True
    )
    np.testing.assert_allclose(float(e1[0]), phi.mean(), atol=2e-3)
    np.testing.assert_allclose(float(e2[0]), (phi**2).mean(), atol=2e-3)
