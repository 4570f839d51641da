import numpy as np
import jax
import jax.numpy as jnp

from zigp_tpu.likelihoods import Gaussian
from zigp_tpu.models import KronGP, SVGP
from zigp_tpu.ops.kernels import RBF


def test_svgp_marginal_samples_match_moments(rng):
    Z = np.linspace(0, 10, 8)[:, None]
    model = SVGP.create(RBF.create([2.0], 1.0), Gaussian.create(0.1), Z, num_data=50, jitter=1e-6)
    X = jnp.asarray(np.linspace(0, 10, 12)[:, None])
    mean, var = model.predict_f(X)
    s = model.predict_f_samples(jax.random.PRNGKey(0), X, num_samples=20000)
    assert s.shape == (20000, 12, 1)
    np.testing.assert_allclose(np.asarray(s.mean(0)), np.asarray(mean), atol=0.03)
    np.testing.assert_allclose(np.asarray(s.var(0)), np.asarray(var), rtol=0.08)


def test_svgp_full_cov_samples_capture_correlation(rng):
    Z = np.linspace(0, 10, 8)[:, None]
    model = SVGP.create(RBF.create([2.0], 1.0), Gaussian.create(0.1), Z, num_data=50, jitter=1e-6)
    X = jnp.asarray(np.array([[3.0], [3.05]]))  # two nearly identical inputs
    s = model.predict_f_samples(jax.random.PRNGKey(1), X, num_samples=4000, full_cov=True)
    corr = np.corrcoef(np.asarray(s[:, 0, 0]), np.asarray(s[:, 1, 0]))[0, 1]
    assert corr > 0.9  # joint draws must be strongly correlated at nearby points


def test_kron_gp_samples(rng):
    Zs = [rng.rand(3, 2), np.linspace(0, 1, 5)[:, None]]
    ks = [RBF.create([1.0, 1.0], 1.0), RBF.create([0.3], 1.0)]
    gp = KronGP.create(ks, Zs, jitter=1e-6)
    X = jnp.asarray(rng.rand(10, 3))
    s = gp.predict_f_samples(jax.random.PRNGKey(2), X, num_samples=5000)
    mu, var = gp.predict_f(X)
    # Monte-Carlo tolerances scaled to the (large) predictive variances:
    # mean std = sqrt(var/S), var rel-std ≈ sqrt(2/S)
    tol_mean = 5.0 * np.sqrt(np.asarray(var) / 5000)
    assert np.all(np.abs(np.asarray(s.mean(0)) - np.asarray(mu)) < tol_mean)
    np.testing.assert_allclose(np.asarray(s.var(0)), np.asarray(var), rtol=0.15)
