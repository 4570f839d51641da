import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zigp_tpu.likelihoods import Gaussian
from zigp_tpu.models import KronSVGP
from zigp_tpu.ops.kernels import Constant, Matern, Product, RBF, Sum, White


def test_matern12_matches_closed_form(rng):
    X = rng.randn(15, 2)
    k = Matern.create([1.3, 0.7], 2.0, nu="1/2")
    K = np.asarray(k.K(jnp.asarray(X)))
    r = np.sqrt(np.sum(((X[:, None, :] - X[None, :, :]) / np.array([1.3, 0.7])) ** 2, -1))
    np.testing.assert_allclose(K, 2.0 * np.exp(-r), rtol=1e-7)


@pytest.mark.parametrize("nu,form", [
    ("3/2", lambda r: (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)),
    ("5/2", lambda r: (1 + np.sqrt(5) * r + 5 * r**2 / 3) * np.exp(-np.sqrt(5) * r)),
])
def test_matern_higher_orders(rng, nu, form):
    X = rng.randn(10, 1)
    X2 = rng.randn(8, 1)
    k = Matern.create([0.9], 1.5, nu=nu)
    K = np.asarray(k.K(jnp.asarray(X), jnp.asarray(X2)))
    r = np.abs(X / 0.9 - X2.T / 0.9)
    np.testing.assert_allclose(K, 1.5 * form(r), rtol=1e-7)


def test_matern_gradient_finite_at_zero_distance(rng):
    X = jnp.asarray(np.repeat(rng.randn(1, 2), 4, axis=0))  # identical rows

    def f(k):
        return jnp.sum(k.K(X))

    for nu in ("1/2", "3/2", "5/2"):
        g = jax.grad(f)(Matern.create([1.0, 1.0], 1.0, nu=nu))
        assert np.all(np.isfinite(np.asarray(g.lengthscales.raw)))


def test_matern_psd(rng):
    X = rng.randn(30, 3)
    for nu in ("1/2", "3/2", "5/2"):
        K = np.asarray(Matern.create([1.0, 1.0, 1.0], 1.0, nu=nu).K(jnp.asarray(X)))
        w = np.linalg.eigvalsh(K)
        assert w.min() > -1e-10


def test_white_and_constant(rng):
    X = rng.randn(5, 2)
    X2 = rng.randn(3, 2)
    w = White.create(0.3)
    np.testing.assert_allclose(np.asarray(w.K(jnp.asarray(X))), 0.3 * np.eye(5), rtol=1e-8)
    assert np.all(np.asarray(w.K(jnp.asarray(X), jnp.asarray(X2))) == 0)
    c = Constant.create(0.7)
    np.testing.assert_allclose(np.asarray(c.K(jnp.asarray(X), jnp.asarray(X2))), 0.7, rtol=1e-8)


def test_sum_product_composites(rng):
    X = rng.randn(9, 2)
    k1 = RBF.create([1.0, 1.0], 1.0)
    k2 = Matern.create([0.5, 0.5], 0.5, nu="3/2")
    Ks = np.asarray(Sum(k1, k2).K(jnp.asarray(X)))
    Kp = np.asarray(Product(k1, k2).K(jnp.asarray(X)))
    K1 = np.asarray(k1.K(jnp.asarray(X)))
    K2 = np.asarray(k2.K(jnp.asarray(X)))
    np.testing.assert_allclose(Ks, K1 + K2, rtol=1e-10)
    np.testing.assert_allclose(Kp, K1 * K2, rtol=1e-10)


def test_matern_works_in_kron_model(rng):
    """Matérn factors drop into the Kronecker models unchanged."""
    Zs = [rng.rand(3, 2), np.linspace(0, 1, 6)[:, None]]
    ks = [Matern.create([1.0, 1.0], 1.0, nu="3/2"), Matern.create([0.3], 1.0, nu="5/2")]
    model = KronSVGP.create(ks, Zs, Gaussian.create(0.1), num_data=40, jitter=1e-6)
    X = rng.rand(20, 3)
    Y = rng.rand(20, 1)
    elbo = float(model.elbo(jnp.asarray(X), jnp.asarray(Y)))
    assert np.isfinite(elbo)
    g = jax.grad(lambda m: m.loss(jnp.asarray(X), jnp.asarray(Y)))(model)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(g))
