import numpy as np
import jax
import jax.numpy as jnp

from zigp_tpu.ops.kernels import RBF
from .oracles import SEKernelNp


def test_rbf_matches_numpy_oracle(rng):
    X = rng.randn(20, 3)
    X2 = rng.randn(15, 3)
    ell = np.array([0.7, 1.3, 2.0])
    var = 1.7
    k = RBF.create(ell, var)
    oracle = SEKernelNp(ell, var)
    np.testing.assert_allclose(np.asarray(k.K(jnp.asarray(X))), oracle.K(X), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(k.K(jnp.asarray(X), jnp.asarray(X2))), oracle.K(X, X2), rtol=1e-8
    )
    np.testing.assert_allclose(np.asarray(k.Kdiag(jnp.asarray(X))), oracle.Kdiag(X), rtol=1e-8)


def test_rbf_scalar_lengthscale(rng):
    X = rng.randn(10, 2)
    k = RBF.create(2.0, 1.0)
    oracle = SEKernelNp(np.array([2.0]), 1.0)
    np.testing.assert_allclose(np.asarray(k.K(jnp.asarray(X))), oracle.K(X), rtol=1e-8)


def test_rbf_active_dims(rng):
    X = rng.randn(10, 3)
    k = RBF.create([1.0, 1.0], 1.0, active_dims=(0, 1))
    oracle = SEKernelNp(np.array([1.0, 1.0]), 1.0)
    np.testing.assert_allclose(np.asarray(k.K(jnp.asarray(X))), oracle.K(X[:, :2]), rtol=1e-8)


def test_rbf_is_jittable_and_differentiable(rng):
    X = jnp.asarray(rng.randn(8, 2))

    @jax.jit
    def f(k):
        return jnp.sum(k.K(X))

    k = RBF.create([1.0, 2.0], 1.5)
    g = jax.grad(f)(k)
    # gradient flows to the unconstrained raw parameters
    assert np.all(np.isfinite(np.asarray(g.lengthscales.raw)))
    assert np.all(np.isfinite(np.asarray(g.variance.raw)))
    assert not np.allclose(np.asarray(g.variance.raw), 0.0)


def test_parameter_bijector_roundtrip():
    from zigp_tpu.core.parameters import positive_param

    p = positive_param(0.01)
    np.testing.assert_allclose(float(p.value), 0.01, rtol=1e-8)
    p2 = positive_param(np.array([1.0, 20.0, 1e-4]))
    np.testing.assert_allclose(np.asarray(p2.value), [1.0, 20.0, 1e-4], rtol=1e-8)
