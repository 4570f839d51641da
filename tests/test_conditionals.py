import numpy as np
import jax.numpy as jnp
import pytest

from zigp_tpu.ops import conditionals
from zigp_tpu.ops.kernels import RBF
from .oracles import SEKernelNp, conditional_dense, kron_inf_dense


@pytest.mark.parametrize("whiten", [False, True])
@pytest.mark.parametrize("q_diag", [True, False])
def test_dense_conditional_matches_oracle(rng, whiten, q_diag):
    M, N, D, L = 9, 14, 2, 1
    Z = rng.randn(M, D)
    X = rng.randn(N, D)
    f = rng.randn(M, L)
    if q_diag:
        q_sqrt = np.abs(rng.randn(M, L)) + 0.1
    else:
        q_sqrt = (np.tril(rng.randn(M, M)) + 2 * np.eye(M))[:, :, None]
    ell, var = np.array([1.1, 0.8]), 1.4
    k = RBF.create(ell, var)
    oracle = SEKernelNp(ell, var)

    got_mean, got_var = conditionals.conditional(
        jnp.asarray(X), jnp.asarray(Z), k, jnp.asarray(f),
        q_sqrt=jnp.asarray(q_sqrt), whiten=whiten, jitter=1e-6,
    )
    want_mean, want_var = conditional_dense(X, Z, oracle, f, q_sqrt=q_sqrt, whiten=whiten, jitter=1e-6)
    np.testing.assert_allclose(np.asarray(got_mean), want_mean, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got_var), want_var, rtol=1e-7, atol=1e-10)


def test_dense_conditional_no_qsqrt(rng):
    M, N, D = 7, 11, 2
    Z, X = rng.randn(M, D), rng.randn(N, D)
    f = rng.randn(M, 1)
    k = RBF.create([1.0, 1.0], 1.0)
    oracle = SEKernelNp(np.array([1.0, 1.0]), 1.0)
    got_mean, got_var = conditionals.conditional(
        jnp.asarray(X), jnp.asarray(Z), k, jnp.asarray(f), jitter=1e-6
    )
    want_mean, want_var = conditional_dense(X, Z, oracle, f, jitter=1e-6)
    np.testing.assert_allclose(np.asarray(got_mean), want_mean, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(got_var), want_var, rtol=1e-7, atol=1e-10)


def test_kron_conditional_matches_reference_vectorized_oracle(rng):
    # spatial factor: 5 inducing in 2-D; temporal factor: 8 inducing in 1-D
    Ms, Mt, B = 5, 8, 17
    Zs_np = [rng.randn(Ms, 2), rng.randn(Mt, 1)]
    X = rng.randn(B, 3)
    M = Ms * Mt
    q_mu = rng.randn(M, 1) * 0.1
    q_sqrt = np.abs(rng.randn(M, 1)) + 0.5
    masks = [(0, 1), (2,)]

    ks = [RBF.create([1.2, 0.9], 1.5), RBF.create([0.5], 2.0)]
    oracles = [SEKernelNp(np.array([1.2, 0.9]), 1.5), SEKernelNp(np.array([0.5]), 2.0)]

    got_mu, got_var = conditionals.kron_conditional(
        jnp.asarray(X), ks, [jnp.asarray(Z) for Z in Zs_np],
        jnp.asarray(q_mu), jnp.asarray(q_sqrt), masks, jitter=1e-5,
    )
    want_mu, want_var = kron_inf_dense(
        X, oracles, Zs_np, q_mu, q_sqrt, [np.array(m) for m in masks], jitter=1e-5
    )
    np.testing.assert_allclose(np.asarray(got_mu), want_mu, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got_var), want_var, rtol=1e-6, atol=1e-9)


def test_kron_conditional_variance_positive(rng):
    Ms, Mt, B = 4, 6, 50
    Zs_np = [rng.rand(Ms, 2), rng.rand(Mt, 1)]
    X = rng.rand(B, 3)
    M = Ms * Mt
    q_mu = rng.randn(M, 1) * 0.01
    q_sqrt = np.ones((M, 1))
    ks = [RBF.create([1.0, 1.0], 1.0), RBF.create([1.0], 1.0)]
    _, var = conditionals.kron_conditional(
        jnp.asarray(X), ks, [jnp.asarray(Z) for Z in Zs_np],
        jnp.asarray(q_mu), jnp.asarray(q_sqrt), [(0, 1), (2,)], jitter=1e-5,
    )
    assert np.all(np.asarray(var) > 0)


@pytest.mark.parametrize("q_diag", [True, False])
def test_dense_conditional_full_cov(rng, q_diag):
    M, N, D, L = 7, 9, 2, 1
    Z = rng.randn(M, D)
    X = rng.randn(N, D)
    f = rng.randn(M, L)
    if q_diag:
        q_sqrt = np.abs(rng.randn(M, L)) + 0.1
    else:
        q_sqrt = (np.tril(rng.randn(M, M)) + 2 * np.eye(M))[:, :, None]
    k = RBF.create([1.0, 0.8], 1.2)
    oracle = SEKernelNp(np.array([1.0, 0.8]), 1.2)
    got_mean, got_cov = conditionals.conditional(
        jnp.asarray(X), jnp.asarray(Z), k, jnp.asarray(f),
        q_sqrt=jnp.asarray(q_sqrt), full_cov=True, jitter=1e-6,
    )
    want_mean, want_cov = conditional_dense(
        X, Z, oracle, f, q_sqrt=q_sqrt, full_cov=True, jitter=1e-6
    )
    np.testing.assert_allclose(np.asarray(got_mean), want_mean, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got_cov), want_cov, rtol=1e-7, atol=1e-9)
    # returned covariance is symmetric PSD per latent
    C = np.asarray(got_cov)[:, :, 0]
    np.testing.assert_allclose(C, C.T, rtol=1e-10)
    assert np.linalg.eigvalsh(C).min() > -1e-8
