import numpy as np
import jax.numpy as jnp
import pytest

from zigp_tpu.ops import gauss_kl
from .oracles import gauss_kl_dense, gauss_kl_kron_dense


def _spd(rng, n):
    A = rng.randn(n, n)
    return A @ A.T + n * np.eye(n)


@pytest.mark.parametrize("num_latent", [1, 3])
def test_kl_diag_nonwhite(rng, num_latent):
    M = 12
    K = _spd(rng, M)
    q_mu = rng.randn(M, num_latent)
    q_sqrt = np.abs(rng.randn(M, num_latent)) + 0.1
    got = float(gauss_kl.gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_sqrt), jnp.asarray(K)))
    want = gauss_kl_dense(q_mu, q_sqrt, K)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_kl_full_nonwhite(rng):
    M, L = 8, 2
    K = _spd(rng, M)
    q_mu = rng.randn(M, L)
    q_sqrt = np.tril(rng.randn(M, M))[:, :, None] * np.ones((1, 1, L))
    q_sqrt += np.eye(M)[:, :, None]
    got = float(gauss_kl.gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_sqrt), jnp.asarray(K)))
    want = gauss_kl_dense(q_mu, q_sqrt, K)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_kl_white_diag_and_full(rng):
    M, L = 10, 1
    q_mu = rng.randn(M, L)
    q_sqrt_diag = np.abs(rng.randn(M, L)) + 0.1
    got = float(gauss_kl.gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_sqrt_diag)))
    want = gauss_kl_dense(q_mu, q_sqrt_diag, None)
    np.testing.assert_allclose(got, want, rtol=1e-9)

    q_sqrt_full = (np.tril(rng.randn(M, M)) + 2 * np.eye(M))[:, :, None]
    got = float(gauss_kl.gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_sqrt_full)))
    want = gauss_kl_dense(q_mu, q_sqrt_full, None)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_kl_nonnegative(rng):
    M = 9
    K = _spd(rng, M)
    q_mu = rng.randn(M, 1)
    q_sqrt = np.abs(rng.randn(M, 1)) + 0.1
    kl = float(gauss_kl.gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_sqrt), jnp.asarray(K)))
    assert kl >= 0.0


def test_kl_zero_when_q_equals_p(rng):
    # q = N(0, K) with full q_sqrt = chol(K)  =>  KL = 0
    M = 7
    K = _spd(rng, M)
    L = np.linalg.cholesky(K)
    kl = float(
        gauss_kl.gauss_kl(jnp.zeros((M, 1)), jnp.asarray(L[:, :, None]), jnp.asarray(K))
    )
    np.testing.assert_allclose(kl, 0.0, atol=1e-9)


def test_kron_kl_matches_dense_oracle(rng):
    sizes = [4, 6]
    Ks = [_spd(rng, n) for n in sizes]
    M = int(np.prod(sizes))
    q_mu = rng.randn(M, 1)
    q_sqrt = np.abs(rng.randn(M, 1)) + 0.1
    got = float(
        gauss_kl.gauss_kl_kron(jnp.asarray(q_mu), jnp.asarray(q_sqrt), [jnp.asarray(K) for K in Ks])
    )
    want = gauss_kl_kron_dense(q_mu, q_sqrt, Ks)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_kron_kl_equals_dense_kl_on_kron_prior(rng):
    # gauss_kl with K = kron(K1,K2) should equal gauss_kl_kron on factors
    sizes = [3, 5]
    Ks = [_spd(rng, n) for n in sizes]
    Kfull = np.kron(Ks[0], Ks[1])
    M = Kfull.shape[0]
    q_mu = rng.randn(M, 1)
    q_sqrt = np.abs(rng.randn(M, 1)) + 0.1
    kl_kron = float(
        gauss_kl.gauss_kl_kron(jnp.asarray(q_mu), jnp.asarray(q_sqrt), [jnp.asarray(K) for K in Ks])
    )
    kl_dense = float(gauss_kl.gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_sqrt), jnp.asarray(Kfull)))
    np.testing.assert_allclose(kl_kron, kl_dense, rtol=1e-8)


def test_kron_kl_three_factors(rng):
    sizes = [2, 3, 4]
    Ks = [_spd(rng, n) for n in sizes]
    M = int(np.prod(sizes))
    q_mu = rng.randn(M, 1)
    q_sqrt = np.abs(rng.randn(M, 1)) + 0.1
    Kfull = np.kron(np.kron(Ks[0], Ks[1]), Ks[2])
    kl_kron = float(
        gauss_kl.gauss_kl_kron(jnp.asarray(q_mu), jnp.asarray(q_sqrt), [jnp.asarray(K) for K in Ks])
    )
    kl_dense = float(gauss_kl.gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_sqrt), jnp.asarray(Kfull)))
    np.testing.assert_allclose(kl_kron, kl_dense, rtol=1e-8)
