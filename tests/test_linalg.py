import numpy as np
import jax.numpy as jnp

from zigp_tpu.ops import linalg


def _random_spd(rng, n, scale=1.0):
    A = rng.randn(n, n)
    return scale * (A @ A.T) + n * np.eye(n)


def test_kron_dense_matches_numpy(rng):
    A = rng.randn(3, 3)
    B = rng.randn(4, 4)
    C = rng.randn(2, 2)
    got = np.asarray(linalg.kron_dense(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C)))
    want = np.kron(np.kron(A, B), C)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_kron_mv_matches_dense(rng):
    A = rng.randn(3, 3)
    B = rng.randn(5, 5)
    C = rng.randn(2, 2)
    x = rng.randn(3 * 5 * 2, 1)
    got = np.asarray(linalg.kron_mv([jnp.asarray(M) for M in (A, B, C)], jnp.asarray(x)))
    want = np.kron(np.kron(A, B), C) @ x
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_kron_mv_multicolumn(rng):
    A = rng.randn(4, 4)
    B = rng.randn(3, 3)
    x = rng.randn(12, 5)
    got = np.asarray(linalg.kron_mv([jnp.asarray(A), jnp.asarray(B)], jnp.asarray(x)))
    want = np.kron(A, B) @ x
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_kron_solve_lower(rng):
    Ka = _random_spd(rng, 4)
    Kb = _random_spd(rng, 6)
    La = np.linalg.cholesky(Ka)
    Lb = np.linalg.cholesky(Kb)
    b = rng.randn(24, 1)
    got = np.asarray(linalg.kron_solve_lower([jnp.asarray(La), jnp.asarray(Lb)], jnp.asarray(b)))
    want = np.linalg.solve(np.kron(La, Lb), b)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_kron_chol_solve(rng):
    Ka = _random_spd(rng, 4)
    Kb = _random_spd(rng, 3)
    La = np.linalg.cholesky(Ka)
    Lb = np.linalg.cholesky(Kb)
    b = rng.randn(12, 1)
    got = np.asarray(linalg.kron_chol_solve([jnp.asarray(La), jnp.asarray(Lb)], jnp.asarray(b)))
    want = np.linalg.solve(np.kron(Ka, Kb), b)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_diag_of_inv_from_chol(rng):
    K = _random_spd(rng, 7)
    L = np.linalg.cholesky(K)
    got = np.asarray(linalg.diag_of_inv_from_chol(jnp.asarray(L)))
    want = np.diag(np.linalg.inv(K))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_kron_diag(rng):
    d1, d2, d3 = rng.rand(3), rng.rand(4), rng.rand(2)
    got = np.asarray(linalg.kron_diag([jnp.asarray(d) for d in (d1, d2, d3)]))
    want = np.diag(np.kron(np.kron(np.diag(d1), np.diag(d2)), np.diag(d3)))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_kron_logdet(rng):
    Ka = _random_spd(rng, 4)
    Kb = _random_spd(rng, 5)
    Ls = [jnp.asarray(np.linalg.cholesky(K)) for K in (Ka, Kb)]
    got = float(linalg.kron_logdet_from_chols(Ls))
    want = np.linalg.slogdet(np.kron(Ka, Kb))[1]
    np.testing.assert_allclose(got, want, rtol=1e-10)
