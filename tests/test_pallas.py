"""Pallas kernels in interpret mode vs XLA references (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zigp_tpu.ops.pallas import batched_small_cholesky, kron_mv_2, rbf_gram, small_cholesky
from zigp_tpu.ops.kernels import RBF


def _xla_gram(X, Z, ell, var):
    Xs = X / ell
    Zs = Z / ell
    d = np.sum((Xs[:, None, :] - Zs[None, :, :]) ** 2, -1)
    return var * np.exp(-0.5 * d)


def test_rbf_gram_matches_xla(rng):
    X = rng.randn(70, 3).astype(np.float32)
    Z = rng.randn(33, 3).astype(np.float32)
    ell = np.array([0.7, 1.3, 2.0], dtype=np.float32)
    got = np.asarray(rbf_gram(jnp.asarray(X), jnp.asarray(Z), jnp.asarray(ell), 1.7, True))
    want = _xla_gram(X.astype(np.float64), Z.astype(np.float64), ell.astype(np.float64), 1.7)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_rbf_gram_large_coordinates_stay_accurate(rng):
    # the f32 killer case: coordinates ~5, lengthscale 0.005
    X = (4.368 + 1.079 * rng.rand(40, 1)).astype(np.float32)
    Z = np.linspace(4.368, 5.447, 25, dtype=np.float32)[:, None]
    ell = np.array([0.005], dtype=np.float32)
    got = np.asarray(rbf_gram(jnp.asarray(X), jnp.asarray(Z), jnp.asarray(ell), 20.0, True))
    want = _xla_gram(X.astype(np.float64), Z.astype(np.float64), np.float64(0.005), 20.0)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_rbf_gram_gradients_match_xla(rng):
    X = rng.randn(12, 2)
    Z = rng.randn(7, 2)
    ell = np.array([0.9, 1.4])
    var = 1.3

    def loss_pallas(X, Z, ell, var):
        return jnp.sum(jnp.sin(rbf_gram(X, Z, ell, var, True)))

    def loss_xla(X, Z, ell, var):
        Xs = X / ell
        Zs = Z / ell
        d = jnp.sum((Xs[:, None, :] - Zs[None, :, :]) ** 2, -1)
        return jnp.sum(jnp.sin(var * jnp.exp(-0.5 * d)))

    args = (jnp.asarray(X), jnp.asarray(Z), jnp.asarray(ell), jnp.asarray(var))
    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_small_cholesky(rng):
    n = 24
    A = rng.randn(n, n)
    K = (A @ A.T + n * np.eye(n)).astype(np.float32)
    L = np.asarray(small_cholesky(jnp.asarray(K), interpret=True))
    np.testing.assert_allclose(L @ L.T, K, rtol=1e-4, atol=1e-3)
    assert np.allclose(L, np.tril(L))


def test_batched_small_cholesky(rng):
    B, n = 5, 16
    Ks = []
    for _ in range(B):
        A = rng.randn(n, n)
        Ks.append(A @ A.T + n * np.eye(n))
    Ks = np.stack(Ks).astype(np.float32)
    Ls = np.asarray(batched_small_cholesky(jnp.asarray(Ks), interpret=True))
    for b in range(B):
        np.testing.assert_allclose(Ls[b] @ Ls[b].T, Ks[b], rtol=1e-4, atol=1e-3)


def test_kron_mv_2(rng):
    A = rng.randn(6, 6).astype(np.float32)
    B = rng.randn(9, 9).astype(np.float32)
    x = rng.randn(54).astype(np.float32)
    got = np.asarray(kron_mv_2(jnp.asarray(A), jnp.asarray(B), jnp.asarray(x), interpret=True))
    want = np.kron(A, B) @ x
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_small_cholesky_nan_on_non_psd(rng):
    """A non-PSD input must poison the factor with NaN (like
    lax.linalg.cholesky), never silently return garbage."""
    A = np.eye(8, dtype=np.float32)
    A[5, 5] = -1.0  # negative pivot
    L = np.asarray(small_cholesky(jnp.asarray(A), interpret=True))
    assert np.isnan(L[5:, 5:]).any()
    # PSD inputs stay exact
    B = rng.randn(8, 8)
    K = (B @ B.T + 8 * np.eye(8)).astype(np.float32)
    L = np.asarray(small_cholesky(jnp.asarray(K), interpret=True))
    np.testing.assert_allclose(L @ L.T, K, rtol=2e-5, atol=1e-4)


# ---------------------------------------------------------------------------
# chol_inv: the fused Cholesky + triangular-inverse kernel and its
# matmul-only custom VJP (the train step's solve-elimination fast path)
# ---------------------------------------------------------------------------


def _spd(rng, shape):
    *batch, n, _ = shape
    A = rng.randn(*batch, n, n)
    return A @ np.swapaxes(A, -1, -2) + n * np.eye(n)


def test_chol_inv_pallas_matches_numpy(rng):
    from zigp_tpu.ops.pallas.chol_inv import chol_inv_pallas

    for n in (5, 8, 10, 100):
        K = _spd(rng, (2, n, n))
        L, Linv = chol_inv_pallas(jnp.asarray(K, jnp.float32), interpret=True)
        L0 = np.linalg.cholesky(K)
        Li0 = np.linalg.inv(L0)
        np.testing.assert_allclose(np.asarray(L), L0, rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(Linv), Li0, rtol=2e-4, atol=1e-4)


def test_chol_inv_pallas_nan_on_non_psd():
    from zigp_tpu.ops.pallas.chol_inv import chol_inv_pallas

    K = np.eye(12, dtype=np.float32)[None]
    K[0, 7, 7] = -1.0
    L, Linv = chol_inv_pallas(jnp.asarray(K), interpret=True)
    assert np.isnan(np.asarray(L)[0, 7:, 7:]).any()
    assert np.isnan(np.asarray(Linv)[0, 7:, :]).any()


def test_chol_inv_custom_vjp_matches_ad(rng):
    """The matmul-only backward must match jax AD of the chol+solve composite
    exactly — this is what keeps model gradients parity-correct after the
    solve-elimination rewrite."""
    from zigp_tpu.ops import linalg

    def ref(K):
        L = jnp.linalg.cholesky(K)
        eye = jnp.eye(K.shape[-1], dtype=K.dtype)
        return L, jax.scipy.linalg.solve_triangular(L, eye, lower=True)

    n = 9
    K = jnp.asarray(_spd(rng, (n, n)))
    dL = jnp.asarray(rng.randn(n, n))
    dLinv = jnp.asarray(rng.randn(n, n))
    _, vjp_ref = jax.vjp(ref, K)
    _, vjp_cus = jax.vjp(linalg.chol_inv, K)
    (g_ref,) = vjp_ref((dL, dLinv))
    (g_cus,) = vjp_cus((dL, dLinv))
    np.testing.assert_allclose(np.asarray(g_cus), np.asarray(g_ref), rtol=1e-9, atol=1e-12)


def test_chol_inv_end_to_end_grads_through_gram(rng):
    """Grads w.r.t. inducing locations through gram -> chol_inv -> downstream
    math match plain AD (the real acceptance check for the rewrite)."""
    from zigp_tpu.ops import linalg

    def build(Z):
        d = jnp.sum((Z[:, None, :] - Z[None, :, :]) ** 2, -1)
        return jnp.exp(-0.5 * d) + 0.1 * jnp.eye(Z.shape[0])

    def f_cus(Z):
        L, Linv = linalg.chol_inv(build(Z))
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(jnp.square(Linv @ Z))

    def f_ref(Z):
        Kz = build(Z)
        L = jnp.linalg.cholesky(Kz)
        V = jax.scipy.linalg.solve_triangular(L, Z, lower=True)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(jnp.square(V))

    Z = jnp.asarray(rng.randn(7, 2))
    np.testing.assert_allclose(float(f_cus(Z)), float(f_ref(Z)), rtol=1e-10)
    g1 = jax.grad(f_cus)(Z)
    g2 = jax.grad(f_ref)(Z)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8, atol=1e-10)


def test_chol_inv_vmap(rng):
    from zigp_tpu.ops import linalg

    Kb = jnp.asarray(_spd(rng, (3, 6, 6)))
    L, Linv = jax.vmap(linalg.chol_inv)(Kb)
    for i in range(3):
        L0 = np.linalg.cholesky(np.asarray(Kb[i]))
        np.testing.assert_allclose(np.asarray(L[i]), L0, rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(np.asarray(Linv[i]), np.linalg.inv(L0), rtol=1e-8, atol=1e-9)


def test_chol_inv_blocked_matches_numpy(rng):
    """Two-level blocked kernel (VERDICT r2 #2): diagonal blocks via the
    sequential rank-2 kernel, panels/updates/back-substitution via exact-f32
    matmuls — parity at the scale config's n=250 and friends."""
    from zigp_tpu.ops.pallas.chol_inv import chol_inv_blocked

    # 200 = the champion grid's temporal factor (ragged adaptive 104+96);
    # 250 = the scale config's (128+122); 256 divides evenly; 130/300 odd
    for n in (130, 200, 250, 256, 300):
        K = _spd(rng, (2, n, n))
        L, Linv = chol_inv_blocked(jnp.asarray(K, jnp.float32), interpret=True)
        L0 = np.linalg.cholesky(K)
        Li0 = np.linalg.inv(L0)
        np.testing.assert_allclose(np.asarray(L), L0, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(Linv), Li0, rtol=2e-4, atol=2e-4)
        # strict lower-triangularity of both outputs (identity-tail unpadding)
        assert np.allclose(np.triu(np.asarray(L), 1), 0.0)
        assert np.allclose(np.triu(np.asarray(Linv), 1), 0.0)


def test_chol_inv_blocked_single_block_consistent(rng):
    """n <= nb degenerates to the plain kernel."""
    from zigp_tpu.ops.pallas.chol_inv import chol_inv_blocked, chol_inv_pallas

    K = jnp.asarray(_spd(rng, (3, 64, 64)), jnp.float32)
    La, Lia = chol_inv_blocked(K, interpret=True)
    Lb, Lib = chol_inv_pallas(K, interpret=True)
    np.testing.assert_allclose(np.asarray(La), np.asarray(Lb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(Lia), np.asarray(Lib), rtol=1e-6)


# ---------------------------------------------------------------------------
# round-3 experimental solve-free alternatives (measured A/B losers, kept
# with tests as the record — see ops/pallas/__init__.py for the numbers)
# ---------------------------------------------------------------------------


def test_chol_pallas_l_only_matches_numpy(rng):
    from zigp_tpu.ops.pallas.chol_inv import chol_pallas

    for n in (10, 100, 105):
        for rank in (2, 4, 8):
            K = _spd(rng, (2, n, n))
            L = chol_pallas(jnp.asarray(K, jnp.float32), interpret=True, rank=rank)
            L0 = np.linalg.cholesky(K)
            np.testing.assert_allclose(np.asarray(L), L0, rtol=2e-4, atol=1e-4)


def test_tri_inv_newton_matches_inverse(rng):
    from zigp_tpu.ops.pallas.chol_inv import tri_inv_newton

    for n in (1, 10, 100, 128):
        L = np.linalg.cholesky(_spd(rng, (2, n, n))).astype(np.float32)
        X = np.asarray(tri_inv_newton(jnp.asarray(L)))
        np.testing.assert_allclose(X, np.linalg.inv(L.astype(np.float64)), rtol=2e-4, atol=1e-4)
        assert np.allclose(np.triu(X, 1), 0.0)


def test_tri_inv_newton_overflows_on_dense_temporal_gram():
    """The documented disqualifier: the Cholesky factor of a tightly-spaced
    1-D RBF gram (the pptr temporal-factor shape) has a bounded inverse,
    but tri_inv_newton's truncated-Neumann intermediates only cancel at
    full depth and overflow f32 at the last squarings. tri_inv_dc inverts
    the same factor fine."""
    from zigp_tpu.ops.pallas.chol_inv import tri_inv_dc, tri_inv_newton

    n = 256
    x = np.linspace(0, 1, n)[:, None]
    K = 20.0 * np.exp(-0.5 * (x - x.T) ** 2 / 0.1**2)
    K += (1e-5 + 2e-4 * 20.0) * np.eye(n)
    L = np.linalg.cholesky(K.astype(np.float64)).astype(np.float32)
    Xn = np.asarray(tri_inv_newton(jnp.asarray(L)))
    assert not np.isfinite(Xn).all()
    Xd = np.asarray(tri_inv_dc(jnp.asarray(L)))
    ref = np.linalg.inv(L.astype(np.float64))
    assert np.isfinite(Xd).all()
    assert np.max(np.abs(Xd - ref)) / np.max(np.abs(ref)) < 1e-3


def test_tri_inv_dc_matches_inverse(rng):
    from zigp_tpu.ops.pallas.chol_inv import tri_inv_dc

    for n in (1, 2, 3, 10, 100, 105, 128, 250):
        L = np.linalg.cholesky(_spd(rng, (2, n, n))).astype(np.float32)
        X = np.asarray(tri_inv_dc(jnp.asarray(L)))
        np.testing.assert_allclose(X, np.linalg.inv(L.astype(np.float64)), rtol=2e-4, atol=1e-4)
        assert np.allclose(np.triu(X, 1), 0.0)
