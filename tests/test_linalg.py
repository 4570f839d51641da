import pytest
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


def test_add_jitter_f32_masked_diag_mean_matches_direct(rng):
    """The relative-f32 jitter uses a masked-sum diagonal mean (layout-safe,
    see the comment in linalg.add_jitter); it must equal the direct
    mean-of-diagonal formulation, batched and unbatched."""
    from zigp_tpu.ops import linalg

    for shape in ((7, 7), (3, 7, 7)):
        K = np.asarray(rng.randn(*shape), np.float32)
        K = K @ np.swapaxes(K, -1, -2) + 7 * np.eye(7, dtype=np.float32)
        got = np.asarray(linalg.add_jitter(jnp.asarray(K), 1e-5))
        mean_diag = np.mean(np.diagonal(K, axis1=-2, axis2=-1), axis=-1)
        want = K + (1e-5 + 2e-4 * mean_diag)[..., None, None] * np.eye(7, dtype=np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_add_jitter_f64_parity_path_unchanged(rng):
    from zigp_tpu.ops import linalg

    K = np.asarray(rng.randn(5, 5))
    K = K @ K.T + 5 * np.eye(5)
    got = np.asarray(linalg.add_jitter(jnp.asarray(K, jnp.float64), 1e-4))
    np.testing.assert_allclose(got, K + 1e-4 * np.eye(5), rtol=0, atol=0)


def test_chol_inv_stacked_matches_per_factor(rng):
    """Padded-stacked factorization (experimental, measured slower in the
    step — linalg.chol_inv_stacked docstring) must still be numerically
    exact vs per-factor chol_inv."""
    from zigp_tpu.ops import linalg

    Ks = []
    for n in (4, 9):
        A = rng.randn(2, n, n)
        Ks.append(jnp.asarray(A @ np.swapaxes(A, -1, -2) + n * np.eye(n)))
    pairs = linalg.chol_inv_stacked(Ks)
    for K, (L, Li) in zip(Ks, pairs):
        L0, Li0 = linalg.chol_inv(K)
        np.testing.assert_allclose(np.asarray(L), np.asarray(L0), rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(np.asarray(Li), np.asarray(Li0), rtol=1e-8, atol=1e-9)


def test_set_solve_precision_switches_hdot_and_restores():
    """The solve-precision knob (measured study in RESULTS.md) must change
    the precision recorded on hdot's dot at trace time, reject unknown
    names, and restore the exact-f32 default."""
    import jax
    from zigp_tpu.ops import linalg

    a = jnp.ones((3, 3), jnp.float32)

    def prec_of(dot=None):
        # fresh callable per trace: jax caches traces on the function object,
        # so tracing linalg.hdot itself twice would replay the first jaxpr
        dot = dot or linalg.hdot
        jaxpr = jax.make_jaxpr(lambda x, y: dot(x, y))(a, a)
        (eqn,) = [e for e in jaxpr.eqns if e.primitive.name == "dot_general"]
        return eqn.params["precision"]

    HI = (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST)
    MID = (jax.lax.Precision.HIGH, jax.lax.Precision.HIGH)
    assert prec_of() == HI and prec_of(linalg.bdot) == HI
    try:
        linalg.set_solve_precision("high")
        assert prec_of() == MID and prec_of(linalg.bdot) == MID
        # mixed: factor-space ops stay exact-f32, batch-scaled projections
        # drop to 3-pass
        linalg.set_solve_precision("mixed")
        assert prec_of() == HI and prec_of(linalg.bdot) == MID
        with pytest.raises(KeyError):
            linalg.set_solve_precision("default")  # deliberately unsupported
    finally:
        linalg.set_solve_precision("highest")
    assert prec_of() == HI and prec_of(linalg.bdot) == HI
