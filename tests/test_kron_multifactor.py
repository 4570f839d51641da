"""Kronecker conditional and KL with P=3 factors (the reference only ever
uses P=2; the framework supports arbitrary factorizations)."""

import numpy as np
import jax.numpy as jnp

from zigp_tpu.ops import conditionals, gauss_kl
from zigp_tpu.ops.kernels import RBF
from .oracles import SEKernelNp


def _dense_kron_conditional_oracle(X, oracles, Zs, q_mu, q_sqrt, masks, jitter):
    """P-factor dense oracle: build the full kron matrices explicitly."""
    P = len(Zs)
    Kmms = [oracles[p].K(Zs[p]) + np.eye(Zs[p].shape[0]) * jitter for p in range(P)]
    Kinv = np.linalg.inv(Kmms[0])
    for Kp in Kmms[1:]:
        Kinv = np.kron(Kinv, np.linalg.inv(Kp))
    B = X.shape[0]
    Knn = np.ones(B)
    Kmn = np.ones((1, B))
    for p in range(P):
        xp = X[:, masks[p]]
        Knn *= oracles[p].Kdiag(xp)
        Kp = oracles[p].K(Zs[p], xp)
        Kmn = (Kmn[:, None, :] * Kp[None, :, :]).reshape(-1, B)
    alpha = Kinv @ q_mu
    A = Kinv @ Kmn
    mu = Kmn.T @ alpha
    S = (q_sqrt**2).reshape(-1)
    var = Knn - np.einsum("mb,mb->b", Kmn, A) + np.einsum("mb,m,mb->b", A, S, A)
    return mu, var[:, None]


def test_three_factor_kron_conditional(rng):
    sizes = [3, 4, 5]
    dims = [2, 1, 1]
    Zs = [rng.rand(s, d) for s, d in zip(sizes, dims)]
    masks = [(0, 1), (2,), (3,)]
    X = rng.rand(13, 4)
    M = int(np.prod(sizes))
    q_mu = rng.randn(M, 1) * 0.2
    q_sqrt = np.abs(rng.randn(M, 1)) + 0.4

    # short lengthscales keep the factor grams well-conditioned so the
    # dense-inverse oracle and the Cholesky path agree to fp precision
    ells = [[0.3, 0.25], [0.15], [0.2]]
    vars_ = [1.3, 0.9, 1.8]
    ks = [RBF.create(e, v) for e, v in zip(ells, vars_)]
    oracles = [SEKernelNp(np.array(e), v) for e, v in zip(ells, vars_)]

    got_mu, got_var = conditionals.kron_conditional(
        jnp.asarray(X), ks, [jnp.asarray(Z) for Z in Zs],
        jnp.asarray(q_mu), jnp.asarray(q_sqrt), masks, jitter=1e-6,
    )
    want_mu, want_var = _dense_kron_conditional_oracle(
        X, oracles, Zs, q_mu, q_sqrt, [np.array(m) for m in masks], 1e-6
    )
    np.testing.assert_allclose(np.asarray(got_mu), want_mu, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got_var), want_var, rtol=1e-6, atol=1e-9)


def test_three_factor_whitened_consistency(rng):
    """Whitened and unwhitened must agree when v = L^T alpha-mapped params."""
    sizes = [2, 3, 4]
    Zs = [rng.rand(s, 1) for s in sizes]
    masks = [(0,), (1,), (2,)]
    X = rng.rand(9, 3)
    M = int(np.prod(sizes))
    u_m = rng.randn(M, 1) * 0.2
    ks = [RBF.create([0.8], 1.0), RBF.create([0.6], 1.2), RBF.create([0.9], 0.7)]

    # unwhitened with (u_m, s) vs whitened with v_m = L^-1 u_m and the same
    # *whitened* diag std: means must match exactly; variances differ because
    # diag-in-u vs diag-in-v are different families — test the mean only.
    from zigp_tpu.ops import linalg

    Kmms = [linalg.add_jitter(k.K(jnp.asarray(Z)), 1e-6) for k, Z in zip(ks, Zs)]
    Ls = [linalg.cholesky(K) for K in Kmms]
    v_m = linalg.kron_solve_lower(Ls, jnp.asarray(u_m))

    s = np.ones((M, 1))
    mu_u, _ = conditionals.kron_conditional(
        jnp.asarray(X), ks, [jnp.asarray(Z) for Z in Zs],
        jnp.asarray(u_m), jnp.asarray(s), masks, jitter=1e-6, whiten=False,
    )
    mu_w, _ = conditionals.kron_conditional(
        jnp.asarray(X), ks, [jnp.asarray(Z) for Z in Zs],
        v_m, jnp.asarray(s), masks, jitter=1e-6, whiten=True,
    )
    np.testing.assert_allclose(np.asarray(mu_w), np.asarray(mu_u), rtol=1e-6, atol=1e-9)
