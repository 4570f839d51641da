"""Whitened Kronecker parameterization: must define the same posterior as the
unwhitened one under the change of variables u = (⊗L_p) v."""

import numpy as np
import jax.numpy as jnp

from zigp_tpu.likelihoods import Gaussian
from zigp_tpu.models import KronGP, KronSVGP
from zigp_tpu.ops import linalg
from zigp_tpu.ops.kernels import RBF


def _setup(rng, whiten, q_v, q_s):
    Zs = [rng.rand(4, 2), rng.rand(6, 1)]
    ks = [RBF.create([1.0, 1.0], 1.5), RBF.create([0.3], 2.0)]
    gp = KronGP.create(ks, Zs, jitter=1e-8, whiten=whiten)
    gp = gp.replace(
        q_mu=gp.q_mu.replace(raw=jnp.asarray(q_v)),
        q_sqrt=gp.q_sqrt.replace_value(jnp.asarray(q_s)),
    )
    return gp


def test_whitened_matches_unwhitened_posterior(rng):
    M = 24
    v_m = rng.randn(M, 1) * 0.3
    v_s = np.abs(rng.randn(M, 1)) * 0.2 + 0.5

    gp_w = _setup(rng, True, v_m, v_s)
    # same posterior in unwhitened coords: u_m = L v_m, S_u = L diag(v_s²) Lᵀ.
    # Our unwhitened KronGP only supports diag S, so compare mean and the
    # *full* predictive density via the whitened path against a dense oracle.
    Ls = [np.linalg.cholesky(np.asarray(K)) for K in gp_w.gram_factors()]
    Lfull = np.kron(Ls[0], Ls[1])
    u_m = Lfull @ v_m

    X = rng.rand(15, 3)
    mu_w, var_w = gp_w.predict_f(jnp.asarray(X))

    # dense oracle of the whitened predictive:
    # mean = Kmnᵀ L⁻ᵀ v_m ; var = Knn − diag(KmnᵀK⁻¹Kmn) + diag((L⁻¹Kmn)ᵀ S (L⁻¹Kmn))
    k_s = lambda A, B: 1.5 * np.exp(
        -0.5 * np.sum((A[:, None, :] - B[None, :, :]) ** 2 / np.array([1.0, 1.0]) ** 2, -1)
    )
    k_t = lambda A, B: 2.0 * np.exp(-0.5 * (A[:, None, 0] - B[None, :, 0]) ** 2 / 0.3**2)
    Zs_np = [np.asarray(p.value) for p in gp_w.Zs]
    Kmn = (k_s(Zs_np[0], X[:, :2])[:, None, :] * k_t(Zs_np[1], X[:, 2:])[None, :, :]).reshape(24, 15)
    Vm = np.linalg.solve(Lfull, Kmn)
    mean_oracle = Vm.T @ v_m
    Knn = 1.5 * 2.0 * np.ones(15)
    var_oracle = Knn - np.sum(Vm**2, 0) + np.sum((v_s**2) * Vm**2, 0)

    # lengthscale params go through softplus roundtrip -> 1e-8-level tolerance
    np.testing.assert_allclose(np.asarray(mu_w)[:, 0], mean_oracle[:, 0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var_w)[:, 0], var_oracle, rtol=1e-6)

    # whitened KL equals dense KL of N(u_m, L S Lᵀ) from N(0, K)
    from zigp_tpu.ops import gauss_kl as gkl
    from .oracles import gauss_kl_dense

    kl_w = float(gp_w.prior_kl())
    Kfull = Lfull @ Lfull.T
    S_u = Lfull @ np.diag(v_s[:, 0] ** 2) @ Lfull.T
    Lq = np.linalg.cholesky(S_u)
    want = gauss_kl_dense(u_m, Lq[:, :, None], Kfull)
    np.testing.assert_allclose(kl_w, want, rtol=1e-6)


def test_whitened_training_decreases_loss(rng):
    N = 60
    X = np.concatenate([rng.rand(N, 2), rng.rand(N, 1)], axis=1)
    Y = np.sin(5 * X[:, 2:3]) + 0.1 * rng.randn(N, 1)
    Zs = [rng.rand(3, 2), np.linspace(0, 1, 6)[:, None]]
    ks = [RBF.create([1.0, 1.0], 1.0), RBF.create([0.3], 1.0)]
    model = KronSVGP.create(ks, Zs, Gaussian.create(0.1), num_data=N, jitter=1e-6, whiten=True)
    from zigp_tpu.training import DataSet, fit

    first = float(model.loss(jnp.asarray(X), jnp.asarray(Y)))
    res = fit(model, DataSet(X, Y), num_iter=60, batch_size=N, learning_rate=0.05, log_every=0)
    assert float(res.model.loss(jnp.asarray(X), jnp.asarray(Y))) < first - 1.0
