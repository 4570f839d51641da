"""Independent numpy oracles of the reference math, used to verify the JAX
implementation. These re-derive each formula from the reference's definitions
(cited per function) in plain numpy — dense, no factorization tricks — so a
factored TPU implementation agreeing with them to fp tolerance is implementing
the same math.
"""

from __future__ import annotations

import numpy as np
from scipy.linalg import cho_factor, cho_solve, cholesky, solve_triangular


class SEKernelNp:
    """ARD squared-exponential, mirroring onofftf/utils.py:26-58 (kernse_np)."""

    def __init__(self, lengthscales, variance):
        self.lengthscales = np.asarray(lengthscales, dtype=np.float64)
        self.variance = float(variance)

    def square_dist(self, X, X2=None):
        X = X / self.lengthscales
        Xs = np.sum(X**2, 1)
        if X2 is None:
            return -2 * X @ X.T + Xs[:, None] + Xs[None, :]
        X2 = X2 / self.lengthscales
        X2s = np.sum(X2**2, 1)
        return -2 * X @ X2.T + Xs[:, None] + X2s[None, :]

    def K(self, X, X2=None):
        return self.variance * np.exp(-self.square_dist(X, X2) / 2)

    def Kdiag(self, X):
        return np.full(X.shape[0], self.variance)


def gauss_kl_dense(q_mu, q_sqrt, K=None):
    """KL oracle following onofftf/main.py:187-252 (sans its internal jitter)."""
    q_mu = np.asarray(q_mu, dtype=np.float64)
    q_sqrt = np.asarray(q_sqrt, dtype=np.float64)
    white = K is None
    if not white:
        Lp = cholesky(K, lower=True)
        alpha = solve_triangular(Lp, q_mu, lower=True)
    else:
        alpha = q_mu

    if q_sqrt.ndim == 2:
        diag = True
        num_latent = q_sqrt.shape[1]
        NM = q_sqrt.size
        Lq_diag = q_sqrt
    else:
        diag = False
        num_latent = q_sqrt.shape[2]
        NM = q_sqrt.shape[0] * num_latent
        Lq = np.tril(np.transpose(q_sqrt, (2, 0, 1)))
        Lq_diag = np.array([np.diag(Lq[k]) for k in range(num_latent)])

    mahalanobis = np.sum(alpha**2)
    constant = -float(NM)
    logdet_qcov = np.sum(np.log(Lq_diag**2))

    if white:
        trace = np.sum(q_sqrt**2) if diag else np.sum(Lq**2)
    else:
        if diag:
            Kinv = cho_solve(cho_factor(K, lower=True), np.eye(K.shape[0]))
            trace = np.sum(np.diag(Kinv)[:, None] * q_sqrt**2)
        else:
            trace = 0.0
            for k in range(num_latent):
                LpiLq = solve_triangular(Lp, Lq[k], lower=True)
                trace += np.sum(LpiLq**2)

    twoKL = mahalanobis + constant - logdet_qcov + trace
    if not white:
        twoKL += num_latent * np.sum(np.log(np.diag(Lp) ** 2))
    return 0.5 * twoKL


def gauss_kl_kron_dense(q_mu, q_sqrt_diag, K_factors):
    """Kron-KL oracle following GaussKLkron (onofftf/main.py:350-387):
    dense kron of the factor Choleskys."""
    Lp_factors = [cholesky(Kp, lower=True) for Kp in K_factors]
    Lp = Lp_factors[0]
    for L in Lp_factors[1:]:
        Lp = np.kron(Lp, L)
    alpha = solve_triangular(Lp, q_mu, lower=True)
    NM = q_sqrt_diag.size
    mahalanobis = np.sum(alpha**2)
    constant = -float(NM)
    logdet_qcov = np.sum(np.log(q_sqrt_diag**2))
    M = Lp.shape[0]
    Lp_inv = solve_triangular(Lp, np.eye(M), lower=True)
    K_inv = solve_triangular(Lp.T, Lp_inv, lower=False)
    trace = np.sum(np.diag(K_inv)[:, None] * q_sqrt_diag**2)
    prior_logdet = np.sum(np.log(np.diag(Lp) ** 2))
    return 0.5 * (mahalanobis + constant - logdet_qcov + trace + prior_logdet)


def conditional_dense(Xnew, Z, kern, f, q_sqrt=None, whiten=False, jitter=1e-6, full_cov=False):
    """Conditional oracle following GPConditional (onofftf/main.py:257-305)."""
    M = Z.shape[0]
    Kmn = kern.K(Z, Xnew)
    Kmm = kern.K(Z) + np.eye(M) * jitter
    Lm = cholesky(Kmm, lower=True)
    A = solve_triangular(Lm, Kmn, lower=True)
    if full_cov:
        fvar = kern.K(Xnew) - A.T @ A
    else:
        fvar = kern.Kdiag(Xnew) - np.sum(A**2, 0)
    if not whiten:
        A = solve_triangular(Lm.T, A, lower=False)
    fmean = A.T @ f
    L = f.shape[1]
    if q_sqrt is not None:
        if q_sqrt.ndim == 2:
            out = []
            for k in range(L):
                LTA = A * q_sqrt[:, k : k + 1]
                out.append(fvar + np.sum(LTA**2, 0) if not full_cov else fvar + LTA.T @ LTA)
            fvar = np.stack(out, -1)
        else:
            out = []
            for k in range(L):
                Lq = np.tril(q_sqrt[:, :, k])
                LTA = Lq.T @ A
                out.append(fvar + np.sum(LTA**2, 0) if not full_cov else fvar + LTA.T @ LTA)
            fvar = np.stack(out, -1)
    else:
        fvar = np.stack([fvar] * L, -1)
    return fmean, fvar


def kron_inf_dense(Xnew, kerns, Zs, q_mu, q_sqrt_diag, masks, jitter=1e-5):
    """Kron conditional oracle following the reference's *vectorized* variant
    (scripts/onoff.py:186-213): explicit per-factor matrix inverses, dense
    kron of the inverses, dense M×B cross-gram, diag of B×B products."""
    Kmm = [kerns[p].K(Zs[p]) + np.eye(Zs[p].shape[0]) * jitter for p in range(len(Zs))]
    Kmm_inv = [np.linalg.inv(K) for K in Kmm]
    Kmm_inv_kron = Kmm_inv[0]
    for Ki in Kmm_inv[1:]:
        Kmm_inv_kron = np.kron(Kmm_inv_kron, Ki)
    alpha = Kmm_inv_kron @ q_mu

    B = Xnew.shape[0]
    Knn = np.ones((B, 1))
    Kmn_factors = []
    for p in range(len(Zs)):
        xp = Xnew[:, masks[p]]
        Knn *= kerns[p].Kdiag(xp).reshape(B, 1)
        Kmn_factors.append(kerns[p].K(Zs[p], xp))

    # dense kron-structured Kmn: rows ordered (i1, i2) row-major
    Kmn = Kmn_factors[0][:, None, :] * Kmn_factors[1][None, :, :]
    Kmn = Kmn.reshape(-1, B)

    S = np.diag((q_sqrt_diag**2).reshape(-1))
    A = Kmm_inv_kron @ Kmn
    mu = Kmn.T @ alpha
    var = Knn - np.diag(Kmn.T @ A - A.T @ S @ A).reshape(-1, 1)
    return mu, var


def probit_expectations_np(gmean, gvar):
    """Probit-gate oracle following OnOffSVGP.py:168-204."""
    from scipy.special import erf

    def normcdf(x):
        return 0.5 * (1.0 + erf(x / np.sqrt(2.0))) * (1.0 - 2e-3) + 1e-3

    def owent(h, a):
        h = np.abs(h)
        return (np.arctan(a) / (2 * np.pi)) * np.exp(-0.5 * h**2 * (a**2 + 1))

    z = gmean / np.sqrt(1.0 + gvar)
    a = 1.0 / np.sqrt(1.0 + 2 * gvar)
    cdfz = normcdf(z)
    tz = owent(z, a)
    pgmean = cdfz
    pgmeansq = cdfz - 2 * tz
    pgvar = cdfz - 2 * tz - cdfz**2
    pgmeansq = (pgmeansq + np.abs(pgmeansq)) / 2
    pgvar = (pgvar + np.abs(pgvar)) / 2
    return pgmean, pgmeansq, pgvar


def onoff_elbo_dense(X, Y, kernf, kerng, Zf, Zg, u_fm, u_gm, u_fs, u_gs, noisevar,
                     num_data, jitter=1e-6):
    """Full dense OnOffSVGP ELBO oracle (build_likelihood, OnOffSVGP.py:107-122)."""
    Kfmm = kernf.K(Zf) + np.eye(Zf.shape[0]) * jitter
    Kgmm = kerng.K(Zg) + np.eye(Zg.shape[0]) * jitter
    kl = gauss_kl_dense(u_fm, u_fs, Kfmm) + gauss_kl_dense(u_gm, u_gs, Kgmm)

    fmean, fvar = conditional_dense(X, Zf, kernf, u_fm, q_sqrt=u_fs, jitter=jitter)
    gmean, gvar = conditional_dense(X, Zg, kerng, u_gm, q_sqrt=u_gs, jitter=jitter)
    ephi, ephi2, varphi = probit_expectations_np(gmean, gvar)
    gfmean = ephi * fmean
    gfvar = ephi2 * fvar
    gfmeanu = varphi * fmean**2
    var_exp = (
        -0.5 * np.log(2 * np.pi)
        - 0.5 * np.log(noisevar)
        - 0.5 * ((Y - gfmean) ** 2 + gfvar + gfmeanu) / noisevar
    )
    scale = num_data / X.shape[0]
    return np.sum(var_exp) * scale - kl
