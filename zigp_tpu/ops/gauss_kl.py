"""KL(q(u) ‖ p(u)) between a Gaussian posterior and a (possibly
Kronecker-structured) Gaussian prior.

Re-design of the reference's ``GaussKL`` (onofftf/main.py:187-252, itself a
copy of gpflow-0.4 ``kullback_leiblers``) and ``GaussKLkron``
(onofftf/main.py:350-387). Supports white/non-white priors × diagonal/full
``q_sqrt``.

The Kronecker variant never materializes the (Π M_p)² prior: the Mahalanobis
term uses factored triangular solves, the trace term uses
``diag((⊗K_p)⁻¹) = ⊗ diag(K_p⁻¹)``, and the prior log-determinant is a sum of
factor log-determinants — all O(Σ M_p³) instead of the reference's dense
O((Π M_p)³) Cholesky of ``tf_kron`` output.

Note: the reference's ``GaussKL`` adds a 1e-4 jitter *inside* the KL
(onofftf/main.py:199) while the gpflow path jitters at gram construction
(onoffgpf/OnOffSVGP.py:96) — a train/predict inconsistency. Here jitter is
applied exactly once, by the caller, when building K.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from . import linalg


def gauss_kl(
    q_mu: jnp.ndarray,
    q_sqrt: jnp.ndarray,
    K: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """KL(N(q_mu, S) ‖ N(0, K)), K=None meaning a white (identity) prior.

    q_mu: (M, L). q_sqrt: (M, L) diagonal standard deviations, or (M, M, L)
    lower-triangular factors (gpflow-0.4 layout; upper triangle ignored).
    """
    white = K is None
    if white:
        alpha = q_mu
    else:
        Lp = linalg.cholesky(K)
        alpha = linalg.tri_solve(Lp, q_mu, lower=True)

    if q_sqrt.ndim == 2:
        diag = True
        num_latent = q_sqrt.shape[1]
        Lq_diag = q_sqrt
    elif q_sqrt.ndim == 3:
        diag = False
        num_latent = q_sqrt.shape[2]
        Lq = jnp.tril(jnp.transpose(q_sqrt, (2, 0, 1)))  # (L, M, M)
        Lq_diag = linalg.masked_diag(Lq)  # layout-safe diag, see linalg
    else:
        raise ValueError(f"Bad q_sqrt ndim: {q_sqrt.ndim}")

    mahalanobis = jnp.sum(jnp.square(alpha))
    # NM: number of (inducing, latent) pairs — matches tf.size(q_sqrt) for the
    # diag case and M·L for the full case (onofftf/main.py:206,211).
    NM = q_sqrt.size if diag else q_sqrt.shape[0] * num_latent
    constant = -jnp.asarray(NM, dtype=q_mu.dtype)
    logdet_qcov = jnp.sum(jnp.log(jnp.square(Lq_diag)))

    if white:
        trace = jnp.sum(jnp.square(q_sqrt if diag else Lq))
    else:
        if diag:
            Kinv_diag = linalg.diag_of_inv_from_chol(Lp)
            trace = jnp.sum(Kinv_diag[:, None] * jnp.square(q_sqrt))
        else:
            Lp_tiled = jnp.broadcast_to(Lp, (num_latent,) + Lp.shape)
            LpiLq = linalg.tri_solve(Lp_tiled, Lq, lower=True)
            trace = jnp.sum(jnp.square(LpiLq))

    twoKL = mahalanobis + constant - logdet_qcov + trace

    if not white:
        twoKL = twoKL + num_latent * linalg.logdet_from_chol(Lp)

    return 0.5 * twoKL


def _factor_state(K_factors, factor_state):
    """(Ls, Linvs) — from the caller's precomputed chol_inv state, or computed
    here. All downstream algebra is then solve-free (matmuls with L⁻¹)."""
    if factor_state is not None:
        return factor_state
    pairs = [linalg.chol_inv(Kp) for Kp in K_factors]
    return tuple(L for L, _ in pairs), tuple(Li for _, Li in pairs)


def gauss_kl_kron(
    q_mu: jnp.ndarray,
    q_sqrt_diag: jnp.ndarray,
    K_factors: Optional[Sequence[jnp.ndarray]] = None,
    *,
    factor_state=None,
) -> jnp.ndarray:
    """KL(N(q_mu, diag(q_sqrt²)) ‖ N(0, ⊗_p K_p)), fully factored.

    Mathematically identical to the reference's ``GaussKLkron``
    (onofftf/main.py:350-387) which builds the dense ⊗chol(K_p); here each
    term is computed from the small per-factor Choleskys, solve-free via
    linalg.chol_inv (every solve is an MXU matmul against L_p⁻¹).

    q_mu: (M, 1), q_sqrt_diag: (M, 1) with M = Π M_p. K_factors must already
    include jitter. ``factor_state=(Ls, Linvs)``: precomputed chol_inv of the
    factors (pass it to share one factorization between KL and conditional).
    """
    Ls, Linvs = _factor_state(K_factors, factor_state)

    alpha = linalg.kron_linv_lower(Linvs, q_mu)
    mahalanobis = jnp.sum(jnp.square(alpha))

    constant = -jnp.asarray(q_sqrt_diag.size, dtype=q_mu.dtype)
    logdet_qcov = jnp.sum(jnp.log(jnp.square(q_sqrt_diag)))

    Kinv_diag = linalg.kron_diag([linalg.diag_of_inv_from_linv(Li) for Li in Linvs])
    trace = jnp.sum(Kinv_diag[:, None] * jnp.square(q_sqrt_diag))

    prior_logdet = linalg.kron_logdet_from_chols(Ls)

    return 0.5 * (mahalanobis + constant - logdet_qcov + trace + prior_logdet)


def gauss_kl_kron_full(
    q_mu: jnp.ndarray,
    C_factors: Sequence[jnp.ndarray],
    K_factors: Optional[Sequence[jnp.ndarray]] = None,
    *,
    factor_state=None,
) -> jnp.ndarray:
    """KL(N(q_mu, ⊗_p C_p C_pᵀ) ‖ N(0, ⊗_p K_p)), fully factored.

    Kronecker-factored *full* posterior covariance — richer than the
    reference's diagonal family (its only option), still O(Σ M_p³):

        tr(K⁻¹S)  = Π_p tr(K_p⁻¹ S_p) = Π_p ‖L_p⁻¹ C_p‖²_F
        logdet S  = Σ_p (M/M_p) · 2 Σ log |diag C_p|

    ``K_factors=None`` means a white prior (whitened parameterization), where
    tr(S) = Π_p ‖C_p‖²_F and the Mahalanobis term is ‖q_mu‖².
    """
    M = 1
    for C in C_factors:
        M *= C.shape[0]
    dtype = q_mu.dtype

    if K_factors is None and factor_state is None:
        mahalanobis = jnp.sum(jnp.square(q_mu))
        trace = 1.0
        for C in C_factors:
            trace = trace * jnp.sum(jnp.square(jnp.tril(C)))
        prior_logdet = jnp.asarray(0.0, dtype)
    else:
        Ls, Linvs = _factor_state(K_factors, factor_state)
        alpha = linalg.kron_linv_lower(Linvs, q_mu)
        mahalanobis = jnp.sum(jnp.square(alpha))
        trace = 1.0
        for Li, C in zip(Linvs, C_factors):
            trace = trace * jnp.sum(jnp.square(linalg.hdot(Li, jnp.tril(C))))
        prior_logdet = linalg.kron_logdet_from_chols(Ls)

    # The C_p are unconstrained lower-triangular factors; a diagonal entry
    # crossing zero mid-optimization would make log|diag| = -inf and poison
    # the KL. Clamp at tiny — the trace/Mahalanobis terms still see the true
    # factor, so the KL stays a valid (finite) objective.
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    logdet_qcov = 0.0
    for C in C_factors:
        logdet_qcov = logdet_qcov + (M // C.shape[0]) * 2.0 * jnp.sum(
            jnp.log(jnp.maximum(jnp.abs(linalg.masked_diag(C)), tiny))
        )

    constant = -jnp.asarray(M, dtype=dtype)
    return 0.5 * (mahalanobis + constant - logdet_qcov + trace + prior_logdet)
