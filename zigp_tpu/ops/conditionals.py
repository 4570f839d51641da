"""Sparse-GP predictive conditionals q(f*) = ∫ p(f*|u) q(u) du.

Dense path re-designs gpflow-0.4 ``conditionals.conditional`` (used at
onoffgpf/OnOffSVGP.py:132-137) and the reference's ``GPConditional``
(onofftf/main.py:257-305).

Kronecker path replaces the 7 copy-pasted ``kron_inf`` closures
(scripts/onoff.py:186-213 and clones). The reference materializes
``tf_kron(*Kmm_inv)`` (1000×1000) and a dense (M×B) cross-gram, then takes
``diag_part`` of *B×B* products. Here everything stays factored:

    Kmn[(i₁..i_P), b] = Π_p Kmn_p[i_p, b]
    A  = (⊗K_p⁻¹) Kmn  =>  A_p = K_p⁻¹ Kmn_p          (still factored!)
    diag(Kmnᵀ A)[b]    = Π_p Σ_i Kmn_p[i,b]·A_p[i,b]
    diag(Aᵀ S A)[b]    = contraction of S over ⊗_p A_p²   (P small matmuls)

so the per-step cost is O(Σ_p M_p³ + Σ_p M_p² B) instead of the reference's
O((Π M_p)² B). The contractions are plain matmuls -> MXU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp

from . import linalg


def conditional(
    Xnew: jnp.ndarray,
    Z: jnp.ndarray,
    kernel,
    f: jnp.ndarray,
    *,
    full_cov: bool = False,
    q_sqrt: Optional[jnp.ndarray] = None,
    whiten: bool = False,
    jitter: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-GP sparse conditional.

    Xnew: (N, D), Z: (M, D), f: (M, L) inducing (whitened) means,
    q_sqrt: None | (M, L) diag | (M, M, L) lower-triangular.
    Returns (mean (N, L), var (N, L) or full cov (N, N, L)).
    """
    M = Z.shape[0]
    Kmn = kernel.K(Z, Xnew)  # (M, N)
    Kmm = linalg.add_jitter(kernel.K(Z), jitter)
    Lm = linalg.cholesky(Kmm)

    A = linalg.tri_solve(Lm, Kmn, lower=True)  # (M, N)

    if full_cov:
        fvar = kernel.K(Xnew) - A.T @ A  # (N, N)
    else:
        fvar = kernel.Kdiag(Xnew) - jnp.sum(jnp.square(A), axis=0)  # (N,)

    if not whiten:
        A = linalg.tri_solve(Lm.T, A, lower=False)

    fmean = linalg.bdot(A.T, f)  # (N, L)
    L_latent = f.shape[1]

    if full_cov:
        fvar = jnp.broadcast_to(fvar[None], (L_latent,) + fvar.shape)  # (L, N, N)
    else:
        fvar = jnp.broadcast_to(fvar[None], (L_latent, fvar.shape[0]))  # (L, N)

    if q_sqrt is not None:
        if q_sqrt.ndim == 2:
            LTA = A[None] * q_sqrt.T[:, :, None]  # (L, M, N)
        elif q_sqrt.ndim == 3:
            Lq = jnp.tril(jnp.transpose(q_sqrt, (2, 0, 1)))  # (L, M, M)
            LTA = jnp.einsum("lmk,mn->lkn", Lq, A,
                             precision=linalg.bulk_precision())  # Lqᵀ A per latent
        else:
            raise ValueError(f"Bad q_sqrt ndim: {q_sqrt.ndim}")
        if full_cov:
            fvar = fvar + jnp.einsum("lmn,lmk->lnk", LTA, LTA,
                                     precision=linalg.bulk_precision())
        else:
            fvar = fvar + jnp.sum(jnp.square(LTA), axis=1)

    fvar = jnp.transpose(fvar) if not full_cov else jnp.transpose(fvar, (1, 2, 0))
    return fmean, fvar


class KronConditionalState(NamedTuple):
    """Precomputable per-step state shared by mean and variance."""

    Ls: Tuple[jnp.ndarray, ...]  # per-factor chol(Kmm_p)
    alpha: jnp.ndarray  # (⊗K_p⁻¹) q_mu, shape (M, 1)


def kron_conditional(
    Xnew: jnp.ndarray,
    kernels: Sequence,
    Zs: Sequence[jnp.ndarray],
    q_mu: jnp.ndarray,
    q_sqrt_diag: jnp.ndarray,
    input_masks: Sequence[Sequence[int]],
    *,
    jitter: float = 1e-6,
    clip_variance: bool = True,
    whiten: bool = False,
    q_sqrt_factors: Optional[Sequence[jnp.ndarray]] = None,
    factor_state=None,
    full_cov: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Kronecker-structured sparse conditional with diagonal q(u) covariance.

    ``whiten=True`` interprets (q_mu, q_sqrt_diag) as the whitened variables
    v with u = (⊗L_p) v — not present in the reference (its whiten branch
    raises NotImplementedError, scripts/onoff.py:146) but strictly better
    conditioned for optimization, and cheaper here: the whitened projection is
    the already-computed V_p = L_p⁻¹ Kmn_p, so the second triangular solve
    (A_p) disappears.

    kernels[p], Zs[p] (M_p, d_p): per-factor kernel and inducing locations.
    input_masks[p]: columns of Xnew belonging to factor p (reference
    ``_gen_inp_mask``, scripts/onoff.py:243-250).
    q_mu, q_sqrt_diag: (M, 1) with M = Π M_p, row-major factor order.

    Returns (mean (B, 1), var (B, 1)); matches the reference ``kron_inf``
    (scripts/onoff.py:186-213) to fp tolerance while never materializing ⊗.

    ``full_cov=True`` returns the joint (B, B, 1) predictive covariance
    instead of marginals (reference full_cov branch:
    /root/reference/onofftf/main.py:277-289, dense only there). Every term
    stays factored over the inducing dimension: the prior and data-fit pieces
    are *Hadamard* products of per-factor (B, B) grams
    (Kmnᵀ(⊗K⁻¹)Kmn = ⊙_p V_pᵀV_p), and the diagonal-S posterior term is a
    sequential pairwise contraction — only B×B ever materializes, never
    (Π M_p)².

    Numerics: the reference computes explicit ``K⁻¹`` products
    (``matrix_inverse`` of the full gram); here every quadratic form goes
    through the *triangular* inverse factors L_p⁻¹ (linalg.chol_inv) — ``c1``
    is a product of ‖L_p⁻¹ k_p‖² terms, each non-negative by construction —
    which keeps the float32 TPU path stable where the reference's full-inverse
    form loses hundreds of units to cancellation (cond(L) = √cond(K), and the
    norm structure can't go negative). ``clip_variance`` clamps the
    (theoretically non-negative) predictive variance at 0 against residual
    f32 roundoff.
    """
    sizes = [Z.shape[0] for Z in Zs]
    B = Xnew.shape[0]
    dtype = Xnew.dtype

    if factor_state is None:
        Kmms = [linalg.add_jitter(k.K(Z), jitter) for k, Z in zip(kernels, Zs)]
        pairs = [linalg.chol_inv(Kmm) for Kmm in Kmms]
        Ls = [L for L, _ in pairs]
        Linvs = [Li for _, Li in pairs]
    else:
        # Precomputed chol_inv of the factor grams (share one factorization
        # between the KL and the conditional — see KronGP.factor_state).
        Ls, Linvs = factor_state

    Knn = jnp.ones((B, B) if full_cov else (B,), dtype=dtype)
    Kmn_factors = []
    V_factors = []  # V_p = L_p⁻¹ Kmn_p, solve-free
    for p, (k, Z, L, Li) in enumerate(zip(kernels, Zs, Ls, Linvs)):
        xp = Xnew[:, jnp.array(tuple(input_masks[p]))]
        Knn = Knn * (k.K(xp) if full_cov else k.Kdiag(xp))
        Kmn_p = k.K(Z, xp)  # (M_p, B)
        Kmn_factors.append(Kmn_p)
        # bdot, not @: TPU default matmul precision is bf16, and a 4e-3
        # relative error in V (vs the exact-f32 triangular solve this matmul
        # replaces) measurably breaks training of variance-sensitive
        # objectives — the GH-Bernoulli quality option plateaus at AUC 0.70
        # off bf16 products and recovers the solve path's trajectory at
        # full precision. bdot is the batch-scaled class: exact-f32 by
        # default, 3-pass under set_solve_precision("high"/"mixed") — its
        # AD cotangents inherit the same precision.
        V_factors.append(linalg.bdot(Li, Kmn_p))

    if whiten:
        # mean: Kmnᵀ L⁻ᵀ v = (⊗V_p)ᵀ v; posterior-cov term uses V_p directly
        mu = _factored_contract(q_mu[:, 0], sizes, V_factors)
        proj = V_factors
    else:
        # alpha = (⊗K_p⁻¹) q_mu, factored
        alpha = linalg.kron_linv_solve(Linvs, q_mu)  # (M, 1)
        proj = [
            linalg.bdot(Li.T, V_p)  # A_p = K_p⁻¹ Kmn_p
            for Li, V_p in zip(Linvs, V_factors)
        ]
        # mean: mu[b] = Σ_m (Π_p Kmn_p[i_p, b]) alpha[m]
        mu = _factored_contract(alpha[:, 0], sizes, Kmn_factors)

    if full_cov:
        # posterior-cov term PᵀSP as a (B, B) matrix, still factored over M
        if q_sqrt_factors is not None:
            # S = ⊗ C_p C_pᵀ: PᵀSP = ⊙_p (C_pᵀP_p)ᵀ(C_pᵀP_p)
            c2 = jnp.ones((B, B), dtype=dtype)
            for C, P_p in zip(q_sqrt_factors, proj):
                CtP = linalg.bdot(jnp.tril(C).T, P_p)  # (M_p, B)
                c2 = c2 * linalg.bdot(CtP.T, CtP)
        else:
            S = jnp.square(q_sqrt_diag[:, 0])
            c2 = _factored_contract_pair(S, sizes, proj)
        # data-fit term Kmnᵀ(⊗K⁻¹)Kmn = ⊙_p V_pᵀV_p
        c1 = jnp.ones((B, B), dtype=dtype)
        for V_p in V_factors:
            c1 = c1 * linalg.bdot(V_p.T, V_p)
        cov = Knn - c1 + c2
        return mu[:, None], cov[:, :, None]

    if q_sqrt_factors is not None:
        # Kronecker-factored full covariance S = ⊗_p C_p C_pᵀ:
        # diag(PᵀSP)[b] = Π_p ‖C_pᵀ P_p[:, b]‖²  (P = A unwhitened, V whitened)
        c2 = jnp.ones((B,), dtype=dtype)
        for C, P_p in zip(q_sqrt_factors, proj):
            CtP = linalg.bdot(jnp.tril(C).T, P_p)  # (M_p, B)
            c2 = c2 * jnp.sum(jnp.square(CtP), axis=0)
    else:
        # diagonal S: c2[b] = Σ_m S[m] (Π_p P_p[i_p, b])²
        S = jnp.square(q_sqrt_diag[:, 0])
        c2 = _factored_contract(S, sizes, [jnp.square(P_p) for P_p in proj])

    # c1[b] = diag(Kmnᵀ (⊗K⁻¹) Kmn)[b] = Π_p ‖V_p[:, b]‖²  (each factor ≥ 0)
    c1 = jnp.ones((B,), dtype=dtype)
    for V_p in V_factors:
        c1 = c1 * jnp.sum(jnp.square(V_p), axis=0)

    var = Knn - c1 + c2
    if clip_variance:
        var = jnp.maximum(var, 0.0)
    return mu[:, None], var[:, None]


def _factored_contract(
    w: jnp.ndarray, sizes: Sequence[int], factors: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """out[b] = Σ_{i₁..i_P} w[(i₁..i_P)] Π_p factors[p][i_p, b].

    Sequential contraction: each step is one (M_p × rest)·(M_p × B) matmul.
    """
    t = w.reshape(tuple(sizes))  # (M_1, ..., M_P)
    for p, F in enumerate(factors):
        if p == 0:
            t = jnp.einsum("i...,ib->b...", t, F,
                           precision=linalg.bulk_precision())
        else:
            t = jnp.einsum("bi...,ib->b...", t, F,
                           precision=linalg.bulk_precision())
    return t  # (B,)


def _factored_contract_pair(
    w: jnp.ndarray, sizes: Sequence[int], factors: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """out[b, c] = Σ_{i₁..i_P} w[(i₁..i_P)] Π_p factors[p][i_p, b]·factors[p][i_p, c]
    — the pairwise (full-covariance) analog of ``_factored_contract``. Each
    step contracts one factor index against both test axes; cost
    O(M_p · B² · Π_{q>p} M_q) per step, (B, B) peak memory."""
    t = w.reshape(tuple(sizes))
    for p, F in enumerate(factors):
        if p == 0:
            t = jnp.einsum("i...,ib,ic->bc...", t, F, F,
                           precision=linalg.bulk_precision())
        else:
            t = jnp.einsum("bci...,ib,ic->bc...", t, F, F,
                           precision=linalg.bulk_precision())
    return t  # (B, B)
