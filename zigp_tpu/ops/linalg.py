"""Dense and Kronecker-factored linear algebra primitives.

TPU-native re-design of the reference's L2 layer (onofftf/main.py:187-387 and
the per-script `__kron_mv`/`tf_kron` clones, e.g. scripts/onoff.py:215-241).

The crucial difference from the reference: the reference *materializes* dense
Kronecker products — ``tf_kron`` builds the full (prod M_p) x (prod M_p)
matrix for the KL Cholesky (onofftf/main.py:356) and for the conditional's
projection matrix (scripts/onoff.py:207). Here every Kronecker operation is
factored: `(⊗_p A_p) x` is a sequence of small per-factor matmuls (MXU
friendly, O(Σ M_p · N) instead of O(N²)), and `(⊗_p L_p)⁻¹ b` is a sequence of
small triangular solves. `kron_dense` exists only for tests.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve, cholesky as _cholesky, solve_triangular


def add_jitter(K: jnp.ndarray, jitter: float, *, relative_f32: float = 2.0e-4) -> jnp.ndarray:
    """K + jitter·I, with an extra *relative* term in float32.

    The reference's absolute jitters (1e-4/1e-5/1e-6) are tuned for float64;
    on the f32 TPU path a gram with diag ≈ 20 and jitter 1e-5 (relative 5e-7,
    below f32 eps) loses positive-definiteness — an M×M gram with
    near-duplicate rows (e.g. 105 kmeans centres under a wide lengthscale)
    carries f32 rounding eigen-perturbations of order M·eps·σ². The f32
    policy adds ``relative_f32 · mean(diag K)`` — scale-invariant, ~1600×f32
    eps, statistically negligible — and leaves float64 parity untouched.
    """
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    if K.dtype == jnp.float32 and relative_f32:
        # Diagonal mean via a masked full-tile reduce, NOT jnp.diagonal: the
        # diagonal gather's transpose rule lowers (under the train step's
        # vmap-of-jvp) to a cond plus several full-gram relayout copies per
        # unrolled scan iteration — measured in the compiled flagship HLO as
        # the largest single copy source. The masked reduce fuses into the
        # gram's elementwise pipeline and has an elementwise VJP.
        mean_diag = jnp.sum(K * eye, axis=(-2, -1)) / n
        jitter = jitter + relative_f32 * mean_diag
        return K + jitter[..., None, None] * eye
    return K + jitter * eye


def cholesky(K: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular Cholesky factor."""
    return _cholesky(K, lower=True)


# Precision of the solve-replacing matmuls (hdot/bdot + the chol_inv VJP).
# HIGHEST = 6-pass bf16 (exact f32 products); HIGH = 3-pass bf16 (drops the
# lo×lo term, ~1e-5 relative — between exact f32 and the 4e-3 of DEFAULT).
# Captured at trace time: switch it before building/jitting a train step.
#
# Two classes of solve-replacing contraction get independent settings:
# factor-space ops (M_p×M_p grams, KL solves, the chol_inv VJP, natgrad
# S-products) go through ``hdot``; batch-scaled projections (L⁻¹Kmn and the
# C_pᵀP_p kron-cov projections, (M_p, M_p)@(M_p, B) — the contractions that
# dominate MXU time at large B) go through ``bdot``. "mixed" keeps hdot
# exact-f32 while dropping bdot to HIGH: the measured +60 % steps/s of the
# HIGH study on MXU-bound configs comes from the bdot class, while the
# gradient-side hdot class is where trajectory drift originates (precision
# study, RESULTS.md).
_SOLVE_PRECISION = jax.lax.Precision.HIGHEST
_BULK_PRECISION = jax.lax.Precision.HIGHEST


def set_solve_precision(name: str) -> None:
    """Set the matmul precision used on every solve-replacing contraction
    (``hdot``/``bdot`` and the chol_inv custom VJP): "highest" (default,
    exact-f32 6-pass), "high" (3-pass, ~1e-5 relative), or "mixed"
    (factor-space ops exact-f32, batch-scaled projections 3-pass). Affects
    functions traced AFTER the call — already-jitted steps keep the
    precision they captured.
    """
    global _SOLVE_PRECISION, _BULK_PRECISION
    _SOLVE_PRECISION, _BULK_PRECISION = {
        "highest": (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST),
        "high": (jax.lax.Precision.HIGH, jax.lax.Precision.HIGH),
        "mixed": (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH),
    }[name]


def hdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-precision matmul. TPU 'default' matmul precision multiplies f32
    operands in bfloat16 (~4e-3 relative error) — fine for the ELBO's bulk
    contractions, catastrophic for the matmuls that REPLACE triangular
    solves (an exact-f32 custom call) in the chol_inv fast path: the
    variance-sensitive GH objective measurably fails to train off the bf16
    products. Every factor-space solve-replacing matmul goes through here."""
    return jnp.dot(a, b, precision=_SOLVE_PRECISION)


def bdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve-replacing matmul of the batch-scaled class (the (M_p, M_p) @
    (M_p, B) projections in the conditionals). Same default as ``hdot``;
    under ``set_solve_precision("mixed")`` these drop to HIGH while the
    gradient-critical factor-space ops stay exact-f32."""
    return jnp.dot(a, b, precision=_BULK_PRECISION)


def bulk_precision():
    """The bulk-class matmul precision, read at trace time — pass as the
    ``precision=`` of einsums that belong to the batch-scaled contraction
    class (same policy as ``bdot``). NEVER leave such einsums at the TPU
    default: bf16 products in the factored mean contraction turn the
    unwhitened α-cancellation into O(100) mean errors at the production
    gram conditioning (found by `experiments selfcheck`, round 4)."""
    return _BULK_PRECISION


# Above this factor size the single-program Pallas kernel's sequential column
# loop loses to alternatives (measured on v5e at the 105×250 scale config:
# n=250 via the sequential kernel costs ~25 % of step throughput; n=100 wins
# ~1.6×). For 128 < n ≤ _PALLAS_BLOCKED_MAX_N the two-level blocked variant
# (sequential kernel on ragged adaptive ≤128 diagonal blocks, exact-f32 MXU
# matmuls for panels/updates) takes over; beyond that, XLA chol + solve.
# Either way downstream stays solve-free (matmuls against L⁻¹).
#
# Measured (v5e, round 3): per standalone call the blocked kernel beats the
# XLA chol+solve pair ~30 % at n=250-500 (1080 vs 1507 µs incl. dispatch)
# with ~100× better L⁻¹ accuracy vs f64 (8e-7 vs 8e-5 — triangular inverse
# via exact panel matmuls instead of a solve against an f32 L). Inside the
# scanned 105×250 train step it is throughput-neutral (2163 vs 2163 steps/s
# at 20k steps): after round 2's device sampler, the factorization is off the
# critical path there — the step is bound by the O(M·B) factored
# contractions, which grow linearly with the 26k-row inducing grid.
_PALLAS_MAX_N = 128
_PALLAS_BLOCKED_MAX_N = 512


def _chol_inv_impl(K: jnp.ndarray):
    n = K.shape[-1]
    if K.dtype == jnp.float32 and jax.default_backend() == "tpu":
        if n <= _PALLAS_MAX_N:
            from .pallas.chol_inv import chol_inv_pallas

            return chol_inv_pallas(K)
        if n <= _PALLAS_BLOCKED_MAX_N:
            from .pallas.chol_inv import chol_inv_blocked

            return chol_inv_blocked(K)
    L = _cholesky(K, lower=True)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=K.dtype), K.shape)
    return L, solve_triangular(L, eye, lower=True)


@jax.custom_vjp
def chol_inv(K: jnp.ndarray):
    """(L, L⁻¹) with L = chol(K), batched over leading dims.

    The train step's Kronecker factor grams are tiny (10×10, 100×100); on TPU
    each XLA Cholesky/TriangularSolve is a ~10 µs custom call and reverse-mode
    multiplies them (~40 solve calls per flagship step — the measured
    majority of step latency). Computing L⁻¹ once turns every downstream
    solve into an MXU matmul, and this custom VJP keeps the *backward* pass
    matmul-only too (Murray 2016 reverse-mode Cholesky, with the triangular
    inverse already in hand). On TPU/f32 the forward is one fused Pallas
    kernel (ops.pallas.chol_inv); elsewhere (f64 CPU parity path) it is
    XLA chol + one triangular solve.
    """
    return _chol_inv_impl(K)


def _phi_half_diag(X: jnp.ndarray) -> jnp.ndarray:
    n = X.shape[-1]
    w = jnp.tril(jnp.ones((n, n), X.dtype)) - 0.5 * jnp.eye(n, dtype=X.dtype)
    return X * w


def _chol_inv_fwd(K):
    L, Linv = _chol_inv_impl(K)
    return (L, Linv), (L, Linv)


def _chol_inv_bwd(res, cots):
    L, Linv = res
    dL, dLinv = cots
    mT = lambda A: jnp.swapaxes(A, -1, -2)
    hi = _SOLVE_PRECISION  # bf16 products here poison the gradients
    # Transposed operands go through dot_general contracting-dimension
    # numbers, NOT materialized swapaxes + matmul: under the train step's
    # vmap-of-jvp the explicit transposes forced per-iteration relayout
    # copies of the full factors in the compiled HLO (same pathology as the
    # add_jitter diagonal; lax.dot_general has no transpose op to lay out).
    nb = L.ndim - 2
    bdims = (tuple(range(nb)), tuple(range(nb)))

    def tdot(a, b):  # aᵀ @ b
        return jax.lax.dot_general(a, b, (((nb,), (nb,)), bdims), precision=hi)

    def dott(a, b):  # a @ bᵀ
        return jax.lax.dot_general(
            a, b, (((nb + 1,), (nb + 1,)), bdims), precision=hi
        )

    def dot(a, b):  # a @ b
        return jax.lax.dot_general(a, b, (((nb + 1,), (nb,)), bdims), precision=hi)

    # Pullback through Linv = L⁻¹ (lower-tri dof only): −tril(L⁻ᵀ dLinv L⁻ᵀ)
    dL_tot = dL - jnp.tril(dott(tdot(Linv, dLinv), Linv))
    # Reverse-mode Cholesky with L⁻¹ available: matmuls only.
    P = _phi_half_diag(tdot(L, dL_tot))
    dK = 0.5 * dot(tdot(Linv, P + mT(P)), Linv)
    return (dK,)


chol_inv.defvjp(_chol_inv_fwd, _chol_inv_bwd)


def chol_inv_stacked(Ks: Sequence[jnp.ndarray]):
    """One ``chol_inv`` dispatch for several grams of (possibly) different
    sizes: pads each (..., n_p, n_p) to n_max with an identity tail
    (chol/inv of blockdiag(K, I) is blockdiag(chol K, I) — the tail never
    touches the real block), stacks on a new leading axis, factorizes once,
    slices back. Returns ``[(L_p, Linv_p), ...]``.

    EXPERIMENTAL — measured ~15 % SLOWER than per-factor dispatch inside
    the flagship train step (4,801 vs 5,726 steps/s interleaved A/B): the
    pad/stack/slice copies plus running the small factor's Newton/kernel
    chain at the large factor's size cost more than the saved call latency.
    Kept (tested) as the documented negative result.
    """
    ns = [K.shape[-1] for K in Ks]
    if len(Ks) == 1:
        L, Li = chol_inv(Ks[0])
        return [(L, Li)]
    nmax = max(ns)
    padded = []
    for K, n in zip(Ks, ns):
        if n < nmax:
            pad = [(0, 0)] * (K.ndim - 2) + [(0, nmax - n), (0, nmax - n)]
            K = jnp.pad(K, pad)
            tail = (jnp.arange(nmax)[:, None] == jnp.arange(nmax)[None, :]) & (
                jnp.arange(nmax)[None, :] >= n
            )
            K = K + tail.astype(K.dtype)
        padded.append(K)
    S = jnp.stack(padded, axis=0)  # (P, ..., nmax, nmax)
    L, Linv = chol_inv(S)
    return [
        (L[p, ..., :n, :n], Linv[p, ..., :n, :n]) for p, n in enumerate(ns)
    ]


def tri_solve(L: jnp.ndarray, b: jnp.ndarray, *, lower: bool = True, trans: bool = False):
    return solve_triangular(L, b, lower=lower, trans=1 if trans else 0)


def chol_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve K x = b given L = chol(K)."""
    return cho_solve((L, True), b)


def diag_of_inv_from_chol(L: jnp.ndarray) -> jnp.ndarray:
    """diag(K⁻¹) from L = chol(K): (K⁻¹)_ii = Σ_k (L⁻¹)_ki²."""
    Linv = solve_triangular(L, jnp.eye(L.shape[0], dtype=L.dtype), lower=True)
    return jnp.sum(jnp.square(Linv), axis=0)


def masked_diag(A: jnp.ndarray) -> jnp.ndarray:
    """diag(A) (batched over leading dims) as a masked reduce. Layout-safe:
    jnp.diagonal's *gather* lowers, under the train step's vmap-of-jvp
    transposes, to a cond plus full-matrix relayout copies per scan
    iteration (the same HLO pathology fixed in add_jitter); the masked
    reduce fuses and has an elementwise VJP."""
    eye = jnp.eye(A.shape[-1], dtype=bool)
    return jnp.sum(jnp.where(eye, A, jnp.zeros((), A.dtype)), axis=-1)


def logdet_from_chol(L: jnp.ndarray) -> jnp.ndarray:
    # log over the eye-masked tile (off-diagonal entries pinned to 1 → log 0)
    # rather than log(diagonal(L)) — see masked_diag for why.
    eye = jnp.eye(L.shape[-1], dtype=bool)
    return 2.0 * jnp.sum(jnp.log(jnp.where(eye, L, jnp.ones((), L.dtype))))


# ---------------------------------------------------------------------------
# Kronecker algebra (factored — never materializes the product)
# ---------------------------------------------------------------------------


def kron_dense(*mats: jnp.ndarray) -> jnp.ndarray:
    """Dense Kronecker product. Test/debug only — O(Π M_p²) memory.

    Equivalent to the reference's ``tf_kron`` (onofftf/main.py:334-348).
    """
    return reduce(jnp.kron, mats)


def _apply_factor_ops(ops, x: jnp.ndarray) -> jnp.ndarray:
    """Apply (⊗_p A_p) to vector(s) x, where ops[p](X) computes A_p @ X.

    Implements the reshape-shuffle matvec (reference ``__kron_mv``,
    scripts/onoff.py:215-225) with arbitrary per-factor linear operators so
    the same loop serves matmul, triangular solve, and full solves. After each
    factor is applied, a transpose-reshape rotates that factor's index to the
    back; after all P factors the row-major index order is restored.

    x: (N,) or (N, K) with N = Π M_p. Columns are independent (vmapped).
    Returns the same shape as x.
    """
    N = 1
    for _, s in ops:
        N *= s

    def apply1(v):  # v: (N,)
        b = v
        for op, size in ops:
            X = b.reshape(size, N // size)
            b = op(X).T.reshape(N)
        return b

    if x.ndim == 1:
        return apply1(x)
    return jax.vmap(apply1, in_axes=1, out_axes=1)(x)


def kron_mv(
    mats: Sequence[jnp.ndarray], x: jnp.ndarray, *, precision=None
) -> jnp.ndarray:
    """y = (⊗_p mats[p]) x without materializing the Kronecker product.

    ``precision``: jax.lax.Precision for the per-factor matmuls (None = TPU
    default bf16 products; pass HIGHEST on precision-sensitive paths)."""
    return _apply_factor_ops(
        [
            (lambda X, A=A: jnp.dot(A, X, precision=precision), A.shape[0])
            for A in mats
        ],
        x,
    )


def kron_solve_lower(Ls: Sequence[jnp.ndarray], b: jnp.ndarray) -> jnp.ndarray:
    """x = (⊗_p L_p)⁻¹ b for lower-triangular factors L_p.

    Since (⊗L_p)⁻¹ = ⊗(L_p⁻¹) this is the factored matvec with per-factor
    triangular solves. Replaces the reference's dense Cholesky-of-Kronecker
    (onofftf/main.py:355-358).
    """
    return _apply_factor_ops(
        [(lambda X, L=L: solve_triangular(L, X, lower=True), L.shape[0]) for L in Ls], b
    )


def kron_chol_solve(Ls: Sequence[jnp.ndarray], b: jnp.ndarray) -> jnp.ndarray:
    """x = (⊗_p K_p)⁻¹ b given per-factor Cholesky factors L_p = chol(K_p)."""
    return _apply_factor_ops(
        [(lambda X, L=L: cho_solve((L, True), X), L.shape[0]) for L in Ls], b
    )


def kron_linv_lower(Linvs: Sequence[jnp.ndarray], b: jnp.ndarray) -> jnp.ndarray:
    """x = (⊗_p L_p)⁻¹ b given precomputed triangular inverses — pure matmuls
    (solve-free variant of kron_solve_lower for the chol_inv fast path)."""
    return _apply_factor_ops(
        [(lambda X, Li=Li: hdot(Li, X), Li.shape[0]) for Li in Linvs], b
    )


def kron_linv_solve(Linvs: Sequence[jnp.ndarray], b: jnp.ndarray) -> jnp.ndarray:
    """x = (⊗_p K_p)⁻¹ b = (⊗L_p⁻ᵀ)(⊗L_p⁻¹) b given triangular inverses."""
    half = kron_linv_lower(Linvs, b)
    return _apply_factor_ops(
        [(lambda X, Li=Li: hdot(Li.T, X), Li.shape[0]) for Li in Linvs], half
    )


def diag_of_inv_from_linv(Linv: jnp.ndarray) -> jnp.ndarray:
    """diag(K⁻¹) from L⁻¹: (K⁻¹)_ii = Σ_k (L⁻¹)_ki²."""
    return jnp.sum(jnp.square(Linv), axis=0)


def kron_diag(diags: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """diag(⊗_p D_p) for diagonal factors given as vectors."""
    out = diags[0]
    for d in diags[1:]:
        out = (out[:, None] * d[None, :]).reshape(-1)
    return out


def kron_logdet_from_chols(Ls: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """log det(⊗_p K_p) = Σ_p (M / M_p) · log det K_p, from factors' Choleskys."""
    M = 1
    for L in Ls:
        M *= L.shape[0]
    out = 0.0
    for L in Ls:
        out = out + (M // L.shape[0]) * logdet_from_chol(L)
    return out
