"""Pallas TPU kernel: fused Cholesky + triangular inverse for small matrices.

The flagship train step factorizes tiny Kronecker factor grams (10×10,
100×100) and then hits them with ~19 triangular solves per factor per step
(forward + reverse-mode). On TPU each XLA Cholesky/TriangularSolve lowers to
a custom call with ~10 µs fixed latency — measured ~76 µs/step of the
202 µs step, the single largest cost. This kernel computes L = chol(K) and
Linv = L⁻¹ together in one VMEM-resident loop; every downstream solve then
becomes an MXU matmul, and the custom VJP (ops.linalg.chol_inv) is
matmul-only, so the entire train step contains zero solve custom calls.

Three measured negative results shaped this design (v5e, flagship step):
a stacked-pair variant (both G=2 matrices in one program on a (2n, n) tile,
halving the sequential program chain) was a wash (137.5 vs 136.9 µs/step) —
the per-iteration top/bottom pivot and row picks double the op count, so the
loop is throughput-bound at this tile size, not chain-bound;
a blocked/MXU variant (8×8 diagonal blocks + panel matmuls) lost ~26 µs/step
because Mosaic matmuls only offer DEFAULT precision (bf16 — loses the
factor's positive-definiteness and NaNs the run) or HIGHEST (6-pass, too
slow at n ≤ 128); and batching the G matrices into one program on (G, n, n)
tiles lost ~55 µs/step to 3-D relayouts. One grid program per matrix with
2-D tiles wins.

Replaces the per-step linear algebra of the reference's ``kron_inf``
(scripts/onoff.py:186-213), which materializes dense ``matrix_inverse``
products instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_inv_body(K, n: int):
    """Right-looking Cholesky interleaved with forward substitution on I,
    two columns per iteration (rank-2 Schur updates).

    Iteration t finalizes columns j = 2t, k = 2t+1 of L and the matching rows
    of L⁻¹. Column k first absorbs column j's rank-1 update inline (a vector
    op), then both outer products hit the trailing block together — halving
    the length of the sequential dependent-op chain, which is what bounds
    this latency-dominated loop (the (n, n) tiles are only ~⌈n/8⌉ vregs, so
    per-op cost is issue latency, not vector throughput).

    Mosaic has no dynamic_slice on VMEM tiles, so column/row picks use masked
    reductions (iota == j). The updates deliberately touch only the strictly-
    trailing region; row garbage above the diagonal is zeroed at the end.

    No pivot clamp: a non-PSD input must yield NaN (sqrt of a negative pivot
    propagates), matching lax.linalg.cholesky instead of silently returning
    garbage. n must be even (callers pad with an identity tail).
    """
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    rv = row_ids[:, 0]

    B = jnp.where(row_ids == col_ids, 1.0, 0.0).astype(K.dtype)

    def body(t, carry):
        A, B = carry
        j = 2 * t
        k = j + 1
        is_col_j = col_ids == j
        is_row_j = row_ids == j
        is_col_k = col_ids == k
        is_row_k = row_ids == k

        col = jnp.sum(jnp.where(is_col_j, A, 0.0), axis=1)  # A[:, j]
        pivot = jnp.sqrt(jnp.sum(jnp.where(is_row_j & is_col_j, A, 0.0)))
        colj = jnp.where(rv >= j, col / pivot, 0.0)
        rowj = jnp.sum(jnp.where(is_row_j, B, 0.0), axis=0) / pivot  # B[j, :]

        colk_raw = jnp.sum(jnp.where(is_col_k, A, 0.0), axis=1)
        # colj[k] = A[k, j]/pivot and colk_upd[k] = A[k, k] − colj[k]²: read
        # both through 2-D masked reduces — Mosaic miscompiles 1-D masked
        # scalar picks (relayout bug on vector<1xN>).
        cj_k = jnp.sum(jnp.where(is_row_k & is_col_j, A, 0.0)) / pivot
        colk_upd = colk_raw - colj * cj_k
        a_kk = jnp.sum(jnp.where(is_row_k & is_col_k, A, 0.0))
        piv_k = jnp.sqrt(a_kk - cj_k * cj_k)
        colk = jnp.where(rv >= k, colk_upd / piv_k, 0.0)
        rowk_raw = jnp.sum(jnp.where(is_row_k, B, 0.0), axis=0)
        rowk = (rowk_raw - cj_k * rowj) / piv_k  # absorb j's deferred update

        trailing = (row_ids > k) & (col_ids > k)
        upd = colj[:, None] * colj[None, :] + colk[:, None] * colk[None, :]
        A = A - jnp.where(trailing, upd, 0.0)
        A = jnp.where(is_col_j, colj[:, None], A)
        A = jnp.where(is_col_k, colk[:, None], A)

        below = row_ids > k
        bupd = colj[:, None] * rowj[None, :] + colk[:, None] * rowk[None, :]
        B = B - jnp.where(below, bupd, 0.0)
        B = jnp.where(is_row_j, rowj[None, :], B)
        B = jnp.where(is_row_k, rowk[None, :], B)
        return A, B

    A, B = jax.lax.fori_loop(0, n // 2, body, (K, B))
    tril_mask = row_ids >= col_ids
    return jnp.where(tril_mask, A, 0.0), jnp.where(tril_mask, B, 0.0)


def _kernel(k_ref, l_ref, linv_ref, *, n: int):
    L, Linv = _chol_inv_body(k_ref[0], n)
    l_ref[0] = L
    linv_ref[0] = Linv


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_inv_pallas(K, *, interpret: bool = False):
    """(L, L⁻¹) of a batch (..., n, n) of small SPD matrices (float32).

    One grid program per matrix; both factorization and inverse stay in VMEM.
    """
    batch_shape = K.shape[:-2]
    n = K.shape[-1]
    Kb = K.astype(jnp.float32).reshape((-1, n, n))
    G = Kb.shape[0]
    # Even-pad with an identity tail (chol/inv of blockdiag(K, I) is
    # blockdiag(chol(K), I)) — the rank-2 loop consumes columns in pairs.
    m = n + (n % 2)
    if m != n:
        Kb = jnp.pad(Kb, ((0, 0), (0, 1), (0, 1)))
        tail = (jnp.arange(m)[:, None] == jnp.arange(m)[None, :]) & (
            jnp.arange(m)[None, :] >= n
        )
        Kb = Kb + tail.astype(Kb.dtype)[None]
    L, Linv = pl.pallas_call(
        functools.partial(_kernel, n=m),
        out_shape=(
            jax.ShapeDtypeStruct((G, m, m), jnp.float32),
            jax.ShapeDtypeStruct((G, m, m), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, m, m), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=(
                pl.BlockSpec((1, m, m), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m, m), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        interpret=interpret,
    )(Kb)
    return (
        L[:, :n, :n].reshape(batch_shape + (n, n)),
        Linv[:, :n, :n].reshape(batch_shape + (n, n)),
    )


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def chol_inv_blocked(K, *, nb: int = 128, interpret: bool = False):
    """Blocked (L, L⁻¹) for medium matrices (128 < n ≤ 512, float32).

    Two-level scheme (VERDICT r2 #2): the exact sequential rank-2 Pallas
    kernel factorizes the nb×nb *diagonal* blocks — where fp exactness is
    load-bearing (pivots/divisions) — while panels, trailing Schur updates,
    and the L⁻¹ block back-substitution are MXU matmuls at Precision.HIGHEST
    (exact f32 via 6-pass; these matmuls REPLACE triangular solves, so bf16
    products here would poison positive-definiteness — the measured round-2
    failure of the uniformly-bf16 8×8 blocked variant). Sequential vector
    work drops from O(n³) to O(n·nb²); the O(n³) bulk rides the MXU.

    Replaces the XLA fallback at the 105×250 scale config, where the 250-knot
    temporal factor's chol+solve custom calls dominate the step (RESULTS.md).
    Reference hot spot being replaced: /root/reference/onofftf/main.py:356.
    """
    batch_shape = K.shape[:-2]
    n = K.shape[-1]
    nblk = -(-n // nb)
    m = nblk * nb
    Kb = K.astype(jnp.float32).reshape((-1, n, n))
    if m != n:
        # identity tail: chol/inv of blockdiag(K, I) = blockdiag(chol K, I)
        Kb = jnp.pad(Kb, ((0, 0), (0, m - n), (0, m - n)))
        tail = (jnp.arange(m)[:, None] == jnp.arange(m)[None, :]) & (
            jnp.arange(m)[None, :] >= n
        )
        Kb = Kb + tail.astype(Kb.dtype)[None]

    hi = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    mT = lambda a: jnp.swapaxes(a, -1, -2)

    # blocked right-looking Cholesky; nblk ≤ 4 so the Python loops unroll
    A = Kb
    Lb = [[None] * nblk for _ in range(nblk)]
    Ld_inv = [None] * nblk
    for i in range(nblk):
        d = slice(i * nb, (i + 1) * nb)
        Lii, Linv_ii = chol_inv_pallas(A[:, d, d], interpret=interpret)
        Lb[i][i] = Lii
        Ld_inv[i] = Linv_ii
        if i + 1 < nblk:
            t = slice((i + 1) * nb, m)
            # panel: L[t, i] = A[t, i] L_iiᵀ⁻¹  (matmul against the inverse)
            P = mm(A[:, t, d], mT(Linv_ii))
            for j in range(i + 1, nblk):
                Lb[j][i] = P[:, (j - i - 1) * nb : (j - i) * nb, :]
            A = A.at[:, t, t].add(-mm(P, mT(P)))

    # L⁻¹ by block forward substitution: (L⁻¹)_ij = −L_ii⁻¹ Σ_k L_ik (L⁻¹)_kj
    Bi = [[None] * nblk for _ in range(nblk)]
    for i in range(nblk):
        Bi[i][i] = Ld_inv[i]
        for j in range(i - 1, -1, -1):
            S = Bi[j][j] * 0.0  # (G, nb, nb) zeros of the right dtype
            for k in range(j, i):
                S = S + mm(Lb[i][k], Bi[k][j])
            Bi[i][j] = -mm(Ld_inv[i], S)

    zero = jnp.zeros_like(Ld_inv[0])
    L = jnp.concatenate(
        [
            jnp.concatenate([Lb[i][j] if j <= i else zero for j in range(nblk)], axis=-1)
            for i in range(nblk)
        ],
        axis=-2,
    )
    Linv = jnp.concatenate(
        [
            jnp.concatenate([Bi[i][j] if j <= i else zero for j in range(nblk)], axis=-1)
            for i in range(nblk)
        ],
        axis=-2,
    )
    return (
        L[:, :n, :n].reshape(batch_shape + (n, n)),
        Linv[:, :n, :n].reshape(batch_shape + (n, n)),
    )

