"""Pallas TPU kernel: fused Cholesky + triangular inverse for small matrices.

The flagship train step factorizes tiny Kronecker factor grams (10×10,
100×100) and then hits them with ~19 triangular solves per factor per step
(forward + reverse-mode). On TPU each XLA Cholesky/TriangularSolve lowers to
a custom call with ~10 µs fixed latency — measured ~76 µs/step of the
202 µs step, the single largest cost. This kernel computes L = chol(K) and
Linv = L⁻¹ together in one VMEM-resident loop; every downstream solve then
becomes an MXU matmul, and the custom VJP (ops.linalg.chol_inv) is
matmul-only, so the entire train step contains zero solve custom calls.

Two measured negative results shaped this design (v5e, flagship step):
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
    """Right-looking Cholesky interleaved with forward substitution on I.

    Iteration j finalizes column j of L and row j of L⁻¹:
      colj = A[:, j] / sqrt(A[j, j])             (column j of L)
      A   -= colj coljᵀ on the trailing block     (Schur update)
      rowj = B[j, :] / pivot                      (row j of L⁻¹; B starts at I)
      B   -= colj rowjᵀ on rows > j               (deferred substitution)

    Mosaic has no dynamic_slice on VMEM tiles, so column/row picks use masked
    reductions (iota == j) — an (n, n) multiply+reduce per pick, VPU work.

    No pivot clamp: a non-PSD input must yield NaN (sqrt of a negative pivot
    propagates), matching lax.linalg.cholesky instead of silently returning
    garbage.
    """
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    B = jnp.where(row_ids == col_ids, 1.0, 0.0).astype(K.dtype)

    def body(j, carry):
        A, B = carry
        is_col_j = col_ids == j  # (n, n)
        is_row_j = row_ids == j
        col = jnp.sum(jnp.where(is_col_j, A, 0.0), axis=1)  # A[:, j]
        pivot = jnp.sqrt(jnp.sum(jnp.where(is_row_j & is_col_j, A, 0.0)))
        colj = jnp.where(row_ids[:, 0] >= j, col / pivot, 0.0)
        trailing = (row_ids > j) & (col_ids > j)
        A = A - jnp.where(trailing, colj[:, None] * colj[None, :], 0.0)
        A = jnp.where(is_col_j, colj[:, None], A)

        rowj = jnp.sum(jnp.where(is_row_j, B, 0.0), axis=0) / pivot  # B[j, :]
        B = B - jnp.where(row_ids > j, colj[:, None] * rowj[None, :], 0.0)
        B = jnp.where(is_row_j, rowj[None, :], B)
        return A, B

    A, B = jax.lax.fori_loop(0, n, body, (K, B))
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
    L, Linv = pl.pallas_call(
        functools.partial(_kernel, n=n),
        out_shape=(
            jax.ShapeDtypeStruct((G, n, n), jnp.float32),
            jax.ShapeDtypeStruct((G, n, n), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, n, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=(
                pl.BlockSpec((1, n, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        interpret=interpret,
    )(Kb)
    return (
        L.reshape(batch_shape + (n, n)),
        Linv.reshape(batch_shape + (n, n)),
    )
