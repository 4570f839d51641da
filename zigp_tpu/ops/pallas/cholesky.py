"""Pallas TPU kernel: unblocked Cholesky for small matrices, with a batched
variant.

The Kronecker factor grams here are tiny (10×10, 100×100). XLA's general
blocked Cholesky pays dispatch and padding overhead at these sizes; a single
VMEM-resident right-looking update loop is enough and keeps the whole
factorization in one kernel. Batched over a leading grid axis for the
"one small Cholesky per factor / per latent" pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_body(A, n: int):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    rvec = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]  # (n,) row index

    def body(j, A):
        col = jax.lax.dynamic_slice_in_dim(A, j, 1, axis=1)[:, 0]  # A[:, j]
        # No pivot clamp: a negative pivot (non-PSD input) must yield NaN —
        # sqrt(neg) = NaN propagates through the column update and poisons the
        # factor, exactly like lax.linalg.cholesky — instead of silently
        # returning garbage.
        pivot = jnp.sqrt(jax.lax.dynamic_index_in_dim(col, j, 0, False))
        colj = jnp.where(rvec >= j, col / pivot, 0.0)
        trailing = (row_ids > j) & (col_ids > j)
        A = A - jnp.where(trailing, colj[:, None] * colj[None, :], 0.0)
        A = jax.lax.dynamic_update_slice_in_dim(A, colj[:, None], j, axis=1)
        return A

    A = jax.lax.fori_loop(0, n, body, A)
    return jnp.where(row_ids >= col_ids, A, 0.0)  # tril


def _chol_kernel(k_ref, out_ref, *, n: int):
    out_ref[:] = _chol_body(k_ref[:], n)


def _chol_kernel_batched(k_ref, out_ref, *, n: int):
    out_ref[0] = _chol_body(k_ref[0], n)


@functools.partial(jax.jit, static_argnames=("interpret",))
def small_cholesky(K, *, interpret: bool = False):
    """Lower Cholesky of one small (n, n) SPD matrix, single fused kernel."""
    n = K.shape[-1]
    return pl.pallas_call(
        functools.partial(_chol_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(K.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_small_cholesky(Ks, *, interpret: bool = False):
    """Lower Cholesky of a batch (B, n, n) of small SPD matrices; one grid
    program per matrix."""
    B, n, _ = Ks.shape
    return pl.pallas_call(
        functools.partial(_chol_kernel_batched, n=n),
        out_shape=jax.ShapeDtypeStruct((B, n, n), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, n, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1, n, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(Ks.astype(jnp.float32))
