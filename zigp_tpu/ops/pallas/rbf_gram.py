"""Pallas TPU kernel: fused ARD-RBF cross-gram build.

Computes K[i, j] = σ² · exp(−½ Σ_d (X[i,d] − Z[j,d])² / ℓ_d²) tiled over
(N, M) with the scale → difference → square → reduce → exp chain fused in
VMEM — one HBM read of X and Z per tile, one write of K, no intermediate
distance matrix in HBM. The input dimension D is tiny (1–3 here), so the
distance is an unrolled per-dimension broadcast-subtract on the VPU; there is
no useful MXU contraction at these shapes (and the matmul expansion form is
float32-catastrophic at this workload's coordinate scales — see
zigp_tpu.ops.kernels.square_dist).

Forward runs the Pallas kernel; the custom VJP reuses the saved gram so the
backward pass is a handful of XLA einsums (no recompute of exp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gram_kernel(x_ref, z_ref, inv_ell2_ref, var_ref, out_ref, *, d_static: int):
    x = x_ref[:]  # (TN, D)
    z = z_ref[:]  # (TM, D)
    acc = jnp.zeros((x.shape[0], z.shape[0]), dtype=jnp.float32)
    for d in range(d_static):
        diff = x[:, d][:, None] - z[:, d][None, :]
        acc = acc + jnp.square(diff) * inv_ell2_ref[0, d]
    out_ref[:] = var_ref[0, 0] * jnp.exp(-0.5 * acc)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret"))
def _rbf_gram_fwd_impl(X, Z, lengthscales, variance, *, tile_n=256, tile_m=256, interpret=False):
    N, D = X.shape
    M = Z.shape[0]
    dtype = jnp.float32
    Xp = jnp.asarray(X, dtype)
    Zp = jnp.asarray(Z, dtype)
    Np, Mp = _round_up(max(N, 8), tile_n), _round_up(max(M, 128), tile_m)
    if Np != N:
        Xp = jnp.pad(Xp, ((0, Np - N), (0, 0)))
    if Mp != M:
        Zp = jnp.pad(Zp, ((0, Mp - M), (0, 0)))
    inv_ell2 = (1.0 / jnp.square(jnp.asarray(lengthscales, dtype))).reshape(1, -1)
    if inv_ell2.shape[1] == 1 and D > 1:
        inv_ell2 = jnp.broadcast_to(inv_ell2, (1, D))
    var = jnp.asarray(variance, dtype).reshape(1, 1)

    grid = (Np // tile_n, Mp // tile_m)
    out = pl.pallas_call(
        functools.partial(_gram_kernel, d_static=D),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_n, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_m, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_n, tile_m), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(Xp, Zp, inv_ell2, var)
    return out[:N, :M]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def rbf_gram(X, Z, lengthscales, variance, interpret=False):
    """σ²·exp(−½‖(x−z)/ℓ‖²) cross-gram via the fused Pallas kernel (float32).

    Differentiable in all four array arguments. For float64 parity work use
    kernels.SquaredExponential.K (plain XLA) instead.
    """
    return _rbf_gram_fwd_impl(X, Z, lengthscales, variance, interpret=interpret)


def _fwd(X, Z, lengthscales, variance, interpret):
    K = _rbf_gram_fwd_impl(X, Z, lengthscales, variance, interpret=interpret)
    return K, (X, Z, lengthscales, variance, K)


def _bwd(interpret, res, gK):
    X, Z, ell, var, K = res
    dtype = K.dtype
    X = jnp.asarray(X, dtype)
    Z = jnp.asarray(Z, dtype)
    ell = jnp.asarray(ell, dtype)
    var_arr = jnp.asarray(var, dtype)
    inv_ell2 = 1.0 / jnp.square(ell)
    if inv_ell2.ndim == 0:
        inv_ell2 = inv_ell2[None]
    D = X.shape[1]
    if inv_ell2.shape[0] == 1 and D > 1:
        inv_ell2 = jnp.broadcast_to(inv_ell2, (D,))

    W = gK * K  # (N, M), common factor of all distance grads
    # d‖·‖²/dX[i,d] = 2(X[i,d]−Z[j,d])/ℓ_d²; dK/ddist² = −½K
    sumW_rows = jnp.sum(W, axis=1)  # (N,)
    sumW_cols = jnp.sum(W, axis=0)  # (M,)
    WZ = W @ Z  # (N, D)
    WX = W.T @ X  # (M, D)
    dX = -(sumW_rows[:, None] * X - WZ) * inv_ell2[None, :]
    dZ = -(sumW_cols[:, None] * Z - WX) * inv_ell2[None, :]
    # dK/dℓ_d = K · (x−z)²/ℓ_d³
    # Σ_ij W_ij (X_id − Z_jd)² = Σ W X² − 2 X·(WZ) + Σ Wᵀ Z²
    sq = (
        jnp.sum(jnp.square(X) * sumW_rows[:, None], axis=0)
        - 2.0 * jnp.sum(X * WZ, axis=0)
        + jnp.sum(jnp.square(Z) * sumW_cols[:, None], axis=0)
    )  # (D,)
    dell_full = sq / (ell.reshape(-1) ** 3) if ell.ndim > 0 else sq / ell**3
    if ell.ndim == 0:
        dell = jnp.sum(dell_full)
    elif ell.shape[0] == 1 and D > 1:
        dell = jnp.sum(dell_full, keepdims=True)
    else:
        dell = dell_full.reshape(ell.shape)
    dvar = jnp.sum(gK * K) / jnp.maximum(var_arr, 1e-30)
    dvar = dvar.reshape(var_arr.shape) if var_arr.ndim else dvar
    return dX, dZ, dell, dvar


rbf_gram.defvjp(_fwd, _bwd)
