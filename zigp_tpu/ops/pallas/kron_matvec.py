"""Pallas TPU kernel: fused 2-factor Kronecker matvec y = (A ⊗ B) x.

The factored matvec is two small matmuls with a transpose-shuffle between
them (ops.linalg.kron_mv). XLA runs that as separate HLOs with an HBM
round-trip for the (Ma·Mb) intermediate; this kernel keeps the intermediate in
VMEM: load x, reshape to (Ma, Mb), X₁ = X Bᵀ, Y = Aᵀ-side product, write y —
one HBM read, one write. Shapes here are small (M ≤ a few thousand), so the
win is memory traffic and kernel-launch count, not FLOPs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kron_mv_kernel(a_ref, b_ref, x_ref, out_ref):
    Ma = a_ref.shape[0]
    Mb = b_ref.shape[0]
    X = x_ref[:].reshape(Ma, Mb)  # row-major (i_a, i_b)
    # (A ⊗ B) x: contract B over i_b, then A over i_a
    T = jnp.dot(X, b_ref[:].T, preferred_element_type=jnp.float32)  # (Ma, Mb)
    Y = jnp.dot(a_ref[:], T, preferred_element_type=jnp.float32)  # (Ma, Mb)
    out_ref[:] = Y.reshape(out_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kron_mv_2(A, B, x, *, interpret: bool = False):
    """y = (A ⊗ B) x for 2 square factors; x: (Ma·Mb,) or (Ma·Mb, 1)."""
    Ma, Mb = A.shape[0], B.shape[0]
    squeeze = x.ndim == 1
    xv = x.reshape(Ma * Mb, 1).astype(jnp.float32)
    out = pl.pallas_call(
        _kron_mv_kernel,
        out_shape=jax.ShapeDtypeStruct((Ma * Mb, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A.astype(jnp.float32), B.astype(jnp.float32), xv)
    return out.reshape(-1) if squeeze else out.reshape(x.shape)
