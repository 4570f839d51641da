"""Stationary kernels as jit-transparent pytrees.

Replaces the reference's ``KernSE`` (onofftf/main.py:33-63), the numpy oracle
``kernse_np`` (onofftf/utils.py:26-58), and gpflow ``kernels.RBF`` (notebook
cell 7). Kernels are flax-struct dataclasses holding Parameters, so a kernel
flows through jax.grad and optax like any other pytree.

Gram construction uses the MXU-friendly quadratic expansion
``-2·X X2ᵀ + |X|² + |X2|²`` exactly as the reference does — the matmul is the
dominant FLOP and maps straight onto the systolic array. An opt-in Pallas
fused gram kernel lives in zigp_tpu.ops.pallas.rbf_gram.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct

from ..core.parameters import Parameter, positive_param


def _on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@struct.dataclass
class SquaredExponential:
    """ARD squared-exponential (RBF) kernel: σ² exp(-½ Σ_d (x_d - x'_d)²/ℓ_d²)."""

    lengthscales: Parameter
    variance: Parameter
    active_dims: Optional[Tuple[int, ...]] = struct.field(pytree_node=False, default=None)
    # opt-in fused Pallas gram build (float32 only; falls back otherwise)
    use_pallas: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls, lengthscales, variance, active_dims=None, lr=None, use_pallas: bool = False
    ) -> "SquaredExponential":
        ell = jnp.atleast_1d(jnp.asarray(lengthscales, dtype=jnp.result_type(float)))
        return cls(
            lengthscales=positive_param(ell, lr=lr),
            variance=positive_param(variance, lr=lr),
            active_dims=tuple(active_dims) if active_dims is not None else None,
            use_pallas=use_pallas,
        )

    def slice(self, X: jnp.ndarray) -> jnp.ndarray:
        if self.active_dims is None:
            return X
        return X[:, jnp.array(self.active_dims)]

    # Above this input dimension the MXU matmul expansion wins; below it the
    # exact pairwise-difference form is both faster (D ≤ 3 here, the matmul
    # contracts over almost nothing) and float32-safe. The expansion form
    # computes O(1) distances as differences of O((x/ℓ)²) terms — with the
    # pptr temporal column (t ≈ 5, ℓ ≈ 0.005 ⇒ (x/ℓ)² ≈ 10⁶) that loses ~15%
    # of the gram to f32 cancellation and produces indefinite Kmm.
    _EXPANSION_MIN_DIM = 16

    def square_dist(self, X: jnp.ndarray, X2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Scaled squared distance matrix."""
        X = X / self.lengthscales.value
        X2 = X / 1.0 if X2 is None else X2 / self.lengthscales.value
        if X.shape[1] < self._EXPANSION_MIN_DIM:
            diff = X[:, None, :] - X2[None, :, :]
            return jnp.sum(jnp.square(diff), axis=-1)
        Xs = jnp.sum(jnp.square(X), axis=1)
        X2s = jnp.sum(jnp.square(X2), axis=1)
        return -2.0 * (X @ X2.T) + Xs[:, None] + X2s[None, :]

    def K(self, X: jnp.ndarray, X2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        X = self.slice(X)
        X2 = self.slice(X2) if X2 is not None else None
        if self.use_pallas and X.dtype == jnp.float32 and _on_tpu():
            from .pallas.rbf_gram import rbf_gram

            return rbf_gram(
                X, X if X2 is None else X2, self.lengthscales.value, self.variance.value
            )
        return self.variance.value * jnp.exp(-0.5 * self.square_dist(X, X2))

    def Kdiag(self, X: jnp.ndarray) -> jnp.ndarray:
        return jnp.full((X.shape[0],), jnp.squeeze(self.variance.value), dtype=X.dtype)


# The reference only ever uses the squared-exponential; keep the familiar name.
RBF = SquaredExponential
