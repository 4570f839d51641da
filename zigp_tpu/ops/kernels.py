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
from . import linalg


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


@struct.dataclass
class Matern:
    """Matérn kernel family (ν ∈ {1/2, 3/2, 5/2}) with ARD lengthscales.

    Not in the reference (which is SE-only) — standard spatio-temporal
    alternatives a user of a GP framework expects. Drop-in compatible with
    every model here (same K/Kdiag protocol).
    """

    lengthscales: Parameter
    variance: Parameter
    nu2: int = struct.field(pytree_node=False, default=3)  # 2ν: 1, 3 or 5
    active_dims: Optional[Tuple[int, ...]] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, lengthscales, variance, nu: str = "3/2", active_dims=None, lr=None):
        nu2 = {"1/2": 1, "3/2": 3, "5/2": 5}[nu]
        ell = jnp.atleast_1d(jnp.asarray(lengthscales, dtype=jnp.result_type(float)))
        return cls(
            lengthscales=positive_param(ell, lr=lr),
            variance=positive_param(variance, lr=lr),
            nu2=nu2,
            active_dims=tuple(active_dims) if active_dims is not None else None,
        )

    def slice(self, X):
        if self.active_dims is None:
            return X
        return X[:, jnp.array(self.active_dims)]

    def _r(self, X, X2):
        X = X / self.lengthscales.value
        X2 = X / 1.0 if X2 is None else X2 / self.lengthscales.value
        d2 = jnp.sum(jnp.square(X[:, None, :] - X2[None, :, :]), axis=-1)
        # safe sqrt: value exact, gradient finite at r = 0
        return jnp.sqrt(jnp.maximum(d2, 1e-36))

    def K(self, X, X2=None):
        X = self.slice(X)
        X2 = self.slice(X2) if X2 is not None else None
        r = self._r(X, X2)
        v = self.variance.value
        if self.nu2 == 1:
            return v * jnp.exp(-r)
        if self.nu2 == 3:
            s = jnp.sqrt(3.0) * r
            return v * (1.0 + s) * jnp.exp(-s)
        s = jnp.sqrt(5.0) * r
        return v * (1.0 + s + jnp.square(s) / 3.0) * jnp.exp(-s)

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), jnp.squeeze(self.variance.value), dtype=X.dtype)


@struct.dataclass
class White:
    """White-noise kernel: σ²·I on matching inputs, 0 cross-covariance."""

    variance: Parameter

    @classmethod
    def create(cls, variance: float = 1.0, lr=None):
        return cls(variance=positive_param(variance, lr=lr))

    def K(self, X, X2=None):
        if X2 is None:
            return self.variance.value * jnp.eye(X.shape[0], dtype=X.dtype)
        return jnp.zeros((X.shape[0], X2.shape[0]), dtype=X.dtype)

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), jnp.squeeze(self.variance.value), dtype=X.dtype)


@struct.dataclass
class Constant:
    """Constant (bias) kernel: σ² everywhere."""

    variance: Parameter

    @classmethod
    def create(cls, variance: float = 1.0, lr=None):
        return cls(variance=positive_param(variance, lr=lr))

    def K(self, X, X2=None):
        n2 = X.shape[0] if X2 is None else X2.shape[0]
        return jnp.full((X.shape[0], n2), jnp.squeeze(self.variance.value), dtype=X.dtype)

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), jnp.squeeze(self.variance.value), dtype=X.dtype)


@struct.dataclass
class Sum:
    """k₁ + k₂ — composite over the same inputs."""

    k1: object
    k2: object

    @classmethod
    def create(cls, k1, k2) -> "Sum":
        """Compose two already-created kernels; per-group learning rates ride
        on the children's Parameters (created with their own ``lr=``)."""
        return cls(k1=k1, k2=k2)

    def K(self, X, X2=None):
        return self.k1.K(X, X2) + self.k2.K(X, X2)

    def Kdiag(self, X):
        return self.k1.Kdiag(X) + self.k2.Kdiag(X)


@struct.dataclass
class Product:
    """k₁ · k₂ — composite over the same inputs (use active_dims on the
    children for separable products over input blocks)."""

    k1: object
    k2: object

    @classmethod
    def create(cls, k1, k2) -> "Product":
        """Compose two already-created kernels; per-group learning rates ride
        on the children's Parameters (created with their own ``lr=``)."""
        return cls(k1=k1, k2=k2)

    def K(self, X, X2=None):
        return self.k1.K(X, X2) * self.k2.K(X, X2)

    def Kdiag(self, X):
        return self.k1.Kdiag(X) * self.k2.Kdiag(X)


@struct.dataclass
class Periodic:
    """Exact periodic (MacKay) kernel: σ²·exp(−2 Σ_d sin²(π(x−x')_d/p_d)/ℓ_d²).

    Not in the reference (SE-only). The natural temporal factor for
    spatio-temporal count data with daily/weekly cycles — drop it in as a
    Kronecker temporal factor (or Product it with an SE for decaying
    periodicity). ARD per-dimension lengthscales and periods.
    """

    lengthscales: Parameter
    period: Parameter
    variance: Parameter
    active_dims: Optional[Tuple[int, ...]] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, lengthscales, period, variance, active_dims=None, lr=None):
        ell = jnp.atleast_1d(jnp.asarray(lengthscales, dtype=jnp.result_type(float)))
        per = jnp.atleast_1d(jnp.asarray(period, dtype=jnp.result_type(float)))
        return cls(
            lengthscales=positive_param(ell, lr=lr),
            period=positive_param(per, lr=lr),
            variance=positive_param(variance, lr=lr),
            active_dims=tuple(active_dims) if active_dims is not None else None,
        )

    def _slice(self, X):
        if self.active_dims is None:
            return X
        return X[:, jnp.array(self.active_dims)]

    def K(self, X, X2=None):
        X = self._slice(X)
        X2 = X if X2 is None else self._slice(X2)
        diff = X[:, None, :] - X2[None, :, :]
        s = jnp.sin(jnp.pi * diff / self.period.value) / self.lengthscales.value
        return self.variance.value * jnp.exp(-2.0 * jnp.sum(jnp.square(s), axis=-1))

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), jnp.squeeze(self.variance.value), dtype=X.dtype)


@struct.dataclass
class RationalQuadratic:
    """σ²·(1 + r²/(2α))^−α — an SE with a gamma mixture of lengthscales
    (α → ∞ recovers SE). ARD lengthscales; trainable mixture weight α."""

    lengthscales: Parameter
    variance: Parameter
    alpha: Parameter
    active_dims: Optional[Tuple[int, ...]] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, lengthscales, variance, alpha: float = 1.0, active_dims=None, lr=None):
        ell = jnp.atleast_1d(jnp.asarray(lengthscales, dtype=jnp.result_type(float)))
        return cls(
            lengthscales=positive_param(ell, lr=lr),
            variance=positive_param(variance, lr=lr),
            alpha=positive_param(alpha, lr=lr),
            active_dims=tuple(active_dims) if active_dims is not None else None,
        )

    def _slice(self, X):
        if self.active_dims is None:
            return X
        return X[:, jnp.array(self.active_dims)]

    def K(self, X, X2=None):
        X = self._slice(X) / self.lengthscales.value
        X2 = X if X2 is None else self._slice(X2) / self.lengthscales.value
        d2 = jnp.sum(jnp.square(X[:, None, :] - X2[None, :, :]), axis=-1)
        a = self.alpha.value
        return self.variance.value * jnp.power(1.0 + d2 / (2.0 * a), -a)

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), jnp.squeeze(self.variance.value), dtype=X.dtype)


@struct.dataclass
class Linear:
    """σ²·⟨x, x'⟩ (dot-product kernel) with ARD per-dimension variances."""

    variances: Parameter
    active_dims: Optional[Tuple[int, ...]] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, variances, active_dims=None, lr=None):
        v = jnp.atleast_1d(jnp.asarray(variances, dtype=jnp.result_type(float)))
        return cls(
            variances=positive_param(v, lr=lr),
            active_dims=tuple(active_dims) if active_dims is not None else None,
        )

    def _slice(self, X):
        if self.active_dims is None:
            return X
        return X[:, jnp.array(self.active_dims)]

    def K(self, X, X2=None):
        X = self._slice(X)
        X2 = X if X2 is None else self._slice(X2)
        return jnp.einsum("nd,d,md->nm", X, self.variances.value, X2,
                          precision=linalg.bulk_precision())

    def Kdiag(self, X):
        X = self._slice(X)
        return jnp.einsum("nd,d,nd->n", X, self.variances.value, X,
                          precision=linalg.bulk_precision())
