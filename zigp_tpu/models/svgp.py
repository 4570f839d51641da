"""Dense-inducing-point sparse variational GP (SVGP).

The single-GP building block: Gaussian likelihood gives the svgp regressor
(reference scripts/svgp.py), Bernoulli gives the sparse GP classifier. The
model is a flax-struct pytree; ``elbo``/``predict_f`` are pure functions of it
and jit/grad straight through.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.config import default_jitter
from ..core.parameters import Parameter, param, positive_param
from ..ops import conditionals, gauss_kl, linalg


@struct.dataclass
class SVGP:
    kernel: Any
    likelihood: Any
    Z: Parameter
    q_mu: Parameter
    q_sqrt: Parameter
    mean_const: Optional[Parameter]
    num_data: int = struct.field(pytree_node=False)
    whiten: bool = struct.field(pytree_node=False)
    q_diag: bool = struct.field(pytree_node=False)
    jitter: float = struct.field(pytree_node=False)

    @classmethod
    def create(
        cls,
        kernel,
        likelihood,
        Z: np.ndarray,
        *,
        num_data: int,
        num_latent: int = 1,
        whiten: bool = False,
        q_diag: bool = True,
        jitter: Optional[float] = None,
        mean_const: Optional[float] = None,
        q_mu_init: Optional[np.ndarray] = None,
        seed: int = 0,
        lr: Optional[float] = None,
    ) -> "SVGP":
        M = Z.shape[0]
        rng = np.random.RandomState(seed)
        q_mu = q_mu_init if q_mu_init is not None else rng.randn(M, num_latent) * 0.01
        if q_diag:
            q_sqrt = positive_param(np.ones((M, num_latent)), lr=lr)
        else:
            eye = np.stack([np.eye(M)] * num_latent, axis=2)
            from ..core.bijectors import FillLowerTriangular

            q_sqrt = param(eye, FillLowerTriangular(), lr=lr)
        return cls(
            kernel=kernel,
            likelihood=likelihood,
            Z=param(Z, lr=lr),
            q_mu=param(q_mu, lr=lr),
            q_sqrt=q_sqrt,
            mean_const=None if mean_const is None else param(mean_const, lr=lr),
            num_data=int(num_data),
            whiten=whiten,
            q_diag=q_diag,
            jitter=float(jitter if jitter is not None else default_jitter()),
        )

    # ---- math ----
    def prior_kl(self) -> jnp.ndarray:
        if self.whiten:
            return gauss_kl.gauss_kl(self.q_mu.value, self.q_sqrt.value, None)
        Kmm = linalg.add_jitter(self.kernel.K(self.Z.value), self.jitter)
        return gauss_kl.gauss_kl(self.q_mu.value, self.q_sqrt.value, Kmm)

    def predict_f(self, Xnew: jnp.ndarray, *, full_cov: bool = False):
        fmean, fvar = conditionals.conditional(
            Xnew,
            self.Z.value,
            self.kernel,
            self.q_mu.value,
            full_cov=full_cov,
            q_sqrt=self.q_sqrt.value,
            whiten=self.whiten,
            jitter=self.jitter,
        )
        if self.mean_const is not None:
            fmean = fmean + self.mean_const.value
        return fmean, fvar

    def predict_f_samples(
        self, key, Xnew: jnp.ndarray, num_samples: int = 1, *, full_cov: bool = False
    ) -> jnp.ndarray:
        """Posterior function samples, (S, N, L). full_cov draws jointly."""
        import jax

        fmean, fvar = self.predict_f(Xnew, full_cov=full_cov)
        if full_cov:
            # fvar: (N, N, L) -> per-latent joint draws
            L_latent = fmean.shape[1]
            eps = jax.random.normal(
                key, (num_samples, Xnew.shape[0], L_latent), dtype=fmean.dtype
            )
            outs = []
            for k in range(L_latent):
                C = linalg.add_jitter(fvar[:, :, k], self.jitter)
                Lc = linalg.cholesky(C)
                outs.append(fmean[:, k][None] + eps[:, :, k] @ Lc.T)
            return jnp.stack(outs, axis=-1)
        eps = jax.random.normal(key, (num_samples,) + fmean.shape, dtype=fmean.dtype)
        return fmean[None] + jnp.sqrt(jnp.maximum(fvar, 0.0))[None] * eps

    def elbo(self, X: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
        kl = self.prior_kl()
        fmean, fvar = self.predict_f(X)
        var_exp = self.likelihood.variational_expectations(fmean, fvar, Y)
        scale = jnp.asarray(self.num_data, dtype=X.dtype) / X.shape[0]
        return jnp.sum(var_exp) * scale - kl

    def loss(self, X: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
        return -self.elbo(X, Y)
