"""Likelihoods: expected log-density terms of the ELBO.

- ``Gaussian``: standard SVGP regression var-exp (scripts/svgp.py:201-203).
- ``OnOffGaussian``: the zero-inflated gated Gaussian with the extra ``Fmuvar``
  trace term from marginalising the support GP
  (onoffgpf/OnOffLikelihood.py:30-32, scripts/onoff.py:252-254).
- ``Bernoulli``: probit-link classification. The reference uses a *plug-in*
  predictive probability, var_exp = log p̃ with p̃ = Φ̃(μ/√(1+v))
  (scripts/classifier.py:210-217) — kept as the parity default — plus a
  Gauss-Hermite quadrature mode as the quality option.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.parameters import Parameter, positive_param
from ..ops import quadrature
from ..ops.probit import normcdf_clipped


@struct.dataclass
class Gaussian:
    variance: Parameter

    @classmethod
    def create(cls, variance: float = 0.01, lr=None) -> "Gaussian":
        return cls(variance=positive_param(variance, lr=lr))

    def variational_expectations(self, Fmu, Fvar, Y):
        v = self.variance.value
        return (
            -0.5 * np.log(2.0 * np.pi)
            - 0.5 * jnp.log(v)
            - 0.5 * (jnp.square(Y - Fmu) + Fvar) / v
        )

    def predict_mean_and_var(self, Fmu, Fvar):
        return Fmu, Fvar + self.variance.value


@struct.dataclass
class OnOffGaussian:
    """Gaussian likelihood for the probit-gated signal: the gate uncertainty
    enters as Fmuvar = Var[Φ(g)]·Fmu² in addition to the usual Fvar term."""

    variance: Parameter

    @classmethod
    def create(cls, variance: float = 0.01, lr=None) -> "OnOffGaussian":
        return cls(variance=positive_param(variance, lr=lr))

    def variational_expectations(self, Fmu, Fvar, Fmuvar, Y):
        v = self.variance.value
        return (
            -0.5 * np.log(2.0 * np.pi)
            - 0.5 * jnp.log(v)
            - 0.5 * (jnp.square(Y - Fmu) + Fvar + Fmuvar) / v
        )


@struct.dataclass
class Bernoulli:
    """Probit-link Bernoulli. ``num_gh=0`` reproduces the reference's plug-in
    approximation; ``num_gh>0`` uses Gauss-Hermite quadrature of
    E[log p(y|f)] (the standard variational treatment)."""

    num_gh: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def create(cls, num_gh: int = 0) -> "Bernoulli":
        return cls(num_gh=num_gh)

    @staticmethod
    def predict_prob(Fmu, Fvar):
        """p(y=1|x) = Φ̃(μ/√(1+v)) — exact for the (unclipped) probit link."""
        return normcdf_clipped(Fmu / jnp.sqrt(1.0 + Fvar))

    def variational_expectations(self, Fmu, Fvar, Y):
        if self.num_gh and self.num_gh > 0:
            def logp(f):
                p = normcdf_clipped(f)
                return jnp.where(jnp.equal(Y[..., None], 1.0), jnp.log(p), jnp.log1p(-p))

            return quadrature.expectation(logp, Fmu, Fvar, n=self.num_gh)
        p = self.predict_prob(Fmu, Fvar)
        return jnp.log(jnp.where(jnp.equal(Y, 1.0), p, 1.0 - p))
