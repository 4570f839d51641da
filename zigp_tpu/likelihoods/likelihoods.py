"""Likelihoods: expected log-density terms of the ELBO.

- ``Gaussian``: standard SVGP regression var-exp (scripts/svgp.py:201-203).
- ``OnOffGaussian``: the zero-inflated gated Gaussian with the extra ``Fmuvar``
  trace term from marginalising the support GP
  (onoffgpf/OnOffLikelihood.py:30-32, scripts/onoff.py:252-254).
- ``Bernoulli``: probit-link classification. The reference uses a *plug-in*
  predictive probability, var_exp = log p̃ with p̃ = Φ̃(μ/√(1+v))
  (scripts/classifier.py:210-217) — kept as the parity default — plus a
  Gauss-Hermite quadrature mode as the quality option.
- ``LogNormal`` / ``Gamma``: positive-support regression heads for the
  hurdle composite's conditional amount model y | y>0. The reference models
  the strictly-positive rain amounts with a Gaussian and clips predictions
  at zero post hoc (scripts/hurdle.py:338-377 ``max(pred, 0)``); these are
  the principled replacements (standard in the precipitation literature).
  Both have CLOSED-FORM variational expectations under a Gaussian q(f) —
  no quadrature in the training step.
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

    def sample_y(self, key, F):
        """One observation draw y ~ p(y|f) per latent sample in ``F``."""
        import jax

        return F + jnp.sqrt(self.variance.value) * jax.random.normal(
            key, F.shape, dtype=F.dtype
        )


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
class LogNormal:
    """Positive-support regression: log y | f ~ N(f, σ²), y > 0.

    The latent GP models the log amount, so the whole model is exactly a
    Gaussian SVGP on log y — the variational expectation is closed-form
    (the Gaussian one on log y minus the Jacobian term log y), and the
    posterior predictive is exactly LogNormal(Fmu, Fvar + σ²).

    Point prediction: ``predict_mean_and_var`` gives the predictive mean
    E[y] = exp(μ + s²/2) (optimal for squared error); ``predict_median``
    gives exp(μ) (optimal for absolute error — the heavy right tail makes
    the two differ materially, report both).
    """

    variance: Parameter  # σ²: observation noise of log y

    @classmethod
    def create(cls, variance: float = 0.1, lr=None) -> "LogNormal":
        return cls(variance=positive_param(variance, lr=lr))

    def variational_expectations(self, Fmu, Fvar, Y):
        v = self.variance.value
        logy = jnp.log(Y)
        return (
            -logy
            - 0.5 * np.log(2.0 * np.pi)
            - 0.5 * jnp.log(v)
            - 0.5 * (jnp.square(logy - Fmu) + Fvar) / v
        )

    def predict_mean_and_var(self, Fmu, Fvar):
        s2 = Fvar + self.variance.value
        mean = jnp.exp(Fmu + 0.5 * s2)
        var = (jnp.exp(s2) - 1.0) * jnp.exp(2.0 * Fmu + s2)
        return mean, var

    def predict_median(self, Fmu, Fvar):
        del Fvar
        return jnp.exp(Fmu)

    def nlpd(self, Fmu, Fvar, Y):
        """Exact per-point −log p(y*): the predictive is LogNormal(μ, Fvar+σ²)."""
        s2 = Fvar + self.variance.value
        logy = jnp.log(Y)
        return logy + 0.5 * jnp.log(2.0 * np.pi * s2) + 0.5 * jnp.square(logy - Fmu) / s2

    def sample_y(self, key, F):
        """One observation draw y ~ LogNormal(f, σ²) per latent sample."""
        import jax

        return jnp.exp(
            F + jnp.sqrt(self.variance.value)
            * jax.random.normal(key, F.shape, dtype=F.dtype)
        )


@struct.dataclass
class Gamma:
    """Positive-support regression: y | f ~ Gamma(shape α, mean exp(f)).

    Log mean link (rate β = α·e^{−f}). The variational expectation is
    closed-form because log p is linear in f up to E[e^{−f}], which is the
    Gaussian MGF: E_q[e^{−f}] = exp(−μ + v/2):

        E_q[log p(y|f)] = α log α − lΓ(α) + (α−1) log y − α μ
                          − α y exp(−μ + v/2).

    The shape α is a learned positive parameter (α=1 is exponential).
    """

    shape: Parameter  # α > 0

    @classmethod
    def create(cls, shape: float = 1.0, lr=None) -> "Gamma":
        return cls(shape=positive_param(shape, lr=lr))

    def variational_expectations(self, Fmu, Fvar, Y):
        from jax.scipy.special import gammaln

        a = self.shape.value
        return (
            a * jnp.log(a)
            - gammaln(a)
            + (a - 1.0) * jnp.log(Y)
            - a * Fmu
            - a * Y * jnp.exp(-Fmu + 0.5 * Fvar)
        )

    def predict_mean_and_var(self, Fmu, Fvar):
        a = self.shape.value
        mean = jnp.exp(Fmu + 0.5 * Fvar)  # E[e^f]
        # Var[y] = E[Var[y|f]] + Var[E[y|f]] = E[e^{2f}]/α + Var[e^f]
        var = jnp.exp(2.0 * Fmu + 2.0 * Fvar) / a + (jnp.exp(Fvar) - 1.0) * jnp.exp(
            2.0 * Fmu + Fvar
        )
        return mean, var

    def nlpd(self, Fmu, Fvar, Y, *, num_gh: int = 32):
        """−log p(y*) = −log E_{f~N(μ,v)}[Gamma(y; α, α e^{−f})] by GH
        quadrature with a log-sum-exp over the nodes."""
        from jax.scipy.special import gammaln, logsumexp

        a = self.shape.value
        x, w = quadrature.gauss_hermite_points(num_gh, dtype=Fmu.dtype)
        f = Fmu[..., None] + jnp.sqrt(jnp.maximum(Fvar, 0.0))[..., None] * x
        logp = (
            a * jnp.log(a)
            - gammaln(a)
            + (a - 1.0) * jnp.log(Y)[..., None]
            - a * f
            - a * Y[..., None] * jnp.exp(-f)
        )
        return -logsumexp(logp + jnp.log(w), axis=-1)

    def sample_y(self, key, F):
        """One draw y ~ Gamma(α, rate α e^{−f}) per latent sample (so the
        conditional mean is e^f): gamma(α)/rate."""
        import jax

        a = self.shape.value
        g = jax.random.gamma(key, a, F.shape, dtype=F.dtype)
        return g * jnp.exp(F) / a


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
