"""Probit-gate expectations E[Φ(g)], E[Φ²(g)], Var[Φ(g)] under q(g)=N(μ,σ²).

Re-design of ``OnOffSVGP.ProbitExpectations`` (onoffgpf/OnOffSVGP.py:168-204)
and its clones (scripts/onoff.py:256-280, onofftf/onoffpred.py:234-258):

    z = μ/√(1+σ²),  a = 1/√(1+2σ²)
    E[Φ(g)]  = Φ̃(z)
    E[Φ²(g)] = Φ̃(z) − 2T(z, a)         (T = Owen's T)
    Var[Φ(g)] = E[Φ²] − E[Φ]²

with the reference's numerical guards kept exactly: the clipped normal CDF
Φ̃(x) = Φ(x)(1−2e−3)+1e−3, the Owen's-T *lower bound*
T(h,a) ≥ (arctan(a)/2π)·exp(−h²(a²+1)/2), and negative-part clipping via
(x+|x|)/2. ``exact_owen_t`` provides a high-accuracy alternative (vectorized
Gauss-Legendre on the integral definition) as the quality option.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erf


def normcdf_clipped(x: jnp.ndarray) -> jnp.ndarray:
    """Φ(x)·(1−2e−3) + 1e−3 — keeps probabilities in [1e−3, 1−1e−3]."""
    phi = 0.5 * (1.0 + erf(x / np.sqrt(2.0)))
    return phi * (1.0 - 2.0e-3) + 1.0e-3


def owen_t_bound(h: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Reference's closed-form lower bound on Owen's T (OnOffSVGP.py:180-188)."""
    h = jnp.abs(h)
    term1 = jnp.arctan(a) / (2.0 * np.pi)
    term2 = jnp.exp(-0.5 * jnp.square(h) * (jnp.square(a) + 1.0))
    return term1 * term2


def owen_t_exact(h: jnp.ndarray, a: jnp.ndarray, order: int = 32) -> jnp.ndarray:
    """Owen's T by Gauss-Legendre quadrature of T(h,a)=∫₀ᵃ e^{−h²(1+t²)/2}/(2π(1+t²)) dt.

    Accurate to ~1e-10 for the a∈(0,1] range used here (a=1/√(1+2σ²)).
    """
    nodes, weights = np.polynomial.legendre.leggauss(order)
    dtype = jnp.result_type(h.dtype, a.dtype)
    nodes = jnp.asarray(nodes, dtype=dtype)
    weights = jnp.asarray(weights, dtype=dtype)
    # map [-1,1] -> [0,a]
    t = 0.5 * a[..., None] * (nodes + 1.0)
    w = 0.5 * a[..., None] * weights
    h2 = jnp.square(h)[..., None]
    integrand = jnp.exp(-0.5 * h2 * (1.0 + jnp.square(t))) / (2.0 * np.pi * (1.0 + jnp.square(t)))
    return jnp.sum(w * integrand, axis=-1)


class ProbitExpectations(NamedTuple):
    e_phi: jnp.ndarray  # E[Φ(g)]
    e_phi_sq: jnp.ndarray  # E[Φ²(g)]
    var_phi: jnp.ndarray  # Var[Φ(g)]


def probit_expectations(
    gmean: jnp.ndarray, gvar: jnp.ndarray, *, exact: bool = False
) -> ProbitExpectations:
    z = gmean / jnp.sqrt(1.0 + gvar)
    a = 1.0 / jnp.sqrt(1.0 + 2.0 * gvar)

    cdfz = normcdf_clipped(z)
    # Owen's T is even in h; both paths take |h|.
    tz = owen_t_exact(jnp.abs(z), a) if exact else owen_t_bound(z, a)

    e_phi = cdfz
    e_phi_sq = cdfz - 2.0 * tz
    var_phi = cdfz - 2.0 * tz - jnp.square(cdfz)

    # clip negative variance terms to zero: (x+|x|)/2 (OnOffSVGP.py:201-202)
    e_phi_sq = 0.5 * (e_phi_sq + jnp.abs(e_phi_sq))
    var_phi = 0.5 * (var_phi + jnp.abs(var_phi))

    return ProbitExpectations(e_phi, e_phi_sq, var_phi)


def probit(x: jnp.ndarray) -> jnp.ndarray:
    """Clipped probit link used by the classifier (scripts/classifier.py:216)."""
    return normcdf_clipped(x)
