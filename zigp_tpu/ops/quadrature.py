"""Gauss-Hermite quadrature for likelihood expectations.

The reference's classifier uses a plug-in approximation instead of quadrature
(scripts/classifier.py:213-217: var_exp = log p with p = Φ̃(μ/√(1+v))).
Gauss-Hermite is the quality option the BASELINE asks for; both are exposed
on the Bernoulli likelihood.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gauss_hermite_points(n: int, dtype=None):
    """Hermite nodes/weights normalised for E_{N(0,1)}[f] = Σ w_i f(x_i)."""
    x, w = np.polynomial.hermite.hermgauss(n)
    x = x * np.sqrt(2.0)
    w = w / np.sqrt(np.pi)
    if dtype is not None:
        return jnp.asarray(x, dtype=dtype), jnp.asarray(w, dtype=dtype)
    return jnp.asarray(x), jnp.asarray(w)


def expectation(fun, mu: jnp.ndarray, var: jnp.ndarray, n: int = 20) -> jnp.ndarray:
    """E_{g~N(mu, var)}[fun(g)], elementwise over mu/var, by n-point GH."""
    x, w = gauss_hermite_points(n, dtype=mu.dtype)
    g = mu[..., None] + jnp.sqrt(var)[..., None] * x
    return jnp.sum(w * fun(g), axis=-1)
