"""Global numerics policy: float dtype and jitter.

The reference hard-codes three different jitters (1e-5 in scripts/onoff.py:18,
1e-4 in onofftf/main.py:11, 1e-6 in onofftf/onoffpred.py:12) and a module-level
float type. Here both are a single config point, overridable per call site.

On TPU the production dtype is float32 (with a larger default jitter for
Cholesky stability); parity tests against the float64 reference run on CPU with
``jax_enable_x64`` turned on.
"""

from __future__ import annotations

import dataclasses
from contextlib import contextmanager

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Settings:
    # Jitter added to the diagonal of inducing-point gram matrices before
    # Cholesky. The gpflow-0.4 default (used by the toy OnOffSVGP path,
    # onoffgpf/OnOffSVGP.py:96) is 1e-6; the pptr scripts use 1e-5.
    jitter: float = 1e-6
    # float32 jitter floor: f32 Cholesky on TPU needs more regularisation.
    jitter_f32: float = 1e-5


_settings = Settings()


def settings() -> Settings:
    return _settings


def default_float() -> jnp.dtype:
    """float64 iff the jax x64 flag is on (parity/CPU mode), else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_jitter(dtype=None) -> float:
    dtype = dtype or default_float()
    if jnp.dtype(dtype) == jnp.float64:
        return _settings.jitter
    return max(_settings.jitter, _settings.jitter_f32)


@contextmanager
def jitter_level(value: float):
    """Temporarily override the global jitter (both precisions)."""
    old = (_settings.jitter, _settings.jitter_f32)
    _settings.jitter = value
    _settings.jitter_f32 = value
    try:
        yield
    finally:
        _settings.jitter, _settings.jitter_f32 = old
