"""Bijectors mapping unconstrained optimizer space <-> constrained parameters.

Functional re-design of gpflow-0.4 ``transforms`` (used by the reference at
onoffgpf/OnOffSVGP.py:61,67 and scripts/onoff.py:88,120) and of the reference's
own Param transform plumbing (onofftf/main.py:137-174). Each bijector is a
stateless singleton with ``forward`` (unconstrained -> constrained, traced
under jit) and ``inverse`` (constrained -> unconstrained, used once at init,
numpy is fine).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class Bijector:
    name = "bijector"

    def forward(self, x):
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError

    def __repr__(self):
        return self.name

    # Bijectors are stateless; make them hashable/comparable so pytrees that
    # carry them as static metadata compare equal across jit calls.
    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self):
        return hash((type(self), tuple(sorted(self.__dict__.items()))))


class Identity(Bijector):
    name = "identity"

    def forward(self, x):
        return x

    def inverse(self, y):
        return y


class Softplus(Bijector):
    """y = log(1 + exp(x)) + lower.

    Matches gpflow-0.4 ``transforms.Log1pe`` (a.k.a. ``transforms.positive``)
    including its 1e-6 lower bound, so that parameters initialised at the
    same constrained value take the same unconstrained value as the reference.
    """

    name = "softplus"

    def __init__(self, lower: float = 1e-6):
        self.lower = lower

    def forward(self, x):
        # Numerically stable softplus.
        return jnp.logaddexp(x, 0.0) + self.lower

    def inverse(self, y):
        # log(exp(y - lower) - 1), stable form: y + log(1 - exp(-(y-lower))).
        # jnp so it is traceable (used inside jitted natural-gradient steps);
        # plain numpy inputs work too.
        ys = jnp.asarray(y) - self.lower
        return ys + jnp.log(-jnp.expm1(-ys))


class Exp(Bijector):
    name = "exp"

    def __init__(self, lower: float = 0.0):
        self.lower = lower

    def forward(self, x):
        return jnp.exp(x) + self.lower

    def inverse(self, y):
        return np.log(np.asarray(y, dtype=np.float64) - self.lower)


class Sigmoid(Bijector):
    """Interval constraint: y = lo + (hi − lo)·σ(x).

    The gpflow-0.4 ``transforms.Logistic`` equivalent (the reference never
    uses it — its hyperparameters are unbounded). Built for drift-prone
    hyperparameters whose training trajectory can leave the numerically
    safe region (measured: periodic-kernel lengthscales/periods under the
    champion budget, results/champ_periodic_probes.json) — the bound is a
    hard trust interval, smooth everywhere, with vanishing gradient at the
    walls. ``lo``/``hi`` are scalars or 1-D sequences matching the
    parameter (stored as tuples so the bijector stays hashable static
    pytree metadata).
    """

    name = "sigmoid"

    def __init__(self, lo, hi):
        lo_a = np.ravel(np.asarray(lo, dtype=np.float64))
        hi_a = np.ravel(np.asarray(hi, dtype=np.float64))
        if not (hi_a > lo_a).all():
            raise ValueError(f"Sigmoid bounds need hi > lo, got {lo} .. {hi}")
        self.lo = float(lo_a[0]) if lo_a.size == 1 else tuple(map(float, lo_a))
        self.hi = float(hi_a[0]) if hi_a.size == 1 else tuple(map(float, hi_a))

    def forward(self, x):
        lo = jnp.asarray(self.lo, dtype=x.dtype)
        hi = jnp.asarray(self.hi, dtype=x.dtype)
        # stable logistic via tanh
        return lo + (hi - lo) * 0.5 * (jnp.tanh(0.5 * x) + 1.0)

    def inverse(self, y):
        y = jnp.asarray(y)
        lo = jnp.asarray(self.lo, dtype=y.dtype)
        hi = jnp.asarray(self.hi, dtype=y.dtype)
        p = (y - lo) / (hi - lo)
        return jnp.log(p) - jnp.log1p(-p)


class FillLowerTriangular(Bijector):
    """Unconstrained (M, M) (or (M, M, K)) matrix -> its lower triangle.

    Equivalent in effect to gpflow-0.4 ``transforms.LowerTriangular`` combined
    with the reference's ``tf.matrix_band_part(..., -1, 0)`` masking
    (onofftf/main.py:212): the strictly-upper entries are zeroed on read, so
    they receive zero gradient and stay inert.
    """

    name = "fill_tril"

    def forward(self, x):
        return jnp.tril(x) if x.ndim == 2 else jnp.tril(x.transpose(2, 0, 1)).transpose(1, 2, 0)

    def inverse(self, y):
        return np.asarray(y)


identity = Identity()
positive = Softplus()  # gpflow-0.4 `transforms.positive`
