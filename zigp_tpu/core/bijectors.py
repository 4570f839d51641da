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
