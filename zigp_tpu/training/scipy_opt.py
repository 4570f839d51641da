"""Scipy L-BFGS-B optimization of a model pytree.

Replicates gpflow-0.4 ``Model.optimize()`` (scipy L-BFGS-B wrapping a compiled
objective — notebook cell 10): flatten the Parameter pytree with
``ravel_pytree``, jit one value-and-grad function, and let scipy's C L-BFGS-B
drive it. Non-trainable Parameters get zero gradients (masked), exactly like
tf variables excluded from the train list.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from ..core.parameters import is_parameter


def _trainable_mask(model):
    def mask(p):
        if is_parameter(p):
            return jax.tree_util.tree_map(
                lambda leaf: jnp.ones_like(leaf) if p.trainable else jnp.zeros_like(leaf), p
            )
        return jax.tree_util.tree_map(jnp.ones_like, p)

    return jax.tree_util.tree_map(mask, model, is_leaf=is_parameter)


def scipy_optimize(
    model,
    loss_fn: Optional[Callable] = None,
    *,
    args: Tuple = (),
    maxiter: int = 1000,
    maxfun: Optional[int] = None,
    method: str = "L-BFGS-B",
    callback=None,
    options: Optional[dict] = None,
):
    """Minimize ``loss_fn(model, *args)`` (default: model.loss) over all
    trainable Parameters. Returns (optimized_model, scipy_result)."""
    from scipy.optimize import minimize

    flat0, unravel = ravel_pytree(model)
    mask_flat, _ = ravel_pytree(_trainable_mask(model))
    mask_np = np.asarray(mask_flat)

    def _loss(m):
        return loss_fn(m, *args) if loss_fn is not None else m.loss(*args)

    @jax.jit
    def value_and_grad(flat):
        m = unravel(flat)
        v, g = jax.value_and_grad(_loss)(m)
        gflat, _ = ravel_pytree(g)
        return v, gflat

    def fun(x):
        v, g = value_and_grad(jnp.asarray(x))
        return float(v), np.asarray(g, dtype=np.float64) * mask_np

    result = minimize(
        fun,
        np.asarray(flat0, dtype=np.float64),
        jac=True,
        method=method,
        options={
            "maxiter": maxiter,
            **({"maxfun": maxfun} if maxfun else {}),
            **(options or {}),
        },
        callback=callback,
    )
    return unravel(jnp.asarray(result.x)), result
