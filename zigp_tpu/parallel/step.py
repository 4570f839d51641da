"""Data-parallel training step over a device mesh.

``make_sharded_train_step`` jit-compiles the full ELBO+grad+Adam update with
parameters replicated and the minibatch sharded along the ``data`` axis. XLA
partitions the batch-dimension matmuls across devices and inserts a psum over
ICI for the var-exp sum and the gradient all-reduce — no hand-written
collectives needed for this workload shape (the per-step collective payload is
just the parameter-sized gradient tree).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax
from jax.sharding import Mesh

from .mesh import batch_sharding, replicated


def make_sharded_train_step(
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    loss_fn: Optional[Callable] = None,
):
    """Jitted (model, opt_state, X, Y) -> (model, opt_state, loss) with
    X, Y sharded over the mesh 'data' axis and everything else replicated."""

    def _loss(model, X, Y):
        return loss_fn(model, X, Y) if loss_fn is not None else model.loss(X, Y)

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    @jax.jit
    def _step(model, opt_state, X, Y):
        loss, grads = jax.value_and_grad(_loss)(model, X, Y)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    def step(model, opt_state, X, Y):
        X = jax.device_put(X, bsh)
        Y = jax.device_put(Y, bsh)
        return _step(model, opt_state, X, Y)

    step.jitted = _step
    return step
