"""Data-parallel training step over a device mesh.

``make_sharded_train_step`` jit-compiles the full ELBO+grad+Adam update with
parameters replicated and the minibatch sharded along the ``data`` axis. XLA
partitions the batch-dimension matmuls across devices and inserts a psum over
ICI for the var-exp sum and the gradient all-reduce — no hand-written
collectives needed for this workload shape (the per-step collective payload is
just the parameter-sized gradient tree).

``make_scan_sharded_train_step`` / ``make_device_sampling_sharded_scan_step``
combine that sharding with the production scanned execution model
(training/scan.py): K optimizer steps per dispatch under ``jax.lax.scan``,
with the per-step minibatch sharded over ``data`` and — optionally — the
M-row variational parameters (and their Adam moments) row-sharded over
``model`` (tensor parallelism, parallel/tp.py). The collectives run *inside*
the scan body; the loop carry keeps its shardings across iterations via
``with_sharding_constraint``, so the parameters never leave their devices
between the K steps of a dispatch.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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


def _scan_body_fns(optimizer, loss_fn, mesh, tp, cache):
    """Shared scan-body factory: one ELBO+grad+update step, re-constraining
    the carry's shardings when tensor parallelism is on (without the
    constraint XLA may re-replicate the updated parameters mid-scan)."""

    def _loss(model, X, Y):
        return loss_fn(model, X, Y) if loss_fn is not None else model.loss(X, Y)

    def body_step(model, opt_state, X, Y):
        loss, grads = jax.value_and_grad(_loss)(model, X, Y)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        if tp:
            model = jax.lax.with_sharding_constraint(model, cache["msh"])
            opt_state = jax.lax.with_sharding_constraint(opt_state, cache["osh"])
        return model, opt_state, loss

    def ensure_shardings(model, opt_state):
        if tp and "msh" not in cache:
            from .tp import tp_shardings_tree

            cache["msh"] = tp_shardings_tree(mesh, model)
            cache["osh"] = tp_shardings_tree(mesh, opt_state)

    return body_step, ensure_shardings


def make_scan_sharded_train_step(
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    loss_fn: Optional[Callable] = None,
    *,
    unroll: int = 8,
    tp: bool = False,
):
    """Scanned sharded train step: (model, opt_state, Xs, Ys) ->
    (model, opt_state, losses) running K = Xs.shape[0] sequential optimizer
    steps in ONE dispatch, each step's (B, D) minibatch sharded over the mesh
    ``data`` axis.

    With ``tp=False`` (pure data parallelism) the parameters are replicated
    and XLA inserts one gradient psum per scan iteration over ICI. With
    ``tp=True`` pass model/opt_state through ``tp_place(mesh, ...)`` first:
    the M-row variational leaves and their Adam moments stay row-sharded over
    ``model`` for the whole scan.

    model/opt_state buffers are DONATED. B must divide by the data-axis size.
    """
    cache = {}
    body_step, ensure = _scan_body_fns(optimizer, loss_fn, mesh, tp, cache)
    block_sh = NamedSharding(mesh, P(None, "data", None))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _step(model, opt_state, Xs, Ys):
        def body(carry, batch):
            model, opt_state = carry
            X, Y = batch
            model, opt_state, loss = body_step(model, opt_state, X, Y)
            return (model, opt_state), loss

        (model, opt_state), losses = jax.lax.scan(
            body, (model, opt_state), (Xs, Ys), unroll=unroll
        )
        return model, opt_state, losses

    def step(model, opt_state, Xs, Ys):
        ensure(model, opt_state)
        n_data = mesh.shape["data"]
        assert Xs.shape[1] % n_data == 0, (
            f"batch size {Xs.shape[1]} not divisible by data axis {n_data}"
        )
        Xs = jax.device_put(Xs, block_sh)
        Ys = jax.device_put(Ys, block_sh)
        return _step(model, opt_state, Xs, Ys)

    step.jitted = _step
    return step


def make_device_sampling_sharded_scan_step(
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    Xtrain,
    Ytrain,
    batch_size: int,
    loss_fn: Optional[Callable] = None,
    *,
    unroll: int = 8,
    tp: bool = False,
):
    """Sharded variant of training/scan.make_device_sampling_scan_step: the
    training set lives replicated in HBM, each scan iteration draws a uniform
    minibatch with jax.random inside the step (identical index sequence to
    the single-device sampler for the same key), and the drawn batch is
    constrained to the mesh ``data`` axis so the ELBO/grad compute shards.
    Per-dispatch host traffic is one PRNG key.
    """
    Xtrain = jnp.asarray(Xtrain)
    Ytrain = jnp.asarray(Ytrain)
    N = Xtrain.shape[0]
    n_data = mesh.shape["data"]
    assert batch_size % n_data == 0, (
        f"batch size {batch_size} not divisible by data axis {n_data}"
    )

    cache = {}
    body_step, ensure = _scan_body_fns(optimizer, loss_fn, mesh, tp, cache)
    blk_sh = NamedSharding(mesh, P(None, "data", None))
    rep = NamedSharding(mesh, P())
    Xtrain = jax.device_put(Xtrain, rep)
    Ytrain = jax.device_put(Ytrain, rep)

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=(3,))
    def _step(model, opt_state, block_key, num_inner):
        # ONE draw + ONE gather per dispatch, exactly like the single-device
        # sampler (same randint call on the same key → identical index
        # sequence); the staged block is row-sharded over ``data`` so each
        # scan slice arrives already distributed. See
        # training/scan.make_device_sampling_scan_step for the staging
        # rationale (per-step gathers re-stage the training set every step).
        idx = jax.random.randint(block_key, (num_inner * batch_size,), 0, N)
        Xs = jax.lax.with_sharding_constraint(
            Xtrain[idx].reshape(num_inner, batch_size, *Xtrain.shape[1:]), blk_sh
        )
        Ys = jax.lax.with_sharding_constraint(
            Ytrain[idx].reshape(num_inner, batch_size, *Ytrain.shape[1:]), blk_sh
        )

        def body(carry, xy):
            model, opt_state = carry
            X, Y = xy
            model, opt_state, loss = body_step(model, opt_state, X, Y)
            return (model, opt_state), loss

        (model, opt_state), losses = jax.lax.scan(
            body, (model, opt_state), (Xs, Ys), unroll=unroll
        )
        return model, opt_state, losses

    def step(model, opt_state, block_key, num_inner):
        ensure(model, opt_state)
        return _step(model, opt_state, block_key, num_inner)

    step.jitted = _step
    return step
