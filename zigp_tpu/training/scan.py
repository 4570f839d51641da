"""Multi-step scanned training: K optimizer steps per device dispatch.

At this workload's shapes (Kron factors 10/100, minibatch 1000) a single
ELBO+grad+Adam step is microseconds of TPU compute — throughput is limited by
host-side dispatch latency (the reference pays a full feed_dict/session
round-trip per step, scripts/onoff.py:379). Staging a (K, B, D) block of
minibatches on device and running ``jax.lax.scan`` over K fused steps
amortizes one dispatch over K updates; the scanned body is compiled once.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def make_scan_train_step(
    optimizer: optax.GradientTransformation,
    loss_fn: Optional[Callable] = None,
    *,
    unroll: int = 4,
):
    """Returns jitted (model, opt_state, Xs, Ys) -> (model, opt_state, losses)
    where Xs: (K, B, D), Ys: (K, B, L); runs K sequential optimizer steps.

    model and opt_state buffers are DONATED: after a call, the arrays you
    passed in are invalid — always continue from the returned pytrees.

    ``unroll``: lax.scan unroll factor — unrolling lets XLA overlap adjacent
    iterations' independent small ops (measured ~18 % faster at 4 on v5e for
    the pptr config) at the cost of a larger compiled body. Semantics are
    identical for any value.
    """

    def _loss(model, X, Y):
        return loss_fn(model, X, Y) if loss_fn is not None else model.loss(X, Y)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(model, opt_state, Xs, Ys):
        def body(carry, batch):
            model, opt_state = carry
            X, Y = batch
            loss, grads = jax.value_and_grad(_loss)(model, X, Y)
            updates, opt_state = optimizer.update(grads, opt_state, model)
            model = optax.apply_updates(model, updates)
            return (model, opt_state), loss

        (model, opt_state), losses = jax.lax.scan(
            body, (model, opt_state), (Xs, Ys), unroll=unroll
        )
        return model, opt_state, losses

    return step


def stage_batches(data, batch_size: int, num_inner: int):
    """Pull num_inner minibatches from a DataSet into one (K, B, ...) block.

    Uses the dataset's native block-staging fast path (io.native.NativeDataSet
    ``next_block``, one C call) when present.
    """
    import numpy as np

    if hasattr(data, "next_block"):
        bx, by = data.next_block(batch_size, num_inner)
        return jnp.asarray(bx), jnp.asarray(by)
    xs, ys = [], []
    for _ in range(num_inner):
        bx, by = data.next_batch(batch_size)
        xs.append(bx)
        ys.append(by)
    return jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys))


def fit_scanned(
    model,
    data,
    *,
    num_iter: int,
    batch_size: int,
    num_inner: int = 50,
    optimizer: Optional[optax.GradientTransformation] = None,
    learning_rate: float = 1e-3,
    log_every_blocks: int = 1,
    log_fn: Callable[[str], None] = print,
    loss_fn: Optional[Callable] = None,
):
    """fit() with the scanned inner loop. num_iter is total optimizer steps."""
    import time

    from .loop import FitResult
    from .optim import make_optimizer

    if optimizer is None:
        optimizer = make_optimizer(model, default_lr=learning_rate)
    opt_state = optimizer.init(model)
    step = make_scan_train_step(optimizer, loss_fn)

    losses = []
    num_blocks = max(1, num_iter // num_inner)
    t_start = time.time()
    timed_steps = 0
    for b in range(num_blocks):
        Xs, Ys = stage_batches(data, batch_size, num_inner)
        model, opt_state, block_losses = step(model, opt_state, Xs, Ys)
        if b == 0:
            # exclude the compile block from throughput
            jax.block_until_ready(block_losses)
            t_start = time.time()
        else:
            timed_steps += num_inner
        if log_every_blocks and b % log_every_blocks == 0:
            last = float(block_losses[-1])
            losses.append(last)
            log_fn(f"step {(b + 1) * num_inner:>8d}  loss {last:.6f}")
    jax.block_until_ready(model)
    elapsed = max(time.time() - t_start, 1e-12)
    return FitResult(
        model=model,
        opt_state=opt_state,
        losses=losses,
        steps_per_sec=timed_steps / elapsed if timed_steps else 0.0,
    )
