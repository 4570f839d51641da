"""Jitted training step and the fit loop.

The reference's hot loop is ``sess.run([summary, train_op], feed_dict=...)``
per iteration (scripts/onoff.py:375-388) — a python↔TF boundary crossing with
feed_dict copies every step. Here the step is one jit-compiled function
``(model, opt_state, X, Y) -> (model, opt_state, loss)``; the whole
ELBO + grad + Adam update fuses into a single XLA executable and the host only
feeds fixed-shape minibatches.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import optax

from .data import DataSet


def make_train_step(optimizer: optax.GradientTransformation, loss_fn: Optional[Callable] = None):
    """Build a jitted step. ``loss_fn(model, X, Y)`` defaults to model.loss.

    model and opt_state buffers are DONATED: after a call, the arrays you
    passed in are invalid — always continue from the returned pytrees.
    """

    def _loss(model, X, Y):
        return loss_fn(model, X, Y) if loss_fn is not None else model.loss(X, Y)

    # donate model/opt_state: they are consumed and returned, so XLA can
    # update parameters in place instead of allocating fresh buffers
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(model, opt_state, X, Y):
        loss, grads = jax.value_and_grad(_loss)(model, X, Y)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return step


@dataclass
class FitResult:
    model: Any
    opt_state: Any
    losses: List[float] = field(default_factory=list)
    steps_per_sec: float = 0.0
    # True when training stopped early on Ctrl-C (after checkpointing for
    # resume). Callers that run multiple fits (the CV driver) must check this
    # and abort instead of treating the partial run as fully trained.
    interrupted: bool = False
    # Loss of the last trained step/block, populated by every trainer
    # regardless of log cadence — the health signal ensemble combining uses
    # to exclude members that ended mid-spike. NaN = unknown (e.g. a
    # zero-step run, or an interrupted one).
    final_loss: float = float("nan")


def block_for_interrupt(model, log_fn, interrupt: BaseException) -> None:
    """After a KeyboardInterrupt in a scanned loop, wait for the in-flight
    dispatch's outputs so the state is safe to checkpoint. If the interrupt
    landed inside the jitted step after its donated inputs were consumed but
    before the outputs were bound, there is no live state at all — re-raise
    the interrupt; ``--resume`` picks up from the last periodic checkpoint.
    """
    try:
        jax.block_until_ready(model)
    except RuntimeError:
        log_fn(
            "interrupted mid-step with donated buffers — no live state "
            "to checkpoint; resume from the last periodic checkpoint"
        )
        raise interrupt from None


def save_final(
    ckpt_manager, steps_done: int, restored_this_block: bool, model, opt_state, log_fn
) -> None:
    """Final save at completion, shared by every scanned trainer (reference:
    scripts/onoff.py:429-430 saves after the loop regardless of cadence) so
    restore-and-predict always sees the fully trained state.

    NOT after a last-block NaN restore: re-stamping the restored (older)
    state at ``steps_done`` would present a half-trained model as fully
    trained — the restore target already exists at its true step.
    """
    if restored_this_block:
        log_fn(
            f"run ended in a NaN-restored state — final checkpoint stays at "
            f"step {ckpt_manager.latest_step() if ckpt_manager else '?'}, "
            f"not {steps_done}"
        )
    elif ckpt_manager is not None and ckpt_manager.latest_step() != steps_done:
        ckpt_manager.save_at(steps_done, model, opt_state)


def fit(
    model,
    data: DataSet,
    *,
    num_iter: int,
    batch_size: int,
    optimizer: Optional[optax.GradientTransformation] = None,
    learning_rate: float = 1e-3,
    log_every: int = 200,
    log_fn: Callable[[str], None] = print,
    callback: Optional[Callable[[int, Any, float], None]] = None,
    loss_fn: Optional[Callable] = None,
    ckpt_manager=None,
    recover_on_nan: bool = True,
    opt_state=None,
) -> FitResult:
    """Adam training loop matching the reference driver's shape
    (scripts/onoff.py:375-427): minibatch, step, periodic logging/callback.

    Failure handling (the reference only has KeyboardInterrupt → save,
    scripts/onoff.py:425-427): with a ``ckpt_manager``
    (io.checkpoint.CheckpointManager), checkpoints are written at its cadence
    and — when ``recover_on_nan`` — a non-finite loss at a log point triggers
    a restore from the latest checkpoint instead of poisoning the run.
    """
    from .optim import make_optimizer

    if optimizer is None:
        optimizer = make_optimizer(model, default_lr=learning_rate)
    if opt_state is None:
        opt_state = optimizer.init(model)
    step = make_train_step(optimizer, loss_fn)

    losses: List[float] = []
    t_start = time.time()
    timed_steps = 0
    for i in range(num_iter):
        bx, by = data.next_batch(batch_size)
        X = jnp.asarray(bx)
        Y = jnp.asarray(by)
        model, opt_state, loss = step(model, opt_state, X, Y)
        if i == 0:
            # exclude compile time from throughput
            jax.block_until_ready(loss)
            t_start = time.time()
            timed_steps = 0
        timed_steps += 1
        # The finite-loss check runs at its own cadence, independent of
        # logging: with log_every=0 (the CV driver) recovery must still fire.
        check_every = log_every or 0
        if ckpt_manager is not None and recover_on_nan:
            cadence = getattr(ckpt_manager, "every", 0) or 200
            check_every = min(check_every or cadence, cadence)
        if check_every and i % check_every == 0:
            loss_val = float(loss)
            if not jnp.isfinite(loss_val):
                log_fn(f"iter {i:>8d}  NON-FINITE loss")
                if ckpt_manager is not None and recover_on_nan:
                    restored = ckpt_manager.restore_latest(model, opt_state)
                    if restored is not None:
                        model, opt_state, from_step = restored
                        log_fn(f"restored from checkpoint at step {from_step}")
                        continue
            if log_every and i % log_every == 0:
                losses.append(loss_val)
                log_fn(f"iter {i:>8d}  loss {loss_val:.6f}")
        if ckpt_manager is not None and i > 0:
            ckpt_manager.maybe_save(i, model, opt_state)
        if callback is not None:
            callback(i, model, loss)
    jax.block_until_ready(model)
    # Final save at completion (reference: scripts/onoff.py:429-430), matching
    # fit_scanned — restore-and-predict always sees the fully trained state.
    # Same gate as every other save site: never checkpoint unverified state.
    if (
        ckpt_manager is not None
        and num_iter > 0
        and ckpt_manager.latest_step() != num_iter
        and bool(jnp.isfinite(loss))
    ):
        ckpt_manager.save_at(num_iter, model, opt_state)
    elapsed = max(time.time() - t_start, 1e-12)
    return FitResult(
        model=model,
        opt_state=opt_state,
        losses=losses,
        steps_per_sec=timed_steps / elapsed,
        final_loss=float(loss) if num_iter > 0 else float("nan"),
    )
