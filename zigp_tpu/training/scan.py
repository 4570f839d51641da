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
    unroll: int = 8,
):
    """Returns jitted (model, opt_state, Xs, Ys) -> (model, opt_state, losses)
    where Xs: (K, B, D), Ys: (K, B, L); runs K sequential optimizer steps.

    model and opt_state buffers are DONATED: after a call, the arrays you
    passed in are invalid — always continue from the returned pytrees.

    ``unroll``: lax.scan unroll factor — unrolling lets XLA overlap adjacent
    iterations' independent small ops (measured on v5e for the pptr config:
    ~18 % faster at 4 vs 1, a further ~3 % at 8 with the solve-free
    chol_inv step) at the cost of a larger compiled body. Semantics are
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


def make_device_sampling_scan_step(
    optimizer: optax.GradientTransformation,
    Xtrain: jnp.ndarray,
    Ytrain: jnp.ndarray,
    batch_size: int,
    loss_fn: Optional[Callable] = None,
    *,
    unroll: int = 8,
):
    """Scanned train step with DEVICE-RESIDENT data and in-step minibatch
    sampling: (model, opt_state, keys (K, 2)) -> (model, opt_state, losses).

    The host pipeline ships (K, B, D) minibatch blocks to the device every
    dispatch; through this machine's TPU tunnel that transfer caps the 26k-
    inducing scale config at ~850 steps/s against a ~2,900 steps/s device
    rate (measured). Here the training set lives in HBM once (pptr: ~1.3 MB)
    and the whole dispatch's minibatches are drawn with ONE jax.random gather
    inside the step, so the per-dispatch host traffic is one PRNG key.

    Sampling is iid-uniform-with-replacement (the unbiased SVI estimator)
    rather than the host pipeline's shuffled epochs — statistically
    equivalent in expectation; use the host sampler to reproduce the
    reference's epoch schedule exactly.
    """
    Xtrain = jnp.asarray(Xtrain)
    Ytrain = jnp.asarray(Ytrain)
    N = Xtrain.shape[0]

    def _loss(model, X, Y):
        return loss_fn(model, X, Y) if loss_fn is not None else model.loss(X, Y)

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=(3,))
    def step(model, opt_state, block_key, num_inner):
        # ONE index draw + ONE gather for the whole dispatch (the host still
        # ships just the block key): the scan consumes pre-gathered (K, B, ·)
        # slices instead of gathering per step. Interleaved TPU A/B
        # (results/sampler_gather_ab.json): +5.6% steps/s at the latency-
        # bound flagship config, neutral at the MXU-bound champion/scale
        # configs (XLA overlaps the per-step gather's async copies there).
        # Same iid-uniform-with-replacement estimator and determinism
        # (indices are a pure function of the block key); HBM cost is the
        # staged block itself (K·B·(D+1) f32 — 6.4 MB at the champion
        # 100×4000).
        idx = jax.random.randint(block_key, (num_inner * batch_size,), 0, N)
        Xs = Xtrain[idx].reshape(num_inner, batch_size, *Xtrain.shape[1:])
        Ys = Ytrain[idx].reshape(num_inner, batch_size, *Ytrain.shape[1:])

        def body(carry, xy):
            model, opt_state = carry
            X, Y = xy
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
    opt_state=None,
    learning_rate: float = 1e-3,
    log_every_blocks: int = 1,
    log_fn: Callable[[str], None] = print,
    loss_fn: Optional[Callable] = None,
    start_step: int = 0,
    ckpt_manager=None,
    recover_on_nan: bool = True,
    metric_logger=None,
    hist_every: int = 0,
    callback: Optional[Callable] = None,
    callback_every: int = 0,
    sampler: str = "host",
    sampler_seed: int = 0,
    mesh=None,
    mesh_tp: bool = False,
    alternating: int = 0,
    alt_opt_factories=None,
):
    """fit() with the scanned inner loop. ``num_iter`` is the number of
    optimizer steps to run *in this call*; ``start_step`` offsets the step
    counter for logging/checkpoint naming on resume.

    ``sampler``: "host" (default) pulls shuffled-epoch minibatch blocks from
    ``data`` and ships them to the device each dispatch — the reference's
    epoch schedule, bit-reproducible. "device" keeps the training set in HBM
    and samples uniform minibatches inside the jitted step
    (make_device_sampling_scan_step) — per-dispatch host traffic drops to K
    PRNG keys, which matters when host→device bandwidth is the bottleneck
    (measured 857 → 2,250+ steps/s at the 26k-inducing scale config).
    Requires ``data`` to expose the ``.arrays`` property returning
    ``(X, Y)`` (DataSet and NativeDataSet both do).

    Production-path failure handling and observability (the pieces the
    reference runs with, scripts/onoff.py:290-303,341-342,390-392):

    - ``ckpt_manager`` (io.checkpoint.CheckpointManager): a checkpoint is
      written whenever a block crosses its cadence boundary, plus one at
      ``start_step`` when the directory is empty so NaN recovery always has a
      restore target.
    - ``recover_on_nan``: a non-finite block loss restores (model, opt_state)
      from the latest checkpoint instead of poisoning the rest of the run.
      Poisoned state is never checkpointed (finiteness is checked first).
    - ``metric_logger`` (utils.logging.MetricLogger): JSONL scalars
      (loss/elbo/kl/var_exp) at the log cadence; with ``hist_every`` > 0,
      parameter and gradient histograms at that step cadence (reference: TB
      histograms of every latent and gradient each 200 iters).
    - ``callback(step, model)`` every ``callback_every`` steps — the
      inducing-monitor hook (reference plots every 10k iters).

    ``alternating`` > 0: the block-coordinate schedule (training.alternating)
    — hyperparameters update once per that many steps by their own Adam
    chain, the q-only steps between run with the factorization hoisted out
    of the scan. Requires ``sampler="device"``, no mesh, the model's own
    loss, and ``alternating`` dividing ``num_inner``; ``opt_state`` becomes
    the ``(h_state, q_state)`` pair (``alt_opt_factories``: per-partition
    make_optimizer factories). Measured profile in RESULTS.md
    "Block-coordinate training".

    Multi-device training (new-design obligation — the reference is single
    process, SURVEY §2 "Parallelism: NONE"): pass a ``mesh``
    (parallel.make_mesh) to run the scanned step sharded — the per-step
    minibatch over the mesh ``data`` axis (pure data parallelism, parameters
    replicated), and with ``mesh_tp=True`` additionally the M-row variational
    parameters + Adam moments row-sharded over ``model`` (tensor
    parallelism). Works with both samplers; trajectories are numerically
    identical to single-device training (equivalence-tested at 1e-9 on the
    8-device CPU mesh, tests/test_parallel_scan.py). ``batch_size`` must
    divide by the data-axis size.
    """
    import time

    from .loop import FitResult, block_for_interrupt, save_final
    from .optim import make_optimizer

    device_mode = sampler == "device"
    if alternating:
        # Block-coordinate schedule (training.alternating): hypers update
        # once per `alternating` steps, q-only steps between with the
        # factorization hoisted out of the scan. Per-partition optimizers
        # replace the joint one.
        from .alternating import make_alternating_device_step

        if not device_mode or loss_fn is not None:
            raise ValueError(
                "alternating training requires sampler='device' and the "
                "model's own loss (loss_fn=None)"
            )
        if mesh_tp:
            raise ValueError(
                "alternating training supports data-parallel meshes only "
                "(mesh_tp=False)"
            )
        if num_inner % alternating:
            raise ValueError(
                f"scan_inner ({num_inner}) must divide by hyper_every "
                f"({alternating})"
            )
        if mesh is not None:
            # data-parallel block-coordinate training (VERDICT r4 #3):
            # replicate params, shard the staged batch over 'data'
            from ..parallel import replicate

            model = replicate(mesh, model)
        Xd, Yd = data.arrays
        step, opt_state0 = make_alternating_device_step(
            model,
            jnp.asarray(Xd),
            jnp.asarray(Yd),
            batch_size,
            hyper_every=alternating,
            learning_rate=learning_rate,
            opt_factories=alt_opt_factories,
            mesh=mesh,
        )
        if opt_state is None:
            opt_state = opt_state0
        elif mesh is not None:
            from ..parallel import replicate

            opt_state = replicate(mesh, opt_state)
    elif optimizer is None:
        optimizer = make_optimizer(model, default_lr=learning_rate)
    if opt_state is None:
        opt_state = optimizer.init(model)
    place = None
    if alternating:
        if mesh is not None:  # keep NaN-restore re-placement consistent
            from ..parallel import replicate

            place = replicate
    elif mesh is not None:
        from ..parallel import replicate
        from ..parallel.step import (
            make_device_sampling_sharded_scan_step,
            make_scan_sharded_train_step,
        )
        from ..parallel.tp import tp_place

        place = tp_place if mesh_tp else replicate
        model = place(mesh, model)
        opt_state = place(mesh, opt_state)
        if device_mode:
            Xd, Yd = data.arrays
            step = make_device_sampling_sharded_scan_step(
                optimizer, mesh, Xd, Yd, batch_size, loss_fn, tp=mesh_tp
            )
        else:
            step = make_scan_sharded_train_step(
                optimizer, mesh, loss_fn, tp=mesh_tp
            )
    elif device_mode:
        Xd, Yd = data.arrays
        step = make_device_sampling_scan_step(
            optimizer, jnp.asarray(Xd), jnp.asarray(Yd), batch_size, loss_fn
        )
    else:
        step = make_scan_train_step(optimizer, loss_fn)

    def _loss(m, X, Y):
        return loss_fn(m, X, Y) if loss_fn is not None else m.loss(X, Y)

    kl_fn = (
        jax.jit(lambda m: m.prior_kl()) if hasattr(model, "prior_kl") else None
    )
    grad_fn = jax.jit(jax.grad(_loss)) if (metric_logger and hist_every) else None

    if ckpt_manager is not None and ckpt_manager.latest_step() is None:
        ckpt_manager.save_at(start_step, model, opt_state)

    losses = []
    # ceil: never train FEWER steps than asked — the scanned execution model
    # rounds the run up to whole blocks (≤ num_inner−1 extra steps), matching
    # the reference's exact-count semantics as closely as one compiled block
    # shape allows. (Floor here silently shortchanged non-multiple requests.)
    num_blocks = max(1, -(-num_iter // num_inner))
    t_start = time.time()
    timed_steps = 0
    steps_done = start_step
    restored_this_block = False
    try:
        for b in range(num_blocks):
            restored_this_block = False
            if device_mode:
                # raw uint32[2] threefry key built host-side: one tiny async H2D
                # per block, zero device round-trips between dispatches
                import numpy as _np

                block_key = jnp.asarray(
                    _np.array(
                        [sampler_seed, start_step // num_inner + b], dtype=_np.uint32
                    )
                )
                model, opt_state, block_losses = step(
                    model, opt_state, block_key, num_inner
                )
            else:
                Xs, Ys = stage_batches(data, batch_size, num_inner)
                model, opt_state, block_losses = step(model, opt_state, Xs, Ys)
            prev_steps = steps_done
            steps_done += num_inner
            if b == 0:
                # exclude the compile block from throughput
                jax.block_until_ready(block_losses)
                t_start = time.time()
            else:
                timed_steps += num_inner

            is_log = log_every_blocks and b % log_every_blocks == 0
            ckpt_due = ckpt_manager is not None and ckpt_manager.crossed(prev_steps, steps_done)
            # Sync with the device only when this block needs the loss value —
            # at log points and checkpoint boundaries (never checkpoint unverified
            # state). NaN recovery piggybacks on those syncs rather than forcing
            # one per block: a per-block float() sync serializes host staging
            # against device compute and costs ~6× throughput at the 26k-inducing
            # scale config (measured); a NaN that strikes mid-interval is caught
            # at the next boundary and restores from the same last-good
            # checkpoint either way.
            if is_log or ckpt_due:
                last = float(block_losses[-1])
                if not jnp.isfinite(last):
                    log_fn(f"step {steps_done:>8d}  NON-FINITE loss")
                    if ckpt_manager is not None and recover_on_nan:
                        restored = ckpt_manager.restore_latest(model, opt_state)
                        if restored is not None:
                            model, opt_state, from_step = restored
                            if place is not None:
                                # restored leaves are host arrays; re-place to
                                # keep the compiled executable's shardings
                                model = place(mesh, model)
                                opt_state = place(mesh, opt_state)
                            restored_this_block = True
                            log_fn(f"restored from checkpoint at step {from_step}")
                    continue
                if ckpt_due:
                    ckpt_manager.save_at(steps_done, model, opt_state)
                if is_log:
                    losses.append(last)
                    log_fn(f"step {steps_done:>8d}  loss {last:.6f}")
                    if metric_logger is not None:
                        scalars = {"loss": last, "elbo": -last}
                        if kl_fn is not None:
                            kl = float(kl_fn(model))
                            scalars["kl"] = kl
                            scalars["var_exp"] = kl - last  # elbo = var_exp - kl
                        metric_logger.log(steps_done, scalars=scalars)
            if grad_fn is not None and (prev_steps // hist_every) != (steps_done // hist_every):
                if device_mode:
                    bx, by = data.next_batch(batch_size)
                    hist_X, hist_Y = jnp.asarray(bx), jnp.asarray(by)
                else:
                    hist_X, hist_Y = Xs[-1], Ys[-1]
                grads = grad_fn(model, hist_X, hist_Y)
                metric_logger.log_param_tree(steps_done, model, prefix="param")
                metric_logger.log_param_tree(steps_done, grads, prefix="grad")
            if (
                callback is not None
                and callback_every
                and (prev_steps // callback_every) != (steps_done // callback_every)
            ):
                callback(steps_done, model)
    except KeyboardInterrupt as ki:
        # reference behaviour: Ctrl-C breaks the loop and saves, so a manual
        # stop is resumable (scripts/onoff.py:425-430). The interruption is
        # surfaced on the result so multi-run callers (the CV driver) abort
        # instead of recording the partial fold as fully trained.
        block_for_interrupt(model, log_fn, ki)
        log_fn(f"interrupted at step {steps_done} — checkpointing for resume")
        if ckpt_manager is not None:
            # never checkpoint unverified state: same finiteness gate as
            # every other save_at site
            last = float(block_losses[-1]) if steps_done > start_step else 0.0
            if jnp.isfinite(last):
                ckpt_manager.save_at(steps_done, model, opt_state)
            else:
                log_fn("interrupt state is non-finite — not checkpointed")
        elapsed = max(time.time() - t_start, 1e-12)
        return FitResult(
            model=model,
            opt_state=opt_state,
            losses=losses,
            steps_per_sec=timed_steps / elapsed if timed_steps else 0.0,
            interrupted=True,
        )
    jax.block_until_ready(model)
    # Close the silent-NaN window (VERDICT r2 weak #4): with log_every=0 and
    # no checkpoint manager nothing above ever syncs a loss value, so a
    # poisoned run would complete silently. One final-loss check costs a
    # single sync at the end of the run.
    final_loss = float(block_losses[-1]) if num_blocks else 0.0
    if not jnp.isfinite(final_loss) and not restored_this_block:
        raise FloatingPointError(
            f"fit_scanned finished at step {steps_done} with a non-finite "
            f"loss ({final_loss}); the trained state is unusable. Enable "
            "checkpointing (ckpt_manager) to get NaN recovery mid-run."
        )
    save_final(ckpt_manager, steps_done, restored_this_block, model, opt_state, log_fn)
    elapsed = max(time.time() - t_start, 1e-12)
    return FitResult(
        model=model,
        opt_state=opt_state,
        losses=losses,
        steps_per_sec=timed_steps / elapsed if timed_steps else 0.0,
        final_loss=(
            final_loss if num_blocks and not restored_this_block else float("nan")
        ),
    )
