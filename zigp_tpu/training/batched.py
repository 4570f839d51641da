"""Batched training over a stacked leading axis: all CV folds (or all seeds
of an ensemble) trained simultaneously on one chip.

The reference runs its 5-fold protocol strictly sequentially — one TF1 graph
build + session per fold (scripts/onoff.py:22, driven fold-by-fold per
README.md:17-26). This framework's sequential CV driver already collapses the
per-fold graph rebuild into a cached jit, but each fold still pays its own
compile (~40 s through this machine's TPU tunnel) and its own dispatch stream,
and at the flagship shapes the per-step device program is *latency*-bound,
not FLOPs-bound (RESULTS.md: 111 µs/step against ~121 µs of leaf work at
B=1000) — the MXU is mostly idle.

TPU-native fix: stack the F per-fold models into ONE pytree (leading axis F
on every leaf, statics shared), keep every fold's training set in HBM, and
``jax.vmap`` the device-sampling scanned train step over the fold axis. One
compile, one dispatch stream, and every small op becomes a batch-F op — the
same latency now buys F folds of progress. The pptr protocol is the ideal
case: 113,015 = 5 × 22,603 points, so all five folds have *identical* shapes
and ELBO scale constants.

Per-fold math is unchanged: fold f samples minibatches with the same threefry
key stream a sequential ``fit_scanned(sampler="device", sampler_seed=seed_f)``
run would use, so trajectories match the sequential ones (equivalence-tested
in tests/test_batched.py).

Ragged stacks (e.g. the hurdle's per-fold "on" subsets, whose sizes differ):
pad each fold's data to the max length and pass ``num_rows`` — minibatch
indices are drawn in [0, num_rows[f]), so padding rows are never sampled —
plus ``aux`` per-fold ELBO scales via ``loss_fn(model, X, Y, aux)`` for
models whose ``num_data`` differs (the static field can't be stacked).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax


def stack_pytrees(trees: Sequence[Any]):
    """Stack equal-structure pytrees along a new leading axis.

    Every tree must have the same treedef — including static (non-pytree)
    fields like ``num_data``: models that differ there cannot be stacked
    (build them with a shared placeholder and pass the true value via
    ``aux``/``loss_fn`` instead).
    """
    treedefs = [jax.tree_util.tree_structure(t) for t in trees]
    if any(td != treedefs[0] for td in treedefs[1:]):
        raise ValueError(
            "cannot stack: pytree structures differ (check static fields such "
            f"as num_data/whiten/jitter): {[str(td) for td in treedefs]}"
        )
    leaves = [jax.tree_util.tree_leaves(t) for t in trees]
    for i, group in enumerate(zip(*leaves)):
        shapes = {getattr(x, "shape", ()) for x in group}
        if len(shapes) > 1:
            path = jax.tree_util.tree_flatten_with_path(trees[0])[0][i][0]
            raise ValueError(
                f"cannot stack: leaf {jax.tree_util.keystr(path)} has "
                f"mismatched shapes across members: {sorted(shapes)}"
            )
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def unstack_pytree(stacked, index: int):
    """Slice member ``index`` out of a stacked pytree."""
    return jax.tree_util.tree_map(lambda x: x[index], stacked)


def member_place(mesh, tree):
    """Shard a stacked pytree's leading member axis over the mesh ``data``
    axis (device_put; every other axis replicated).

    This is the natural multi-chip mapping for CV folds and seed ensembles:
    the member axis is embarrassingly parallel, so a member-sharded stack
    trains with ZERO per-step collectives — each device runs its F/D members'
    full math locally and the only communication is the final unstack fetch.
    Contrast dp (gradient psum per step) and tp (gathers in the conditional):
    member sharding is the reference protocol's ideal scaling axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def sh(x):
        x = jnp.asarray(x)
        return jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        )

    return jax.tree_util.tree_map(sh, tree)


def _check_member_mesh(mesh, F: int):
    n = mesh.shape["data"]
    if F % n != 0:
        raise ValueError(
            f"member count {F} must divide by the mesh data axis ({n}) for "
            "member-axis sharding — pad the stack or change the mesh"
        )


def _member_pad_ids(mesh, F: int):
    """Member indices padded cyclically to a multiple of the mesh data axis.

    The fit_* drivers use this so any member count runs on any device count
    (5 CV folds over 8 chips, etc.): pad members duplicate a real member AND
    its sampler seed, so their trajectories are bit-identical to the member
    they copy — no new NaN risk, no behavioral change — and they are dropped
    from the returned results.
    """
    D = mesh.shape["data"]
    P = -(-F // D) * D
    return list(range(F)) + [i % F for i in range(P - F)]


def _stacked_first_rows_loss(stacked, xys, batch_size, *, loss_fn=None, aux=None):
    """Per-member loss of a stacked pytree on each member's first
    min(batch_size, shortest-member) rows — the deterministic health signal
    populated on no-op resume paths, where no trained-block loss exists.
    (For ragged stacks the slice is over real rows of every member since it
    is capped at the shortest; for the loss_fn+aux convention see
    make_batched_device_sampling_scan_step.)"""
    b0 = min(batch_size, min(x.shape[0] for x, _ in xys))
    Xb = jnp.asarray(np.stack([np.asarray(x)[:b0] for x, _ in xys]))
    Yb = jnp.asarray(np.stack([np.asarray(y)[:b0] for _, y in xys]))
    lf = loss_fn if loss_fn is not None else (lambda m, X, Y, a: m.loss(X, Y))
    return np.asarray(jax.jit(jax.vmap(lf))(stacked, Xb, Yb, aux))


def make_batched_device_sampling_scan_step(
    optimizer: optax.GradientTransformation,
    Xs: jnp.ndarray,
    Ys: jnp.ndarray,
    batch_size: int,
    loss_fn: Optional[Callable] = None,
    *,
    num_rows: Optional[jnp.ndarray] = None,
    aux=None,
    unroll: int = 8,
    mesh=None,
):
    """Scanned+vmapped train step over stacked members with HBM-resident data.

    Xs: (F, N, D), Ys: (F, N, L) — the F members' training sets (pad ragged
    folds to a common N and set ``num_rows`` (F,) to each fold's true row
    count; padded rows are never sampled).

    aux: optional per-member pytree (leading axis F on every leaf) forwarded
    to ``loss_fn(model, X, Y, aux_f)`` — the hook for per-fold ELBO scales
    when ``num_data`` can't live in the (static) model field.

    Returns jitted (models, opt_states, block_keys (F, 2), num_inner) ->
    (models, opt_states, losses (F, K)). models/opt_states are stacked
    pytrees and are DONATED.
    """
    Xs = jnp.asarray(Xs)
    Ys = jnp.asarray(Ys)
    if Xs.ndim != 3:
        raise ValueError(f"Xs must be (F, N, D), got {Xs.shape}")
    N = Xs.shape[1]
    rows = jnp.full((Xs.shape[0],), N, dtype=jnp.int32) if num_rows is None else jnp.asarray(num_rows, jnp.int32)
    if mesh is not None:
        _check_member_mesh(mesh, Xs.shape[0])
        Xs, Ys, rows = member_place(mesh, (Xs, Ys, rows))
        if aux is not None:
            aux = member_place(mesh, aux)

    if loss_fn is None:
        _loss = lambda model, X, Y, a: model.loss(X, Y)  # noqa: E731
    else:
        _loss = loss_fn

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=(3,))
    def step(models, opt_states, block_keys, num_inner):
        def one_member(model, opt_state, Xf, Yf, block_key, nf, aux_f):
            # same per-member key stream as fit_scanned's device sampler:
            # ONE index draw + ONE gather per dispatch (per-step gathers
            # re-stage the member's training rows into scoped VMEM every
            # step — see training/scan.make_device_sampling_scan_step)
            idx = jax.random.randint(block_key, (num_inner * batch_size,), 0, nf)
            Xg = Xf[idx].reshape(num_inner, batch_size, *Xf.shape[1:])
            Yg = Yf[idx].reshape(num_inner, batch_size, *Yf.shape[1:])

            def body(carry, xy):
                model, opt_state = carry
                X, Y = xy
                loss, grads = jax.value_and_grad(_loss)(model, X, Y, aux_f)
                updates, opt_state = optimizer.update(grads, opt_state, model)
                model = optax.apply_updates(model, updates)
                return (model, opt_state), loss

            (model, opt_state), losses = jax.lax.scan(
                body, (model, opt_state), (Xg, Yg), unroll=unroll
            )
            return model, opt_state, losses

        return jax.vmap(one_member)(models, opt_states, Xs, Ys, block_keys, rows, aux)

    return step


def fit_batched_scanned(
    models: Sequence[Any],
    datas: Sequence[Any],
    *,
    num_iter: int,
    batch_size: int,
    num_inner: int = 50,
    optimizer: Optional[optax.GradientTransformation] = None,
    learning_rate: float = 1e-3,
    loss_fn: Optional[Callable] = None,
    aux=None,
    seeds: Optional[Sequence[int]] = None,
    log_every_blocks: int = 1,
    log_fn: Callable[[str], None] = print,
    ckpt_manager=None,
    recover_on_nan: bool = True,
    metric_logger=None,
    resume: bool = False,
    mesh=None,
    hyper_every: int = 0,
    alt_opt_factories=None,
):
    """Train F stacked members simultaneously; returns a list of F FitResults.

    ``hyper_every`` > 0 switches every member to the block-coordinate
    schedule (training.alternating: hypers once per hyper_every steps,
    factorization-free q-only steps between). Requires the models' own loss
    (``loss_fn``/``aux`` unsupported — the hurdle's ragged stacks keep the
    joint schedule); per-member math matches a sequential
    ``fit_scanned(alternating=hyper_every)`` run.

    ``mesh`` (parallel.make_mesh): shard the MEMBER axis over the mesh
    ``data`` axis — F/D members per device, zero per-step collectives (the
    member axis is embarrassingly parallel; see member_place). A member count
    that does not divide the axis is padded cyclically with duplicates of the
    real members (same data, same seed — identical trajectories), dropped
    from the returned results. Trajectories are identical to the unsharded
    stack.

    models: F equal-structure model pytrees (different leaf values are fine —
    per-fold kernel inits, kmeans centres, q_mu draws).
    datas: F datasets exposing ``.arrays`` (DataSet / NativeDataSet), or raw
    (X, Y) tuples. Ragged lengths are padded internally; minibatches are
    drawn from each fold's true rows only.
    seeds: per-member sampler seeds (default 0..F−1) — member f's minibatch
    stream is identical to a sequential ``fit_scanned(sampler="device",
    sampler_seed=seeds[f])`` run.
    loss_fn(model, X, Y, aux_f): optional override (default ``model.loss``);
    ``aux`` is a per-member stacked pytree (e.g. true num_data for ragged
    folds).

    Checkpoint/NaN semantics mirror fit_scanned, applied to the whole stack:
    the checkpoint stores the stacked pytrees; a non-finite loss in ANY member
    restores the entire stack from the last good checkpoint. The final
    finiteness gate raises if any member finishes non-finite.
    """
    import time

    from .loop import FitResult, save_final
    from .optim import make_optimizer

    F = len(models)
    if F == 0:
        raise ValueError("no models to train")
    if seeds is None:
        seeds = list(range(F))
    if len(seeds) != F or len(datas) != F:
        raise ValueError("models, datas and seeds must have equal length")

    real_F = F
    if mesh is not None and F % mesh.shape["data"]:
        ids = _member_pad_ids(mesh, F)
        models = [models[i] for i in ids]
        datas = [datas[i] for i in ids]
        seeds = [seeds[i] for i in ids]
        if aux is not None:
            sel = jnp.asarray(ids)
            aux = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[sel], aux)
        F = len(ids)
        log_fn(
            f"member padding: {real_F} -> {F} members to fill the "
            f"{mesh.shape['data']}-device data axis (pads discarded)"
        )

    def _arrays(d):
        return d.arrays if hasattr(d, "arrays") else d

    xys = [_arrays(d) for d in datas]
    lens = [x.shape[0] for x, _ in xys]
    N = max(lens)
    ragged = len(set(lens)) > 1

    stacked = stack_pytrees(models)
    init_alt_states = None
    if hyper_every:
        from .alternating import make_batched_alternating_step  # noqa: F401

        if loss_fn is not None or aux is not None:
            raise ValueError(
                "hyper_every (block-coordinate schedule) requires the "
                "models' own loss — loss_fn/aux are unsupported"
            )
        if num_inner % hyper_every:
            raise ValueError(
                f"num_inner ({num_inner}) must divide by hyper_every "
                f"({hyper_every})"
            )
    if optimizer is None:
        optimizer = make_optimizer(models[0], default_lr=learning_rate)
    if hyper_every:
        # stacked (h_state, q_state) pairs; the step factory below rebuilds
        # the same optimizers from the template, so states and step agree
        from .alternating import init_alt_optimizers, partition_model

        opt_q0, opt_h0, _ = init_alt_optimizers(
            models[0], learning_rate=learning_rate,
            opt_factories=alt_opt_factories,
        )

        def _alt_init(m):
            qm, hm, _ = partition_model(m)
            return (opt_h0.init(hm), opt_q0.init(qm))

        opt_states = jax.vmap(_alt_init)(stacked)
    else:
        # init per member (count scalars etc. get their F axis from the vmap)
        opt_states = jax.vmap(optimizer.init)(stacked)

    # Resume BEFORE the heavy setup (full-dataset stacking/transfer, step
    # build): a resume that turns out to be a completed-run no-op must not
    # pay for machinery it never touches.
    start_step = None
    if resume and ckpt_manager is not None:
        restored = ckpt_manager.restore_latest(stacked, opt_states)
        if restored is not None:
            stacked, opt_states, start_step = restored
            log_fn(f"resumed the stacked run from step {start_step}")
    if start_step is not None and start_step >= num_iter:
        # resumed a completed run: don't overshoot the budget (see
        # fit_natgrad_scanned). final_loss is evaluated on each member's
        # first rows so health-signal consumers (ensemble mixing) see the
        # restored state, not NaN-unknown.
        log_fn("checkpoint is already at or past num_iter; nothing to train")
        finals = _stacked_first_rows_loss(
            stacked, xys, batch_size, loss_fn=loss_fn, aux=aux
        )
        return [
            FitResult(
                model=unstack_pytree(stacked, f),
                opt_state=unstack_pytree(opt_states, f),
                final_loss=float(finals[f]),
            )
            for f in range(real_F)
        ]
    start_step = start_step or 0

    if mesh is not None:
        _check_member_mesh(mesh, F)
        stacked = member_place(mesh, stacked)
        opt_states = member_place(mesh, opt_states)

    def _pad(a, n):
        pad = n - a.shape[0]
        return a if pad == 0 else np.concatenate([a, np.repeat(np.asarray(a)[-1:], pad, axis=0)], axis=0)

    Xs = jnp.asarray(np.stack([_pad(np.asarray(x), N) for x, _ in xys]))
    Ys = jnp.asarray(np.stack([_pad(np.asarray(y), N) for _, y in xys]))
    num_rows = jnp.asarray(lens, jnp.int32) if ragged else None

    if hyper_every:
        from .alternating import make_batched_alternating_step

        step, _ = make_batched_alternating_step(
            models[0], Xs, Ys, batch_size,
            hyper_every=hyper_every, learning_rate=learning_rate,
            opt_factories=alt_opt_factories, num_rows=num_rows, mesh=mesh,
        )
    else:
        step = make_batched_device_sampling_scan_step(
            optimizer, Xs, Ys, batch_size, loss_fn,
            num_rows=num_rows, aux=aux, mesh=mesh,
        )

    if ckpt_manager is not None and ckpt_manager.latest_step() is None:
        ckpt_manager.save_at(start_step, stacked, opt_states)

    num_blocks = max(1, -(-(num_iter - start_step) // num_inner))
    losses_log: list = []
    t_start = time.time()
    timed_steps = 0
    steps_done = start_step
    block_losses = None
    restored_this_block = False
    for b in range(num_blocks):
        restored_this_block = False
        block_index = steps_done // num_inner
        block_keys = jnp.asarray(
            np.array([[s, block_index] for s in seeds], dtype=np.uint32)
        )
        if mesh is not None:
            block_keys = member_place(mesh, block_keys)
        stacked, opt_states, block_losses = step(
            stacked, opt_states, block_keys, num_inner
        )
        prev_steps = steps_done
        steps_done += num_inner
        if b == 0:
            jax.block_until_ready(block_losses)
            t_start = time.time()
        else:
            timed_steps += num_inner

        is_log = log_every_blocks and b % log_every_blocks == 0
        ckpt_due = ckpt_manager is not None and ckpt_manager.crossed(prev_steps, steps_done)
        if is_log or ckpt_due:
            last = np.asarray(block_losses[:, -1])
            if not np.all(np.isfinite(last)):
                bad = [f for f in range(F) if not np.isfinite(last[f])]
                log_fn(f"step {steps_done:>8d}  NON-FINITE loss in members {bad}")
                if ckpt_manager is not None and recover_on_nan:
                    restored = ckpt_manager.restore_latest(stacked, opt_states)
                    if restored is not None:
                        stacked, opt_states, from_step = restored
                        if mesh is not None:
                            stacked = member_place(mesh, stacked)
                            opt_states = member_place(mesh, opt_states)
                        restored_this_block = True
                        log_fn(f"restored the stack from checkpoint at step {from_step}")
                continue
            if ckpt_due:
                ckpt_manager.save_at(steps_done, stacked, opt_states)
            if is_log:
                losses_log.append(last)
                joined = " ".join(f"{v:.4f}" for v in last[:real_F])
                log_fn(f"step {steps_done:>8d}  losses [{joined}]")
                if metric_logger is not None:
                    metric_logger.log(
                        steps_done,
                        scalars={f"loss_{f}": float(last[f]) for f in range(real_F)},
                    )
    jax.block_until_ready(stacked)
    final = np.asarray(block_losses[:, -1])
    if not np.all(np.isfinite(final)) and not restored_this_block:
        bad = [f for f in range(F) if not np.isfinite(final[f])]
        raise FloatingPointError(
            f"fit_batched_scanned finished at step {steps_done} with "
            f"non-finite losses in members {bad}; the trained stack is "
            "unusable. Enable checkpointing (ckpt_manager) for NaN recovery."
        )
    # The pre-restore block's per-member losses don't describe a NaN-restored
    # stack, so final_loss reads unknown for every member in that case.
    save_final(ckpt_manager, steps_done, restored_this_block, stacked, opt_states, log_fn)
    elapsed = max(time.time() - t_start, 1e-12)
    sps = timed_steps / elapsed if timed_steps else 0.0
    results = []
    for f in range(real_F):
        results.append(
            FitResult(
                model=unstack_pytree(stacked, f),
                opt_state=unstack_pytree(opt_states, f),
                losses=[float(row[f]) for row in losses_log],
                steps_per_sec=sps,  # shared dispatch stream: per-member rate ≡ stack rate
                final_loss=float("nan") if restored_this_block else float(final[f]),
            )
        )
    return results


def fit_natgrad_batched(
    models: Sequence[Any],
    datas: Sequence[Any],
    *,
    num_iter: int,
    batch_size: int,
    num_inner: int = 50,
    gamma: float = 0.1,
    gamma_warmup: int = 2000,
    gamma_init: float = 1e-4,
    adam_lr: float = 1e-3,
    adam_warmup: int = 0,
    max_mean_step: float = 10.0,
    kron_joint: bool = False,
    kl_cap=10.0,
    seeds: Optional[Sequence[int]] = None,
    log_every_blocks: int = 4,
    log_fn: Callable[[str], None] = print,
    ckpt_manager=None,
    recover_on_nan: bool = True,
    metric_logger=None,
    resume: bool = False,
    unroll: int = 4,
    mesh=None,
):
    """Natural-gradient training of F stacked members simultaneously — the
    batched counterpart of training.natgrad.fit_natgrad_scanned.

    Same recipe per member (Adam warm-start, γ-warmup schedule as traced
    per-step scalars, the diag/kron/kron_joint natural steps), vmapped over
    the member axis with device-resident data: member f reproduces a
    sequential ``fit_natgrad_scanned(sampler="device",
    sampler_seed=seeds[f])`` run exactly (equivalence-tested in
    tests/test_batched.py). Equal-length members only (no ragged/aux path:
    the natural-step algebra reads the models' static num_data).

    Returns a list of F FitResults. Checkpoint/NaN semantics as in
    fit_batched_scanned, applied to the whole stack.
    """
    import time

    from .loop import FitResult, save_final
    from .natgrad import NaturalGradientTrainer

    F = len(models)
    if F == 0:
        raise ValueError("no models to train")
    if seeds is None:
        seeds = list(range(F))
    if len(seeds) != F or len(datas) != F:
        raise ValueError("models, datas and seeds must have equal length")

    real_F = F
    if mesh is not None and F % mesh.shape["data"]:
        ids = _member_pad_ids(mesh, F)
        models = [models[i] for i in ids]
        datas = [datas[i] for i in ids]
        seeds = [seeds[i] for i in ids]
        F = len(ids)
        log_fn(
            f"member padding: {real_F} -> {F} members to fill the "
            f"{mesh.shape['data']}-device data axis (pads discarded)"
        )

    def _arrays(d):
        return d.arrays if hasattr(d, "arrays") else d

    xys = [_arrays(d) for d in datas]
    if len({x.shape for x, _ in xys}) > 1:
        raise ValueError(
            "fit_natgrad_batched requires equal-shaped member datasets "
            f"(got {[x.shape for x, _ in xys]})"
        )

    # budget guards, mirroring fit_natgrad_scanned
    num_iter = int(num_iter)
    adam_warmup = min(int(adam_warmup), num_iter // 2)
    num_inner = max(1, min(int(num_inner), num_iter - adam_warmup))

    trainer = NaturalGradientTrainer(
        models[0], gamma=gamma, adam_lr=adam_lr,
        gamma_warmup=gamma_warmup, gamma_init=gamma_init,
        max_mean_step=max_mean_step, kron_joint=kron_joint, kl_cap=kl_cap,
    )

    # Resume BEFORE the heavy setup (full-dataset stacking/transfer): a
    # completed-run no-op must not pay for machinery it never touches.
    stacked = opt_states = None
    start_step = None
    if resume and ckpt_manager is not None:
        probe = stack_pytrees(models)
        restored = ckpt_manager.restore_latest(
            probe, jax.vmap(trainer.init)(probe)
        )
        if restored is not None:
            stacked, opt_states, start_step = restored
            log_fn(f"resumed the natgrad stack from step {start_step}")

    if start_step is not None and start_step >= num_iter:
        # resumed a completed run: don't overshoot the budget (see
        # fit_natgrad_scanned); final_loss evaluated on first rows so
        # health-signal consumers see the restored state, not NaN-unknown
        log_fn("checkpoint is already at or past num_iter; nothing to train")
        finals = _stacked_first_rows_loss(stacked, xys, batch_size)
        return [
            FitResult(
                model=unstack_pytree(stacked, f),
                opt_state=unstack_pytree(opt_states, f),
                final_loss=float(finals[f]),
            )
            for f in range(real_F)
        ]

    Xs = jnp.asarray(np.stack([np.asarray(x) for x, _ in xys]))
    Ys = jnp.asarray(np.stack([np.asarray(y) for _, y in xys]))
    N = Xs.shape[1]
    if mesh is not None:
        _check_member_mesh(mesh, F)
        Xs, Ys = member_place(mesh, (Xs, Ys))

    if start_step is None:
        if adam_warmup:
            warm = fit_batched_scanned(
                models, datas,
                num_iter=adam_warmup, batch_size=batch_size,
                num_inner=min(num_inner, adam_warmup),
                learning_rate=adam_lr, seeds=seeds,
                log_every_blocks=0, log_fn=log_fn, mesh=mesh,
            )
            models = [r.model for r in warm]
        stacked = stack_pytrees(models)
        opt_states = jax.vmap(trainer.init)(stacked)
        start_step = adam_warmup
    if mesh is not None:
        stacked = member_place(mesh, stacked)
        opt_states = member_place(mesh, opt_states)

    num_iter = max(num_iter, start_step + num_inner)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(stacked, opt_states, block_keys, gammas, local_steps):
        def one_member(model, opt_state, Xf, Yf, block_key):
            # ONE index draw + ONE gather per dispatch (same staging
            # rationale as training/scan.make_device_sampling_scan_step)
            K = gammas.shape[0]
            idx = jax.random.randint(block_key, (K * batch_size,), 0, N)
            Xg = Xf[idx].reshape(K, batch_size, *Xf.shape[1:])
            Yg = Yf[idx].reshape(K, batch_size, *Yf.shape[1:])

            def body(carry, inp):
                model, opt_state = carry
                X, Y, g, i = inp
                model, opt_state, loss = trainer._step_body(
                    model, opt_state, X, Y, g, i
                )
                return (model, opt_state), loss

            (model, opt_state), losses = jax.lax.scan(
                body, (model, opt_state), (Xg, Yg, gammas, local_steps),
                unroll=unroll,
            )
            return model, opt_state, losses

        return jax.vmap(
            one_member, in_axes=(0, 0, 0, 0, 0)
        )(stacked, opt_states, Xs, Ys, block_keys)

    if ckpt_manager is not None and ckpt_manager.latest_step() is None:
        ckpt_manager.save_at(start_step, stacked, opt_states)

    losses_log: list = []
    num_blocks = max(1, -(-(num_iter - start_step) // num_inner))
    t_start = time.time()
    timed_steps = 0
    steps_done = start_step
    block_losses = None
    restored_this_block = False
    for b in range(num_blocks):
        restored_this_block = False
        # γ schedule keyed to the natgrad-phase-local step (shared by all
        # members); block keys use the same [seed, block_index] threefry
        # construction as the sequential device sampler
        local = steps_done - adam_warmup
        local_steps = jnp.arange(local, local + num_inner, dtype=jnp.int32)
        gammas = trainer.gamma_at(local_steps)
        # ceil, matching fit_natgrad_scanned: floor would reuse the Adam
        # warmup's block-0 key when adam_warmup is not a multiple of
        # num_inner (identical to floor in the divisible production case)
        block_keys = jnp.asarray(
            np.array(
                [[s, -(-steps_done // num_inner)] for s in seeds], dtype=np.uint32
            )
        )
        if mesh is not None:
            block_keys = member_place(mesh, block_keys)
        stacked, opt_states, block_losses = step(
            stacked, opt_states, block_keys, gammas, local_steps
        )
        prev_steps = steps_done
        steps_done += num_inner
        if b == 0:
            jax.block_until_ready(block_losses)
            t_start = time.time()
        else:
            timed_steps += num_inner

        is_log = log_every_blocks and b % log_every_blocks == 0
        ckpt_due = ckpt_manager is not None and ckpt_manager.crossed(prev_steps, steps_done)
        if is_log or ckpt_due:
            last = np.asarray(block_losses[:, -1])
            if not np.all(np.isfinite(last)):
                bad = [f for f in range(F) if not np.isfinite(last[f])]
                log_fn(f"step {steps_done:>8d}  NON-FINITE loss in members {bad}")
                if ckpt_manager is not None and recover_on_nan:
                    restored = ckpt_manager.restore_latest(stacked, opt_states)
                    if restored is not None:
                        stacked, opt_states, from_step = restored
                        if mesh is not None:
                            stacked = member_place(mesh, stacked)
                            opt_states = member_place(mesh, opt_states)
                        restored_this_block = True
                        log_fn(f"restored the stack from checkpoint at step {from_step}")
                continue
            if ckpt_due:
                ckpt_manager.save_at(steps_done, stacked, opt_states)
            if is_log:
                losses_log.append(last)
                joined = " ".join(f"{v:.4f}" for v in last[:real_F])
                log_fn(f"step {steps_done:>8d}  losses [{joined}]")
                if metric_logger is not None:
                    scalars = {f"loss_{f}": float(last[f]) for f in range(real_F)}
                    scalars["gamma"] = float(gammas[-1])
                    metric_logger.log(steps_done, scalars=scalars)
    jax.block_until_ready(stacked)
    final = np.asarray(block_losses[:, -1])
    if not np.all(np.isfinite(final)) and not restored_this_block:
        bad = [f for f in range(F) if not np.isfinite(final[f])]
        raise FloatingPointError(
            f"fit_natgrad_batched finished at step {steps_done} with "
            f"non-finite losses in members {bad}; the trained stack is "
            "unusable. Enable checkpointing (ckpt_manager) for NaN recovery."
        )
    # The pre-restore block's per-member losses don't describe a NaN-restored
    # stack, so final_loss reads unknown for every member in that case.
    save_final(ckpt_manager, steps_done, restored_this_block, stacked, opt_states, log_fn)
    elapsed = max(time.time() - t_start, 1e-12)
    sps = timed_steps / elapsed if timed_steps else 0.0
    return [
        FitResult(
            model=unstack_pytree(stacked, f),
            opt_state=unstack_pytree(opt_states, f),
            losses=[float(row[f]) for row in losses_log],
            steps_per_sec=sps,
            final_loss=float("nan") if restored_this_block else float(final[f]),
        )
        for f in range(real_F)
    ]


def predict_batched_stacked(
    predict_fn: Callable,
    stacked_model,
    Xs: np.ndarray,
    batch: int = 4096,
):
    """predict over F stacked members in fixed-shape vmapped chunks.

    predict_fn(model_f, X_chunk_f) -> dict/NamedTuple of (B, k) arrays.
    Xs: (F, N, D) — equal-length per-member inputs (pad ragged ones upstream).
    Returns a list of F dicts of (N, k) arrays. One compile for all members.
    """
    F, N = Xs.shape[0], Xs.shape[1]
    jitted = jax.jit(jax.vmap(predict_fn))
    pending = []
    for start in range(0, N, batch):
        chunk = Xs[:, start : start + batch]
        pad = batch - chunk.shape[1]
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[:, -1:], pad, axis=1)], axis=1)
        res = jitted(stacked_model, jnp.asarray(chunk))
        d = res._asdict() if hasattr(res, "_asdict") else dict(res)
        pending.append((d, batch - pad if pad else batch))
    fetched = jax.device_get([d for d, _ in pending])
    outs: list = [{} for _ in range(F)]
    for (_, valid), d in zip(pending, fetched):
        for k, v in d.items():
            for f in range(F):
                outs[f].setdefault(k, []).append(v[f, :valid])
    return [{k: np.concatenate(v, axis=0) for k, v in o.items()} for o in outs]
