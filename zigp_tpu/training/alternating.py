"""Block-coordinate (alternating) training: the factorization-free q-step.

Motivation (measured, RESULTS.md round-3 decompositions): the scanned train
step at the flagship/scale configs is dominated by the per-step chol_inv
factorization kernel (~40 of 96 µs / ~138 of 295 µs) plus the hyperparameter
cotangent work behind it — yet the hyperparameters it exists to refresh are
~10 slow-moving scalars (kernel lengthscales/variances, noise, inducing
locations at lr 1e-3), while all the fast learning happens in the
variational parameters.

So train the two partitions block-coordinate-wise: once every
``hyper_every`` steps a HYPER step updates the kernel/inducing/likelihood
partition (full gradient at the current q — this step factorizes and pays
the full price), then the factor state (chol_inv of every Kronecker factor
gram) is computed ONCE and the remaining ``hyper_every − 1`` q-only steps
consume it as a loop-invariant: their scan body contains zero
factorizations, no hyper cotangents, and each partition's update is the
exact gradient of the same ELBO at the other partition's current value —
block-coordinate ascent, not an approximation (no stale-gradient error
anywhere; the only change vs joint training is the update *schedule*).

Each partition carries its own optimizer chain (per-lr-group Adam as
everywhere else, training.optim.make_optimizer). The reference trains
everything jointly (scripts/onoff.py:325-350); this schedule is a TPU-first
redesign, quality-gated in RESULTS.md.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.parameters import is_parameter

# Parameter path fragments that form the variational (q) partition; everything
# else — kernel hypers, inducing locations, likelihood params — is the hyper
# partition. Matches the model families' field names (models/kron.py,
# models/onoff.py).
_Q_KEYS = (
    ".q_mu",
    ".q_sqrt",
    ".q_sqrt_factors",
    ".mean_const",
    ".u_fm",
    ".u_gm",
    ".u_fs_sqrt",
    ".u_gs_sqrt",
)


def partition_model(model):
    """Split a model pytree into (q_leaves, h_leaves, merge).

    ``q_leaves``/``h_leaves`` are lists of Parameter leaves;
    ``merge(q_leaves, h_leaves)`` rebuilds the model. The split is by field
    path (_Q_KEYS), so it works for every model family without the model
    knowing about it.
    """
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(
        model, is_leaf=is_parameter
    )
    mask = [
        any(k in jax.tree_util.keystr(path) for k in _Q_KEYS)
        for path, _ in paths_leaves
    ]
    leaves = [leaf for _, leaf in paths_leaves]
    q_leaves = [l for l, m in zip(leaves, mask) if m]
    h_leaves = [l for l, m in zip(leaves, mask) if not m]
    if not q_leaves:
        raise ValueError(
            "alternating training found no variational parameters to "
            f"partition (looked for {_Q_KEYS})"
        )

    def merge(q, h):
        it_q, it_h = iter(q), iter(h)
        return jax.tree_util.tree_unflatten(
            treedef, [next(it_q) if m else next(it_h) for m in mask]
        )

    return q_leaves, h_leaves, merge


def init_alt_optimizers(
    model,
    *,
    learning_rate: float = 1e-3,
    opt_factories=None,
):
    """(opt_q, opt_h, opt_state0) — per-partition optimizers + initial state.

    The state layout ``(h_state, q_state)`` is what the alternating step
    carries and what its checkpoints store; resume paths use this to build
    the restore template (experiments.runners._fit_auto).
    """
    from .optim import make_optimizer

    q0, h0, _ = partition_model(model)
    q_fac, h_fac = opt_factories if opt_factories else (optax.adam, optax.adam)
    opt_q = make_optimizer(q0, default_lr=learning_rate, opt_factory=q_fac)
    opt_h = make_optimizer(h0, default_lr=learning_rate, opt_factory=h_fac)
    return opt_q, opt_h, (opt_h.init(h0), opt_q.init(q0))


def make_alternating_device_step(
    model,
    Xtrain: jnp.ndarray,
    Ytrain: jnp.ndarray,
    batch_size: int,
    *,
    hyper_every: int,
    learning_rate: float = 1e-3,
    opt_factories: Optional[
        Tuple[
            Callable[[float], optax.GradientTransformation],
            Callable[[float], optax.GradientTransformation],
        ]
    ] = None,
    unroll: int = 8,
    mesh=None,
):
    """Device-sampling alternating step, fit_scanned-compatible.

    Returns ``(step, opt_state0)`` with the same calling convention as
    make_device_sampling_scan_step: ``step(model, opt_state, block_key,
    num_inner) -> (model, opt_state, losses)``, donated buffers, one staged
    gather per dispatch. ``opt_state`` is the pair ``(h_state, q_state)``.
    ``num_inner`` must divide by ``hyper_every`` (each group = 1 hyper step
    + hyper_every−1 q steps); requires a model exposing
    ``factor_state()`` and ``loss(..., factor_state=...)`` (the Kron
    families).

    ``opt_factories``: per-partition ``(q_factory, h_factory)`` in the
    make_optimizer ``opt_factory`` convention — schedules should be sized to
    each partition's own update count (q: num_iter·(K−1)/K, h: num_iter/K).

    ``mesh``: data-parallel execution (VERDICT r4 #3) — the per-step
    minibatch is constrained to the mesh ``data`` axis, parameters stay
    replicated (pass model/opt_state through ``parallel.replicate`` first);
    XLA partitions the batch-dim contractions of both the hyper and the
    q-only steps and inserts the gradient psums. The index stream is
    identical to the single-device sampler, so the trajectory matches a
    single-chip run up to reduction order.
    """
    if hyper_every < 2:
        raise ValueError(f"hyper_every must be >= 2 (got {hyper_every})")
    if not (hasattr(model, "factor_state") and hasattr(model, "loss")):
        raise ValueError(
            "alternating training needs a model with factor_state()/"
            "loss(factor_state=...) — the Kronecker families"
        )
    Xtrain = jnp.asarray(Xtrain)
    Ytrain = jnp.asarray(Ytrain)
    N = Xtrain.shape[0]
    batch_spec = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        n_data = mesh.shape["data"]
        if batch_size % n_data:
            raise ValueError(
                f"batch size {batch_size} not divisible by data axis {n_data}"
            )
        # (groups, hyper_every, B, ·): shard the per-step batch rows
        batch_spec = NamedSharding(mesh, _P(None, None, "data", None))
        rep = NamedSharding(mesh, _P())
        Xtrain = jax.device_put(Xtrain, rep)
        Ytrain = jax.device_put(Ytrain, rep)
    opt_q, opt_h, opt_state0 = init_alt_optimizers(
        model, learning_rate=learning_rate, opt_factories=opt_factories
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=(3,))
    def step(model, opt_state, block_key, num_inner):
        return _alternating_dispatch(
            model, opt_state, block_key, num_inner,
            Xtrain=Xtrain, Ytrain=Ytrain, nrows=N, batch_size=batch_size,
            hyper_every=hyper_every, opt_q=opt_q, opt_h=opt_h, unroll=unroll,
            batch_spec=batch_spec,
        )

    return step, opt_state0


def _alternating_dispatch(
    model, opt_state, block_key, num_inner, *,
    Xtrain, Ytrain, nrows, batch_size, hyper_every, opt_q, opt_h, unroll,
    batch_spec=None,
):
    """One traced alternating dispatch: the group structure shared by the
    single-member step and the batched (vmapped-over-members) step.
    ``batch_spec``: optional NamedSharding for the staged (groups,
    hyper_every, B, ·) block — the data-parallel mesh path."""
    if num_inner % hyper_every:
        raise ValueError(
            f"num_inner ({num_inner}) must divide by hyper_every "
            f"({hyper_every})"
        )
    h_state, q_state = opt_state
    q, h, _merge = partition_model(model)

    # one staged gather for the whole dispatch (sampler convention of
    # make_device_sampling_scan_step — same key stream, same estimator)
    idx = jax.random.randint(block_key, (num_inner * batch_size,), 0, nrows)
    groups = num_inner // hyper_every
    Xs = Xtrain[idx].reshape(groups, hyper_every, batch_size, *Xtrain.shape[1:])
    Ys = Ytrain[idx].reshape(groups, hyper_every, batch_size, *Ytrain.shape[1:])
    if batch_spec is not None:
        Xs = jax.lax.with_sharding_constraint(Xs, batch_spec)
        Ys = jax.lax.with_sharding_constraint(Ys, batch_spec)

    def outer(carry, xy):
        q, h, h_state, q_state = carry
        Xg, Yg = xy  # (hyper_every, B, ·)

        # hyper step: full gradient wrt the hyper partition at current q
        # (this is the one step per group that factorizes)
        def h_loss(h_leaves, X, Y):
            return _merge(q, h_leaves).loss(X, Y)

        loss0, gh = jax.value_and_grad(h_loss)(h, Xg[0], Yg[0])
        upd, h_state = opt_h.update(gh, h_state, h)
        h = optax.apply_updates(h, upd)

        # factorize ONCE at the new hypers; loop-invariant for the q-scan
        st = jax.lax.stop_gradient(_merge(q, h).factor_state())

        def q_body(qcarry, xy1):
            q, q_state = qcarry
            X, Y = xy1

            def q_loss(q_leaves):
                return _merge(q_leaves, h).loss(X, Y, factor_state=st)

            loss, gq = jax.value_and_grad(q_loss)(q)
            upd, q_state = opt_q.update(gq, q_state, q)
            q = optax.apply_updates(q, upd)
            return (q, q_state), loss

        (q, q_state), q_losses = jax.lax.scan(
            q_body, (q, q_state), (Xg[1:], Yg[1:]), unroll=unroll
        )
        losses = jnp.concatenate([loss0[None], q_losses])
        return (q, h, h_state, q_state), losses

    (q, h, h_state, q_state), losses = jax.lax.scan(
        outer, (q, h, h_state, q_state), (Xs, Ys)
    )
    return _merge(q, h), (h_state, q_state), losses.reshape(-1)


def make_batched_alternating_step(
    template,
    Xs: jnp.ndarray,
    Ys: jnp.ndarray,
    batch_size: int,
    *,
    hyper_every: int,
    learning_rate: float = 1e-3,
    opt_factories=None,
    num_rows=None,
    unroll: int = 8,
    mesh=None,
):
    """Alternating step vmapped over a stacked member axis (the
    training.batched layout: Xs (F, N, D), Ys (F, N, L), models/opt_states
    stacked with a leading F axis). Returns ``(step, init_opt_states)``
    where ``init_opt_states(stacked_models)`` builds the stacked
    ``(h_state, q_state)`` pair. Per-member math is exactly
    make_alternating_device_step's — member f's trajectory matches a
    sequential alternating run with the same sampler seed.
    """
    if hyper_every < 2:
        raise ValueError(f"hyper_every must be >= 2 (got {hyper_every})")
    if not (hasattr(template, "factor_state") and hasattr(template, "loss")):
        raise ValueError(
            "alternating training needs a model with factor_state()/"
            "loss(factor_state=...) — the Kronecker families"
        )
    Xs = jnp.asarray(Xs)
    Ys = jnp.asarray(Ys)
    if Xs.ndim != 3:
        raise ValueError(f"Xs must be (F, N, D), got {Xs.shape}")
    N = Xs.shape[1]
    rows = (
        jnp.full((Xs.shape[0],), N, dtype=jnp.int32)
        if num_rows is None
        else jnp.asarray(num_rows, jnp.int32)
    )
    if mesh is not None:
        from .batched import _check_member_mesh, member_place

        _check_member_mesh(mesh, Xs.shape[0])
        Xs, Ys, rows = member_place(mesh, (Xs, Ys, rows))

    opt_q, opt_h, _ = init_alt_optimizers(
        template, learning_rate=learning_rate, opt_factories=opt_factories
    )

    def init_opt_states(stacked):
        def one(m):
            qm, hm, _ = partition_model(m)
            return (opt_h.init(hm), opt_q.init(qm))

        return jax.vmap(one)(stacked)

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=(3,))
    def step(models, opt_states, block_keys, num_inner):
        def one_member(model, opt_state, Xf, Yf, block_key, nf):
            return _alternating_dispatch(
                model, opt_state, block_key, num_inner,
                Xtrain=Xf, Ytrain=Yf, nrows=nf, batch_size=batch_size,
                hyper_every=hyper_every, opt_q=opt_q, opt_h=opt_h,
                unroll=unroll,
            )

        return jax.vmap(one_member)(models, opt_states, Xs, Ys, block_keys, rows)

    return step, init_opt_states
