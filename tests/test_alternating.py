"""Block-coordinate (alternating) training — training.alternating.

The schedule is exact block-coordinate ascent: the hyper step is the full
gradient wrt the hyper partition at the current q; the q-only steps are full
gradients wrt q at the (frozen) hypers with the factorization precomputed.
These tests pin that exactness against hand-built steps, the partition
split, and the fit_scanned integration (checkpoint/NaN/resume machinery)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from zigp_tpu.experiments.builders import build_onoff_pptr
from zigp_tpu.experiments.configs import KronGridConfig, OnOffPptrConfig
from zigp_tpu.io.datasets import Split
from zigp_tpu.training.alternating import (
    init_alt_optimizers,
    make_alternating_device_step,
    partition_model,
)


@pytest.fixture
def split(rng):
    def gen(N):
        X = rng.rand(N, 3)
        Y = np.maximum(np.sin(4 * X[:, 2:3]) * (rng.rand(N, 1) > 0.5), 0.0)
        return X, Y

    Xtr, Ytr = gen(200)
    Xte, Yte = gen(40)
    return Split(Xtr, Ytr, Xte, Yte)


def _model(split, **kw):
    cfg = OnOffPptrConfig(grid=KronGridConfig(num_spatial=3, num_temporal=6), **kw)
    return build_onoff_pptr(cfg, split)


def test_partition_split_and_merge(split):
    model = _model(split)
    q, h, merge = partition_model(model)
    # q = variational means/stds for both GPs (+ none else at this config)
    assert len(q) == 4  # u_fm/u_gm analogues: q_mu, q_sqrt for f and g
    rebuilt = merge(q, h)
    for a, b in zip(jax.tree_util.tree_leaves(model), jax.tree_util.tree_leaves(rebuilt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # kron q_cov adds the per-factor covariance Choleskys to q
    model_k = _model(split, q_cov="kron", whiten=True)
    qk, hk, _ = partition_model(model_k)
    # q_mu x2 + (frozen diag) q_sqrt x2 + two q_sqrt_factors per GP
    assert len(qk) == 8
    # hyper partition: kernel params, Zs, likelihood — identical either way
    assert len(hk) == len(h)


def test_elbo_factor_state_injection_is_identity(split, rng):
    for kw in ({}, {"q_cov": "kron", "whiten": True}):
        model = _model(split, **kw)
        X = jnp.asarray(split.Xtest[:16])
        Y = jnp.asarray(split.Ytest[:16])
        base = float(model.elbo(X, Y))
        injected = float(model.elbo(X, Y, factor_state=model.factor_state()))
        np.testing.assert_allclose(injected, base, rtol=1e-12)


def test_alternating_step_is_exact_block_coordinate(split):
    """One dispatch with hyper_every=2 ≡ hand-built: (1) hyper-partition Adam
    step at current q, (2) q-partition Adam step at the new hypers — both
    full gradients of the same ELBO."""
    model = _model(split)
    Xd = jnp.asarray(split.Xtrain)
    Yd = jnp.asarray(split.Ytrain)
    B = 32
    step, opt_state0 = make_alternating_device_step(
        model, Xd, Yd, B, hyper_every=2, learning_rate=1e-2
    )
    key = jnp.asarray(np.array([0, 0], dtype=np.uint32))
    out_model, _, losses = step(model, opt_state0, key, 2)
    assert losses.shape == (2,)

    # ---- reference: the same two minibatches, hand-stepped ----
    model2 = _model(split)  # fresh copy (buffers were donated)
    idx = jax.random.randint(key, (2 * B,), 0, Xd.shape[0])
    Xs = Xd[idx].reshape(2, B, -1)
    Ys = Yd[idx].reshape(2, B, 1)
    q, h, merge = partition_model(model2)
    opt_q, opt_h, (h_state, q_state) = init_alt_optimizers(
        model2, learning_rate=1e-2
    )

    gh = jax.grad(lambda hh: merge(q, hh).loss(Xs[0], Ys[0]))(h)
    upd, h_state = opt_h.update(gh, h_state, h)
    h = optax.apply_updates(h, upd)

    st = merge(q, h).factor_state()
    gq = jax.grad(lambda qq: merge(qq, h).loss(Xs[1], Ys[1], factor_state=st))(q)
    upd, q_state = opt_q.update(gq, q_state, q)
    q = optax.apply_updates(q, upd)
    want = merge(q, h)

    for a, b in zip(
        jax.tree_util.tree_leaves(out_model), jax.tree_util.tree_leaves(want)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12)


def test_q_steps_leave_hypers_bit_identical(split):
    """Within a group, only the first step touches the hyper partition."""
    model = _model(split, q_cov="kron", whiten=True)
    Xd = jnp.asarray(split.Xtrain)
    Yd = jnp.asarray(split.Ytrain)
    step, opt_state0 = make_alternating_device_step(
        model, Xd, Yd, 32, hyper_every=4, learning_rate=1e-2
    )
    _, h_before, _ = partition_model(model)
    h_before = [np.asarray(p.raw).copy() for p in h_before]

    key = jnp.asarray(np.array([0, 0], dtype=np.uint32))
    out1, opt_state, _ = step(model, opt_state0, key, 4)
    _, h_after1, _ = partition_model(out1)
    # exactly one hyper update happened: hypers changed once vs init
    changed = [
        not np.array_equal(a, np.asarray(p.raw)) for a, p in zip(h_before, h_after1)
    ]
    assert any(changed)

    # now freeze the comparison: run a dispatch whose FIRST step is the only
    # hyper touch — re-running with the same key from the same state must
    # give bit-identical hypers (determinism of the whole schedule)
    model_b = _model(split, q_cov="kron", whiten=True)
    step_b, opt_state_b = make_alternating_device_step(
        model_b, Xd, Yd, 32, hyper_every=4, learning_rate=1e-2
    )
    out2, _, _ = step_b(model_b, opt_state_b, key, 4)
    for a, b in zip(
        jax.tree_util.tree_leaves(out1), jax.tree_util.tree_leaves(out2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_alternating_validation_errors(split):
    model = _model(split)
    Xd = jnp.asarray(split.Xtrain)
    Yd = jnp.asarray(split.Ytrain)
    with pytest.raises(ValueError, match="hyper_every must be"):
        make_alternating_device_step(model, Xd, Yd, 32, hyper_every=1)
    step, st0 = make_alternating_device_step(model, Xd, Yd, 32, hyper_every=4)
    key = jnp.asarray(np.array([0, 0], dtype=np.uint32))
    with pytest.raises(ValueError, match="divide"):
        step(model, st0, key, 6)


def test_batched_alternating_matches_sequential(split):
    """Each member of the batched alternating stack reproduces its own
    sequential fit_scanned(alternating=K) run — same seeds, same schedule,
    same trajectories (the batched analogue of
    tests/test_batched.py::test_batched_folds_match_sequential)."""
    from zigp_tpu.training import fit_scanned
    from zigp_tpu.training.batched import fit_batched_scanned

    def data(seed, N=60):
        r = np.random.RandomState(seed)
        X = r.rand(N, 3)
        Y = np.maximum(r.randn(N, 1), 0.0)
        return X, Y

    def model(seed):
        s = Split(*data(100 + seed), *data(900 + seed, 10))
        cfg = OnOffPptrConfig(
            grid=KronGridConfig(num_spatial=3, num_temporal=6),
            whiten=True, q_cov="kron", seed=seed,
        )
        return build_onoff_pptr(cfg, s)

    folds = [data(100 + f) for f in range(2)]
    seq_models = []
    for f, (X, Y) in enumerate(folds):
        from zigp_tpu.io.native import make_dataset

        res = fit_scanned(
            model(f), make_dataset(X, Y), num_iter=8, batch_size=16,
            num_inner=4, learning_rate=1e-2, log_every_blocks=0,
            log_fn=lambda s: None, sampler="device", sampler_seed=f,
            alternating=4,
        )
        seq_models.append(res.model)

    results = fit_batched_scanned(
        [model(f) for f in range(2)], folds,
        num_iter=8, batch_size=16, num_inner=4, learning_rate=1e-2,
        seeds=[0, 1], log_every_blocks=0, log_fn=lambda s: None,
        hyper_every=4,
    )
    for seq, res in zip(seq_models, results):
        for a, b in zip(
            jax.tree_util.tree_leaves(seq), jax.tree_util.tree_leaves(res.model)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-11
            )

    # guard: the ragged/aux path refuses the schedule with a clear error
    with pytest.raises(ValueError, match="loss_fn/aux"):
        fit_batched_scanned(
            [model(f) for f in range(2)], folds,
            num_iter=8, batch_size=16, num_inner=4, hyper_every=4,
            log_fn=lambda s: None,
            loss_fn=lambda m, X, Y, a: m.loss(X, Y),
        )


def test_fit_scanned_alternating_trains_and_checkpoints(split, tmp_path):
    """fit_scanned(alternating=K): loss decreases, checkpoint/restore works
    with the pair opt_state, and the guard rails reject bad combinations."""
    from zigp_tpu.io.checkpoint import CheckpointManager
    from zigp_tpu.io.native import make_dataset
    from zigp_tpu.training import fit_scanned

    model = _model(split, q_cov="kron", whiten=True)
    ds = make_dataset(split.Xtrain, split.Ytrain)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"), every=8)
    res = fit_scanned(
        model,
        ds,
        num_iter=16,
        batch_size=32,
        num_inner=8,
        learning_rate=1e-2,
        sampler="device",
        alternating=4,
        log_every_blocks=1,
        log_fn=lambda s: None,
        ckpt_manager=ckpt,
    )
    assert np.isfinite(res.final_loss)
    assert res.losses[-1] < res.losses[0] or len(res.losses) == 1
    # the checkpointed opt_state is the (h_state, q_state) pair and restores
    restored = ckpt.restore_latest(res.model, res.opt_state)
    assert restored is not None

    with pytest.raises(ValueError, match="sampler='device'"):
        fit_scanned(
            model, ds, num_iter=8, batch_size=32, num_inner=8,
            sampler="host", alternating=4, log_fn=lambda s: None,
        )
