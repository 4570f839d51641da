"""Batched (stacked-axis) training: all CV folds / ensemble members trained
simultaneously through one vmapped scanned step (training/batched.py).

Ground truth is the sequential device-sampler path: member f of the stack
must reproduce ``fit_scanned(sampler="device", sampler_seed=seeds[f])``
exactly — same threefry key stream, same math, only the batching differs.
"""

import jax
import numpy as np
import pytest

from zigp_tpu.likelihoods import Gaussian, OnOffGaussian
from zigp_tpu.models import KronOnOffSVGP, KronSVGP
from zigp_tpu.ops.kernels import RBF
from zigp_tpu.training import DataSet, fit_scanned, make_optimizer
from zigp_tpu.training.batched import (
    fit_batched_scanned,
    predict_batched_stacked,
    stack_pytrees,
    unstack_pytree,
)


def _svgp(seed, *, N=60, Ms=6, Mt=5, whiten=True, q_cov="diag", num_data=None):
    r = np.random.RandomState(seed)
    Zs = [r.rand(Ms, 2), np.linspace(0, 1, Mt)[:, None]]
    kernels = [RBF.create([1.0, 1.0], 2.0), RBF.create([0.3], 2.0)]
    return KronSVGP.create(
        kernels, Zs, Gaussian.create(0.1),
        num_data=N if num_data is None else num_data,
        jitter=1e-6, seed=seed, whiten=whiten, q_cov=q_cov,
    )


def _onoff(seed, *, N=60, Ms=5, Mt=4, q_cov="diag"):
    r = np.random.RandomState(seed)
    Zs = [r.rand(Ms, 2), np.linspace(0, 1, Mt)[:, None]]
    ks = lambda v: [RBF.create([1.0, 1.0], v), RBF.create([0.3], v)]
    return KronOnOffSVGP.create(
        ks(2.0), Zs, ks(1.0), [Z.copy() for Z in Zs], OnOffGaussian.create(0.05),
        num_data=N, jitter=1e-6, seed=seed, whiten=True, q_cov=q_cov,
    )


def _data(seed, N=60):
    r = np.random.RandomState(seed)
    X = r.rand(N, 3)
    Y = np.maximum(r.randn(N, 1), 0.0)
    return X, Y


def _assert_trees_close(a, b, rtol=1e-9, atol=1e-11):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


@pytest.mark.parametrize("q_cov", ["diag", "kron"])
def test_batched_folds_match_sequential_device_sampler(q_cov):
    """Each member of the batched stack reproduces its own sequential
    fit_scanned(sampler='device') run — same seeds, same trajectories."""
    folds = [(_onoff(seed=f, q_cov=q_cov), _data(100 + f)) for f in range(3)]

    seq_models = []
    for f, (model, (X, Y)) in enumerate(folds):
        res = fit_scanned(
            model, DataSet(X, Y), num_iter=12, batch_size=16, num_inner=4,
            learning_rate=1e-2, log_every_blocks=0, log_fn=lambda s: None,
            sampler="device", sampler_seed=f,
        )
        seq_models.append(res.model)

    # fit_scanned DONATED the original model buffers — rebuild them (the
    # factories are seed-deterministic, so the rebuilds are identical)
    results = fit_batched_scanned(
        [_onoff(seed=f, q_cov=q_cov) for f in range(3)], [d for _, d in folds],
        num_iter=12, batch_size=16, num_inner=4, learning_rate=1e-2,
        seeds=[0, 1, 2], log_every_blocks=0, log_fn=lambda s: None,
    )
    for seq, res in zip(seq_models, results):
        _assert_trees_close(seq, res.model)


def test_batched_ragged_folds_num_data_override():
    """Ragged member lengths: padding rows are never sampled and the traced
    num_data override reproduces each member's true ELBO scale."""
    sizes = [40, 60, 52]
    folds = [
        (_svgp(seed=f, N=sizes[f], num_data=1), _data(200 + f, N=sizes[f]))
        for f in range(3)
    ]
    # sequential truth: same model structure, loss evaluated with the true N
    seq_models = []
    for f, (model, (X, Y)) in enumerate(folds):
        res = fit_scanned(
            model, DataSet(X, Y), num_iter=8, batch_size=12, num_inner=4,
            learning_rate=1e-2, log_every_blocks=0, log_fn=lambda s: None,
            sampler="device", sampler_seed=f,
            loss_fn=lambda m, Xb, Yb, n=sizes[f]: m.loss(Xb, Yb, num_data=n),
        )
        seq_models.append(res.model)

    import jax.numpy as jnp

    # rebuild: the sequential runs donated the original buffers
    results = fit_batched_scanned(
        [_svgp(seed=f, N=sizes[f], num_data=1) for f in range(3)],
        [d for _, d in folds],
        num_iter=8, batch_size=12, num_inner=4, learning_rate=1e-2,
        seeds=[0, 1, 2], log_every_blocks=0, log_fn=lambda s: None,
        loss_fn=lambda m, Xb, Yb, n: m.loss(Xb, Yb, num_data=n),
        aux=jnp.asarray(np.array(sizes, dtype=np.float64)),
    )
    for seq, res in zip(seq_models, results):
        _assert_trees_close(seq, res.model)


def test_stack_pytrees_rejects_structure_mismatch():
    a = _svgp(0, N=50)
    b = _svgp(1, N=51)  # num_data is a static field -> different treedef
    with pytest.raises(ValueError, match="cannot stack"):
        stack_pytrees([a, b])


def test_unstack_roundtrip():
    models = [_svgp(s) for s in range(3)]
    stacked = stack_pytrees(models)
    for i, m in enumerate(models):
        _assert_trees_close(m, unstack_pytree(stacked, i), rtol=0, atol=0)


def test_predict_batched_stacked_matches_individual():
    models = [_onoff(seed=s) for s in range(2)]
    stacked = stack_pytrees(models)
    Xs = np.stack([_data(300 + s, N=37)[0] for s in range(2)])

    preds = predict_batched_stacked(
        lambda m, X: m.predict(X), stacked, Xs, batch=16
    )
    for f, m in enumerate(models):
        ref = m.predict(Xs[f])._asdict()
        for k, v in preds[f].items():
            assert v.shape[0] == 37
            np.testing.assert_allclose(v, np.asarray(ref[k]), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("kron_joint", [False, True])
def test_natgrad_batched_matches_sequential(kron_joint):
    """Each member of the natgrad stack reproduces its own sequential
    fit_natgrad_scanned(sampler='device') run — Adam warm-start, γ schedule,
    and the diag / joint-kron natural steps all included."""
    from zigp_tpu.training.batched import fit_natgrad_batched
    from zigp_tpu.training.natgrad import fit_natgrad_scanned

    q_cov = "kron" if kron_joint else "diag"
    kw = dict(
        num_iter=16, batch_size=12, num_inner=4,
        gamma=0.05, gamma_warmup=8, adam_warmup=4, adam_lr=1e-2,
        kron_joint=kron_joint,
        log_every_blocks=0, log_fn=lambda s: None,
    )
    folds = [(_svgp(seed=f, q_cov=q_cov, whiten=True), _data(500 + f)) for f in range(2)]

    seq_models = []
    for f, (model, (X, Y)) in enumerate(folds):
        r = fit_natgrad_scanned(
            model, DataSet(X, Y), sampler="device", sampler_seed=f, **kw
        )
        seq_models.append(r.model)

    results = fit_natgrad_batched(
        [_svgp(seed=f, q_cov=q_cov, whiten=True) for f in range(2)],
        [d for _, d in folds],
        seeds=[0, 1], **kw,
    )
    for seq, r in zip(seq_models, results):
        _assert_trees_close(seq, r.model)
        assert np.isfinite(r.final_loss)


def test_member_sharded_stack_matches_unsharded():
    """Member-axis sharding over the mesh 'data' axis (F/D members per
    device, zero collectives) reproduces the unsharded stack exactly."""
    from zigp_tpu.parallel import make_mesh
    from zigp_tpu.training.batched import fit_batched_scanned as fit

    mesh = make_mesh(n_data=2, n_model=1)
    kw = dict(
        num_iter=8, batch_size=12, num_inner=4, learning_rate=1e-2,
        seeds=[0, 1, 2, 3], log_every_blocks=0, log_fn=lambda s: None,
    )
    datas = [_data(700 + f) for f in range(4)]
    plain = fit([_svgp(seed=f) for f in range(4)], datas, **kw)
    sharded = fit([_svgp(seed=f) for f in range(4)], datas, mesh=mesh, **kw)
    for a, b in zip(plain, sharded):
        _assert_trees_close(a.model, b.model)


def test_member_sharded_natgrad_matches_unsharded():
    from zigp_tpu.parallel import make_mesh
    from zigp_tpu.training.batched import fit_natgrad_batched

    mesh = make_mesh(n_data=2, n_model=1)
    kw = dict(
        num_iter=12, batch_size=12, num_inner=4,
        gamma=0.05, gamma_warmup=8, adam_warmup=4, adam_lr=1e-2,
        seeds=[0, 1], log_every_blocks=0, log_fn=lambda s: None,
    )
    datas = [_data(800 + f) for f in range(2)]
    plain = fit_natgrad_batched(
        [_svgp(seed=f, whiten=True) for f in range(2)], datas, **kw
    )
    sharded = fit_natgrad_batched(
        [_svgp(seed=f, whiten=True) for f in range(2)], datas, mesh=mesh, **kw
    )
    for a, b in zip(plain, sharded):
        _assert_trees_close(a.model, b.model)


def test_member_sharding_pads_nondividing():
    """3 members over a 2-device data axis: padded to 4 internally, pads
    discarded — results ≡ the unsharded 3-member stack."""
    from zigp_tpu.parallel import make_mesh
    from zigp_tpu.training.batched import fit_batched_scanned as fit

    mesh = make_mesh(n_data=2, n_model=1)
    kw = dict(
        num_iter=8, batch_size=8, num_inner=4,
        log_every_blocks=0, log_fn=lambda s: None,
    )
    datas = [_data(900 + f) for f in range(3)]
    plain = fit([_svgp(seed=f) for f in range(3)], datas, **kw)
    sharded = fit([_svgp(seed=f) for f in range(3)], datas, mesh=mesh, **kw)
    assert len(sharded) == 3
    for a, b in zip(plain, sharded):
        _assert_trees_close(a.model, b.model)


def test_batched_final_nan_gate():
    """A member that goes non-finite must raise at completion (no silent
    poisoned member in the returned stack)."""
    folds = [(_svgp(seed=f), _data(400 + f)) for f in range(2)]
    with pytest.raises(FloatingPointError, match="non-finite"):
        fit_batched_scanned(
            [m for m, _ in folds], [d for _, d in folds],
            num_iter=4, batch_size=8, num_inner=2,
            log_every_blocks=0, log_fn=lambda s: None,
            loss_fn=lambda m, X, Y, a: m.loss(X, Y) * np.nan,
        )


def test_batched_resume_completed_run_is_noop(tmp_path):
    """resume=True with the stack checkpoint already at num_iter: no further
    training, no checkpoint advance, members returned from the checkpoint."""
    from zigp_tpu.io.checkpoint import CheckpointManager

    folds = [(_svgp(seed=f), _data(300 + f)) for f in range(3)]
    mgr = CheckpointManager(str(tmp_path / "ck"), every=8)
    first = fit_batched_scanned(
        [m for m, _ in folds], [d for _, d in folds],
        num_iter=8, batch_size=16, num_inner=4, learning_rate=1e-2,
        seeds=[0, 1, 2], log_every_blocks=0, log_fn=lambda s: None,
        ckpt_manager=mgr,
    )
    assert mgr.latest_step() == 8

    logs = []
    again = fit_batched_scanned(
        [_svgp(seed=f) for f in range(3)], [d for _, d in folds],
        num_iter=8, batch_size=16, num_inner=4, learning_rate=1e-2,
        seeds=[0, 1, 2], log_every_blocks=0, log_fn=logs.append,
        ckpt_manager=mgr, resume=True,
    )
    assert any("nothing to train" in l for l in logs)
    assert mgr.latest_step() == 8
    for a, b in zip(first, again):
        _assert_trees_close(a.model, b.model, rtol=0, atol=0)
        # no-op resume still populates the per-member health signal
        assert np.isfinite(b.final_loss)
