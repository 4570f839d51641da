"""GSPMD tensor-parallel TRAINING: the full ELBO/grad/Adam step with the
variational parameters (and Adam moments) row-sharded over the mesh ``model``
axis must reproduce the single-device training trajectory."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zigp_tpu.likelihoods import Gaussian, OnOffGaussian
from zigp_tpu.models import KronOnOffSVGP, KronSVGP
from zigp_tpu.ops.kernels import RBF
from zigp_tpu.parallel import make_mesh, make_tp_train_step, tp_place, tp_shardings_tree
from zigp_tpu.training import make_optimizer
from zigp_tpu.training.loop import make_train_step

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _onoff(*, whiten, q_cov, Ms=8, Mt=6, N=64):
    # fresh arrays per call: the tp/single runs must start from identical
    # models, and donated buffers must not be shared between builds
    r = np.random.RandomState(11)
    Zs = [r.rand(Ms, 2), np.linspace(0, 1, Mt)[:, None]]
    ks = lambda v: [RBF.create([1.0, 1.0], v), RBF.create([0.3], v)]
    return KronOnOffSVGP.create(
        ks(2.0), Zs, ks(1.0), [Z.copy() for Z in Zs], OnOffGaussian.create(0.05),
        num_data=N, jitter=1e-6, seed=3, whiten=whiten, q_cov=q_cov,
    )


def _run_single(model, batches, lr=1e-2):
    opt = make_optimizer(model, default_lr=lr)
    state = opt.init(model)
    step = make_train_step(opt)
    for X, Y in batches:
        model, state, loss = step(model, state, X, Y)
    return model, float(loss)


def _run_tp(model, batches, mesh, lr=1e-2):
    opt = make_optimizer(model, default_lr=lr)
    state = opt.init(model)
    model = tp_place(mesh, model)
    state = tp_place(mesh, state)
    step = make_tp_train_step(opt, mesh)
    for X, Y in batches:
        model, state, loss = step(model, state, X, Y)
    return model, float(loss)


def _assert_trees_close(a, b, rtol=1e-9, atol=1e-11):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def _batches(rng, n, B=16):
    out = []
    for _ in range(n):
        X = jnp.asarray(rng.rand(B, 3))
        Y = jnp.asarray(np.maximum(rng.randn(B, 1), 0.0))
        out.append((X, Y))
    return out


@requires_8
@pytest.mark.parametrize("whiten,q_cov", [(True, "diag"), (False, "diag"), (True, "kron")])
def test_tp_train_step_matches_single_device(rng, whiten, q_cov):
    batches = _batches(rng, 5)
    m1, loss1 = _run_single(_onoff(whiten=whiten, q_cov=q_cov), batches)

    mesh = make_mesh(n_data=2, n_model=4)
    m2, loss2 = _run_tp(_onoff(whiten=whiten, q_cov=q_cov), batches, mesh)

    assert np.isclose(loss1, loss2, rtol=1e-9)
    _assert_trees_close(m1, m2)


@requires_8
def test_tp_placement_actually_shards(rng):
    """q_mu/q_sqrt land row-sharded over 'model'; kernels stay replicated."""
    mesh = make_mesh(n_data=2, n_model=4)
    model = _onoff(whiten=True, q_cov="diag")
    placed = tp_place(mesh, model)
    sh = placed.f.q_mu.raw.sharding
    assert sh.spec[0] == "model"
    assert not placed.f.kernels[0].lengthscales.raw.sharding.is_fully_replicated or True
    # kernel params replicated
    assert placed.f.kernels[0].lengthscales.raw.sharding.is_fully_replicated
    # a 4-way row shard of (48, 1) puts 12 rows per device
    shard_shapes = {s.data.shape for s in placed.f.q_mu.raw.addressable_shards}
    assert shard_shapes == {(12, 1)}


@requires_8
def test_tp_train_svgp_regression(rng):
    """Single-GP model family through the same tp step."""
    Zs = [rng.rand(8, 2), np.linspace(0, 1, 6)[:, None]]

    def build():
        ks = [RBF.create([1.0, 1.0], 1.5), RBF.create([0.3], 1.5)]
        return KronSVGP.create(ks, [Z.copy() for Z in Zs], Gaussian.create(0.1),
                               num_data=64, jitter=1e-6, seed=1, whiten=True)

    batches = _batches(rng, 4)
    m1, _ = _run_single(build(), batches)
    mesh = make_mesh(n_data=1, n_model=8)
    m2, _ = _run_tp(build(), batches, mesh)
    _assert_trees_close(m1, m2)
