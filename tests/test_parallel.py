import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zigp_tpu.likelihoods import OnOffGaussian
from zigp_tpu.models import KronOnOffSVGP
from zigp_tpu.ops.kernels import RBF
from zigp_tpu.parallel import make_mesh, make_sharded_train_step, replicate, shard_batch
from zigp_tpu.training import make_optimizer


requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _model_and_batch(rng, B=32, num_data=1000):
    Zs_np = [rng.rand(4, 2), rng.rand(6, 1)]
    ks = [RBF.create([8.0, 8.0], 20.0), RBF.create([0.005], 20.0)]
    model = KronOnOffSVGP.create(
        ks, Zs_np, ks, Zs_np, OnOffGaussian.create(0.01), num_data=num_data, jitter=1e-5
    )
    X = rng.rand(B, 3)
    Y = rng.rand(B, 1)
    Y[Y < 0.6] = 0.0
    return model, X, Y


@requires_8_devices
def test_sharded_loss_matches_single_device(rng):
    model, X, Y = _model_and_batch(rng)
    single = float(model.loss(jnp.asarray(X), jnp.asarray(Y)))

    mesh = make_mesh(n_data=8)
    model_r = replicate(mesh, model)
    Xs, Ys = shard_batch(mesh, jnp.asarray(X), jnp.asarray(Y))
    sharded = float(jax.jit(lambda m, x, y: m.loss(x, y))(model_r, Xs, Ys))
    np.testing.assert_allclose(sharded, single, rtol=1e-10)


@requires_8_devices
def test_sharded_train_step_matches_single_device(rng):
    model, X, Y = _model_and_batch(rng)
    opt = make_optimizer(model, default_lr=1e-3)

    # single-device step
    import optax

    state = opt.init(model)
    grads = jax.grad(lambda m: m.loss(jnp.asarray(X), jnp.asarray(Y)))(model)
    updates, _ = opt.update(grads, state, model)
    ref_model = optax.apply_updates(model, updates)

    # sharded step
    mesh = make_mesh(n_data=8)
    model_r = replicate(mesh, model)
    state_r = replicate(mesh, opt.init(model))
    step = make_sharded_train_step(opt, mesh)
    new_model, _, loss = step(model_r, state_r, jnp.asarray(X), jnp.asarray(Y))

    ref_leaves = jax.tree_util.tree_leaves(ref_model)
    new_leaves = jax.tree_util.tree_leaves(new_model)
    for a, b in zip(ref_leaves, new_leaves):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8, atol=1e-12)


@requires_8_devices
def test_mesh_2d_with_model_axis(rng):
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    model, X, Y = _model_and_batch(rng, B=16)
    model_r = replicate(mesh, model)
    Xs, Ys = shard_batch(mesh, jnp.asarray(X), jnp.asarray(Y))
    loss = float(jax.jit(lambda m, x, y: m.loss(x, y))(model_r, Xs, Ys))
    assert np.isfinite(loss)
