import numpy as np
import jax.numpy as jnp

from zigp_tpu.likelihoods import Gaussian, OnOffGaussian
from zigp_tpu.models import KronSVGP, OnOffSVGP
from zigp_tpu.ops.kernels import RBF
from zigp_tpu.training import DataSet, fit, make_optimizer


def test_dataset_epoch_shuffle_semantics():
    x = np.arange(10)[:, None].astype(np.float64)
    y = x.copy()
    ds = DataSet(x, y, seed=0)
    seen = []
    for _ in range(4):
        bx, by = ds.next_batch(4)
        assert bx.shape == (4, 1)
        np.testing.assert_array_equal(bx, by)
        seen.extend(bx[:, 0].tolist())
    # 16 draws over a 10-element set: every element appears at least once
    assert set(np.arange(10.0)) == set(seen) or len(set(seen)) >= 9
    assert ds.epochs_completed >= 1


def test_dataset_wraparound_batch_is_full_size():
    x = np.arange(7)[:, None].astype(np.float64)
    ds = DataSet(x, x, seed=1)
    for _ in range(5):
        bx, _ = ds.next_batch(3)
        assert bx.shape == (3, 1)


def test_fit_decreases_loss_svgp_toy(rng):
    N = 80
    X = np.linspace(0, 10, N)[:, None]
    Y = np.sin(X) + rng.randn(N, 1) * 0.1
    Z = np.linspace(0, 10, 8)[:, None]
    model = KronSVGP.create(
        [RBF.create([2.0], 1.0)], [Z], Gaussian.create(0.1), num_data=N, jitter=1e-6
    )
    first = float(model.loss(jnp.asarray(X), jnp.asarray(Y)))
    res = fit(model, DataSet(X, Y), num_iter=60, batch_size=N, learning_rate=0.05, log_every=0)
    last = float(res.model.loss(jnp.asarray(X), jnp.asarray(Y)))
    assert last < first - 1.0


def test_fit_onoff_dense_toy_loss_decreases(rng):
    N = 60
    X = np.linspace(0, 10, N)[:, None]
    f = np.sin(X)
    gate = (np.cos(X) > 0).astype(np.float64)
    Y = f * gate + rng.randn(N, 1) * 0.05
    Z = np.linspace(0, 10, 8)[:, None]
    model = OnOffSVGP.create(
        RBF.create([2.0], 1.0), RBF.create([2.0], 5.0), OnOffGaussian.create(0.01),
        Z, Z, num_data=N, jitter=1e-6,
    )
    first = float(model.loss(jnp.asarray(X), jnp.asarray(Y)))
    res = fit(model, DataSet(X, Y), num_iter=80, batch_size=N, learning_rate=0.05, log_every=0)
    last = float(res.model.loss(jnp.asarray(X), jnp.asarray(Y)))
    assert last < first


def test_per_lr_group_optimizer_and_frozen(rng):
    from zigp_tpu.core.parameters import param
    import optax

    Z = np.linspace(0, 1, 5)[:, None]
    model = KronSVGP.create(
        [RBF.create([1.0], 1.0, lr=1e-2)], [Z], Gaussian.create(0.1), num_data=10, jitter=1e-6
    )
    # freeze the inducing locations
    frozen_Zs = tuple(p.replace(trainable=False) for p in model.gp.Zs)
    model = model.replace(gp=model.gp.replace(Zs=frozen_Zs))

    opt = make_optimizer(model, default_lr=1e-3)
    state = opt.init(model)
    X = np.linspace(0, 1, 10)[:, None]
    Y = rng.randn(10, 1)
    import jax

    grads = jax.grad(lambda m: m.loss(jnp.asarray(X), jnp.asarray(Y)))(model)
    updates, _ = opt.update(grads, state, model)
    new_model = optax.apply_updates(model, updates)
    # frozen Z unchanged
    np.testing.assert_array_equal(np.asarray(new_model.gp.Zs[0].raw), np.asarray(model.gp.Zs[0].raw))
    # kernel params (lr group 1e-2) moved
    assert not np.allclose(
        np.asarray(new_model.gp.kernels[0].variance.raw),
        np.asarray(model.gp.kernels[0].variance.raw),
    )
