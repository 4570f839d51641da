"""The paired (vmapped) f/g path must be numerically identical to the
sequential path."""

import numpy as np
import jax.numpy as jnp

from zigp_tpu.likelihoods import OnOffGaussian
from zigp_tpu.models import KronOnOffSVGP
from zigp_tpu.ops.kernels import RBF


def _model(rng, pair, whiten=False):
    Zs = [rng.rand(4, 2), rng.rand(7, 1)]
    fk = [RBF.create([1.1, 0.9], 1.5), RBF.create([0.3], 2.0)]
    gk = [RBF.create([0.8, 1.3], 0.7), RBF.create([0.4], 1.1)]
    m = KronOnOffSVGP.create(
        fk, Zs, gk, [Z.copy() for Z in Zs], OnOffGaussian.create(0.05),
        num_data=100, jitter=1e-6, seed=3, whiten=whiten,
    )
    return m.replace(pair_gps=pair)


def test_paired_matches_sequential(rng):
    X = rng.rand(25, 3)
    Y = rng.rand(25, 1)
    mp = _model(np.random.RandomState(0), True)
    ms = mp.replace(pair_gps=False)
    assert mp._pairable()

    ep = float(mp.elbo(jnp.asarray(X), jnp.asarray(Y)))
    es = float(ms.elbo(jnp.asarray(X), jnp.asarray(Y)))
    np.testing.assert_allclose(ep, es, rtol=1e-12)

    pp = mp.predict(jnp.asarray(X))
    ps = ms.predict(jnp.asarray(X))
    for a, b in zip(pp, ps):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_paired_matches_sequential_whitened(rng):
    X = rng.rand(15, 3)
    Y = rng.rand(15, 1)
    mp = _model(np.random.RandomState(1), True, whiten=True)
    ms = mp.replace(pair_gps=False)
    np.testing.assert_allclose(
        float(mp.elbo(jnp.asarray(X), jnp.asarray(Y))),
        float(ms.elbo(jnp.asarray(X), jnp.asarray(Y))),
        rtol=1e-12,
    )


def test_paired_gradients_match(rng):
    import jax

    X = jnp.asarray(rng.rand(20, 3))
    Y = jnp.asarray(rng.rand(20, 1))
    mp = _model(np.random.RandomState(2), True)
    ms = mp.replace(pair_gps=False)
    gp_ = jax.grad(lambda m: m.loss(X, Y))(mp)
    gs_ = jax.grad(lambda m: m.loss(X, Y))(ms)
    for a, b in zip(jax.tree_util.tree_leaves(gp_), jax.tree_util.tree_leaves(gs_)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12)


def test_unpairable_falls_back(rng):
    # different factor sizes for f and g -> sequential path
    r = np.random.RandomState(4)
    Zf = [r.rand(4, 2), r.rand(7, 1)]
    Zg = [r.rand(3, 2), r.rand(7, 1)]
    fk = [RBF.create([1.0, 1.0], 1.0), RBF.create([0.3], 1.0)]
    gk = [RBF.create([1.0, 1.0], 1.0), RBF.create([0.3], 1.0)]
    m = KronOnOffSVGP.create(fk, Zf, gk, Zg, OnOffGaussian.create(), num_data=50, jitter=1e-6)
    assert not m._pairable()
    X = jnp.asarray(r.rand(10, 3))
    Y = jnp.asarray(r.rand(10, 1))
    assert np.isfinite(float(m.elbo(X, Y)))
