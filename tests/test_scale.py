"""Scale pin: the full 105-station × 250-knot configuration (M = 26,250
inducing points per GP — RESULTS.md 'Scale' section) must build and take a
finite training step. The reference's dense-Kronecker formulation cannot
represent this at all (it would materialize a 26,250² prior factor)."""

import numpy as np
import jax
import jax.numpy as jnp

from zigp_tpu.experiments.builders import build_onoff_pptr
from zigp_tpu.experiments.configs import KronGridConfig, OnOffPptrConfig
from zigp_tpu.io.datasets import Split
from zigp_tpu.training import make_optimizer
from zigp_tpu.training.loop import make_train_step


def test_105x250_grid_builds_and_steps_finite(rng):
    N = 4000
    X = np.stack([
        59.8 + 10.3 * rng.rand(N),
        20.0 + 11.0 * rng.rand(N),
        4.368 + 1.079 * rng.rand(N),
    ], axis=1)
    Y = np.maximum(rng.randn(N, 1), 0.0)
    Y[rng.rand(N, 1) < 0.89] = 0.0
    split = Split(X, Y, X[:10], Y[:10])

    cfg = OnOffPptrConfig(
        whiten=True,
        grid=KronGridConfig(num_spatial=105, num_temporal=250),
    )
    model = build_onoff_pptr(cfg, split)
    assert model.f.q_mu.value.shape == (105 * 250, 1)

    opt = make_optimizer(model, default_lr=1e-3)
    state = opt.init(model)
    step = make_train_step(opt)
    Xb, Yb = jnp.asarray(X[:256]), jnp.asarray(Y[:256])
    model, state, loss = step(model, state, Xb, Yb)
    assert np.isfinite(float(loss))
    model, state, loss2 = step(model, state, Xb, Yb)
    assert np.isfinite(float(loss2))
    assert float(loss2) < float(loss)
