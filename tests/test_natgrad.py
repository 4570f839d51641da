import numpy as np
import jax.numpy as jnp

from zigp_tpu.likelihoods import Gaussian, OnOffGaussian
from zigp_tpu.models import KronSVGP, OnOffSVGP
from zigp_tpu.ops.kernels import RBF
from zigp_tpu.training.natgrad import NaturalGradientTrainer, natgrad_update_diag


def test_natgrad_exact_for_conjugate_gaussian(rng):
    """For L = KL(N(m, s²) ‖ N(0, 1)) − const, one nat-grad step with γ=1
    lands exactly on the optimum (m*, s*) of a conjugate Gaussian model."""
    import jax

    # loss: -E_q[log N(y|u, σ²)] + KL(q || N(0,1)), single point y
    y, sigma2 = 1.3, 0.5

    def loss(m, s):
        eq = -0.5 * np.log(2 * np.pi * sigma2) - 0.5 * ((y - m) ** 2 + s**2) / sigma2
        kl = 0.5 * (m**2 + s**2 - 1.0 - jnp.log(s**2))
        return -(eq) + kl

    m0, s0 = jnp.asarray(0.0), jnp.asarray(1.0)
    dm, ds = jax.grad(loss, argnums=(0, 1))(m0, s0)
    m1, s1 = natgrad_update_diag(m0, s0, dm, ds, lr=1.0)
    # analytic posterior: precision 1 + 1/σ², mean = (y/σ²)/prec
    prec = 1.0 + 1.0 / sigma2
    np.testing.assert_allclose(float(m1), (y / sigma2) / prec, rtol=1e-8)
    np.testing.assert_allclose(float(s1), np.sqrt(1.0 / prec), rtol=1e-8)


def test_natgrad_trainer_decreases_loss_kron(rng):
    N = 60
    X = np.concatenate([rng.rand(N, 2), rng.rand(N, 1)], axis=1)
    Y = np.sin(5 * X[:, 2:3]) + 0.1 * rng.randn(N, 1)
    Zs = [rng.rand(3, 2), np.linspace(0, 1, 6)[:, None]]
    ks = [RBF.create([1.0, 1.0], 1.0), RBF.create([0.3], 1.0)]
    model = KronSVGP.create(ks, Zs, Gaussian.create(0.1), num_data=N, jitter=1e-6)

    trainer = NaturalGradientTrainer(model, gamma=0.05, adam_lr=1e-2)
    state = trainer.init(model)
    step = trainer.make_step()
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    first = float(model.loss(Xj, Yj))
    for _ in range(40):
        model, state, loss = step(model, state, Xj, Yj)
    assert float(loss) < first
    assert np.isfinite(float(loss))
    # variational params actually moved
    assert not np.allclose(np.asarray(model.gp.q_mu.value), 0.0, atol=1e-4)


def test_natgrad_trainer_onoff_dense(rng):
    N = 40
    X = np.linspace(0, 10, N)[:, None]
    Y = np.sin(X) * (np.cos(X) > 0)
    Z = np.linspace(0, 10, 6)[:, None]
    model = OnOffSVGP.create(
        RBF.create([2.0], 1.0), RBF.create([2.0], 5.0), OnOffGaussian.create(0.01),
        Z, Z, num_data=N, jitter=1e-6,
    )
    trainer = NaturalGradientTrainer(model, gamma=0.02, adam_lr=1e-2)
    state = trainer.init(model)
    step = trainer.make_step()
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    first = float(model.loss(Xj, Yj))
    for _ in range(30):
        model, state, loss = step(model, state, Xj, Yj)
    assert np.isfinite(float(loss))
    assert float(loss) < first
