"""Tensor-parallel (inducing-dimension-sharded) whitened Kron GP must match
the single-device path exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zigp_tpu.models import KronGP
from zigp_tpu.ops.kernels import RBF
from zigp_tpu.parallel import make_mesh
from zigp_tpu.parallel.tp import tp_whitened_kron_predict_and_kl

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _gp(rng, Ms=8, Mt=6):
    Zs = [rng.rand(Ms, 2), rng.rand(Mt, 1)]
    ks = [RBF.create([0.8, 0.9], 1.3), RBF.create([0.3], 1.1)]
    gp = KronGP.create(ks, Zs, jitter=1e-6, whiten=True, seed=5)
    return gp


@requires_8
def test_tp_matches_single_device(rng):
    gp = _gp(rng)
    X = jnp.asarray(rng.rand(17, 3))

    mu_ref, var_ref = gp.predict_f(X)
    kl_ref = float(gp.prior_kl())

    mesh = make_mesh(n_data=1, n_model=8)
    mu, var, kl = jax.jit(
        lambda q_mu, q_sqrt: tp_whitened_kron_predict_and_kl(
            mesh,
            gp.kernels,
            [Z.value for Z in gp.Zs],
            q_mu,
            q_sqrt,
            X,
            gp.input_masks,
            jitter=gp.jitter,
        )
    )(gp.q_mu.value, gp.q_sqrt.value)

    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(float(kl), kl_ref, rtol=1e-10)


@requires_8
def test_tp_uneven_not_required_but_4way_works(rng):
    # model axis 4 (Ms=8 divides evenly); data axis 2 unused by the op
    gp = _gp(rng, Ms=8, Mt=5)
    X = jnp.asarray(rng.rand(9, 3))
    mesh = make_mesh(n_data=2, n_model=4)
    mu, var, kl = tp_whitened_kron_predict_and_kl(
        mesh, gp.kernels, [Z.value for Z in gp.Zs],
        gp.q_mu.value, gp.q_sqrt.value, X, gp.input_masks, jitter=gp.jitter,
    )
    mu_ref, var_ref = gp.predict_f(X)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), rtol=1e-10)
    np.testing.assert_allclose(float(kl), float(gp.prior_kl()), rtol=1e-10)
