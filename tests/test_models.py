import numpy as np
import jax
import jax.numpy as jnp

from zigp_tpu.likelihoods import Bernoulli, Gaussian, OnOffGaussian
from zigp_tpu.models import KronOnOffSVGP, KronSVGP, OnOffSVGP, SVGP
from zigp_tpu.ops.kernels import RBF
from .oracles import (
    SEKernelNp,
    conditional_dense,
    gauss_kl_kron_dense,
    kron_inf_dense,
    onoff_elbo_dense,
    probit_expectations_np,
)


def _toy_problem(rng, N=30, M=6, D=1):
    X = rng.rand(N, D) * 10
    Y = np.sin(X[:, :1]) + rng.randn(N, 1) * 0.1
    Z = np.linspace(0, 10, M)[:, None] if D == 1 else rng.rand(M, D) * 10
    return X, Y, Z


def test_onoff_dense_elbo_matches_oracle(rng):
    X, Y, Z = _toy_problem(rng)
    kernf = RBF.create([2.0], 1.0)
    kerng = RBF.create([2.0], 5.0)
    u_fm = rng.randn(6, 1) * 0.01
    u_gm = rng.randn(6, 1) * 0.01
    model = OnOffSVGP.create(
        kernf, kerng, OnOffGaussian.create(0.01), Z, Z,
        num_data=X.shape[0], jitter=1e-6, u_fm_init=u_fm, u_gm_init=u_gm,
    )
    got = float(model.elbo(jnp.asarray(X), jnp.asarray(Y)))
    want = onoff_elbo_dense(
        X, Y,
        SEKernelNp(np.array([2.0]), 1.0), SEKernelNp(np.array([2.0]), 5.0),
        Z, Z, u_fm, u_gm, np.ones((6, 1)), np.ones((6, 1)),
        noisevar=0.01, num_data=X.shape[0], jitter=1e-6,
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_svgp_dense_elbo_matches_oracle(rng):
    X, Y, Z = _toy_problem(rng)
    k = RBF.create([2.0], 1.0)
    q_mu = rng.randn(6, 1) * 0.01
    model = SVGP.create(
        k, Gaussian.create(0.01), Z, num_data=X.shape[0], jitter=1e-6, q_mu_init=q_mu
    )
    got = float(model.elbo(jnp.asarray(X), jnp.asarray(Y)))

    # oracle: dense conditional + Gaussian var_exp + dense KL
    from .oracles import gauss_kl_dense

    oracle_k = SEKernelNp(np.array([2.0]), 1.0)
    Kmm = oracle_k.K(Z) + np.eye(6) * 1e-6
    kl = gauss_kl_dense(q_mu, np.ones((6, 1)), Kmm)
    fmean, fvar = conditional_dense(X, Z, oracle_k, q_mu, q_sqrt=np.ones((6, 1)), jitter=1e-6)
    noisevar = 0.01
    var_exp = (
        -0.5 * np.log(2 * np.pi) - 0.5 * np.log(noisevar)
        - 0.5 * ((Y - fmean) ** 2 + fvar) / noisevar
    )
    want = np.sum(var_exp) - kl
    np.testing.assert_allclose(got, want, rtol=1e-6)


def _kron_setup(rng, Ms=4, Mt=7, B=20):
    Zs_np = [rng.rand(Ms, 2), rng.rand(Mt, 1)]
    X = rng.rand(B, 3)
    Y = rng.rand(B, 1)
    Y[Y < 0.6] = 0.0
    M = Ms * Mt
    q_mu = rng.randn(M, 1) * 0.1
    ks = [RBF.create([8.0, 8.0], 20.0), RBF.create([0.005], 20.0)]
    oracles = [SEKernelNp(np.array([8.0, 8.0]), 20.0), SEKernelNp(np.array([0.005]), 20.0)]
    return Zs_np, X, Y, q_mu, ks, oracles


def test_kron_svgp_elbo_matches_oracle(rng):
    Zs_np, X, Y, q_mu, ks, oracles = _kron_setup(rng)
    M = q_mu.shape[0]
    num_data = 1000
    model = KronSVGP.create(
        ks, Zs_np, Gaussian.create(0.01), num_data=num_data, jitter=1e-5, q_mu_init=q_mu
    )
    got = float(model.elbo(jnp.asarray(X), jnp.asarray(Y)))

    Kmms = [oracles[p].K(Zs_np[p]) + np.eye(Zs_np[p].shape[0]) * 1e-5 for p in range(2)]
    kl = gauss_kl_kron_dense(q_mu, np.ones((M, 1)), Kmms)
    mu, var = kron_inf_dense(X, oracles, Zs_np, q_mu, np.ones((M, 1)),
                             [np.array([0, 1]), np.array([2])], jitter=1e-5)
    noisevar = 0.01
    var_exp = (
        -0.5 * np.log(2 * np.pi) - 0.5 * np.log(noisevar)
        - 0.5 * ((Y - mu) ** 2 + var) / noisevar
    )
    want = np.sum(var_exp) * (num_data / X.shape[0]) - kl
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_kron_onoff_elbo_matches_oracle(rng):
    Zs_np, X, Y, q_fm, ks, oracles = _kron_setup(rng)
    M = q_fm.shape[0]
    q_gm = rng.randn(M, 1) * 0.1
    num_data = 1000
    model = KronOnOffSVGP.create(
        ks, Zs_np, ks, Zs_np, OnOffGaussian.create(0.01),
        num_data=num_data, jitter=1e-5,
    )
    # overwrite inits to known values
    model = model.replace(
        f=model.f.replace(q_mu=model.f.q_mu.replace(raw=jnp.asarray(q_fm))),
        g=model.g.replace(q_mu=model.g.q_mu.replace(raw=jnp.asarray(q_gm))),
    )
    got = float(model.elbo(jnp.asarray(X), jnp.asarray(Y)))

    masks = [np.array([0, 1]), np.array([2])]
    Kmms = [oracles[p].K(Zs_np[p]) + np.eye(Zs_np[p].shape[0]) * 1e-5 for p in range(2)]
    kl = gauss_kl_kron_dense(q_fm, np.ones((M, 1)), Kmms) + gauss_kl_kron_dense(
        q_gm, np.ones((M, 1)), Kmms
    )
    fmean, fvar = kron_inf_dense(X, oracles, Zs_np, q_fm, np.ones((M, 1)), masks, jitter=1e-5)
    gmean, gvar = kron_inf_dense(X, oracles, Zs_np, q_gm, np.ones((M, 1)), masks, jitter=1e-5)
    ephi, ephi2, varphi = probit_expectations_np(gmean, gvar)
    gfmean, gfvar, gfmeanu = ephi * fmean, ephi2 * fvar, varphi * fmean**2
    noisevar = 0.01
    var_exp = (
        -0.5 * np.log(2 * np.pi) - 0.5 * np.log(noisevar)
        - 0.5 * ((Y - gfmean) ** 2 + gfvar + gfmeanu) / noisevar
    )
    want = np.sum(var_exp) * (num_data / X.shape[0]) - kl
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_kron_classifier_elbo_matches_reference_plugin_form(rng):
    Zs_np, X, Y, q_mu, ks, oracles = _kron_setup(rng)
    M = q_mu.shape[0]
    Yb = (Y > 0).astype(np.float64)
    num_data = 500
    model = KronSVGP.create(
        ks, Zs_np, Bernoulli.create(num_gh=0), num_data=num_data, jitter=1e-5, q_mu_init=q_mu
    )
    got = float(model.elbo(jnp.asarray(X), jnp.asarray(Yb)))

    from scipy.special import erf

    masks = [np.array([0, 1]), np.array([2])]
    Kmms = [oracles[p].K(Zs_np[p]) + np.eye(Zs_np[p].shape[0]) * 1e-5 for p in range(2)]
    kl = gauss_kl_kron_dense(q_mu, np.ones((M, 1)), Kmms)
    fmean, fvar = kron_inf_dense(X, oracles, Zs_np, q_mu, np.ones((M, 1)), masks, jitter=1e-5)
    p = 0.5 * (1 + erf(fmean / np.sqrt(1 + fvar) / np.sqrt(2))) * (1 - 2e-3) + 1e-3
    var_exp = np.log(np.where(Yb == 1, p, 1 - p))
    want = np.sum(var_exp) * (num_data / X.shape[0]) - kl
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bernoulli_gh_close_to_plugin_at_low_var(rng):
    # with tiny predictive variance both forms approach log p(y|f=mu)
    Fmu = rng.randn(50, 1)
    Fvar = np.full((50, 1), 1e-8)
    Y = (rng.rand(50, 1) > 0.5).astype(np.float64)
    plug = Bernoulli.create(0).variational_expectations(jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y))
    gh = Bernoulli.create(30).variational_expectations(jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y))
    np.testing.assert_allclose(np.asarray(plug), np.asarray(gh), atol=1e-6)


def test_elbo_is_differentiable_end_to_end(rng):
    Zs_np, X, Y, q_mu, ks, _ = _kron_setup(rng)
    model = KronOnOffSVGP.create(
        ks, Zs_np, ks, Zs_np, OnOffGaussian.create(0.01), num_data=100, jitter=1e-5
    )
    grads = jax.grad(lambda m: m.loss(jnp.asarray(X), jnp.asarray(Y)))(model)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # at least the likelihood variance and f q_mu receive signal
    assert not np.allclose(np.asarray(grads.f.q_mu.raw), 0.0)
    assert not np.allclose(np.asarray(grads.likelihood.variance.raw), 0.0)


def test_onoff_predict_y_samples_match_moments(rng):
    """predict_y_samples draws the gated predictive y* = Φ(g*)·f* + ε whose
    Monte-Carlo moments must match the closed-form prediction fields:
    E[y*] = gfmean and Var[y*] = E[Φ²](fvar + fmean²) − gfmean² + σ²."""
    Zs_np, X, Y, q_fm, ks, _ = _kron_setup(rng)
    model = KronOnOffSVGP.create(
        ks, Zs_np, ks, Zs_np, OnOffGaussian.create(0.01),
        num_data=1000, jitter=1e-5,
    )
    Xt = jnp.asarray(X[:8])
    pred = model.predict(Xt)
    S = 20_000
    s = np.asarray(model.predict_y_samples(jax.random.PRNGKey(0), Xt, S))
    assert s.shape == (S, 8, 1)

    mean = np.asarray(pred.gfmean)
    ephi2 = np.asarray(pred.gfvar) / np.maximum(np.asarray(pred.fvar), 1e-30)
    var = (
        ephi2 * (np.asarray(pred.fvar) + np.asarray(pred.fmean) ** 2)
        - mean**2
        + 0.01
    )
    mc_mean = s.mean(axis=0)
    mc_var = s.var(axis=0)
    # MC tolerance: ~4 standard errors
    se_mean = np.sqrt(var / S)
    assert np.all(np.abs(mc_mean - mean) < 4 * se_mean + 1e-6)
    np.testing.assert_allclose(mc_var, var, rtol=0.1, atol=1e-4)

    # dense model exposes the same API
    Xd, Yd, Zd = _toy_problem(rng)
    dense = OnOffSVGP.create(
        RBF.create([1.0], 1.0), RBF.create([1.0], 1.0),
        OnOffGaussian.create(0.01), Zd, Zd, num_data=Xd.shape[0],
    )
    sd = np.asarray(dense.predict_y_samples(jax.random.PRNGKey(1), jnp.asarray(Xd[:5]), 7))
    assert sd.shape == (7, 5, 1) and np.isfinite(sd).all()
