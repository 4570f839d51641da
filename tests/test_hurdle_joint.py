"""Jointly-trained hurdle model (models.KronHurdleSVGP): gate + amount GP in
one separable ELBO, replacing the reference's two-stage pipeline
(scripts/classifier.py → scripts/hurdle.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zigp_tpu.experiments import HurdleJointConfig, KronGridConfig, run_hurdle_joint
from zigp_tpu.experiments.builders import build_hurdle_joint_pptr
from zigp_tpu.io.datasets import Split


def _synthetic_split(rng, Ntrain=300, Ntest=80):
    def gen(N):
        X = rng.rand(N, 3)
        gate = (np.cos(5 * X[:, 2:3]) + 0.3 * rng.randn(N, 1)) > 0
        Y = np.maximum((1.0 + np.sin(3 * X[:, 2:3]) + X[:, 0:1]) * gate, 0.0)
        return X, Y

    Xtr, Ytr = gen(Ntrain)
    Xte, Yte = gen(Ntest)
    return Split(Xtr, Ytr, Xte, Yte)


def _tiny_cfg(**kw):
    kw.setdefault("grid", KronGridConfig(num_spatial=3, num_temporal=6))
    kw.setdefault("num_iter", 30)
    kw.setdefault("batch_size", 64)
    kw.setdefault("log_every", 0)
    return HurdleJointConfig(**kw)


@pytest.mark.parametrize("head", ["lognormal", "gamma", "gaussian"])
def test_elbo_assembly_matches_manual(rng, head):
    """The joint ELBO is exactly (gate var_exp over all points) + (amount
    var_exp over the positives) − KL_f − KL_g — re-derived here from the
    model's own independently-oracled pieces (KronGP.predict_f / prior_kl
    have their own dense-oracle tests)."""
    split = _synthetic_split(rng)
    model = build_hurdle_joint_pptr(_tiny_cfg(likelihood=head), split)
    X = jnp.asarray(split.Xtrain[:100])
    Y = jnp.asarray(split.Ytrain[:100])

    got = model.elbo(X, Y)

    fmean, fvar = model.f.predict_f(X)
    if model.mean_const is not None:
        fmean = fmean + model.mean_const.value
    gmean, gvar = model.g.predict_f(X)
    kl = model.f.prior_kl() + model.g.prior_kl()
    on = np.asarray(Y).reshape(-1) > 0
    ve_gate = model.gate_likelihood.variational_expectations(
        gmean, gvar, (Y > 0).astype(X.dtype)
    )
    ve_amount = model.amount_likelihood.variational_expectations(
        fmean[on], fvar[on], Y[on]
    )
    scale = split.Xtrain.shape[0] / X.shape[0]
    want = (jnp.sum(ve_gate) + jnp.sum(ve_amount)) * scale - kl
    np.testing.assert_allclose(float(got), float(want), rtol=1e-9)


def test_gradients_finite_with_zeros(rng):
    """The masked amount term must not poison the backward pass at the y=0
    rows (log(0)·0 hazard)."""
    split = _synthetic_split(rng)
    model = build_hurdle_joint_pptr(_tiny_cfg(), split)
    X = jnp.asarray(split.Xtrain[:64])
    Y = jnp.asarray(split.Ytrain[:64])
    assert float(np.sum(np.asarray(Y) == 0)) > 0  # zeros present
    grads = jax.grad(lambda m: m.loss(X, Y))(model)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)


def test_paired_vmap_equals_sequential(rng):
    split = _synthetic_split(rng)
    model = build_hurdle_joint_pptr(_tiny_cfg(), split)
    X = jnp.asarray(split.Xtrain[:80])
    Y = jnp.asarray(split.Ytrain[:80])
    e_paired = model.elbo(X, Y)
    e_seq = model.replace(pair_gps=False).elbo(X, Y)
    np.testing.assert_allclose(float(e_paired), float(e_seq), rtol=1e-9)

    pr_p = model.predict(X)
    pr_s = model.replace(pair_gps=False).predict(X)
    np.testing.assert_allclose(np.asarray(pr_p.p_on), np.asarray(pr_s.p_on), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(pr_p.fmean), np.asarray(pr_s.fmean), rtol=1e-9)


def test_factor_state_hoisting(rng):
    """elbo(factor_state=precomputed) ≡ elbo() — the block-coordinate
    trainer's contract (training.alternating)."""
    split = _synthetic_split(rng)
    model = build_hurdle_joint_pptr(_tiny_cfg(), split)
    X = jnp.asarray(split.Xtrain[:64])
    Y = jnp.asarray(split.Ytrain[:64])
    st = model.factor_state()
    np.testing.assert_allclose(
        float(model.elbo(X, Y, factor_state=st)), float(model.elbo(X, Y)), rtol=1e-12
    )


@pytest.mark.parametrize("head", ["lognormal", "gaussian"])
def test_run_hurdle_joint_end_to_end(rng, tmp_path, head):
    split = _synthetic_split(rng)
    res = run_hurdle_joint(
        split, _tiny_cfg(likelihood=head), workdir=str(tmp_path),
        log_fn=lambda s: None,
    )
    for k in (
        "test_hurdle_comb_rmse", "test_hurdle_comb_mae", "test_hurdle_prob_rmse",
        "test_hurdle_nlpd", "test_gate_accuracy", "test_gate_auc",
    ):
        assert np.isfinite(res[k]), k
    assert res["test_pred_hurdle_comb"].shape == split.Ytest.shape
    if head == "lognormal":
        # exp-link amount mean: non-negative by construction (the gaussian
        # head can go negative — that's the reference's clipping problem)
        assert (np.asarray(res["test_pred_hurdle_comb"]) >= 0.0).all()
    assert (tmp_path / "results_hurdlej.pickle").exists()


@pytest.mark.parametrize("head", ["lognormal", "gamma", "gaussian"])
def test_predict_y_samples_moments(rng, head):
    """Mixed-measure draws: zero fraction ≈ 1−p and sample mean ≈ p·E[amount]
    (Monte Carlo agreement with the analytic moments)."""
    split = _synthetic_split(rng)
    model = build_hurdle_joint_pptr(_tiny_cfg(likelihood=head), split)
    X = jnp.asarray(split.Xtest[:20])
    pr = model.predict(X)
    S = 6000
    ys = np.asarray(model.predict_y_samples(jax.random.PRNGKey(0), X, S))
    assert ys.shape == (S, 20, 1)

    p = np.asarray(pr.p_on, dtype=np.float64).reshape(-1)
    zero_frac = (ys == 0.0).mean(axis=0).reshape(-1)
    np.testing.assert_allclose(zero_frac, 1.0 - p, atol=0.03)

    from zigp_tpu.experiments.runners import _amount_ymean

    ymean = _amount_ymean(
        model.amount_likelihood, np.asarray(pr.fmean), np.asarray(pr.fvar)
    ).reshape(-1)
    want = p * ymean
    got = ys.mean(axis=0).reshape(-1)
    # z-test tolerance: the untrained prior variance makes the draws wide
    # (heavy-tailed under the exp links, var ~ O(100) for the gaussian head),
    # so bound the error by 6 standard errors of the sample mean per point
    se = ys.std(axis=0).reshape(-1) / np.sqrt(S)
    assert (np.abs(got - want) <= 6.0 * se + 1e-9).all()


def test_natgrad_on_joint_hurdle_moves_all_variational_blocks(rng):
    """optimizer='natgrad' on KronHurdleSVGP: the natural step must update
    BOTH GPs' (q_mu, q_sqrt) pairs (regression guard against the dense-family
    freeze bug class: a mean-only pseudo-step that leaves q_sqrt Adam-frozen),
    and the objective must improve."""
    split = _synthetic_split(rng)
    cfg = _tiny_cfg(
        num_iter=120, batch_size=128, optimizer="natgrad",
        natgrad_warmup=20, natgrad_adam_warmup=10,
    )
    m0 = build_hurdle_joint_pptr(cfg, split)
    X, Y = jnp.asarray(split.Xtrain), jnp.asarray(split.Ytrain)
    loss0 = float(m0.loss(X, Y))
    res = run_hurdle_joint(split, cfg, log_fn=lambda s: None)
    m1 = res["model"]
    assert float(m1.loss(X, Y)) < loss0
    for gp in ("f", "g"):
        for field in ("q_mu", "q_sqrt"):
            a = np.asarray(getattr(getattr(m0, gp), field).value)
            b = np.asarray(getattr(getattr(m1, gp), field).value)
            assert not np.allclose(a, b), f"{gp}.{field} did not move"


def test_joint_training_improves_elbo(rng):
    """A short fit must improve the objective (both GPs receive gradient)."""
    split = _synthetic_split(rng)
    cfg = _tiny_cfg(num_iter=150, batch_size=128, scan_inner=0)
    model = build_hurdle_joint_pptr(cfg, split)
    X = jnp.asarray(split.Xtrain)
    Y = jnp.asarray(split.Ytrain)
    loss0 = float(model.loss(X, Y))
    res = run_hurdle_joint(split, cfg, log_fn=lambda s: None)
    loss1 = float(res["model"].loss(X, Y))
    assert loss1 < loss0
    # both GPs moved
    m = res["model"]
    m0 = model
    assert not np.allclose(np.asarray(m.f.q_mu.value), np.asarray(m0.f.q_mu.value))
    assert not np.allclose(np.asarray(m.g.q_mu.value), np.asarray(m0.g.q_mu.value))
