import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zigp_tpu.likelihoods import Gaussian
from zigp_tpu.models import KronSVGP
from zigp_tpu.ops.kernels import Constant, Matern, Product, RBF, Sum, White


def test_matern12_matches_closed_form(rng):
    X = rng.randn(15, 2)
    k = Matern.create([1.3, 0.7], 2.0, nu="1/2")
    K = np.asarray(k.K(jnp.asarray(X)))
    r = np.sqrt(np.sum(((X[:, None, :] - X[None, :, :]) / np.array([1.3, 0.7])) ** 2, -1))
    np.testing.assert_allclose(K, 2.0 * np.exp(-r), rtol=1e-7)


@pytest.mark.parametrize("nu,form", [
    ("3/2", lambda r: (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)),
    ("5/2", lambda r: (1 + np.sqrt(5) * r + 5 * r**2 / 3) * np.exp(-np.sqrt(5) * r)),
])
def test_matern_higher_orders(rng, nu, form):
    X = rng.randn(10, 1)
    X2 = rng.randn(8, 1)
    k = Matern.create([0.9], 1.5, nu=nu)
    K = np.asarray(k.K(jnp.asarray(X), jnp.asarray(X2)))
    r = np.abs(X / 0.9 - X2.T / 0.9)
    np.testing.assert_allclose(K, 1.5 * form(r), rtol=1e-7)


def test_matern_gradient_finite_at_zero_distance(rng):
    X = jnp.asarray(np.repeat(rng.randn(1, 2), 4, axis=0))  # identical rows

    def f(k):
        return jnp.sum(k.K(X))

    for nu in ("1/2", "3/2", "5/2"):
        g = jax.grad(f)(Matern.create([1.0, 1.0], 1.0, nu=nu))
        assert np.all(np.isfinite(np.asarray(g.lengthscales.raw)))


def test_matern_psd(rng):
    X = rng.randn(30, 3)
    for nu in ("1/2", "3/2", "5/2"):
        K = np.asarray(Matern.create([1.0, 1.0, 1.0], 1.0, nu=nu).K(jnp.asarray(X)))
        w = np.linalg.eigvalsh(K)
        assert w.min() > -1e-10


def test_white_and_constant(rng):
    X = rng.randn(5, 2)
    X2 = rng.randn(3, 2)
    w = White.create(0.3)
    np.testing.assert_allclose(np.asarray(w.K(jnp.asarray(X))), 0.3 * np.eye(5), rtol=1e-8)
    assert np.all(np.asarray(w.K(jnp.asarray(X), jnp.asarray(X2))) == 0)
    c = Constant.create(0.7)
    np.testing.assert_allclose(np.asarray(c.K(jnp.asarray(X), jnp.asarray(X2))), 0.7, rtol=1e-8)


def test_sum_product_composites(rng):
    X = rng.randn(9, 2)
    k1 = RBF.create([1.0, 1.0], 1.0)
    k2 = Matern.create([0.5, 0.5], 0.5, nu="3/2")
    Ks = np.asarray(Sum(k1, k2).K(jnp.asarray(X)))
    Kp = np.asarray(Product(k1, k2).K(jnp.asarray(X)))
    K1 = np.asarray(k1.K(jnp.asarray(X)))
    K2 = np.asarray(k2.K(jnp.asarray(X)))
    np.testing.assert_allclose(Ks, K1 + K2, rtol=1e-10)
    np.testing.assert_allclose(Kp, K1 * K2, rtol=1e-10)


def test_matern_works_in_kron_model(rng):
    """Matérn factors drop into the Kronecker models unchanged."""
    Zs = [rng.rand(3, 2), np.linspace(0, 1, 6)[:, None]]
    ks = [Matern.create([1.0, 1.0], 1.0, nu="3/2"), Matern.create([0.3], 1.0, nu="5/2")]
    model = KronSVGP.create(ks, Zs, Gaussian.create(0.1), num_data=40, jitter=1e-6)
    X = rng.rand(20, 3)
    Y = rng.rand(20, 1)
    elbo = float(model.elbo(jnp.asarray(X), jnp.asarray(Y)))
    assert np.isfinite(elbo)
    g = jax.grad(lambda m: m.loss(jnp.asarray(X), jnp.asarray(Y)))(model)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(g))


def test_periodic_kernel_properties(rng):
    from zigp_tpu.ops.kernels import Periodic

    X = rng.rand(8, 1)
    k = Periodic.create([0.7], [0.31], 1.3)
    K = np.asarray(k.K(jnp.asarray(X)))
    # exact periodicity: shifting inputs by one period leaves the gram fixed
    K_shift = np.asarray(k.K(jnp.asarray(X), jnp.asarray(X + 0.31)))
    np.testing.assert_allclose(K_shift, K, rtol=1e-6, atol=1e-8)
    # PSD + unit diagonal at variance
    np.testing.assert_allclose(np.diag(K), 1.3, rtol=1e-7)
    assert np.linalg.eigvalsh(K + 1e-9 * np.eye(8)).min() > 0
    np.testing.assert_allclose(np.asarray(k.Kdiag(jnp.asarray(X))), 1.3, rtol=1e-7)


def test_rational_quadratic_limits(rng):
    from zigp_tpu.ops.kernels import RationalQuadratic

    X = rng.randn(7, 2)
    rq_big = RationalQuadratic.create([0.9, 1.4], 1.1, alpha=1e6)
    se = RBF.create([0.9, 1.4], 1.1)
    np.testing.assert_allclose(
        np.asarray(rq_big.K(jnp.asarray(X))), np.asarray(se.K(jnp.asarray(X))),
        rtol=1e-4,
    )
    # alpha=1 closed form: v / (1 + r²/2)
    rq1 = RationalQuadratic.create([1.0, 1.0], 2.0, alpha=1.0)
    d2 = np.sum((X[:, None, :] - X[None, :, :]) ** 2, -1)
    np.testing.assert_allclose(
        np.asarray(rq1.K(jnp.asarray(X))), 2.0 / (1.0 + d2 / 2.0), rtol=1e-7
    )


def test_linear_kernel(rng):
    from zigp_tpu.ops.kernels import Linear

    X = rng.randn(6, 3)
    k = Linear.create([0.5, 1.0, 2.0])
    K = np.asarray(k.K(jnp.asarray(X)))
    want = X @ np.diag([0.5, 1.0, 2.0]) @ X.T
    np.testing.assert_allclose(K, want, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(k.Kdiag(jnp.asarray(X))), np.diag(want), rtol=1e-8)


def test_periodic_works_as_kron_temporal_factor(rng):
    """Periodic temporal factor drops into the Kronecker on/off model —
    gradients flow through period/lengthscale/variance."""
    from zigp_tpu.ops.kernels import Periodic

    Zs = [rng.rand(3, 2), np.linspace(0, 1, 6)[:, None]]
    ks = [RBF.create([1.0, 1.0], 1.0), Periodic.create([0.5], [0.4], 1.0)]
    model = KronSVGP.create(ks, Zs, Gaussian.create(0.1), num_data=40, jitter=1e-6)
    X = rng.rand(20, 3)
    Y = rng.rand(20, 1)
    assert np.isfinite(float(model.elbo(jnp.asarray(X), jnp.asarray(Y))))
    g = jax.grad(lambda m: m.loss(jnp.asarray(X), jnp.asarray(Y)))(model)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    per_grad = np.asarray(g.gp.kernels[1].period.raw)
    assert np.all(np.isfinite(per_grad)) and np.any(per_grad != 0)


# ---------------------------------------------------------------------------
# Kernel-zoo wiring into the experiment surface (VERDICT r2 #4): KernelInit
# family specs, composite Sum/Product create, CLI flag threading
# ---------------------------------------------------------------------------


def test_make_kernel_families(rng):
    from zigp_tpu.experiments.builders import make_kernel
    from zigp_tpu.experiments.configs import KernelInit
    from zigp_tpu.ops import kernels as kz

    init = KernelInit((0.5,), 1.2)
    import dataclasses
    cases = {
        "rbf": kz.SquaredExponential,
        "matern32": kz.Matern,
        "matern52": kz.Matern,
        "periodic": kz.Periodic,
        "rq": kz.RationalQuadratic,
        "linear": kz.Linear,
    }
    X = jnp.asarray(rng.rand(7, 1))
    for fam, typ in cases.items():
        k = make_kernel(dataclasses.replace(init, family=fam, period=(0.3,)), lr=2e-3)
        assert isinstance(k, typ), fam
        K = np.asarray(k.K(X))
        assert K.shape == (7, 7) and np.isfinite(K).all()


def test_make_kernel_composites(rng):
    import dataclasses

    from zigp_tpu.experiments.builders import make_kernel
    from zigp_tpu.experiments.configs import KernelInit
    from zigp_tpu.ops import kernels as kz

    init = KernelInit((0.4,), 1.0, period=(0.5,))
    X = jnp.asarray(rng.rand(6, 1))
    prod = make_kernel(dataclasses.replace(init, family="periodic*rbf"))
    assert isinstance(prod, kz.Product)
    both = make_kernel(dataclasses.replace(init, family="periodic*rbf+linear"))
    assert isinstance(both, kz.Sum)
    # product binds tighter than sum: K = K_periodic·K_rbf + K_linear
    kp = make_kernel(dataclasses.replace(init, family="periodic"))
    kr = make_kernel(dataclasses.replace(init, family="rbf"))
    kl = make_kernel(dataclasses.replace(init, family="linear"))
    want = np.asarray(kp.K(X)) * np.asarray(kr.K(X)) + np.asarray(kl.K(X))
    np.testing.assert_allclose(np.asarray(both.K(X)), want, rtol=1e-12)
    # unknown family is a clear error
    import pytest
    with pytest.raises(ValueError, match="unknown kernel family"):
        make_kernel(dataclasses.replace(init, family="spline"))


def test_sigmoid_bijector_roundtrip_and_bounds():
    from zigp_tpu.core import bijectors

    b = bijectors.Sigmoid(0.5, 2.0)
    y = np.asarray(b.forward(jnp.asarray([-50.0, 0.0, 50.0])))
    assert (y >= 0.5).all() and (y <= 2.0).all()
    for v in (0.6, 1.0, 1.9):
        np.testing.assert_allclose(
            np.asarray(b.forward(jnp.asarray(b.inverse(v)))), v, rtol=1e-10
        )
    # ARD bounds; hashable static metadata (tuple-normalized)
    b2 = bijectors.Sigmoid([0.1, 1.0], [0.4, 4.0])
    np.testing.assert_allclose(np.asarray(b2.forward(jnp.zeros(2))), [0.25, 2.5])
    assert b2 == bijectors.Sigmoid((0.1, 1.0), (0.4, 4.0))
    assert hash(b2) == hash(bijectors.Sigmoid((0.1, 1.0), (0.4, 4.0)))
    with pytest.raises(ValueError, match="hi > lo"):
        bijectors.Sigmoid(1.0, 1.0)


def test_make_kernel_trust_interval(rng):
    """KernelInit.trust bounds every component's lengthscales/periods to
    [init/R, init·R]; inits are preserved and no unconstrained update can
    leave the interval (the champion×periodic drift failure mode)."""
    import dataclasses

    from zigp_tpu.experiments.builders import make_kernel
    from zigp_tpu.experiments.configs import KernelInit

    init = KernelInit(
        (0.005,), 20.0, family="periodic*rbf", period=(0.001,), trust=4.0
    )
    k = make_kernel(init, lr=2e-3)
    np.testing.assert_allclose(np.asarray(k.k1.period.value), [0.001], rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(k.k1.lengthscales.value), [0.005], rtol=1e-9
    )
    assert k.k1.lengthscales.lr == 2e-3  # per-group lr rides the bound

    # simulate unbounded optimizer drift on the raw leaves
    moved = jax.tree_util.tree_map(lambda x: x + 1e3, k)
    per = float(np.asarray(moved.k1.period.value))
    ls = float(np.asarray(moved.k1.lengthscales.value))
    assert per <= 0.004 + 1e-9 and ls <= 0.02 + 1e-9
    moved_dn = jax.tree_util.tree_map(lambda x: x - 1e3, k)
    assert float(np.asarray(moved_dn.k1.period.value)) >= 0.00025 - 1e-9

    # variance stays unbounded (reference Softplus)
    assert float(np.asarray(moved.k1.variance.value)) > 1e3
    # gram still finite at the walls
    X = jnp.asarray(rng.rand(6, 1))
    assert np.isfinite(np.asarray(moved.K(X))).all()

    with pytest.raises(ValueError, match="trust must be"):
        make_kernel(dataclasses.replace(init, trust=0.5))


def test_composite_kernel_carries_per_group_lr(rng):
    """Sum/Product children created with lr= keep their per-group labels, so
    the multi_transform optimizer gives them their own Adam group."""
    import dataclasses

    from zigp_tpu.core.parameters import collect_lrs
    from zigp_tpu.experiments.builders import make_kernel
    from zigp_tpu.experiments.configs import KernelInit

    k = make_kernel(
        dataclasses.replace(KernelInit((0.4,), 1.0, period=(0.5,)), family="periodic*rbf"),
        lr=7e-3,
    )
    groups = collect_lrs(k, default_lr=1e-3)
    assert groups.get("lr:0.007") == 7e-3


def test_kron_svgp_trains_with_periodic_product_temporal(rng):
    """A Periodic⊗SE temporal factor trains end-to-end inside the Kron model
    on a synthetic daily-cycle signal."""
    import dataclasses

    from zigp_tpu.experiments.builders import make_kernel
    from zigp_tpu.experiments.configs import KernelInit
    from zigp_tpu.likelihoods import Gaussian
    from zigp_tpu.models import KronSVGP
    from zigp_tpu.training import DataSet, fit

    N = 120
    t = np.linspace(0, 2, N)[:, None]
    X = np.concatenate([rng.rand(N, 2), t], axis=1)
    Y = np.sin(2 * np.pi * t / 0.5) + 0.1 * rng.randn(N, 1)
    Zs = [rng.rand(3, 2), np.linspace(0, 2, 8)[:, None]]
    kt = make_kernel(KernelInit((0.3,), 1.0, family="periodic*rbf", period=(0.5,)))
    ks = make_kernel(KernelInit((1.0, 1.0), 1.0))
    model = KronSVGP.create([ks, kt], Zs, Gaussian.create(0.1), num_data=N, jitter=1e-6)
    first = float(model.loss(jnp.asarray(X), jnp.asarray(Y)))
    res = fit(model, DataSet(X, Y), num_iter=60, batch_size=N, learning_rate=0.05, log_every=0)
    assert float(res.model.loss(jnp.asarray(X), jnp.asarray(Y))) < first - 1.0


def test_cli_kernel_flag_threads_family(monkeypatch, tmp_path, rng):
    """--kernel-temporal periodic*rbf reaches the builder config."""
    import zigp_tpu.experiments.cli as cli_mod

    captured = {}

    def fake_run_onoff(split, cfg=None, **kw):
        captured["cfg"] = cfg
        return {"test_rmse": 1.0, "test_mae": 1.0, "steps_per_sec": 1.0}

    import zigp_tpu.experiments.runners as runners_mod
    monkeypatch.setattr(runners_mod, "run_onoff", fake_run_onoff)

    # fake fold loading to avoid needing the pptr data file
    from zigp_tpu.io.datasets import Split
    X = rng.rand(20, 3)
    split = Split(X, rng.rand(20, 1), X[:5], rng.rand(5, 1))
    monkeypatch.setattr(cli_mod, "_load_fold", lambda args: split)

    cli_mod.main([
        "onoff", "--workdir", str(tmp_path), "--iters", "10",
        "--kernel-temporal", "periodic*rbf", "--kernel-period", "0.001",
    ])
    cfg = captured["cfg"]
    assert cfg.fk_temporal.family == "periodic*rbf"
    assert cfg.gk_temporal.family == "periodic*rbf"
    assert cfg.fk_temporal.period == (0.001,)
