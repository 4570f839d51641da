"""Model builders wiring configs to models for the pptr experiments."""

from __future__ import annotations

import numpy as np

from ..io.datasets import Split, kron_inducing_init
from ..likelihoods import Bernoulli, Gamma, Gaussian, LogNormal, OnOffGaussian
from ..models import KronOnOffSVGP, KronSVGP
from ..ops import kernels as _kz
from ..ops.kernels import RBF
from .configs import ClassifierPptrConfig, KernelInit, OnOffPptrConfig, SvgpPptrConfig

_FAMILIES = {
    "rbf": lambda init, lr: RBF.create(list(init.lengthscales), init.variance, lr=lr),
    "se": lambda init, lr: RBF.create(list(init.lengthscales), init.variance, lr=lr),
    "matern12": lambda init, lr: _kz.Matern.create(
        list(init.lengthscales), init.variance, nu="1/2", lr=lr),
    "matern32": lambda init, lr: _kz.Matern.create(
        list(init.lengthscales), init.variance, nu="3/2", lr=lr),
    "matern52": lambda init, lr: _kz.Matern.create(
        list(init.lengthscales), init.variance, nu="5/2", lr=lr),
    "periodic": lambda init, lr: _kz.Periodic.create(
        list(init.lengthscales),
        list(init.period) if init.period else [1.0] * len(init.lengthscales),
        init.variance, lr=lr),
    "rq": lambda init, lr: _kz.RationalQuadratic.create(
        list(init.lengthscales), init.variance, alpha=init.alpha, lr=lr),
    "linear": lambda init, lr: _kz.Linear.create(
        [init.variance] * len(init.lengthscales), lr=lr),
}


def _bound_hypers(kernel, trust: float, *, lr=None):
    """Rebuild a kernel atom's lengthscales/period Parameters with a Sigmoid
    interval [init/trust, init·trust] (``KernelInit.trust``). Variances stay
    unbounded — they set scale, not gram conditioning, and the relative
    jitter absorbs them."""
    from ..core import bijectors
    from ..core.parameters import param

    if trust <= 1.0:
        raise ValueError(f"trust must be > 1 (got {trust})")
    repl = {}
    for f in ("lengthscales", "period"):
        p = getattr(kernel, f, None)
        if p is None:
            continue
        v = np.asarray(p.value, dtype=np.float64)
        repl[f] = param(v, bijectors.Sigmoid(v / trust, v * trust), lr=lr)
    return kernel.replace(**repl) if repl else kernel


def make_kernel(init: KernelInit, *, lr=None):
    """Build the kernel named by ``init.family`` — a zoo name or a composite
    "a*b" / "a+b" spec (Product binds tighter than Sum; components share the
    lengthscale/variance init). The experiment surface for the kernel zoo
    (ops/kernels.py; the reference is SE-only, onofftf/main.py:84-120)."""
    spec = (init.family or "rbf").strip().lower()

    def atom(name):
        name = name.strip()
        if name not in _FAMILIES:
            raise ValueError(
                f"unknown kernel family {name!r}; choose from "
                f"{sorted(_FAMILIES)} or join with '*' / '+'"
            )
        k = _FAMILIES[name](init, lr)
        if getattr(init, "trust", 0.0):
            k = _bound_hypers(k, float(init.trust), lr=lr)
        return k

    def product(term):
        parts = term.split("*")
        k = atom(parts[0])
        for p in parts[1:]:
            k = _kz.Product.create(k, atom(p))
        return k

    terms = spec.split("+")
    k = product(terms[0])
    for t in terms[1:]:
        k = _kz.Sum.create(k, product(t))
    return k


def _axis_spans(X):
    """(lat span, lon span) of the training inputs — the clamp reference for
    the three-factor axis lengthscale inits (see make_factor_kernels)."""
    X = np.asarray(X)
    return (
        float(X[:, 0].max() - X[:, 0].min()),
        float(X[:, 1].max() - X[:, 1].min()),
    )


def make_factor_kernels(
    spatial_init, temporal_init, spatial_factors, *, lr=None, axis_spans=None
):
    """Per-factor kernel list for a grid config. Two-factor layout: one 2-D
    spatial kernel + the temporal kernel. ``spatial_factors`` set: the 2-D
    spatial ``KernelInit`` splits into one 1-D kernel per axis (lat, lon),
    each taking its own axis's lengthscale/period init — three factors
    total, matching ``kron_inducing_init(..., spatial_factors=...)``.

    ``axis_spans`` (lat span, lon span of the training data) clamps each
    axis lengthscale init to span/4: the reference's 2-D init (8.0) was
    chosen for kmeans-centre distances, but on a 1-D axis of span ~10 it
    makes the factor gram near-rank-1 — and Kron K_uu conditioning is the
    PRODUCT over factors (measured: cond 4.8e5 per factor at ls=8 vs 1.5e2
    at span/4; unclamped, the f32 training loss sits at ~1e19). The
    lengthscale remains a learned parameter — only the init is clamped."""
    import dataclasses

    if spatial_factors is None:
        return [make_kernel(spatial_init, lr=lr), make_kernel(temporal_init, lr=lr)]

    def axis_init(d):
        ls = spatial_init.lengthscales
        ls_d = ls[min(d, len(ls) - 1)]
        if axis_spans is not None:
            ls_d = min(ls_d, float(axis_spans[d]) / 4.0)
        repl = {"lengthscales": (ls_d,)}
        if spatial_init.period:
            pd = spatial_init.period
            repl["period"] = (pd[min(d, len(pd) - 1)],)
        return dataclasses.replace(spatial_init, **repl)

    return [
        make_kernel(axis_init(0), lr=lr),
        make_kernel(axis_init(1), lr=lr),
        make_kernel(temporal_init, lr=lr),
    ]


def _exog_kernels(X, *, lr=None):
    """One extra RBF factor over the forecast-covariate columns when the
    inputs carry them (io.datasets.augment_forecast_covariates, D > 3).
    Unit lengthscales/variance: the history columns are z-scored and the
    diurnal pair is bounded, and in a ⊗-product the factor variance
    multiplies the others' — init at 1 leaves the pair's scale untouched."""
    d = np.asarray(X).shape[1] - 3
    if d <= 0:
        return []
    return [RBF.create([1.0] * d, 1.0, lr=lr)]


def build_onoff_pptr(cfg: OnOffPptrConfig, split: Split) -> KronOnOffSVGP:
    Zs = kron_inducing_init(
        split.Xtrain, cfg.grid.num_spatial, cfg.grid.num_temporal, seed=cfg.seed,
        spatial_factors=cfg.grid.spatial_factors,
        num_exog=getattr(cfg.grid, "num_exog", 8),
    )
    spans = _axis_spans(split.Xtrain)
    fkerns = make_factor_kernels(
        cfg.fk_spatial, cfg.fk_temporal, cfg.grid.spatial_factors,
        lr=cfg.kern_lr, axis_spans=spans,
    ) + _exog_kernels(split.Xtrain, lr=cfg.kern_lr)
    gkerns = make_factor_kernels(
        cfg.gk_spatial, cfg.gk_temporal, cfg.grid.spatial_factors,
        lr=cfg.kern_lr, axis_spans=spans,
    ) + _exog_kernels(split.Xtrain, lr=cfg.kern_lr)
    return KronOnOffSVGP.create(
        fkerns,
        Zs,
        gkerns,
        [Z.copy() for Z in Zs],
        OnOffGaussian.create(cfg.noise_variance, lr=cfg.kern_lr),
        num_data=split.Xtrain.shape[0],
        jitter=cfg.jitter,
        seed=cfg.seed,
        lr=cfg.indp_lr,
        q_mu_scale=cfg.q_mu_scale,
        exact_owen_t=cfg.exact_owen_t,
        whiten=cfg.whiten,
        g_mean_shift=cfg.g_mean_shift,
        q_cov=cfg.q_cov,
    )


def make_regression_likelihood(cfg: SvgpPptrConfig, Y: np.ndarray):
    """(likelihood, mean_const) for the regression head named by
    ``cfg.likelihood``. The positive-support heads model the latent on a log
    scale, so they get a learned constant prior mean initialised from the
    (strictly positive) targets — log-scale latents start near the data
    instead of at 0 (= amount 1)."""
    name = (getattr(cfg, "likelihood", "gaussian") or "gaussian").lower()
    if name == "gaussian":
        return Gaussian.create(cfg.noise_variance, lr=cfg.lr), None
    Y = np.asarray(Y, dtype=np.float64).reshape(-1)
    if (Y <= 0).any():
        raise ValueError(
            f"likelihood={name!r} requires strictly positive targets "
            f"(got min {Y.min()}); use it as the hurdle's on-subset head "
            "or filter zeros first"
        )
    if name == "lognormal":
        return (
            LogNormal.create(cfg.lognormal_variance, lr=cfg.lr),
            float(np.mean(np.log(Y))),
        )
    if name == "gamma":
        return Gamma.create(cfg.gamma_shape, lr=cfg.lr), float(np.log(np.mean(Y)))
    raise ValueError(
        f"unknown regression likelihood {name!r}; "
        "choose gaussian | lognormal | gamma"
    )


def _log_matched_kernel_inits(k_spatial, k_temporal, Y, n_factors: int):
    """Kernel inits with per-factor variance var(log y)^(1/F): the positive
    heads' latent lives on a LOG scale, so the y-scale variance heuristic
    (max(Y), utils_pptr-style) is wildly miscalibrated — Kron prior variance
    is the PRODUCT over factors (20·20 = 400 ⇒ exp(200) predictive means)."""
    import dataclasses

    v_log = max(
        float(np.var(np.log(np.asarray(Y, dtype=np.float64).reshape(-1)))), 0.05
    )
    v_f = v_log ** (1.0 / n_factors)
    return (
        dataclasses.replace(k_spatial, variance=v_f),
        dataclasses.replace(k_temporal, variance=v_f),
    )


def build_svgp_pptr(cfg: SvgpPptrConfig, split: Split, *, subset_idx=None) -> KronSVGP:
    X = split.Xtrain if subset_idx is None else split.Xtrain[subset_idx]
    Y = split.Ytrain if subset_idx is None else split.Ytrain[subset_idx]
    Zs = kron_inducing_init(
        X, cfg.grid.num_spatial, cfg.grid.num_temporal, seed=cfg.seed,
        spatial_factors=cfg.grid.spatial_factors,
        num_exog=getattr(cfg.grid, "num_exog", 8),
    )
    likelihood, mean_const = make_regression_likelihood(cfg, Y)
    k_spatial, k_temporal = cfg.k_spatial, cfg.k_temporal
    if mean_const is not None:
        n_factors = 2 if cfg.grid.spatial_factors is None else 3
        k_spatial, k_temporal = _log_matched_kernel_inits(
            k_spatial, k_temporal, Y, n_factors
        )
    kerns = make_factor_kernels(
        k_spatial, k_temporal, cfg.grid.spatial_factors,
        lr=cfg.lr, axis_spans=_axis_spans(X),
    ) + _exog_kernels(X, lr=cfg.lr)
    return KronSVGP.create(
        kerns,
        Zs,
        likelihood,
        num_data=X.shape[0],
        mean_const=mean_const,
        jitter=cfg.jitter,
        seed=cfg.seed,
        lr=cfg.lr,
        q_mu_scale=cfg.q_mu_scale,
        whiten=cfg.whiten,
        q_cov=cfg.q_cov,
    )


def build_classifier_pptr(cfg: ClassifierPptrConfig, split: Split) -> KronSVGP:
    Zs = kron_inducing_init(
        split.Xtrain, cfg.grid.num_spatial, cfg.grid.num_temporal, seed=cfg.seed,
        spatial_factors=cfg.grid.spatial_factors,
        num_exog=getattr(cfg.grid, "num_exog", 8),
    )
    kerns = make_factor_kernels(
        cfg.k_spatial, cfg.k_temporal, cfg.grid.spatial_factors,
        lr=cfg.lr, axis_spans=_axis_spans(split.Xtrain),
    ) + _exog_kernels(split.Xtrain, lr=cfg.lr)
    return KronSVGP.create(
        kerns,
        Zs,
        Bernoulli.create(num_gh=cfg.num_gh),
        num_data=split.Xtrain.shape[0],
        jitter=cfg.jitter,
        seed=cfg.seed,
        lr=cfg.lr,
        q_mu_scale=cfg.q_mu_scale,
        whiten=cfg.whiten,
        q_cov=cfg.q_cov,
    )


def build_hurdle_joint_pptr(cfg, split: Split) -> "KronHurdleSVGP":
    """Jointly-trained hurdle (models.KronHurdleSVGP): gate + amount GP in
    one ELBO. The amount head's likelihood/mean/kernel-variance inits are
    derived from the strictly-positive training targets (cfg.likelihood may
    also be "gaussian" for an ablation against the y-scale head)."""
    from ..models import KronHurdleSVGP

    X, Y = split.Xtrain, split.Ytrain
    Zs = kron_inducing_init(
        X, cfg.grid.num_spatial, cfg.grid.num_temporal, seed=cfg.seed,
        spatial_factors=cfg.grid.spatial_factors,
        num_exog=getattr(cfg.grid, "num_exog", 8),
    )
    spans = _axis_spans(X)
    Ypos = np.asarray(Y, dtype=np.float64).reshape(-1)
    Ypos = Ypos[Ypos > 0]
    amount_lik, mean_const = make_regression_likelihood(cfg, Ypos)
    k_spatial, k_temporal = cfg.k_spatial, cfg.k_temporal
    if mean_const is not None:
        n_factors = 2 if cfg.grid.spatial_factors is None else 3
        k_spatial, k_temporal = _log_matched_kernel_inits(
            k_spatial, k_temporal, Ypos, n_factors
        )
    fkerns = make_factor_kernels(
        k_spatial, k_temporal, cfg.grid.spatial_factors,
        lr=cfg.lr, axis_spans=spans,
    ) + _exog_kernels(X, lr=cfg.lr)
    gkerns = make_factor_kernels(
        cfg.gk_spatial, cfg.gk_temporal, cfg.grid.spatial_factors,
        lr=cfg.lr, axis_spans=spans,
    ) + _exog_kernels(X, lr=cfg.lr)
    return KronHurdleSVGP.create(
        fkerns,
        Zs,
        gkerns,
        [Z.copy() for Z in Zs],
        Bernoulli.create(num_gh=cfg.num_gh),
        amount_lik,
        num_data=X.shape[0],
        mean_const=mean_const,
        jitter=cfg.jitter,
        seed=cfg.seed,
        lr=cfg.lr,
        q_mu_scale=cfg.q_mu_scale,
        whiten=cfg.whiten,
        q_cov=cfg.q_cov,
    )


def binarize_targets(Y: np.ndarray) -> np.ndarray:
    """y > 0 as float — the classifier's target transform
    (scripts/classifier.py:44-47)."""
    return (np.asarray(Y) > 0).astype(np.float64)
