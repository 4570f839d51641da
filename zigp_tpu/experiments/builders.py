"""Model builders wiring configs to models for the pptr experiments."""

from __future__ import annotations

import numpy as np

from ..io.datasets import Split, kron_inducing_init
from ..likelihoods import Bernoulli, Gaussian, OnOffGaussian
from ..models import KronOnOffSVGP, KronSVGP
from ..ops.kernels import RBF
from .configs import ClassifierPptrConfig, OnOffPptrConfig, SvgpPptrConfig


def build_onoff_pptr(cfg: OnOffPptrConfig, split: Split) -> KronOnOffSVGP:
    Zs = kron_inducing_init(
        split.Xtrain, cfg.grid.num_spatial, cfg.grid.num_temporal, seed=cfg.seed
    )
    fkerns = [
        RBF.create(list(cfg.fk_spatial.lengthscales), cfg.fk_spatial.variance, lr=cfg.kern_lr),
        RBF.create(list(cfg.fk_temporal.lengthscales), cfg.fk_temporal.variance, lr=cfg.kern_lr),
    ]
    gkerns = [
        RBF.create(list(cfg.gk_spatial.lengthscales), cfg.gk_spatial.variance, lr=cfg.kern_lr),
        RBF.create(list(cfg.gk_temporal.lengthscales), cfg.gk_temporal.variance, lr=cfg.kern_lr),
    ]
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


def build_svgp_pptr(cfg: SvgpPptrConfig, split: Split, *, subset_idx=None) -> KronSVGP:
    X = split.Xtrain if subset_idx is None else split.Xtrain[subset_idx]
    Zs = kron_inducing_init(X, cfg.grid.num_spatial, cfg.grid.num_temporal, seed=cfg.seed)
    kerns = [
        RBF.create(list(cfg.k_spatial.lengthscales), cfg.k_spatial.variance, lr=cfg.lr),
        RBF.create(list(cfg.k_temporal.lengthscales), cfg.k_temporal.variance, lr=cfg.lr),
    ]
    return KronSVGP.create(
        kerns,
        Zs,
        Gaussian.create(cfg.noise_variance, lr=cfg.lr),
        num_data=X.shape[0],
        jitter=cfg.jitter,
        seed=cfg.seed,
        lr=cfg.lr,
        q_mu_scale=cfg.q_mu_scale,
        whiten=cfg.whiten,
        q_cov=cfg.q_cov,
    )


def build_classifier_pptr(cfg: ClassifierPptrConfig, split: Split) -> KronSVGP:
    Zs = kron_inducing_init(
        split.Xtrain, cfg.grid.num_spatial, cfg.grid.num_temporal, seed=cfg.seed
    )
    kerns = [
        RBF.create(list(cfg.k_spatial.lengthscales), cfg.k_spatial.variance, lr=cfg.lr),
        RBF.create(list(cfg.k_temporal.lengthscales), cfg.k_temporal.variance, lr=cfg.lr),
    ]
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


def binarize_targets(Y: np.ndarray) -> np.ndarray:
    """y > 0 as float — the classifier's target transform
    (scripts/classifier.py:44-47)."""
    return (np.asarray(Y) > 0).astype(np.float64)
