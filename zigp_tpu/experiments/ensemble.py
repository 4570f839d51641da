"""Seed ensembles: E independently-initialized variants of one model trained
simultaneously through the batched stacked trainer, predictions combined as a
uniform mixture.

The reference trains exactly one model per fold (every script seeds a single
graph, e.g. scripts/onoff.py:51-79). Ensembling is the classic cheap quality
lever the sequential TF1 design makes expensive (E graph builds + E runs) but
the stacked vmapped trainer makes nearly free: at the latency-bound pptr
shapes an E-member stack trains in ~the wall of one member plus a small
per-step increment (RESULTS.md "Batched-fold CV": a 5-stack step costs 2.35×
a single step), and the whole ensemble shares one compile.

Members differ in EVERYTHING the seed touches: kmeans inducing inits, q_mu
init draws, and the minibatch sampling stream (seeds=[seed+e]).

Prediction combining is exact uniform-mixture moment matching over members:
    mean = (1/E) Σ_e mean_e
    var  = (1/E) Σ_e (var_e + mean_e²) − mean²   (law of total variance)
applied to the Gaussian predictive (svgp), the gated moments (onoff), and
the probability (classifier: mean of pfmean; pfvar via the same identity).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import numpy as np

from ..io.datasets import Split
from ..training.batched import fit_batched_scanned, stack_pytrees
from .builders import binarize_targets, build_classifier_pptr, build_onoff_pptr, build_svgp_pptr
from .configs import ClassifierPptrConfig, OnOffPptrConfig, SvgpPptrConfig
from .cv_batched import _stacked_predict, _svgp_predict
from .runners import (
    _classifier_metrics,
    _maybe_pickle,
    _onoff_metrics,
    _svgp_metrics,
)


def mixture_moments(means: np.ndarray, variances: np.ndarray):
    """Uniform-mixture mean/variance over the leading member axis.

    means, variances: (E, N, L). Returns ((N, L), (N, L)).
    """
    mu = means.mean(axis=0)
    var = (variances + np.square(means)).mean(axis=0) - np.square(mu)
    return mu, np.maximum(var, 0.0)


_BUILDERS = {
    "onoff": (build_onoff_pptr, OnOffPptrConfig),
    "svgp": (build_svgp_pptr, SvgpPptrConfig),
    "classifier": (build_classifier_pptr, ClassifierPptrConfig),
}


def _avg_noise_model(models: list):
    """Member 0's model with the likelihood noise replaced by the members'
    average — the scalar the shared metric blocks read for NLPD."""
    noise = float(np.mean([
        np.asarray(m.likelihood.variance.value) for m in models
    ]))
    return models[0].replace(
        likelihood=models[0].likelihood.replace(
            variance=models[0].likelihood.variance.replace_value(noise)
        )
    )


def mix_gaussian_preds(preds: list) -> dict:
    """Uniform-mixture {fmean, fvar} over member prediction dicts."""
    mu, var = mixture_moments(
        np.stack([p["fmean"] for p in preds]),
        np.stack([p["fvar"] for p in preds]),
    )
    return {"fmean": mu, "fvar": var}


def mix_classifier_preds(preds: list) -> dict:
    mu, var = mixture_moments(
        np.stack([p["pfmean"] for p in preds]),
        np.stack([p["pfvar"] for p in preds]),
    )
    return {"pfmean": mu, "pfvar": var}


def mix_onoff_preds(preds: list) -> dict:
    """Uniform mixture of the gated predictive Φ(g)f: the total second moment
    is gfvar + gfmeanu + gfmean², so the total-variance identity applies to
    (gfvar + gfmeanu); the mixture's split between the two terms is not
    identified, so everything lands in gfvar and gfmeanu is zeroed."""
    gfmean, gfvar_tot = mixture_moments(
        np.stack([p["gfmean"] for p in preds]),
        np.stack([p["gfvar"] + p["gfmeanu"] for p in preds]),
    )
    mix = dict(preds[0])
    mix["gfmean"] = gfmean
    mix["gfvar"] = gfvar_tot
    mix["gfmeanu"] = np.zeros_like(gfvar_tot)
    mix["fmean"] = np.stack([p["fmean"] for p in preds]).mean(axis=0)
    mix["pgmean"] = np.stack([p["pgmean"] for p in preds]).mean(axis=0)
    return mix


def run_ensemble(
    split: Split,
    kind: str,
    cfg=None,
    *,
    size: int = 5,
    workdir: Optional[str] = None,
    log_fn: Callable[[str], None] = print,
) -> dict:
    """Train a seed ensemble of ``size`` members of ``kind`` on one split and
    evaluate the mixture predictive with the same metric block as the
    single-model runner. Returns that runner's results dict plus
    ``member_*`` per-member metrics and ``ensemble_size``.
    """
    if kind not in _BUILDERS:
        raise ValueError(f"unknown ensemble kind {kind!r} (onoff|svgp|classifier)")
    build, default_cfg = _BUILDERS[kind]
    cfg = cfg or default_cfg()
    if getattr(cfg, "optimizer", "adam") == "natgrad":
        raise ValueError("ensembles support optimizer='adam' only")

    base_seed = getattr(cfg, "seed", 0)
    seeds = [base_seed + e for e in range(size)]
    members = [build(dataclasses.replace(cfg, seed=s), split) for s in seeds]
    Y = binarize_targets(split.Ytrain) if kind == "classifier" else split.Ytrain
    lr = cfg.indp_lr if kind == "onoff" else cfg.lr

    from ..training.optim import cosine_adam, make_optimizer

    if getattr(cfg, "lr_schedule", "") == "cosine":
        optimizer = make_optimizer(
            members[0], default_lr=lr, opt_factory=cosine_adam(cfg.num_iter)
        )
    else:
        optimizer = make_optimizer(members[0], default_lr=lr)

    num_inner = getattr(cfg, "scan_inner", 50) or 50
    t0 = time.time()
    res = fit_batched_scanned(
        members,
        [(split.Xtrain, Y)] * size,
        num_iter=cfg.num_iter,
        batch_size=cfg.batch_size,
        num_inner=num_inner,
        optimizer=optimizer,
        seeds=seeds,
        log_every_blocks=(
            max(1, cfg.log_every // num_inner) if getattr(cfg, "log_every", 0) else 0
        ),
        log_fn=lambda m: log_fn(f"[ensemble x{size}] {m}"),
    )
    train_time = time.time() - t0
    trained = [r.model for r in res]

    if kind == "svgp":
        ptr = _stacked_predict(trained, _svgp_predict, [split.Xtrain] * size)
        pte = _stacked_predict(trained, _svgp_predict, [split.Xtest] * size)
        member_metrics = [
            _svgp_metrics(trained[e], ptr[e], pte[e], split, lambda s: None)
            for e in range(size)
        ]
        mix_tr, mix_te = (
            dict(zip(
                ("fmean", "fvar"),
                mixture_moments(
                    np.stack([p["fmean"] for p in preds]),
                    np.stack([p["fvar"] for p in preds]),
                ),
            ))
            for preds in (ptr, pte)
        )
        # mixture NLPD needs a noise scalar: average the members' learned noises
        noise = float(np.mean([
            np.asarray(m.likelihood.variance.value) for m in trained
        ]))
        mix_model = trained[0].replace(
            likelihood=trained[0].likelihood.replace(
                variance=trained[0].likelihood.variance.replace_value(noise)
            )
        )
        results = _svgp_metrics(mix_model, mix_tr, mix_te, split, log_fn)
    elif kind == "classifier":
        predict = lambda m, X: dict(  # noqa: E731
            zip(("pfmean", "pfvar"), m.predict_prob(X))
        )
        ptr = _stacked_predict(trained, predict, [split.Xtrain] * size)
        pte = _stacked_predict(trained, predict, [split.Xtest] * size)
        member_metrics = [
            _classifier_metrics(ptr[e], pte[e], split, lambda s: None)
            for e in range(size)
        ]
        mix_tr, mix_te = (
            dict(zip(
                ("pfmean", "pfvar"),
                mixture_moments(
                    np.stack([p["pfmean"] for p in preds]),
                    np.stack([p["pfvar"] for p in preds]),
                ),
            ))
            for preds in (ptr, pte)
        )
        results = _classifier_metrics(mix_tr, mix_te, split, log_fn)
    else:  # onoff
        pte = _stacked_predict(
            trained, lambda m, X: m.predict(X), [split.Xtest] * size
        )
        member_metrics = [
            _onoff_metrics(trained[e], pte[e], split, lambda s: None)
            for e in range(size)
        ]
        # mixture over the gated predictive: total second moment of Φ(g)f is
        # gfvar + gfmeanu + gfmean², so the mixture's (gfvar + gfmeanu) is the
        # total-variance identity applied to that sum
        gfmean, gfvar_tot = mixture_moments(
            np.stack([p["gfmean"] for p in pte]),
            np.stack([p["gfvar"] + p["gfmeanu"] for p in pte]),
        )
        mix_te = dict(pte[0])
        mix_te["gfmean"] = gfmean
        mix_te["gfvar"] = gfvar_tot
        mix_te["gfmeanu"] = np.zeros_like(gfvar_tot)
        mix_te["fmean"] = np.stack([p["fmean"] for p in pte]).mean(axis=0)
        mix_te["pgmean"] = np.stack([p["pgmean"] for p in pte]).mean(axis=0)
        noise = float(np.mean([
            np.asarray(m.likelihood.variance.value) for m in trained
        ]))
        mix_model = trained[0].replace(
            likelihood=trained[0].likelihood.replace(
                variance=trained[0].likelihood.variance.replace_value(noise)
            )
        )
        results = _onoff_metrics(mix_model, mix_te, split, log_fn)

    results["ensemble_size"] = size
    results["train_time_sec"] = train_time
    results["steps_per_sec"] = res[0].steps_per_sec
    for key in ("test_rmse", "test_mae", "test_auc", "test_accuracy"):
        vals = [m[key] for m in member_metrics if key in m]
        if vals:
            results[f"member_{key}"] = vals
            log_fn(
                f"members {key}: "
                + " ".join(f"{v:.4f}" for v in vals)
                + f"  (ensemble {results[key]:.4f})"
            )
    _maybe_pickle(
        {k: v for k, v in results.items() if k != "models"},
        workdir, f"results_ensemble_{kind}.pickle",
    )
    results["models"] = trained
    return results
