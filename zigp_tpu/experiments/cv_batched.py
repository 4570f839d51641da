"""Batched 5-fold cross-validation: every fold of a variant trained
SIMULTANEOUSLY through one vmapped scanned step (training/batched.py).

The reference's protocol is strictly sequential — one TF1 graph build +
session per fold per variant (README.md:17-26, scripts/onoff.py:22). The
sequential driver here (`cv.run_cv`) already caches the jitted step across
steps, but each fold still pays its own ~40 s TPU compile and its own
dispatch stream, and at the pptr shapes the per-step device program is
latency-bound — the MXU idles between tiny ops. Stacking the F per-fold
models on a leading axis turns every per-step op into a batch-F op: one
compile, one dispatch stream, F folds of progress per dispatch.

The pptr protocol is the ideal case: all five folds have identical train
sizes (KFold on 113,015 rows), so the stacked models share every static
(num_data included) and the data stacks un-padded. The one ragged variant —
the hurdle's per-fold "on" subsets — uses the padded path: subset rows padded
to the max fold length (never sampled, `num_rows`) and the true per-fold
ELBO scale threaded as a traced `num_data` override (models/kron.py elbo).

Semantics: fold f's trajectory is exactly the sequential
``fit_scanned(sampler="device", sampler_seed=cfg.seed)`` trajectory
(equivalence-tested in tests/test_batched.py; integration-tested vs run_cv in
tests/test_cv_batched.py) — batched CV always uses the device-resident
uniform sampler, not the host epoch pipeline. optimizer="natgrad" routes to
the vmapped natural-gradient stack trainer (training.batched.
fit_natgrad_batched; equal-shape stacks only, so the hurdle inner regression
still needs adam). ``mesh_members=D`` shards the member axis over a D-device
mesh (zero per-step collectives — training.batched.member_place; member
counts that don't divide D are padded with discarded duplicates). Not
supported in batched mode: dp/tp sharding of a single member and
monitor/histogram callbacks (use the sequential driver for those).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import numpy as np

from ..io.datasets import Split, load_pptr, make_cv_splits
from ..models import hurdle_on_indices
from ..training.batched import (
    fit_batched_scanned,
    predict_batched_stacked,
    stack_pytrees,
)
from .builders import (
    binarize_targets,
    build_classifier_pptr,
    build_onoff_pptr,
    build_svgp_pptr,
)
from .configs import ClassifierPptrConfig, OnOffPptrConfig, SvgpPptrConfig
from .cv import _record_exceedance, aggregate_summary
from .runners import (
    _classifier_metrics,
    _eval_hurdle,
    _hurdle_nlpd,
    _hurdle_probabilistic_scores,
    _log_hyperparams,
    _onoff_metrics,
    _svgp_metrics,
    run_zero_inflated,
)


def _stacked_predict(models: list, predict_fn, Xs_list: list) -> List[dict]:
    """One vmapped prediction pass over F per-fold models and inputs.

    Xs_list entries may be ragged — they are padded to the common max length
    for the single compiled shape and sliced back per fold.
    """
    lens = [np.asarray(x).shape[0] for x in Xs_list]
    N = max(lens)

    def _pad(a):
        pad = N - a.shape[0]
        return a if pad == 0 else np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])

    Xs = np.stack([_pad(np.asarray(x)) for x in Xs_list])
    preds = predict_batched_stacked(predict_fn, stack_pytrees(models), Xs)
    return [
        {k: v[: lens[f]] for k, v in p.items()} for f, p in enumerate(preds)
    ]


def _train_stack(
    kind: str,
    models: list,
    datas: list,
    cfg,
    lr: float,
    *,
    workdir: Optional[str],
    log_fn,
    loss_fn=None,
    aux=None,
    resume: bool = False,
    seeds: Optional[list] = None,
    mesh=None,
):
    """fit_batched_scanned with the same optimizer/cadence/checkpoint policy
    as the sequential runners' _fit_auto. ``mesh`` shards the member axis
    over the mesh data axis (training.batched.member_place)."""
    from ..io.checkpoint import CheckpointManager
    from ..training.optim import cosine_adam, make_optimizer
    from ..utils.logging import MetricLogger

    num_inner = getattr(cfg, "scan_inner", 50) or 50
    log_blocks = (
        max(1, cfg.log_every // num_inner) if getattr(cfg, "log_every", 0) else 0
    )
    wrapped_log = lambda m: log_fn(f"[{kind} x{len(models)}] {m}")  # noqa: E731

    ckpt = metric = None
    if workdir:
        os.makedirs(workdir, exist_ok=True)
        if getattr(cfg, "ckpt_every", 0):
            # the checkpoint holds the STACK (all folds); resume restores it
            ckpt = CheckpointManager(
                os.path.join(workdir, f"ckpt_{kind}_stack"), every=cfg.ckpt_every
            )
        metric = MetricLogger(os.path.join(workdir, f"metrics_{kind}_stack.jsonl"))

    if getattr(cfg, "optimizer", "adam") == "natgrad":
        from ..training.batched import fit_natgrad_batched

        if getattr(cfg, "hyper_every", 0):
            log_fn(
                "warning: --hyper-every is an Adam-path schedule; the "
                "natgrad stack already alternates — ignoring the flag"
            )
        if loss_fn is not None or aux is not None:
            raise ValueError(
                "batched natgrad supports equal-shape stacks only (no "
                "ragged/aux path) — train the hurdle inner regression with "
                "optimizer='adam' or the sequential driver"
            )
        if getattr(cfg, "natgrad_kron_joint", False) and getattr(cfg, "q_cov", "diag") != "kron":
            log_fn("warning: --natgrad-joint requires q_cov='kron'; taking the diagonal-family natural step instead")
        return fit_natgrad_batched(
            models,
            datas,
            num_iter=cfg.num_iter,
            batch_size=cfg.batch_size,
            num_inner=num_inner,
            gamma=cfg.natgrad_gamma,
            gamma_warmup=cfg.natgrad_warmup,
            adam_warmup=cfg.natgrad_adam_warmup,
            kron_joint=getattr(cfg, "natgrad_kron_joint", False),
            kl_cap=getattr(cfg, "natgrad_kl_cap", 10.0),
            adam_lr=lr,
            seeds=seeds or [getattr(cfg, "seed", 0)] * len(models),
            log_every_blocks=log_blocks,
            log_fn=wrapped_log,
            ckpt_manager=ckpt,
            metric_logger=metric,
            resume=resume,
            mesh=mesh,
        )

    hyper_every = getattr(cfg, "hyper_every", 0) or 0
    alt_facs = None
    if hyper_every and (loss_fn is not None or aux is not None):
        # the hurdle's ragged/aux stacks keep the joint schedule
        log_fn(
            f"[{kind}] hyper_every is unsupported on the ragged/aux stack — "
            "training jointly"
        )
        hyper_every = 0
    if getattr(cfg, "lr_schedule", "") == "cosine":
        optimizer = make_optimizer(
            models[0], default_lr=lr, opt_factory=cosine_adam(cfg.num_iter)
        )
        if hyper_every:
            alt_facs = (
                cosine_adam(cfg.num_iter * (hyper_every - 1) // hyper_every),
                cosine_adam(max(1, cfg.num_iter // hyper_every)),
            )
    else:
        optimizer = make_optimizer(models[0], default_lr=lr)

    results = fit_batched_scanned(
        models,
        datas,
        num_iter=cfg.num_iter,
        batch_size=cfg.batch_size,
        num_inner=num_inner,
        optimizer=optimizer,
        loss_fn=loss_fn,
        aux=aux,
        hyper_every=hyper_every,
        alt_opt_factories=alt_facs,
        learning_rate=lr,
        # default mirrors the sequential protocol: every fold uses
        # sampler_seed=cfg.seed (ensemble members override per member)
        seeds=seeds or [getattr(cfg, "seed", 0)] * len(models),
        log_every_blocks=log_blocks,
        log_fn=wrapped_log,
        ckpt_manager=ckpt,
        metric_logger=metric,
        resume=resume,
        mesh=mesh,
    )
    return results


def _svgp_predict(m, X):
    fmean, fvar = m.predict_f(X)
    return {"fmean": fmean, "fvar": fvar}


def run_cv_batched(
    models: List[str],
    *,
    splits: Optional[List[Split]] = None,
    onoff_cfg: Optional[OnOffPptrConfig] = None,
    svgp_cfg: Optional[SvgpPptrConfig] = None,
    clf_cfg: Optional[ClassifierPptrConfig] = None,
    hurdlej_cfg=None,
    workdir: Optional[str] = None,
    log_fn: Callable[[str], None] = print,
    resume: bool = False,
    ensemble: int = 1,
    mesh_members: int = 0,
) -> dict:
    """run_cv with all folds of each variant trained in one batched run.

    models ⊆ {"onoff", "svgp", "classifier", "hurdle", "hurdlej", "zi"};
    hurdle/zi pull in the classifier (and zi the svgp) exactly as the
    sequential driver does; "hurdlej" is the jointly-trained hurdle
    (single stack, no classifier prerequisite; ensemble=1 only for now).
    Returns the same aggregate dict shape as run_cv and writes the same
    ``cv_summary.json`` (per-fold prediction pickles are not written — use the
    sequential driver to produce those artifacts).

    ``ensemble`` > 1 trains that many independently-seeded members PER FOLD
    in the same stack (F×E members total) and evaluates each fold's
    uniform-mixture predictive (experiments.ensemble combining rules) — the
    full ensemble protocol in one compile + one dispatch stream per variant.
    """
    import dataclasses

    from .ensemble import (
        _avg_noise_model,
        _healthy,
        mix_classifier_preds,
        mix_gaussian_preds,
        mix_onoff_preds,
    )

    if any(
        getattr(c, "recalibrate_noise", False)
        for c in (onoff_cfg, svgp_cfg, clf_cfg)
        if c is not None
    ):
        log_fn(
            "warning: --recalibrate-noise is not implemented for the batched "
            "driver (its eval reuses stacked test predictions and computes "
            "no train predictions) — ignoring; use the sequential cv driver"
        )
    splits = splits or make_cv_splits(load_pptr())
    F = len(splits)
    E = max(1, int(ensemble))
    mesh = None
    if mesh_members:
        from ..parallel import make_mesh

        mesh = make_mesh(n_data=mesh_members, n_model=1)
        log_fn(
            f"member-axis sharding: {F * E} members over "
            f"{mesh.shape['data']} devices (zero per-step collectives)"
        )
    need_clf = bool({"classifier", "hurdle", "zi"} & set(models))
    need_svgp = bool({"svgp", "zi"} & set(models))

    summary: Dict[str, Dict[str, List[float]]] = {}

    def record(model: str, metric: str, value: float):
        summary.setdefault(model, {}).setdefault(metric, []).append(float(value))

    def expand(build, cfg):
        """F×E member models + per-member sampler seeds (member f*E+e)."""
        base = getattr(cfg, "seed", 0)
        ms, seeds = [], []
        for f in range(F):
            for e in range(E):
                c = dataclasses.replace(cfg, seed=base + e) if E > 1 else cfg
                ms.append(build(c, splits[f]))
                seeds.append(base + e)
        return ms, seeds

    def per_fold(items):
        """Group a flat F×E member list back into F lists of E."""
        return [items[f * E : (f + 1) * E] for f in range(F)]

    def fold_inputs(xs_per_fold):
        return [xs_per_fold[m // E] for m in range(F * E)]

    clf_res: List[Optional[dict]] = [None] * F
    svgp_res: List[Optional[dict]] = [None] * F

    if need_clf:
        cfg = clf_cfg or ClassifierPptrConfig()
        members, seeds = expand(build_classifier_pptr, cfg)
        res = _train_stack(
            "classifier", members,
            fold_inputs([(s.Xtrain, binarize_targets(s.Ytrain)) for s in splits]),
            cfg, cfg.lr, workdir=workdir, log_fn=log_fn, resume=resume,
            seeds=seeds, mesh=mesh,
        )
        trained = [r.model for r in res]

        def _clf_predict(m, X):
            pfmean, pfvar = m.predict_prob(X)
            return {"pfmean": pfmean, "pfvar": pfvar}

        ptr = _stacked_predict(
            trained, _clf_predict, fold_inputs([s.Xtrain for s in splits])
        )
        pte = _stacked_predict(
            trained, _clf_predict, fold_inputs([s.Xtest for s in splits])
        )
        for f, split in enumerate(splits):
            log_fn(f"--- classifier fold {f + 1}/{F} ---")
            _log_hyperparams(per_fold(trained)[f][0], log_fn)
            if E > 1:
                _, (ktr, kte) = _healthy(
                    per_fold(trained)[f], [per_fold(ptr)[f], per_fold(pte)[f]],
                    per_fold(res)[f], log_fn, f"classifier fold {f + 1}",
                )
                tr, te = mix_classifier_preds(ktr), mix_classifier_preds(kte)
            else:
                tr, te = per_fold(ptr)[f][0], per_fold(pte)[f][0]
            clf_res[f] = _classifier_metrics(tr, te, split, log_fn)
            for m in ("accuracy", "precision", "recall", "auc"):
                record("classifier", f"test_{m}", clf_res[f][f"test_{m}"])

    if need_svgp:
        cfg = svgp_cfg or SvgpPptrConfig()
        members, seeds = expand(build_svgp_pptr, cfg)
        res = _train_stack(
            "svgp", members,
            fold_inputs([(s.Xtrain, s.Ytrain) for s in splits]),
            cfg, cfg.lr, workdir=workdir, log_fn=log_fn, resume=resume,
            seeds=seeds, mesh=mesh,
        )
        trained = [r.model for r in res]
        ptr = _stacked_predict(
            trained, _svgp_predict, fold_inputs([s.Xtrain for s in splits])
        )
        pte = _stacked_predict(
            trained, _svgp_predict, fold_inputs([s.Xtest for s in splits])
        )
        for f, split in enumerate(splits):
            log_fn(f"--- svgp fold {f + 1}/{F} ---")
            fold_models = per_fold(trained)[f]
            _log_hyperparams(fold_models[0], log_fn)
            if E > 1:
                keep, (ktr, kte) = _healthy(
                    fold_models, [per_fold(ptr)[f], per_fold(pte)[f]],
                    per_fold(res)[f], log_fn, f"svgp fold {f + 1}",
                )
                model = _avg_noise_model(keep)
                tr, te = mix_gaussian_preds(ktr), mix_gaussian_preds(kte)
            else:
                model, tr, te = fold_models[0], per_fold(ptr)[f][0], per_fold(pte)[f][0]
            svgp_res[f] = _svgp_metrics(model, tr, te, split, log_fn)
            record("svgp", "test_rmse", svgp_res[f]["test_rmse"])
            record("svgp", "test_mae", svgp_res[f]["test_mae"])
            if "test_crps" in svgp_res[f]:
                record("svgp", "test_crps", svgp_res[f]["test_crps"])
                if "test_crps_mc" in svgp_res[f]:
                    record("svgp", "test_crps_mc", svgp_res[f]["test_crps_mc"])
                _record_exceedance(record, "svgp", svgp_res[f])

    if "onoff" in models:
        cfg = onoff_cfg or OnOffPptrConfig()
        members, seeds = expand(build_onoff_pptr, cfg)
        res = _train_stack(
            "onoff", members,
            fold_inputs([(s.Xtrain, s.Ytrain) for s in splits]),
            cfg, cfg.indp_lr, workdir=workdir, log_fn=log_fn, resume=resume,
            seeds=seeds, mesh=mesh,
        )
        trained = [r.model for r in res]
        pte = _stacked_predict(
            trained, lambda m, X: m.predict(X),
            fold_inputs([s.Xtest for s in splits]),
        )
        for f, split in enumerate(splits):
            log_fn(f"--- onoff fold {f + 1}/{F} ---")
            fold_models = per_fold(trained)[f]
            _log_hyperparams(fold_models[0], log_fn)
            if E > 1:
                keep, (kte,) = _healthy(
                    fold_models, [per_fold(pte)[f]],
                    per_fold(res)[f], log_fn, f"onoff fold {f + 1}",
                )
                model = _avg_noise_model(keep)
                te = mix_onoff_preds(kte)
            else:
                model, te = fold_models[0], per_fold(pte)[f][0]
            out = _onoff_metrics(model, te, split, log_fn)
            record("onoff", "test_rmse", out["test_rmse"])
            record("onoff", "test_mae", out["test_mae"])
            record("onoff", "test_crps", out["test_crps"])
            if "test_crps_mc" in out:
                record("onoff", "test_crps_mc", out["test_crps_mc"])
            _record_exceedance(record, "onoff", out)
            record("onoff", "steps_per_sec", res[f * E].steps_per_sec)

    if "hurdle" in models:
        import jax.numpy as jnp

        cfg = svgp_cfg or SvgpPptrConfig()
        # per-fold classifier-'on' subsets: ragged — the padded/num_rows path.
        # Positive-support heads (cfg.likelihood != gaussian) fit on the
        # strictly-positive 'on' points only (their density lives on y > 0;
        # classifier-miscalled exact zeros would put log(0) in the loss) but
        # still predict over the full 'on' subset.
        head = (getattr(cfg, "likelihood", "gaussian") or "gaussian").lower()
        subs, on_idx, fit_idx = [], [], []
        for f, split in enumerate(splits):
            tr = hurdle_on_indices(clf_res[f]["pred_train"]["pfmean"])
            te = hurdle_on_indices(clf_res[f]["pred_test"]["pfmean"])
            on_idx.append((tr, te))
            sub = Split(split.Xtrain[tr], split.Ytrain[tr],
                        split.Xtest[te], split.Ytest[te])
            subs.append(sub)
            if head != "gaussian":
                pos = np.flatnonzero(
                    np.asarray(sub.Ytrain, dtype=np.float64).reshape(-1) > 0
                )
                fit_idx.append(np.asarray(tr)[pos])
            else:
                fit_idx.append(np.asarray(tr))
        fit_data = [
            (splits[f].Xtrain[fit_idx[f]], splits[f].Ytrain[fit_idx[f]])
            for f in range(F)
        ]
        sizes = [x.shape[0] for x, _ in fit_data]
        # shared static num_data placeholder so the stacked treedefs match;
        # the true per-fold ELBO scale rides in as the traced aux override
        base = getattr(cfg, "seed", 0)
        hmodels, hseeds = [], []
        for f in range(F):
            for e in range(E):
                c = dataclasses.replace(cfg, seed=base + e) if E > 1 else cfg
                hmodels.append(
                    build_svgp_pptr(c, splits[f], subset_idx=fit_idx[f]).replace(num_data=1)
                )
                hseeds.append(base + e)
        res = _train_stack(
            "hurdle", hmodels,
            fold_inputs(fit_data),
            cfg, cfg.lr, workdir=workdir, log_fn=log_fn, resume=resume,
            loss_fn=lambda m, X, Y, n: m.loss(X, Y, num_data=n),
            aux=jnp.asarray(np.asarray(fold_inputs(sizes), dtype=np.int32)),
            seeds=hseeds, mesh=mesh,
        )
        trained = [r.model for r in res]
        ptr = _stacked_predict(
            trained, _svgp_predict, fold_inputs([s.Xtrain for s in subs])
        )
        pte = _stacked_predict(
            trained, _svgp_predict, fold_inputs([s.Xtest for s in subs])
        )
        for f, split in enumerate(splits):
            log_fn(f"--- hurdle fold {f + 1}/{F} ---")
            sub, (tr, te) = subs[f], on_idx[f]
            fold_models = per_fold(trained)[f]
            if E > 1:
                keep, (kptr, kpte) = _healthy(
                    fold_models, [per_fold(ptr)[f], per_fold(pte)[f]],
                    per_fold(res)[f], log_fn, f"hurdle fold {f + 1}",
                )
                model = _avg_noise_model(keep)
                rtr = mix_gaussian_preds(kptr)
                rte = mix_gaussian_preds(kpte)
            else:
                model, rtr, rte = fold_models[0], per_fold(ptr)[f][0], per_fold(pte)[f][0]
            reg = _svgp_metrics(
                model, rtr, rte, sub,
                lambda m: log_fn(f"[hurdle on-subset] {m}"),
            )
            out = _eval_hurdle(split, clf_res[f], reg, sub, tr, te, log_fn)
            record("hurdle", "test_rmse", out["test_hurdle_comb_rmse"])
            record("hurdle", "test_mae", out["test_hurdle_comb_mae"])
            nlpd = _hurdle_nlpd(model, clf_res[f]["pred_test"]["pfmean"], split)
            log_fn(f"hurdle test nlpd: {nlpd}")
            record("hurdle", "test_nlpd", nlpd)
            scores = _hurdle_probabilistic_scores(
                model, clf_res[f]["pred_test"]["pfmean"], split
            )
            log_fn(f"hurdle test crps: {scores['test_crps']}")
            record("hurdle", "test_crps", scores["test_crps"])
            if "test_crps_mc" in scores:
                record("hurdle", "test_crps_mc", scores["test_crps_mc"])
            _record_exceedance(record, "hurdle", scores)

    if "hurdlej" in models:
        from .builders import build_hurdle_joint_pptr
        from .configs import HurdleJointConfig
        from .runners import _hurdlej_metrics, _hurdlej_predict

        cfg = hurdlej_cfg or HurdleJointConfig()
        members, seeds = expand(build_hurdle_joint_pptr, cfg)
        res = _train_stack(
            "hurdlej", members,
            fold_inputs([(s.Xtrain, s.Ytrain) for s in splits]),
            cfg, cfg.lr, workdir=workdir, log_fn=log_fn, resume=resume,
            seeds=seeds, mesh=mesh,
        )
        trained = [r.model for r in res]
        ptr = _stacked_predict(
            trained, _hurdlej_predict, fold_inputs([s.Xtrain for s in splits])
        )
        pte = _stacked_predict(
            trained, _hurdlej_predict, fold_inputs([s.Xtest for s in splits])
        )
        for f, split in enumerate(splits):
            log_fn(f"--- hurdlej fold {f + 1}/{F} ---")
            fold_models = per_fold(trained)[f]
            _log_hyperparams(fold_models[0], log_fn)
            if E > 1:
                from .ensemble import _avg_amount_model, mix_hurdlej_preds

                keep, (ktr, kte) = _healthy(
                    fold_models, [per_fold(ptr)[f], per_fold(pte)[f]],
                    per_fold(res)[f], log_fn, f"hurdlej fold {f + 1}",
                )
                model = _avg_amount_model(keep)
                tr, te = mix_hurdlej_preds(ktr), mix_hurdlej_preds(kte)
            else:
                model, tr, te = (
                    fold_models[0], per_fold(ptr)[f][0], per_fold(pte)[f][0]
                )
            out = _hurdlej_metrics(model, tr, te, split, log_fn)
            record("hurdlej", "test_rmse", out["test_hurdle_comb_rmse"])
            record("hurdlej", "test_mae", out["test_hurdle_comb_mae"])
            record("hurdlej", "test_nlpd", out["test_hurdle_nlpd"])
            record("hurdlej", "test_crps", out["test_crps"])
            if "test_crps_mc" in out:
                record("hurdlej", "test_crps_mc", out["test_crps_mc"])
            _record_exceedance(record, "hurdlej", out)
            record("hurdlej", "test_gate_auc", out["test_gate_auc"])

    if "zi" in models:
        for f, split in enumerate(splits):
            log_fn(f"--- zi fold {f + 1}/{F} ---")
            out = run_zero_inflated(split, clf_res[f], svgp_res[f], log_fn=log_fn)
            record("zi", "test_rmse_prob", out["test_zi_prob_reg_rmse"])
            record("zi", "test_mae_prob", out["test_zi_prob_reg_mae"])
            record("zi", "test_rmse_indc", out["test_zi_indc_reg_rmse"])
            record("zi", "test_mae_indc", out["test_zi_indc_reg_mae"])
            if "test_crps" in out:
                record("zi", "test_crps", out["test_crps"])
                if "test_crps_mc" in out:
                    record("zi", "test_crps_mc", out["test_crps_mc"])
                _record_exceedance(record, "zi", out)

    return aggregate_summary(summary, workdir, log_fn)
