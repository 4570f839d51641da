"""5-fold cross-validation driver: the reference's full pptr experimental
protocol (README.md:17-26 — five model variants over the KFold splits from
scripts/create_cvsplits.py) as one call, with aggregate metrics.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import numpy as np

from ..io.datasets import Split, load_pptr, make_cv_splits
from .configs import ClassifierPptrConfig, OnOffPptrConfig, SvgpPptrConfig
from .runners import run_classifier, run_hurdle, run_onoff, run_svgp, run_zero_inflated


def _agg(values: List[float]) -> Dict[str, float]:
    """NaN-aware fold aggregate: exceedance AUC is undefined (NaN) on folds
    where a threshold sees a single class (e.g. no events above 5.0 mm in a
    short forecast window, ADVICE r3) — such folds are excluded from
    mean/std but kept in ``folds`` so the list stays one-entry-per-fold."""
    a = np.asarray(values, dtype=np.float64)
    finite = a[np.isfinite(a)]
    mean = float(finite.mean()) if finite.size else float("nan")
    std = float(finite.std()) if finite.size else float("nan")
    # NaN folds serialize as null: bare NaN literals are not RFC-8259 JSON
    # and break external consumers of cv_summary.json (ADVICE r4)
    out = {
        "mean": mean,
        "std": std,
        "folds": [float(v) if np.isfinite(v) else None for v in a],
    }
    if finite.size != a.size:
        out["n_finite"] = int(finite.size)
    return out


def aggregate_summary(
    summary: Dict[str, Dict[str, List[float]]],
    workdir: Optional[str],
    log_fn: Callable[[str], None],
) -> dict:
    """Fold-lists → {mean, std, folds} aggregates + cv_summary.json + log.

    Metrics that are NaN on EVERY fold (a threshold degenerate across the
    whole protocol) are dropped rather than reported as NaN aggregates.
    Shared by the sequential (run_cv) and batched (run_cv_batched) drivers.
    """
    aggregates = {
        model: {
            metric: _agg(vals)
            for metric, vals in metrics.items()
            if np.isfinite(vals).any()
        }
        for model, metrics in summary.items()
    }
    if workdir:
        os.makedirs(workdir, exist_ok=True)
        with open(os.path.join(workdir, "cv_summary.json"), "w") as f:
            json.dump(aggregates, f, indent=2)
    for model, metrics in aggregates.items():
        for metric, agg in metrics.items():
            log_fn(f"{model}.{metric}: {agg['mean']:.4f} ± {agg['std']:.4f}")
    return aggregates


def _record_exceedance(record, model: str, res: dict):
    """Flatten the per-threshold exceedance scores into CV-aggregable
    scalars (test_brier_τ / test_excauc_τ)."""
    for tau, s in res.get("test_exceedance", {}).items():
        record(model, f"test_brier_{tau}", s["brier"])
        record(model, f"test_excauc_{tau}", s["auc"])


def run_cv(
    models: List[str],
    *,
    splits: Optional[List[Split]] = None,
    onoff_cfg: Optional[OnOffPptrConfig] = None,
    svgp_cfg: Optional[SvgpPptrConfig] = None,
    clf_cfg: Optional[ClassifierPptrConfig] = None,
    hurdlej_cfg=None,
    workdir: Optional[str] = None,
    log_fn: Callable[[str], None] = print,
) -> dict:
    """Run the requested model variants over all CV folds.

    models ⊆ {"onoff", "svgp", "classifier", "hurdle", "hurdlej", "zi"}.
    hurdle/zi automatically pull in the classifier (and zi the svgp) per
    fold; "hurdlej" is the jointly-trained hurdle (no classifier needed).
    """
    splits = splits or make_cv_splits(load_pptr())
    need_clf = bool({"classifier", "hurdle", "zi"} & set(models))
    need_svgp = bool({"svgp", "zi"} & set(models))

    summary: Dict[str, Dict[str, List[float]]] = {}

    def record(model: str, metric: str, value: float):
        summary.setdefault(model, {}).setdefault(metric, []).append(float(value))

    def _abort_if_interrupted(res: dict, what: str, fold: int):
        # A Ctrl-C inside a fold's training surfaces as interrupted=True on
        # the runner result (training/scan.py). Recording the partial fold as
        # fully trained and moving on would silently corrupt the CV summary —
        # propagate the interrupt so the whole sweep stops here.
        if res.get("interrupted"):
            log_fn(f"fold {fold} {what} was interrupted — aborting the CV sweep")
            raise KeyboardInterrupt

    for k, split in enumerate(splits, start=1):
        fold_dir = os.path.join(workdir, str(k)) if workdir else None
        log_fn(f"===== fold {k}/{len(splits)} =====")
        clf = reg = None
        if need_clf:
            clf = run_classifier(split, clf_cfg, workdir=fold_dir, log_fn=log_fn)
            _abort_if_interrupted(clf, "classifier", k)
            for m in ("accuracy", "precision", "recall", "auc"):
                record("classifier", f"test_{m}", clf[f"test_{m}"])
        if need_svgp:
            reg = run_svgp(split, svgp_cfg, workdir=fold_dir, log_fn=log_fn)
            _abort_if_interrupted(reg, "svgp", k)
            record("svgp", "test_rmse", reg["test_rmse"])
            record("svgp", "test_mae", reg["test_mae"])
            if "test_crps" in reg:
                record("svgp", "test_crps", reg["test_crps"])
                if "test_crps_mc" in reg:
                    record("svgp", "test_crps_mc", reg["test_crps_mc"])
                _record_exceedance(record, "svgp", reg)
        if "onoff" in models:
            res = run_onoff(split, onoff_cfg, workdir=fold_dir, log_fn=log_fn)
            _abort_if_interrupted(res, "onoff", k)
            record("onoff", "test_rmse", res["test_rmse"])
            record("onoff", "test_mae", res["test_mae"])
            if "test_crps" in res:
                record("onoff", "test_crps", res["test_crps"])
                if "test_crps_mc" in res:
                    record("onoff", "test_crps_mc", res["test_crps_mc"])
                _record_exceedance(record, "onoff", res)
            record("onoff", "steps_per_sec", res["steps_per_sec"])
        if "hurdle" in models:
            res = run_hurdle(split, clf, svgp_cfg, workdir=fold_dir, log_fn=log_fn)
            _abort_if_interrupted(res, "hurdle", k)
            record("hurdle", "test_rmse", res["test_hurdle_comb_rmse"])
            record("hurdle", "test_mae", res["test_hurdle_comb_mae"])
            record("hurdle", "test_nlpd", res["test_hurdle_nlpd"])
            if "test_crps" in res:
                record("hurdle", "test_crps", res["test_crps"])
                if "test_crps_mc" in res:
                    record("hurdle", "test_crps_mc", res["test_crps_mc"])
                _record_exceedance(record, "hurdle", res)
        if "hurdlej" in models:
            from .runners import run_hurdle_joint

            res = run_hurdle_joint(split, hurdlej_cfg, workdir=fold_dir, log_fn=log_fn)
            _abort_if_interrupted(res, "hurdlej", k)
            record("hurdlej", "test_rmse", res["test_hurdle_comb_rmse"])
            record("hurdlej", "test_mae", res["test_hurdle_comb_mae"])
            record("hurdlej", "test_nlpd", res["test_hurdle_nlpd"])
            if "test_crps" in res:
                record("hurdlej", "test_crps", res["test_crps"])
                if "test_crps_mc" in res:
                    record("hurdlej", "test_crps_mc", res["test_crps_mc"])
                _record_exceedance(record, "hurdlej", res)
            record("hurdlej", "test_gate_auc", res["test_gate_auc"])
            record("hurdlej", "steps_per_sec", res["steps_per_sec"])
        if "zi" in models:
            res = run_zero_inflated(split, clf, reg, workdir=fold_dir, log_fn=log_fn)
            record("zi", "test_rmse_prob", res["test_zi_prob_reg_rmse"])
            record("zi", "test_mae_prob", res["test_zi_prob_reg_mae"])
            record("zi", "test_rmse_indc", res["test_zi_indc_reg_rmse"])
            record("zi", "test_mae_indc", res["test_zi_indc_reg_mae"])
            if "test_crps" in res:
                record("zi", "test_crps", res["test_crps"])
                if "test_crps_mc" in res:
                    record("zi", "test_crps_mc", res["test_crps_mc"])
                _record_exceedance(record, "zi", res)

    return aggregate_summary(summary, workdir, log_fn)
