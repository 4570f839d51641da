"""Batched CV driver (experiments/cv_batched.py): all folds of a variant
trained in one vmapped scanned run.

Equivalence anchor: the sequential driver run with the device sampler —
per-fold member f of the batched stack reproduces run_cv's fold-f training
exactly (same seed, same threefry stream), so the CV metrics must agree to
float tolerance.
"""

import dataclasses

import numpy as np
import pytest

from zigp_tpu.experiments.configs import (
    ClassifierPptrConfig,
    KronGridConfig,
    OnOffPptrConfig,
    SvgpPptrConfig,
)
from zigp_tpu.experiments.cv import run_cv
from zigp_tpu.experiments.cv_batched import run_cv_batched
from zigp_tpu.io.datasets import Split


def _splits(F=2, N=48, Nt=20, seed=0):
    """Tiny pptr-shaped folds: X (n, 3) = 2 spatial + 1 temporal column,
    zero-inflated positive targets. All folds share train/test sizes, like
    the real KFold protocol."""
    r = np.random.RandomState(seed)
    out = []
    for f in range(F):
        Xtr, Xte = r.rand(N, 3), r.rand(Nt, 3)
        Ytr = np.maximum(r.randn(N, 1) + 0.7, 0.0)
        Yte = np.maximum(r.randn(Nt, 1) + 0.7, 0.0)
        out.append(Split(Xtr, Ytr, Xte, Yte))
    return out


from zigp_tpu.experiments.configs import KernelInit

# kernel inits sized for the synthetic [0,1]^3 inputs — the pptr defaults
# (temporal lengthscale 5/1000) are for the /1000-scaled real data and give
# near-zero cross-grams here
_SP = KernelInit((0.5, 0.5), 1.0)
_TM = KernelInit((0.5,), 1.0)
_TINY = dict(
    num_iter=8,
    batch_size=8,
    scan_inner=4,
    log_every=0,
    ckpt_every=0,
    grid=KronGridConfig(num_spatial=4, num_temporal=3),
    sampler="device",
)


def test_batched_svgp_cv_matches_sequential_device_sampler():
    splits = _splits()
    cfg = SvgpPptrConfig(**_TINY, k_spatial=_SP, k_temporal=_TM)
    silent = lambda s: None  # noqa: E731

    seq = run_cv(["svgp"], splits=splits, svgp_cfg=cfg, log_fn=silent)
    bat = run_cv_batched(["svgp"], splits=splits, svgp_cfg=cfg, log_fn=silent)

    for metric in ("test_rmse", "test_mae"):
        np.testing.assert_allclose(
            bat["svgp"][metric]["folds"], seq["svgp"][metric]["folds"],
            rtol=1e-7, atol=1e-9,
        )


def test_batched_hurdlej_cv_matches_sequential_device_sampler():
    from zigp_tpu.experiments.configs import HurdleJointConfig

    splits = _splits()
    cfg = HurdleJointConfig(
        **_TINY, k_spatial=_SP, k_temporal=_TM, gk_spatial=_SP, gk_temporal=_TM,
    )
    silent = lambda s: None  # noqa: E731

    seq = run_cv(["hurdlej"], splits=splits, hurdlej_cfg=cfg, log_fn=silent)
    bat = run_cv_batched(["hurdlej"], splits=splits, hurdlej_cfg=cfg, log_fn=silent)

    for metric in ("test_rmse", "test_mae", "test_nlpd", "test_gate_auc"):
        np.testing.assert_allclose(
            bat["hurdlej"][metric]["folds"], seq["hurdlej"][metric]["folds"],
            rtol=1e-6, atol=1e-8,
        )


def test_batched_hurdlej_ensemble_smoke():
    from zigp_tpu.experiments.configs import HurdleJointConfig

    splits = _splits()
    cfg = HurdleJointConfig(
        **_TINY, k_spatial=_SP, k_temporal=_TM, gk_spatial=_SP, gk_temporal=_TM,
    )
    res = run_cv_batched(
        ["hurdlej"], splits=splits, hurdlej_cfg=cfg, ensemble=2,
        log_fn=lambda s: None,
    )
    for metric, agg in res["hurdlej"].items():
        assert np.isfinite(agg["mean"]), metric
        assert len(agg["folds"]) == len(splits)


@pytest.mark.parametrize("variants", [["onoff"], ["classifier", "svgp", "hurdle", "zi"]])
def test_batched_cv_all_variants_smoke(variants, tmp_path):
    """End-to-end batched CV over every variant: finite metrics, correct
    summary structure, summary JSON written. The classifier is trained long
    enough (strongly positive targets) that the hurdle 'on' subsets are
    non-empty on every fold."""
    splits = _splits(seed=3)
    onoff_cfg = OnOffPptrConfig(
        **_TINY, monitor_every=0,
        fk_spatial=_SP, fk_temporal=_TM, gk_spatial=_SP, gk_temporal=_TM,
    )
    svgp_cfg = SvgpPptrConfig(**_TINY, k_spatial=_SP, k_temporal=_TM)
    clf_cfg = dataclasses.replace(
        ClassifierPptrConfig(**_TINY, k_spatial=_SP, k_temporal=_TM),
        num_iter=200, batch_size=24, lr=5e-2,
    )
    res = run_cv_batched(
        variants,
        splits=splits,
        onoff_cfg=onoff_cfg,
        svgp_cfg=svgp_cfg,
        clf_cfg=clf_cfg,
        workdir=str(tmp_path),
        log_fn=lambda s: None,
    )
    for v in variants:
        assert v in res, f"variant {v} missing from the summary"
        for metric, agg in res[v].items():
            assert np.isfinite(agg["mean"]), f"{v}.{metric} non-finite"
            assert len(agg["folds"]) == len(splits)
    assert (tmp_path / "cv_summary.json").exists()


def test_batched_cv_ensemble_all_variants(tmp_path):
    """ensemble=2: F×E members in one stack per variant, per-fold mixture
    metrics; summary has one row per fold (not per member)."""
    splits = _splits(seed=3)
    variants = ["classifier", "svgp", "hurdle", "zi", "onoff"]
    onoff_cfg = OnOffPptrConfig(
        **_TINY, monitor_every=0,
        fk_spatial=_SP, fk_temporal=_TM, gk_spatial=_SP, gk_temporal=_TM,
    )
    svgp_cfg = SvgpPptrConfig(**_TINY, k_spatial=_SP, k_temporal=_TM)
    clf_cfg = dataclasses.replace(
        ClassifierPptrConfig(**_TINY, k_spatial=_SP, k_temporal=_TM),
        num_iter=200, batch_size=24, lr=5e-2,
    )
    res = run_cv_batched(
        variants,
        splits=splits,
        onoff_cfg=onoff_cfg,
        svgp_cfg=svgp_cfg,
        clf_cfg=clf_cfg,
        workdir=str(tmp_path),
        log_fn=lambda s: None,
        ensemble=2,
    )
    for v in variants:
        assert v in res
        for metric, agg in res[v].items():
            assert np.isfinite(agg["mean"]), f"{v}.{metric} non-finite"
            assert len(agg["folds"]) == len(splits)


def test_batched_cv_member_sharded_matches_unsharded():
    """mesh_members=2: fold stack sharded over 2 CPU devices ≡ unsharded."""
    splits = _splits()
    cfg = SvgpPptrConfig(**_TINY, k_spatial=_SP, k_temporal=_TM)
    silent = lambda s: None  # noqa: E731
    plain = run_cv_batched(["svgp"], splits=splits, svgp_cfg=cfg, log_fn=silent)
    sharded = run_cv_batched(
        ["svgp"], splits=splits, svgp_cfg=cfg, log_fn=silent, mesh_members=2
    )
    np.testing.assert_allclose(
        sharded["svgp"]["test_rmse"]["folds"], plain["svgp"]["test_rmse"]["folds"],
        rtol=1e-9,
    )


def test_batched_cv_member_sharded_pads_nondividing():
    """mesh_members=2 with 3 folds: the stack is padded 3 -> 4 with
    discarded duplicates; real-fold metrics ≡ the unsharded run (this is
    the real 5-folds-over-8-chips shape, scaled down)."""
    splits = _splits(F=3)
    cfg = SvgpPptrConfig(**_TINY, k_spatial=_SP, k_temporal=_TM)
    silent = lambda s: None  # noqa: E731
    plain = run_cv_batched(["svgp"], splits=splits, svgp_cfg=cfg, log_fn=silent)
    sharded = run_cv_batched(
        ["svgp"], splits=splits, svgp_cfg=cfg, log_fn=silent, mesh_members=2
    )
    assert len(sharded["svgp"]["test_rmse"]["folds"]) == 3
    np.testing.assert_allclose(
        sharded["svgp"]["test_rmse"]["folds"], plain["svgp"]["test_rmse"]["folds"],
        rtol=1e-9,
    )


def test_batched_cv_natgrad():
    """optimizer='natgrad' routes to the vmapped natural-gradient stack
    trainer; metrics finite, summary shaped per fold."""
    splits = _splits()
    cfg = dataclasses.replace(
        SvgpPptrConfig(**_TINY, k_spatial=_SP, k_temporal=_TM),
        optimizer="natgrad", num_iter=16, natgrad_warmup=8,
        natgrad_adam_warmup=4, natgrad_gamma=0.05,
    )
    res = run_cv_batched(["svgp"], splits=splits, svgp_cfg=cfg, log_fn=lambda s: None)
    assert len(res["svgp"]["test_rmse"]["folds"]) == len(splits)
    assert np.isfinite(res["svgp"]["test_rmse"]["mean"])


def test_batched_cv_natgrad_rejects_ragged_hurdle():
    splits = _splits(seed=3)
    cfg = dataclasses.replace(
        SvgpPptrConfig(**_TINY, k_spatial=_SP, k_temporal=_TM), optimizer="natgrad"
    )
    clf_cfg = dataclasses.replace(
        ClassifierPptrConfig(**_TINY, k_spatial=_SP, k_temporal=_TM),
        num_iter=200, batch_size=24, lr=5e-2,
    )
    with pytest.raises(ValueError, match="equal-shape"):
        run_cv_batched(
            ["hurdle"], splits=splits, svgp_cfg=cfg, clf_cfg=clf_cfg,
            log_fn=lambda s: None,
        )
