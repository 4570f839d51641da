"""Seed ensembles (experiments/ensemble.py): batched-stack training of E seed
variants + exact uniform-mixture prediction combining."""

import dataclasses

import numpy as np
import pytest

from zigp_tpu.experiments.configs import (
    ClassifierPptrConfig,
    KernelInit,
    KronGridConfig,
    OnOffPptrConfig,
    SvgpPptrConfig,
)
from zigp_tpu.experiments.ensemble import mixture_moments, run_ensemble
from zigp_tpu.experiments.runners import run_svgp
from zigp_tpu.io.datasets import Split

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


def _split(seed=0, N=48, Nt=20):
    r = np.random.RandomState(seed)
    return Split(
        r.rand(N, 3), np.maximum(r.randn(N, 1) + 0.7, 0.0),
        r.rand(Nt, 3), np.maximum(r.randn(Nt, 1) + 0.7, 0.0),
    )


def test_mixture_moments_match_sampling():
    """Moment-matched mixture mean/var ≡ the empirical moments of the
    hierarchical sample (draw member, then draw from its Gaussian)."""
    r = np.random.RandomState(0)
    E, N = 3, 4
    means = r.randn(E, N, 1)
    varis = r.rand(E, N, 1) + 0.1
    mu, var = mixture_moments(means, varis)

    S = 400_000
    comp = r.randint(0, E, size=S)
    draws = means[comp, :, 0] + np.sqrt(varis[comp, :, 0]) * r.randn(S, N)
    np.testing.assert_allclose(mu[:, 0], draws.mean(0), atol=5e-3)
    np.testing.assert_allclose(var[:, 0], draws.var(0), rtol=2e-2)


def test_ensemble_size1_matches_single_run():
    """A 1-member ensemble reproduces the plain runner (same seed, device
    sampler): identical training stream, identity mixture."""
    split = _split()
    cfg = SvgpPptrConfig(**_TINY, k_spatial=_SP, k_temporal=_TM)
    single = run_svgp(split, cfg, log_fn=lambda s: None)
    ens = run_ensemble(split, "svgp", cfg, size=1, log_fn=lambda s: None)
    np.testing.assert_allclose(ens["test_rmse"], single["test_rmse"], rtol=1e-7)
    np.testing.assert_allclose(ens["test_nlpd"], single["test_nlpd"], rtol=1e-7)


@pytest.mark.parametrize("kind", ["svgp", "classifier", "onoff", "hurdlej"])
def test_ensemble_smoke_all_kinds(kind, tmp_path):
    from zigp_tpu.experiments.configs import HurdleJointConfig

    split = _split(seed=1)
    cfg = {
        "svgp": SvgpPptrConfig(**_TINY, k_spatial=_SP, k_temporal=_TM),
        "classifier": dataclasses.replace(
            ClassifierPptrConfig(**_TINY, k_spatial=_SP, k_temporal=_TM),
            num_iter=40,
        ),
        "onoff": OnOffPptrConfig(
            **_TINY, monitor_every=0,
            fk_spatial=_SP, fk_temporal=_TM, gk_spatial=_SP, gk_temporal=_TM,
        ),
        "hurdlej": HurdleJointConfig(
            **_TINY, k_spatial=_SP, k_temporal=_TM, gk_spatial=_SP, gk_temporal=_TM,
        ),
    }[kind]
    res = run_ensemble(
        split, kind, cfg, size=3, workdir=str(tmp_path), log_fn=lambda s: None
    )
    assert res["ensemble_size"] == 3
    key = {
        "classifier": "test_auc", "hurdlej": "test_hurdle_comb_rmse",
    }.get(kind, "test_rmse")
    assert np.isfinite(res[key])
    assert len(res[f"member_{key}"]) == 3
    assert all(np.isfinite(v) for v in res[f"member_{key}"])
    assert (tmp_path / f"results_ensemble_{kind}.pickle").exists()
    # members differ (different seeds touched init + sampling)
    assert len({round(v, 12) for v in res[f"member_{key}"]}) > 1


def test_ensemble_rejects_natgrad():
    cfg = dataclasses.replace(
        SvgpPptrConfig(**_TINY, k_spatial=_SP, k_temporal=_TM), optimizer="natgrad"
    )
    with pytest.raises(ValueError, match="adam"):
        run_ensemble(_split(), "svgp", cfg, size=2, log_fn=lambda s: None)


def test_healthy_member_mask():
    from zigp_tpu.experiments.ensemble import healthy_member_mask

    # healthy seed variation: everyone kept
    assert healthy_member_mask([2.1e5, 1.9e5, 2.3e5, 2.0e5]).all()
    # a mid-spike endpoint (3 orders of magnitude) is excluded
    mask = healthy_member_mask([2.1e5, 1.9e5, 4.1e8, 2.0e5])
    assert list(mask) == [True, True, False, True]
    # unknown losses: keep everyone (no information, no exclusion)
    assert healthy_member_mask([float("nan")] * 3).all()
    # all bad: the least-bad member survives
    mask = healthy_member_mask([1e9, 5e8, 7e9])
    assert mask.sum() >= 1 and mask[1]
    # negative member losses (loss = -ELBO can be negative): the |median|
    # scale is blind there, the spread criterion must still catch the spike
    mask = healthy_member_mask([-5000.0, -5010.0, -4990.0, 40000.0])
    assert list(mask) == [True, True, True, False]
    # near-zero losses with a spike
    mask = healthy_member_mask([0.5, -0.3, 0.1, 2e4])
    assert list(mask) == [True, True, True, False]
    # near-identical members with f32-level jitter: no false positives
    assert healthy_member_mask([1e6, 1e6 + 27.0, 1e6 + 3.0, 1e6 + 11.0]).all()
