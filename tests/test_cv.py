import numpy as np

from zigp_tpu.experiments.configs import (
    ClassifierPptrConfig,
    KronGridConfig,
    OnOffPptrConfig,
    SvgpPptrConfig,
)
from zigp_tpu.experiments.cv import run_cv
from zigp_tpu.io.datasets import Split


def _splits(rng, n_folds=2, N=150):
    out = []
    for _ in range(n_folds):
        X = rng.rand(N, 3)
        gate = np.cos(5 * X[:, 2:3]) > 0
        Y = np.maximum((2 * np.sin(3 * X[:, 2:3]) + X[:, :1]) * gate, 0.0)
        Xt = rng.rand(50, 3)
        Yt = np.maximum((2 * np.sin(3 * Xt[:, 2:3]) + Xt[:, :1]) * (np.cos(5 * Xt[:, 2:3]) > 0), 0.0)
        out.append(Split(X, Y, Xt, Yt))
    return out


def test_run_cv_all_variants(rng, tmp_path):
    grid = KronGridConfig(num_spatial=3, num_temporal=6)
    agg = run_cv(
        ["onoff", "svgp", "classifier", "hurdle", "zi"],
        splits=_splits(rng),
        onoff_cfg=OnOffPptrConfig(num_iter=20, batch_size=50, grid=grid, log_every=0, scan_inner=0),
        svgp_cfg=SvgpPptrConfig(num_iter=20, batch_size=50, grid=grid, log_every=0, scan_inner=0),
        clf_cfg=ClassifierPptrConfig(num_iter=20, batch_size=50, grid=grid, log_every=0, scan_inner=0),
        workdir=str(tmp_path),
        log_fn=lambda s: None,
    )
    assert set(agg) == {"classifier", "svgp", "onoff", "hurdle", "zi"}
    assert len(agg["onoff"]["test_rmse"]["folds"]) == 2
    assert np.isfinite(agg["onoff"]["test_rmse"]["mean"])
    assert (tmp_path / "cv_summary.json").exists()
    assert (tmp_path / "1" / "results_scgp.pickle").exists()
    assert (tmp_path / "2" / "results_zi.pickle").exists()
