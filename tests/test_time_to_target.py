"""Smoke test for the time-to-target benchmark driver (BASELINE north-star
metric, zigp_tpu/experiments/time_to_target.py) on a tiny config/split."""

import numpy as np

from zigp_tpu.experiments.configs import KronGridConfig, OnOffPptrConfig
from zigp_tpu.experiments.time_to_target import run_time_to_target
from zigp_tpu.io.datasets import Split


def test_time_to_target_smoke(rng, tmp_path):
    N = 400
    X = np.stack([
        59.8 + 10.3 * rng.rand(N),
        20.0 + 11.0 * rng.rand(N),
        4.368 + 1.079 * rng.rand(N),
    ], axis=1).astype(np.float32)
    Y = np.maximum(rng.randn(N, 1), 0.0).astype(np.float32)
    Y[rng.rand(N, 1) < 0.89] = 0.0
    split = Split(X[:300], Y[:300], X[300:], Y[300:])

    cfg = OnOffPptrConfig(
        num_iter=200, batch_size=64, scan_inner=50, whiten=True,
        grid=KronGridConfig(num_spatial=3, num_temporal=5), sampler="device",
    )
    out = tmp_path / "ttt.json"
    res = run_time_to_target(eval_every=100, out=str(out), cfg=cfg, split=split)
    assert out.exists()
    assert np.isfinite(res["final_rmse"])
    assert res["curve"][-1]["step"] == 200
    # the zero-predictor floor target must resolve (hit or None), and the
    # within-1%-of-final target is hit by construction at the last eval
    assert res["targets"]["rmse within 1% of final"] is not None
