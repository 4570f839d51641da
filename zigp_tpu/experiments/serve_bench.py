"""Serving-throughput benchmark: exported artifact vs in-process predictor.

Measures the AOT export path (io.export: StableHLO artifact, params baked
in) against the in-process ``predict_batched`` serving path (RESULTS.md
"Serving throughput") on the same champion-config model and the same
fixed-shape chunking/transfer scheduling, on whatever backend the process
has (the TPU in production). The reference has no serving benchmark — its
predict modules re-run per test point through a ``tf.while_loop``
(onofftf/onoffpred.py:176-195).

    python -m zigp_tpu.experiments.serve_bench [--batch 16384] [--rows 65536]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import jax
import numpy as np


def _time_passes(fn, repeats: int = 3):
    """Median wall seconds of ``fn()`` over ``repeats`` timed passes (one
    untimed warmup pass excludes compile — the repo timing convention)."""
    fn()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def run(batch: int = 16384, rows: int = 65536, out: str | None = None) -> dict:
    from ..io.export import export_predictor, load_predictor
    from .measure import build_config

    model, (Xtrain, _), _, _ = build_config("champion")
    X = np.asarray(Xtrain[:rows], dtype=np.float32)
    rows = X.shape[0]

    def chunked(call):
        # the predict_batched transfer scheduling: dispatch every fixed-shape
        # chunk without syncing, fetch everything in one device_get
        def run_all():
            pending = []
            for start in range(0, rows, batch):
                chunk = X[start : start + batch]
                pad = batch - chunk.shape[0]
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0
                    )
                pending.append(call(chunk))
            return jax.device_get(pending)

        return run_all

    # in-process steady-state path: one jitted model.predict, reused
    jitted = jax.jit(model.predict)
    t_inproc = _time_passes(chunked(jitted))

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "onoff.zigp")
        export_predictor(model, "onoff", X.shape[1], path)
        size_mb = os.path.getsize(path) / 1e6
        served = load_predictor(path)
        t_export = _time_passes(chunked(lambda c: served(c, as_numpy=False)))

    res = {
        "metric": "export_serving_points_per_sec",
        "batch": batch,
        "rows": rows,
        "device": jax.devices()[0].device_kind,
        "artifact_mb": round(size_mb, 2),
        "export_pts_per_sec": round(rows / t_export, 1),
        "in_process_pts_per_sec": round(rows / t_inproc, 1),
        "export_vs_in_process": round(t_inproc / t_export, 3),
    }
    print(json.dumps(res))
    if out:
        with open(out, "w") as f:
            json.dump(res, f, indent=2)
    return res


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--rows", type=int, default=65536)
    ap.add_argument("--out", type=str, default=None)
    run(**vars(ap.parse_args()))
