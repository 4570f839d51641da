"""Scale-tier utilization probe: batch-scaling the 105×250 grid with
calibrated MFU accounting at each point.

    python -m zigp_tpu.experiments.scale_utilization [--out results/...json]
        [--solve-precision highest|high|mixed]

For B ∈ {4096, 8192, 16384, 32768} at the 105 spatial × 250 temporal
inducing grid (26,250 inducing points per GP — a configuration the
reference's dense Kronecker formulation cannot represent at all), measures
the PRODUCTION scale-tier step (HBM-resident device sampler, the CLI's
``--sampler device`` — every RESULTS.md scale recipe; round 5 switched the
probe from host-staged blocks to align with the shipped recipe — measured
rate-equivalent at these shapes, the step is compute-bound either way) and
reports steps/s,
FLOPs/step, achieved TFLOP/s, MFU and arithmetic intensity under two
accountings:

- ``*_ca``: XLA ``cost_analysis`` FLOPs — kept for continuity with the
  round-4 artifacts, but measured (round 5) to under-report these shapes'
  logical matmul FLOPs ~5×;
- ``*_analytic``: the calibrated logical-matmul model
  (``experiments.measure.analytic_matmul_flops`` — V/A solves + first-stage factored
  contractions, fwd + 2× reverse), vs the 6-pass f32-effective v5e peak
  (197/6 ≈ 32.8 TFLOP/s under Precision.HIGHEST; ``--solve-precision
  mixed`` drops the batch-scaled class to 3-pass, peak 65.7, and the MFU
  denominators switch accordingly for that class — reported against the
  HIGHEST peak for comparability, i.e. mixed rows can exceed 1.0× of the
  6-pass bound in principle).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

V5E_PEAK_F32_EFFECTIVE = 197e12 / 6.0


def probe(
    batches=(4096, 8192, 16384, 32768),
    num_inner=100,
    num_blocks=3,
    solve_precision=None,
    log_fn=print,
):
    import jax
    import jax.numpy as jnp

    from ..io.datasets import load_pptr, make_cv_splits
    from ..ops import linalg
    from ..training import make_optimizer
    from ..training.scan import make_device_sampling_scan_step
    from .measure import analytic_matmul_flops
    from .builders import build_onoff_pptr
    from .configs import KronGridConfig, OnOffPptrConfig

    if solve_precision:
        linalg.set_solve_precision(solve_precision)
    split = make_cv_splits(load_pptr())[0]
    X = jnp.asarray(np.asarray(split.Xtrain, np.float32))
    Y = jnp.asarray(np.asarray(split.Ytrain, np.float32))
    rows = []
    try:
        for B in batches:
            cfg = OnOffPptrConfig(grid=KronGridConfig(num_spatial=105, num_temporal=250))
            model = build_onoff_pptr(cfg, split)
            opt = make_optimizer(model, default_lr=1e-3)
            state = opt.init(model)
            step = make_device_sampling_scan_step(opt, X, Y, B)

            def key(b):
                return jnp.asarray(np.array([0, b], dtype=np.uint32))

            flops = bytes_acc = 0.0
            try:
                compiled = step.lower(model, state, key(0), num_inner).compile()
                ca = compiled.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                flops = float(ca.get("flops", 0.0))
                bytes_acc = float(ca.get("bytes accessed", 0.0))
                # reuse the AOT executable (static num_inner is baked in) —
                # calling the jit again would compile a second time
                step = lambda m, s, k, n, _c=compiled: _c(m, s, k)
            except Exception as e:  # pragma: no cover - backend-dependent
                log_fn(f"cost_analysis unavailable ({e}); timing only")
            model, state, losses = step(model, state, key(0), num_inner)  # warmup
            jax.block_until_ready(losses)
            rates = []
            b = 1
            for _ in range(3):
                t0 = time.time()
                for _ in range(num_blocks):
                    model, state, losses = step(model, state, key(b), num_inner)
                    b += 1
                jax.block_until_ready(losses)
                rates.append(num_blocks * num_inner / (time.time() - t0))
            rate = sorted(rates)[1]
            fps_ca = flops / num_inner
            fps_an = analytic_matmul_flops(B, 105, 250)
            # null (not 0.0) when cost analysis is unavailable (ADVICE r4)
            row = {
                "batch": B,
                "sampler": "device",
                "solve_precision": solve_precision or "highest",
                "steps_per_sec": round(rate, 2),
                "flops_per_step_ca": fps_ca if flops else None,
                "achieved_tflops_ca": round(fps_ca * rate / 1e12, 4) if flops else None,
                "mfu_f32_effective_ca": (
                    round(fps_ca * rate / V5E_PEAK_F32_EFFECTIVE, 5) if flops else None
                ),
                "flops_per_step_analytic": fps_an,
                "achieved_tflops_analytic": round(fps_an * rate / 1e12, 4),
                "mfu_f32_effective_analytic": round(
                    fps_an * rate / V5E_PEAK_F32_EFFECTIVE, 5
                ),
                "arithmetic_intensity": (
                    round(flops / bytes_acc, 2) if bytes_acc else None
                ),
                "samples_per_sec": round(rate * B, 1),
                "final_block_loss": float(losses[-1]),
            }
            rows.append(row)
            log_fn(json.dumps(row))
    finally:
        if solve_precision:
            linalg.set_solve_precision("highest")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/scale_utilization_r5.json")
    ap.add_argument("--solve-precision", type=str, default=None,
                    choices=("highest", "high", "mixed"))
    args = ap.parse_args()
    rows = probe(solve_precision=args.solve_precision)
    with open(args.out, "w") as f:
        json.dump({"task": "scale_utilization", "grid": "105x250",
                   "sampler": "device", "rows": rows}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
