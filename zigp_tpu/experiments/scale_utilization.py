"""Scale-tier utilization probe (VERDICT r4 stretch): batch-scaling the
105×250 grid until the step is compute-bound, with XLA cost-analysis MFU
accounting at each point.

    python -m zigp_tpu.experiments.scale_utilization [--out results/...json]

For B ∈ {4096, 8192, 16384, 32768} at the 105 spatial × 250 temporal
inducing grid (26,250 inducing points per GP — a configuration the
reference's dense Kronecker formulation cannot represent at all), measures
the production scanned step's steps/s, FLOPs/step, achieved TFLOP/s, MFU
(vs the 32.8 TFLOP/s f32-effective v5e peak under the repo's
Precision.HIGHEST policy — see bench.py), and arithmetic intensity.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

V5E_PEAK_F32_EFFECTIVE = 197e12 / 6.0


def probe(batches=(4096, 8192, 16384, 32768), num_inner=50, num_blocks=3, log_fn=print):
    import jax
    import jax.numpy as jnp

    from ..io.datasets import load_pptr, make_cv_splits
    from ..training import make_optimizer, make_scan_train_step
    from .builders import build_onoff_pptr
    from .configs import KronGridConfig, OnOffPptrConfig

    split = make_cv_splits(load_pptr())[0]
    X = np.asarray(split.Xtrain, np.float32)
    Y = np.asarray(split.Ytrain, np.float32)
    rows = []
    for B in batches:
        cfg = OnOffPptrConfig(grid=KronGridConfig(num_spatial=105, num_temporal=250))
        model = build_onoff_pptr(cfg, split)
        opt = make_optimizer(model, default_lr=1e-3)
        state = opt.init(model)
        step = make_scan_train_step(opt)
        rng = np.random.RandomState(0)
        blocks = []
        for _ in range(num_blocks):
            idx = rng.randint(0, X.shape[0], size=(num_inner, B))
            blocks.append((jnp.asarray(X[idx]), jnp.asarray(Y[idx])))
        flops = bytes_acc = 0.0
        try:
            compiled = step.lower(model, state, *blocks[0]).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            bytes_acc = float(ca.get("bytes accessed", 0.0))
            step = compiled
        except Exception as e:  # pragma: no cover - backend-dependent
            log_fn(f"cost_analysis unavailable ({e}); timing only")
        model, state, losses = step(model, state, *blocks[0])  # warmup
        jax.block_until_ready(losses)
        rates = []
        for _ in range(3):
            t0 = time.time()
            for Xs, Ys in blocks:
                model, state, losses = step(model, state, Xs, Ys)
            jax.block_until_ready(losses)
            rates.append(num_blocks * num_inner / (time.time() - t0))
        rate = sorted(rates)[1]
        fps = flops / num_inner
        achieved = fps * rate
        # null (not 0.0) when cost analysis is unavailable (ADVICE r4)
        row = {
            "batch": B,
            "steps_per_sec": round(rate, 2),
            "flops_per_step": fps if flops else None,
            "achieved_tflops": round(achieved / 1e12, 4) if flops else None,
            "mfu_f32_effective": (
                round(achieved / V5E_PEAK_F32_EFFECTIVE, 5) if flops else None
            ),
            "arithmetic_intensity": round(flops / bytes_acc, 2) if bytes_acc else None,
            "samples_per_sec": round(rate * B, 1),
            "final_block_loss": float(losses[-1]),
        }
        rows.append(row)
        log_fn(json.dumps(row))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/scale_utilization_r4.json")
    args = ap.parse_args()
    rows = probe()
    with open(args.out, "w") as f:
        json.dump({"task": "scale_utilization", "grid": "105x250", "rows": rows}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
