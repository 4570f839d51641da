"""Interleaved A/B of the solve-matmul precision policies on real hardware.

The round-2 post-mortem (RESULTS.md) pinned every solve-replacing
contraction at Precision.HIGHEST after TPU-default bf16 products broke the
GH objective; the round-3 study measured HIGH (+60 % steps/s on MXU-bound
configs, small champion-RMSE drift). This harness measures any subset of the
policies ("highest", "high", "mixed" — see ops.linalg.set_solve_precision)
on the three configs where precision passes pay:

- flagship: onoff 10x100, B=1000, host-staged blocks (latency-bound — the
  control: policies should be ~equal here);
- champion: onoff 32x200 kron-cov whitened, B=4000, device sampler
  (MXU-bound — where HIGH measured +60 %);
- scale: onoff 105x250, B=1000, device sampler (the O(M*B) factored
  contractions).

Interleaved within one process, one round-robin pass per repeat, so the
tunnel's run-to-run variance hits every policy equally (the repo's
measurement convention: only same-session interleaved A/Bs are trusted for
small deltas). Each policy gets its own freshly traced step — precision is
captured at trace time.

Usage: python -m zigp_tpu.experiments.precision_ab
           [--configs flagship,champion,scale] [--policies highest,mixed]
           [--blocks 8] [--inner 100] [--repeats 3] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _build(config: str):
    """(model, (X, Y) train arrays, batch_size) for a named config."""
    from ..io.datasets import load_pptr, make_cv_splits
    from .builders import build_onoff_pptr
    from .configs import OnOffPptrConfig, best_onoff_config

    split = make_cv_splits(load_pptr())[0]
    if config == "flagship":
        cfg = OnOffPptrConfig()
        batch = cfg.batch_size  # 1000
    elif config == "champion":
        cfg = best_onoff_config()
        batch = cfg.batch_size  # 4000
    elif config == "scale":
        cfg = OnOffPptrConfig()
        cfg.grid.num_spatial = 105
        cfg.grid.num_temporal = 250
        batch = cfg.batch_size
    else:
        raise ValueError(f"unknown config {config!r}")
    model = build_onoff_pptr(cfg, split)
    return model, (split.Xtrain, split.Ytrain), batch, cfg


def _measure_once(model, arrays, batch, cfg, *, num_inner: int, num_blocks: int):
    """steps/s for ONE freshly traced scanned run at the current precision
    policy (device sampler: one PRNG key per dispatch)."""
    import jax
    import jax.numpy as jnp

    from ..training.optim import make_optimizer
    from ..training.scan import make_device_sampling_scan_step

    X, Y = (jnp.asarray(np.asarray(a)) for a in arrays)
    # the scanned step DONATES model/opt_state buffers — train on a fresh
    # copy so the caller's built model survives the round-robin passes
    model = jax.tree_util.tree_map(jnp.array, model)
    optimizer = make_optimizer(model, default_lr=cfg.indp_lr)
    opt_state = optimizer.init(model)
    step = make_device_sampling_scan_step(optimizer, X, Y, batch)
    key = jnp.asarray(np.array([0, 0], dtype=np.uint32))
    # compile block excluded from timing
    model, opt_state, losses = step(model, opt_state, key, num_inner)
    jax.block_until_ready(losses)
    t0 = time.time()
    for b in range(1, num_blocks + 1):
        key = jnp.asarray(np.array([0, b], dtype=np.uint32))
        model, opt_state, losses = step(model, opt_state, key, num_inner)
    jax.block_until_ready(losses)
    rate = num_blocks * num_inner / (time.time() - t0)
    return rate, float(losses[-1])


def run_precision_ab(
    configs=("flagship", "champion"),
    policies=("highest", "mixed"),
    num_inner: int = 100,
    num_blocks: int = 8,
    repeats: int = 3,
    out: str | None = None,
    log_fn=print,
):
    from ..ops import linalg

    results = {c: {p: [] for p in policies} for c in configs}
    losses = {c: {p: [] for p in policies} for c in configs}  # every repeat kept
    try:
        for config in configs:
            log_fn(f"== {config} ==")
            built = _build(config)
            for r in range(repeats):
                for policy in policies:  # interleaved round-robin
                    linalg.set_solve_precision(policy)
                    model = built[0]
                    rate, last = _measure_once(
                        model, built[1], built[2], built[3],
                        num_inner=num_inner, num_blocks=num_blocks,
                    )
                    results[config][policy].append(round(rate, 1))
                    losses[config][policy].append(last)
                    log_fn(f"  {policy:>8s} pass {r}: {rate:8.1f} steps/s "
                           f"(loss {last:.1f})")
    finally:
        linalg.set_solve_precision("highest")

    summary = {
        "task": "interleaved solve-precision A/B (see ops.linalg.set_solve_precision)",
        "num_inner": num_inner,
        "num_blocks": num_blocks,
        "steps_per_sec_median": {
            c: {p: sorted(v)[len(v) // 2] for p, v in d.items() if v}
            for c, d in results.items()
        },
        "steps_per_sec_all": results,
        "final_block_loss": losses,
    }
    log_fn(json.dumps(summary["steps_per_sec_median"]))
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
        log_fn(f"wrote {out}")
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--configs", type=str, default="flagship,champion")
    ap.add_argument("--policies", type=str, default="highest,mixed")
    ap.add_argument("--inner", type=int, default=100)
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)
    run_precision_ab(
        configs=tuple(args.configs.split(",")),
        policies=tuple(args.policies.split(",")),
        num_inner=args.inner,
        num_blocks=args.blocks,
        repeats=args.repeats,
        out=args.out,
    )


if __name__ == "__main__":
    main()
