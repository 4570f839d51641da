"""Device-time breakdown of the production scanned train step.

Captures a ``jax.profiler`` trace around N scanned dispatches of a named
benchmark config (the shared experiments.measure scaffold) and prints
where the device program spends its time — op categories (fusions, copies,
dots, the Pallas custom calls) and the top individual ops — using the
self-contained XSpace reader in ``utils/xprof.py``. This is the tool behind
the RESULTS.md step-optimization sections; the reference has no equivalent
(its only instrumentation is wall-clock deltas, onofftf/utils.py:4-8).

Usage: python -m zigp_tpu.experiments.profile_step
           [--config flagship|champion|scale] [--inner 100] [--blocks 3]
           [--solve-precision highest|high|mixed] [--keep-trace DIR]
           [--out PATH.json]
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time


def profile_step(
    config: str = "flagship",
    *,
    batch: int | None = None,
    num_inner: int = 100,
    num_blocks: int = 3,
    solve_precision: str | None = None,
    keep_trace: str | None = None,
    out: str | None = None,
    log_fn=print,
) -> dict:
    import jax

    from ..ops import linalg
    from ..utils import xprof
    from . import measure

    if solve_precision:
        linalg.set_solve_precision(solve_precision)
    try:
        step, model, opt_state = measure.prepare_step(
            *measure.build_config(config, batch_override=batch)
        )
        model, opt_state, losses = step(
            model, opt_state, measure.block_key(0), num_inner
        )
        jax.block_until_ready(losses)  # compile excluded from the trace

        logdir = keep_trace or tempfile.mkdtemp(prefix="zigp_trace_")
        jax.profiler.start_trace(logdir)
        t0 = time.time()
        try:
            for b in range(1, num_blocks + 1):
                model, opt_state, losses = step(
                    model, opt_state, measure.block_key(b), num_inner
                )
            jax.block_until_ready(losses)
        finally:
            wall = time.time() - t0
            jax.profiler.stop_trace()
    finally:
        if solve_precision:
            linalg.set_solve_precision("highest")

    steps = num_blocks * num_inner
    summary = xprof.summarize_trace(logdir)
    summary.update(
        config=config,
        batch=batch,
        solve_precision=solve_precision or "highest",
        steps=steps,
        steps_per_sec=round(steps / wall, 1),
        wall_us_per_step=round(1e6 * wall / steps, 2),
        per_step_us=round(summary["total_us"] / steps, 2),
        final_block_loss=float(losses[-1]),
    )
    log_fn(xprof.format_summary(summary, steps))
    log_fn(f"wall: {summary['wall_us_per_step']} µs/step "
           f"({summary['steps_per_sec']} steps/s, incl. dispatch)")
    if not keep_trace:
        shutil.rmtree(logdir, ignore_errors=True)
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
        log_fn(f"wrote {out}")
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", type=str, default="flagship",
                    choices=("flagship", "champion", "scale"))
    ap.add_argument("--batch", type=int, default=None,
                    help="override the config's batch size")
    ap.add_argument("--inner", type=int, default=100)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--solve-precision", type=str, default=None,
                    choices=("highest", "high", "mixed"))
    ap.add_argument("--keep-trace", type=str, default=None,
                    help="keep the raw trace under this dir (default: tmp, deleted)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)
    profile_step(
        args.config,
        batch=args.batch,
        num_inner=args.inner,
        num_blocks=args.blocks,
        solve_precision=args.solve_precision,
        keep_trace=args.keep_trace,
        out=args.out,
    )


if __name__ == "__main__":
    main()
