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

from . import measure


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

    def measure_one(built, policy, *, num_inner, num_blocks):
        # precision is captured at trace time: set the policy, then trace a
        # fresh step for this pass
        linalg.set_solve_precision(policy)
        step, model, opt_state = measure.prepare_step(*built)
        return measure.measure_rate(
            step, model, opt_state, num_inner=num_inner, num_blocks=num_blocks
        )

    try:
        return measure.run_round_robin(
            "interleaved solve-precision A/B (see ops.linalg.set_solve_precision)",
            configs, policies, measure_one,
            num_inner=num_inner, num_blocks=num_blocks, repeats=repeats,
            out=out, log_fn=log_fn,
        )
    finally:
        linalg.set_solve_precision("highest")


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
