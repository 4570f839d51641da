"""Interleaved A/B: joint training vs the block-coordinate schedule.

Same measurement conventions as the other harnesses (experiments.measure):
fresh model copies, one untimed warmup dispatch, interleaved round-robin,
medians. Variants: ``joint`` (the production device-sampler scanned step)
and ``alt<K>`` (training.alternating with hyper_every=K — hypers update
once per K steps, factorization-free q-steps between).

    python -m zigp_tpu.experiments.alternating_ab [--configs flagship,scale]
        [--variants joint,alt10,alt50] [--out results/alternating_ab.json]

Note the variants run different update schedules, so their losses are not
comparable step-for-step — quality is gated separately (fold-1/CV probes in
RESULTS.md); this harness measures throughput only.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from .measure import build_config, measure_rate, run_round_robin


def _prepare(built, variant):
    from ..training.alternating import make_alternating_device_step
    from ..training.optim import make_optimizer
    from ..training.scan import make_device_sampling_scan_step

    model, arrays, batch, cfg = built
    X, Y = (jnp.asarray(np.asarray(a)) for a in arrays)
    model = jax.tree_util.tree_map(jnp.array, model)
    if variant == "joint":
        optimizer = make_optimizer(model, default_lr=cfg.indp_lr)
        step = make_device_sampling_scan_step(optimizer, X, Y, batch)
        return step, model, optimizer.init(model)
    assert variant.startswith("alt"), variant
    k = int(variant[3:])
    step, opt_state0 = make_alternating_device_step(
        model, X, Y, batch, hyper_every=k, learning_rate=cfg.indp_lr
    )
    return step, model, opt_state0


def _measure_one(built, variant, *, num_inner, num_blocks):
    step, model, opt_state = _prepare(built, variant)
    return measure_rate(
        step, model, opt_state, num_inner=num_inner, num_blocks=num_blocks
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str, default="flagship,scale")
    ap.add_argument("--variants", type=str, default="joint,alt10,alt50")
    ap.add_argument("--num-inner", type=int, default=100, dest="num_inner")
    ap.add_argument("--num-blocks", type=int, default=100, dest="num_blocks")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)
    run_round_robin(
        "alternating_ab",
        [c.strip() for c in args.configs.split(",") if c.strip()],
        [v.strip() for v in args.variants.split(",") if v.strip()],
        _measure_one,
        num_inner=args.num_inner,
        num_blocks=args.num_blocks,
        repeats=args.repeats,
        out=args.out,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
