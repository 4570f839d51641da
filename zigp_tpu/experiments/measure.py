"""Shared measurement scaffold for the experiment harnesses.

ONE copy of the repo's timing convention — used by ``precision_ab``,
``sampler_ab``, and ``profile_step`` so a correction to the convention
cannot silently diverge their measurements:

- train on a FRESH model/opt_state copy (the scanned steps donate their
  buffers, so the caller's built model must survive round-robin passes);
- exclude compile by one untimed warmup dispatch;
- per-block PRNG keys ``[0, b]`` (the deterministic device-sampler stream);
- interleaved round-robin over variants within one process, median of
  repeats (only same-session interleaved A/Bs are trusted for small
  deltas — tunnel variance hits every variant equally).

The reference has no measurement tooling beyond wall-clock deltas
(onofftf/utils.py:4-8); this module is the harness behind the RESULTS.md
A/B tables.
"""

from __future__ import annotations

import json
import time

import numpy as np


def analytic_matmul_flops(batch: int, num_spatial: int, num_temporal: int) -> float:
    """Logical matmul FLOPs per train step of the paired-GP factored
    conditional (fwd+bwd), the denominator-side of honest MFU accounting (used by bench.py and scale_utilization).

    Per GP forward: V_p = L_p⁻¹Kmn_p and A_p = K_p⁻¹Kmn_p at 2·M_p²·B each
    (both factors), plus the first-stage mean/c2 contractions at 2·Ms·Mt·B
    each; reverse-mode doubles every matmul (dA = dC·Bᵀ, dB = Aᵀ·dC), so
    total = 3× forward. Two GPs (f and g). Elementwise work (gram exps,
    probit, Adam) is excluded — conservative.

    Round-5 calibration (RESULTS.md "scale tier decomposition"): XLA
    ``cost_analysis`` under-reports this model's logical FLOPs ~5× at the
    scale shapes, which is what made BENCH_r04's scale MFU read 10-12%;
    microbenched per-op rates put the dominant (250-class, HIGHEST) einsums
    at 31.2 TF/s logical = 95% of the 6-pass effective peak, i.e. the step
    is compute-bound under this accounting, not 12%-idle."""
    Ms, Mt, B = num_spatial, num_temporal, batch
    fwd_per_gp = 4 * B * (Ms * Ms + Mt * Mt) + 4 * B * Ms * Mt
    return 3.0 * 2.0 * fwd_per_gp


def build_config(config: str, *, batch_override: int | None = None):
    """(model, (X, Y) train arrays, batch_size, cfg) for a named bench config.

    - ``flagship``: onoff 10x100, B=1000 (the bench.py configuration);
    - ``champion``: onoff 32x200 kron-cov whitened, B=4000 (quality headline);
    - ``scale``: onoff 105x250, B=1000 (26k-inducing scale tier).
    ``batch_override`` overrides the config's batch size (the large-batch
    scale sweeps: 8192-32768).
    """
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
    return model, (split.Xtrain, split.Ytrain), int(batch_override) if batch_override else batch, cfg


def prepare_step(model, arrays, batch, cfg, step_factory=None):
    """Donation-safe (step, model, opt_state) for a scanned-trainer run.

    ``step_factory(optimizer, X, Y, batch_size)`` defaults to the production
    device sampler (``training.scan.make_device_sampling_scan_step``); the
    A/B harnesses pass their variant factories.
    """
    import jax
    import jax.numpy as jnp

    from ..training.optim import make_optimizer
    from ..training.scan import make_device_sampling_scan_step

    X, Y = (jnp.asarray(np.asarray(a)) for a in arrays)
    model = jax.tree_util.tree_map(jnp.array, model)
    optimizer = make_optimizer(model, default_lr=cfg.indp_lr)
    opt_state = optimizer.init(model)
    factory = step_factory or make_device_sampling_scan_step
    step = factory(optimizer, X, Y, batch)
    return step, model, opt_state


def block_key(b: int):
    """The deterministic per-block PRNG key of the measurement convention."""
    import jax.numpy as jnp

    return jnp.asarray(np.array([0, b], dtype=np.uint32))


def measure_rate(step, model, opt_state, *, num_inner: int, num_blocks: int):
    """(steps/s, final-block loss): one untimed warmup dispatch (compile
    excluded), then ``num_blocks`` timed dispatches of ``num_inner`` steps."""
    import jax

    model, opt_state, losses = step(model, opt_state, block_key(0), num_inner)
    jax.block_until_ready(losses)
    t0 = time.time()
    for b in range(1, num_blocks + 1):
        model, opt_state, losses = step(model, opt_state, block_key(b), num_inner)
    jax.block_until_ready(losses)
    rate = num_blocks * num_inner / (time.time() - t0)
    return rate, float(losses[-1])


def run_round_robin(
    task: str,
    configs,
    variants,
    measure_one,
    *,
    num_inner: int,
    num_blocks: int,
    repeats: int,
    out: str | None = None,
    log_fn=print,
):
    """Interleaved round-robin A/B: for each config, ``repeats`` passes of
    every variant in turn, median summary, optional JSON artifact.

    ``measure_one(built, variant, num_inner=, num_blocks=)`` returns
    (steps/s, final-block loss) for one freshly traced run.
    """
    results = {c: {v: [] for v in variants} for c in configs}
    losses = {c: {v: [] for v in variants} for c in configs}  # every repeat kept
    for config in configs:
        log_fn(f"== {config} ==")
        built = build_config(config)
        for r in range(repeats):
            for variant in variants:  # interleaved round-robin
                rate, last = measure_one(
                    built, variant, num_inner=num_inner, num_blocks=num_blocks
                )
                results[config][variant].append(round(rate, 1))
                losses[config][variant].append(last)
                log_fn(f"  {variant:>8s} pass {r}: {rate:8.1f} steps/s "
                       f"(loss {last:.1f})")

    summary = {
        "task": task,
        "num_inner": num_inner,
        "num_blocks": num_blocks,
        "steps_per_sec_median": {
            c: {v: sorted(vals)[len(vals) // 2] for v, vals in d.items() if vals}
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
