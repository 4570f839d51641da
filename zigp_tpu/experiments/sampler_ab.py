"""Interleaved A/B of the device-sampler gather strategies on real hardware.

Round 3's step trace (profile_step at the champion 32x200 B=4000 config)
attributed ~60 us/step to async slice copies: the per-step
`Xtrain[randint(key, (B,))]` gather re-stages rows of the HBM-resident
training set into scoped memory on every scan iteration. The shipped
device sampler (training/scan.make_device_sampling_scan_step) therefore
draws the WHOLE dispatch's minibatches with one randint + one gather and
scans over the staged (K, B, .) block.

This harness keeps the superseded per-step-gather variant inline (it no
longer exists in the library) and interleaves it with the shipped staged
variant within one process, one round-robin pass per repeat, so tunnel
variance hits both equally — the repo's measurement convention for small
deltas.

Note the two variants draw different (equally valid) iid-uniform index
streams: staged uses randint(block_key, (K*B,)) where per-step splits
block_key into K per-step keys. Loss columns are therefore not comparable
bit-for-bit between variants, only within one.

Usage: python -m zigp_tpu.experiments.sampler_ab
           [--configs flagship,champion,scale] [--blocks 8] [--inner 100]
           [--repeats 3] [--out PATH]
"""

from __future__ import annotations

import argparse
import functools

from . import measure


def _make_perstep_gather_step(optimizer, Xtrain, Ytrain, batch_size, *, unroll=8):
    """The superseded round-2/3 device sampler: one gather per scan step."""
    import jax
    import jax.numpy as jnp
    import optax

    Xtrain = jnp.asarray(Xtrain)
    Ytrain = jnp.asarray(Ytrain)
    N = Xtrain.shape[0]

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=(3,))
    def step(model, opt_state, block_key, num_inner):
        keys = jax.random.split(block_key, num_inner)

        def body(carry, key):
            model, opt_state = carry
            idx = jax.random.randint(key, (batch_size,), 0, N)
            X, Y = Xtrain[idx], Ytrain[idx]
            loss, grads = jax.value_and_grad(lambda m: m.loss(X, Y))(model)
            updates, opt_state = optimizer.update(grads, opt_state, model)
            model = optax.apply_updates(model, updates)
            return (model, opt_state), loss

        (model, opt_state), losses = jax.lax.scan(
            body, (model, opt_state), keys, unroll=unroll
        )
        return model, opt_state, losses

    return step


def _make_fused_gather_step(optimizer, Xtrain, Ytrain, batch_size, *, unroll=8):
    """Staged variant with X and Y drawn in ONE gather: the flagship trace
    shows the staged (N, 1) target gather lowering to its own poorly-tiled
    1-D gather fusion (~6.6 us/step amortized, f32[K*B]{0:T(1024)}) beside
    X's 2-D gather — concatenating [X|Y] to (N, D+P) folds both into one
    2-D gather, and the downstream [..., :D] / [..., D:] slices fuse into
    their consumers. Same index stream and exact same values as 'staged'
    (concat/slice are exact), so losses must agree bit-for-bit with it.

    MEASURED NEUTRAL (kept as the record): interleaved ×3 at the flagship,
    staged 6886/7429/6789 vs fused 6847/7614/6886 steps/s — equal medians,
    bit-identical losses. The separate Y gather's ~6.6 us/step is already
    overlapped with the scan's compute, so folding it away buys nothing;
    'staged' stays the production sampler."""
    import jax
    import jax.numpy as jnp
    import optax

    Xtrain = jnp.asarray(Xtrain)
    Ytrain = jnp.asarray(Ytrain)
    N, D = Xtrain.shape
    XY = jnp.concatenate([Xtrain, Ytrain], axis=1)

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=(3,))
    def step(model, opt_state, block_key, num_inner):
        idx = jax.random.randint(block_key, (num_inner * batch_size,), 0, N)
        G = XY[idx].reshape(num_inner, batch_size, XY.shape[1])
        Xs, Ys = G[..., :D], G[..., D:]

        def body(carry, xy):
            model, opt_state = carry
            X, Y = xy
            loss, grads = jax.value_and_grad(lambda m: m.loss(X, Y))(model)
            updates, opt_state = optimizer.update(grads, opt_state, model)
            model = optax.apply_updates(model, updates)
            return (model, opt_state), loss

        (model, opt_state), losses = jax.lax.scan(
            body, (model, opt_state), (Xs, Ys), unroll=unroll
        )
        return model, opt_state, losses

    return step


_FACTORIES = {
    "staged": None,  # the shipped production sampler (measure.prepare_step default)
    "perstep": _make_perstep_gather_step,
    "fused": _make_fused_gather_step,
}


def run_sampler_ab(
    configs=("flagship", "champion"),
    variants=("perstep", "staged"),
    num_inner: int = 100,
    num_blocks: int = 8,
    repeats: int = 3,
    out: str | None = None,
    log_fn=print,
):
    def measure_one(built, variant, *, num_inner, num_blocks):
        if variant not in _FACTORIES:
            raise ValueError(f"unknown variant {variant!r}")
        step, model, opt_state = measure.prepare_step(
            *built, step_factory=_FACTORIES[variant]
        )
        return measure.measure_rate(
            step, model, opt_state, num_inner=num_inner, num_blocks=num_blocks
        )

    return measure.run_round_robin(
        "interleaved device-sampler gather A/B "
        "(staged block vs per-step gather vs fused [X|Y] gather)",
        configs, variants, measure_one,
        num_inner=num_inner, num_blocks=num_blocks, repeats=repeats,
        out=out, log_fn=log_fn,
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--configs", type=str, default="flagship,champion")
    ap.add_argument("--variants", type=str, default="perstep,staged")
    ap.add_argument("--inner", type=int, default=100)
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)
    run_sampler_ab(
        configs=tuple(args.configs.split(",")),
        variants=tuple(args.variants.split(",")),
        num_inner=args.inner,
        num_blocks=args.blocks,
        repeats=args.repeats,
        out=args.out,
    )


if __name__ == "__main__":
    main()
