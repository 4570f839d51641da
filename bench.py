"""Benchmark: zero-inflated on/off GP optimizer steps/sec at the pptr
production config (Kronecker 10×100 inducing grid per GP, minibatch 1000,
Adam, full ELBO + gradients + update per step — the reference's hot loop,
scripts/onoff.py:375-388).

Prints ONE JSON line:
  {"metric": ..., "value": steps/sec on this device, "unit": "steps/s",
   "vs_baseline": speedup vs a same-math dense CPU reference proxy}

The reference publishes no wall-clock numbers (BASELINE.md), so the baseline
is measured here: a numpy float64 re-enactment of the reference's *dense*
per-step linear algebra (dense 1000×1000 Kronecker Cholesky + solves for the
KL of both GPs, dense kron(Kmm⁻¹), dense M×B cross-gram and B×B diag products
for both conditionals — exactly the tensors TF1 materializes per step,
scripts/onoff.py:186-213 + onofftf/main.py:350-387), times a 3× reverse-mode
factor for the backward pass. That proxy *underestimates* the true TF1
feed_dict/session overhead, so vs_baseline is conservative.
"""

import json
import time

import numpy as np


def bench_tpu_steps_per_sec(num_steps: int = 200, batch: int = 1000):
    """Single-dispatch mode: one host→device round-trip per optimizer step
    (the reference's execution model)."""
    import jax

    from __graft_entry__ import _batch, _flagship
    from zigp_tpu.training import make_optimizer, make_train_step

    model = _flagship()
    optimizer = make_optimizer(model, default_lr=1e-3)
    opt_state = optimizer.init(model)
    step = make_train_step(optimizer)

    X, Y = _batch(batch)
    # warmup/compile
    model, opt_state, loss = step(model, opt_state, X, Y)
    jax.block_until_ready(loss)

    # median of 3 timed passes: dispatch latency through the TPU tunnel
    # varies run to run (measured ±9 % round over round), and a single pass
    # inherits whatever the tunnel was doing that minute
    rates = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(num_steps):
            model, opt_state, loss = step(model, opt_state, X, Y)
        jax.block_until_ready(loss)
        rates.append(num_steps / (time.time() - t0))
    return sorted(rates)[1], float(loss)


def bench_tpu_scanned_steps_per_sec(num_inner: int = 100, num_blocks: int = 10, batch: int = 1000):
    """Production mode: lax.scan runs num_inner optimizer steps per dispatch
    over a staged (K, B, D) minibatch block (zigp_tpu.training.scan)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _batch, _flagship
    from zigp_tpu.training import make_optimizer, make_scan_train_step

    model = _flagship()
    optimizer = make_optimizer(model, default_lr=1e-3)
    opt_state = optimizer.init(model)
    step = make_scan_train_step(optimizer)

    blocks = []
    for b in range(num_blocks):
        xs, ys = zip(*[_batch(batch, seed=b * num_inner + i) for i in range(num_inner)])
        blocks.append((jnp.stack(xs), jnp.stack(ys)))

    model, opt_state, losses = step(model, opt_state, *blocks[0])  # compile
    jax.block_until_ready(losses)

    # median of 3 timed passes over the same staged blocks (tunnel dispatch
    # jitter is the dominant run-to-run variance; see the single-dispatch
    # bench for the same pattern). Training continues across passes — only
    # the timing window repeats.
    #
    # Loss reporting: the quoted final_loss is the end of pass 0 (1,100
    # optimizer steps), the point the single-pass round-1/2 benches reported —
    # comparable across rounds. The synthetic bench targets are pure noise
    # (Y = max(randn,0), 90 % zeroed, random X), so training *past* that point
    # cycles the same noise batches until the likelihood variance collapses
    # and the ELBO goes stiff: around step ~2,400 the loss spikes several
    # orders of magnitude before recovering (deterministic, finite
    # throughout). That is a fit-the-noise artifact of the synthetic data,
    # not a step-math defect — real-data runs at this lr train 50k+ steps
    # monotonically (RESULTS.md CV tables) — and it does not affect timing
    # (identical ops per step). Both losses are emitted for transparency.
    rates = []
    first_pass_loss = None
    for _ in range(3):
        t0 = time.time()
        for Xs, Ys in blocks:
            model, opt_state, losses = step(model, opt_state, Xs, Ys)
        jax.block_until_ready(losses)
        rates.append(num_blocks * num_inner / (time.time() - t0))
        if first_pass_loss is None:
            first_pass_loss = float(losses[-1])
    return sorted(rates)[1], first_pass_loss, float(losses[-1])


def bench_tpu_alternating_steps_per_sec(
    num_inner: int = 100, num_blocks: int = 60, batch: int = 1000
):
    """Block-coordinate production mode (training.alternating, the CLI's
    ``--hyper-every 50 --sampler device``): hypers update once per 50 steps,
    the q-only steps between run with the factorization hoisted out of the
    scan. Reported alongside the joint number — `value` stays the joint
    scanned rate for round-over-round comparability; quality profile of the
    schedule is in RESULTS.md ("Block-coordinate training")."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _batch, _flagship
    from zigp_tpu.training import make_alternating_device_step

    model = _flagship()
    X, Y = _batch(100_000, seed=0)  # device-resident synthetic training set
    step, opt_state = make_alternating_device_step(
        model, jnp.asarray(X), jnp.asarray(Y), batch,
        hyper_every=50, learning_rate=1e-3,
    )

    def key(b):
        return jnp.asarray(np.array([0, b], dtype=np.uint32))

    model, opt_state, losses = step(model, opt_state, key(0), num_inner)
    jax.block_until_ready(losses)
    rates = []
    b = 1
    for _ in range(3):
        t0 = time.time()
        for _ in range(num_blocks):
            model, opt_state, losses = step(model, opt_state, key(b), num_inner)
            b += 1
        jax.block_until_ready(losses)
        rates.append(num_blocks * num_inner / (time.time() - t0))
    return sorted(rates)[1], float(losses[-1])


def bench_reference_proxy_steps_per_sec(num_steps: int = 3, batch: int = 1000):
    """Dense numpy re-enactment of the reference's per-step forward algebra."""
    Ms, Mt, M, B = 10, 100, 1000, batch
    rng = np.random.RandomState(0)
    Zs = rng.rand(Ms, 2)
    Zt = np.linspace(0, 1, Mt)[:, None]
    Xb = rng.rand(B, 3)
    q_mu = rng.randn(M, 1) * 0.1
    q_sqrt = np.ones((M, 1))

    def se(A, C, ell, var):
        A = A / ell
        C = C / ell
        d = -2 * A @ C.T + (A**2).sum(1)[:, None] + (C**2).sum(1)[None, :]
        return var * np.exp(-d / 2)

    def forward():
        total = 0.0
        for _gp in range(2):  # f and g
            Ks = se(Zs, Zs, 8.0, 20.0) + 1e-5 * np.eye(Ms)
            Kt = se(Zt, Zt, 0.005, 20.0) + 1e-5 * np.eye(Mt)
            # KL: dense kron cholesky + solves (GaussKLkron)
            Lp = np.kron(np.linalg.cholesky(Ks), np.linalg.cholesky(Kt))
            alpha = np.linalg.solve(Lp, q_mu)
            Lp_inv = np.linalg.solve(Lp, np.eye(M))
            K_inv = np.linalg.solve(Lp.T, Lp_inv)
            total += (
                np.sum(alpha**2)
                + np.sum(np.diag(K_inv)[:, None] * q_sqrt**2)
                + np.sum(np.log(np.diag(Lp) ** 2))
            )
            # conditional: dense kron(Kmm_inv), M×B cross-gram, B×B diag products
            Kmm_inv = np.kron(np.linalg.inv(Ks), np.linalg.inv(Kt))
            al = Kmm_inv @ q_mu
            Kmn = (
                se(Zs, Xb[:, :2], 8.0, 20.0)[:, None, :]
                * se(Zt, Xb[:, 2:], 0.005, 20.0)[None, :, :]
            ).reshape(M, B)
            A = Kmm_inv @ Kmn
            mu = Kmn.T @ al
            S = q_sqrt[:, 0] ** 2
            var = 20.0 * 20.0 - np.diag(Kmn.T @ A - (A * S[:, None]).T @ A)
            total += float(mu.sum() + var.sum())
        return total

    forward()  # warmup numpy/BLAS
    times = []
    for _ in range(num_steps):
        t0 = time.time()
        forward()
        times.append(time.time() - t0)
    fwd = sorted(times)[len(times) // 2]  # median: host CPU contention jitter
    # reverse-mode AD of this graph costs ~2× forward on top (TF1 measured
    # convention); total per train step ≈ 3× forward.
    return 1.0 / (3.0 * fwd)


def main():
    single_sps, single_loss = bench_tpu_steps_per_sec()
    scan_sps, scan_loss, scan_loss_3100 = bench_tpu_scanned_steps_per_sec()
    alt_sps, alt_loss = bench_tpu_alternating_steps_per_sec()
    ref_sps = bench_reference_proxy_steps_per_sec()
    import jax

    result = {
        "metric": "onoff_pptr_train_steps_per_sec",
        "value": round(scan_sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(scan_sps / ref_sps, 2),
        "single_dispatch_steps_per_sec": round(single_sps, 3),
        # the block-coordinate schedule (--hyper-every 50): same config,
        # hypers once per 50 steps — see RESULTS.md for its quality profile
        "alternating_steps_per_sec": round(alt_sps, 3),
        "baseline_proxy_steps_per_sec": round(ref_sps, 3),
        "device": str(jax.devices()[0]),
        # 1,100-step loss: the round-comparable training-works check (see the
        # synthetic-noise note in bench_tpu_scanned_steps_per_sec)
        "final_loss": scan_loss if np.isfinite(scan_loss) else single_loss,
        "loss_after_3100_steps": scan_loss_3100,
        "losses_finite": bool(
            np.isfinite(single_loss)
            and np.isfinite(scan_loss)
            and np.isfinite(scan_loss_3100)
            and np.isfinite(alt_loss)
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
