"""Optimizers with per-parameter learning-rate groups.

Re-design of the reference's optimizer block (scripts/onoff.py:325-350): TF
variables are grouped by ``var._learning_rate`` and one AdamOptimizer is built
per group. Adam is elementwise, so per-group Adam ≡ one masked multi-transform
with a separate learning rate per label — which is what optax gives us.
Non-trainable Parameters map to the reserved "frozen" label (zero updates),
replacing the reference's ``fixed -> tf.constant`` trick (onofftf/main.py:157).
"""

from __future__ import annotations

from typing import Callable

import optax

from ..core.parameters import collect_lrs, lr_labels


def cosine_adam(total_steps: int, *, warmup: int = 0, final_scale: float = 0.01):
    """opt_factory: Adam with (optional warmup +) cosine decay to
    final_scale·lr over total_steps."""

    def factory(lr: float) -> optax.GradientTransformation:
        if warmup:
            sched = optax.warmup_cosine_decay_schedule(
                0.0, lr, warmup, total_steps, end_value=lr * final_scale
            )
        else:
            sched = optax.cosine_decay_schedule(lr, total_steps, alpha=final_scale)
        return optax.adam(sched)

    return factory


def make_optimizer(
    model,
    *,
    default_lr: float = 1e-3,
    opt_factory: Callable[[float], optax.GradientTransformation] = optax.adam,
    zero_nans: bool = True,
) -> optax.GradientTransformation:
    """Per-lr-group optimizer over a model pytree of Parameters.

    ``zero_nans``: drop non-finite gradient components instead of poisoning
    the parameters — a float32-TPU safety net (a transient NaN gradient, e.g.
    from a marginally-PD Cholesky, costs one masked update instead of the
    whole run). Parity-irrelevant: all-finite gradients pass through exactly.
    """
    groups = collect_lrs(model, default_lr)
    transforms = {label: opt_factory(lr) for label, lr in groups.items()}
    transforms["frozen"] = optax.set_to_zero()
    labels = lr_labels(model)
    tx = optax.multi_transform(transforms, labels)
    if zero_nans:
        tx = optax.chain(optax.zero_nans(), tx)
    return tx


def adam_per_group(model, default_lr: float = 1e-3) -> optax.GradientTransformation:
    return make_optimizer(model, default_lr=default_lr, opt_factory=optax.adam)
