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


def make_optimizer(
    model,
    *,
    default_lr: float = 1e-3,
    opt_factory: Callable[[float], optax.GradientTransformation] = optax.adam,
) -> optax.GradientTransformation:
    """Per-lr-group optimizer over a model pytree of Parameters."""
    groups = collect_lrs(model, default_lr)
    transforms = {label: opt_factory(lr) for label, lr in groups.items()}
    transforms["frozen"] = optax.set_to_zero()
    labels = lr_labels(model)
    return optax.multi_transform(transforms, labels)


def adam_per_group(model, default_lr: float = 1e-3) -> optax.GradientTransformation:
    return make_optimizer(model, default_lr=default_lr, opt_factory=optax.adam)
