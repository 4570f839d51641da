"""Parameter pytree: the TPU-native replacement for gpflow ``Param`` and the
reference's Param/Variable plumbing (onofftf/main.py:15-30,137-184).

Design: a ``Parameter`` is a flax-struct pytree whose single leaf is the
*unconstrained* array (``raw``). The bijector, trainable flag, and per-param
learning-rate group ride along as static metadata. Models are themselves
flax-struct pytrees of Parameters, so the whole model flows through
``jax.jit`` / ``jax.grad`` / optax untouched — no graph/session dance, no
variable collections.

Per-variable learning rates (the reference groups TF variables by
``var._learning_rate`` and builds one AdamOptimizer per group,
scripts/onoff.py:325-350) become optax ``multi_transform`` labels derived from
``Parameter.lr`` — see zigp_tpu.training.optim.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import bijectors
from .config import default_float


@struct.dataclass
class Parameter:
    raw: jnp.ndarray
    bijector: bijectors.Bijector = struct.field(pytree_node=False, default=bijectors.identity)
    trainable: bool = struct.field(pytree_node=False, default=True)
    lr: Optional[float] = struct.field(pytree_node=False, default=None)

    @property
    def value(self) -> jnp.ndarray:
        return self.bijector.forward(self.raw)

    @property
    def shape(self):
        return self.raw.shape

    def replace_value(self, value) -> "Parameter":
        return self.replace(raw=jnp.asarray(self.bijector.inverse(value), dtype=self.raw.dtype))


def param(
    value: Any,
    bijector: Optional[bijectors.Bijector] = None,
    *,
    trainable: bool = True,
    lr: Optional[float] = None,
    dtype=None,
) -> Parameter:
    """Create a Parameter from a *constrained* value (like gpflow Param)."""
    bijector = bijector or bijectors.identity
    dtype = dtype or default_float()
    raw = np.asarray(bijector.inverse(np.asarray(value, dtype=np.float64)), dtype=dtype)
    return Parameter(raw=jnp.asarray(raw), bijector=bijector, trainable=trainable, lr=lr)


def positive_param(value, **kw) -> Parameter:
    return param(value, bijectors.positive, **kw)


def is_parameter(x) -> bool:
    return isinstance(x, Parameter)


def constrained(tree):
    """Map a pytree of Parameters (and raw arrays) to constrained values."""
    return jax.tree_util.tree_map(
        lambda p: p.value if is_parameter(p) else p, tree, is_leaf=is_parameter
    )


def lr_labels(tree, default_label: str = "default"):
    """Pytree of string labels for optax.multi_transform.

    Non-trainable Parameters map to the reserved label "frozen". Parameters
    with an explicit lr map to "lr:<value>"; everything else to
    ``default_label``.
    """

    def label(p):
        if is_parameter(p):
            if not p.trainable:
                lbl = "frozen"
            elif p.lr is not None:
                lbl = f"lr:{p.lr:g}"
            else:
                lbl = default_label
            # every leaf of this Parameter (just `raw`) gets the label
            return jax.tree_util.tree_map(lambda _: lbl, p)
        return jax.tree_util.tree_map(lambda _: default_label, p)

    return jax.tree_util.tree_map(label, tree, is_leaf=is_parameter)


def collect_lrs(tree, default_lr: float):
    """Set of (label, lr) pairs present in the tree."""
    groups = {"default": default_lr}
    for leaf in jax.tree_util.tree_leaves(tree, is_leaf=is_parameter):
        if is_parameter(leaf) and leaf.trainable and leaf.lr is not None:
            groups[f"lr:{leaf.lr:g}"] = leaf.lr
    return groups


def hyperparam_summary(tree, *, max_size: int = 8):
    """{path: constrained value} for every small trainable Parameter — the
    learned kernel lengthscales/variances and likelihood noise, excluding the
    variational/inducing arrays. The reference logs exactly these at run
    completion (scripts/onoff.py:437-446); runners emit one line per entry.
    """
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=is_parameter
    )[0]:
        if not (is_parameter(leaf) and leaf.trainable):
            continue
        if int(np.prod(leaf.shape) or 1) > max_size:
            continue
        name = jax.tree_util.keystr(path).replace(".raw", "").strip(".")
        out[name] = np.asarray(leaf.value)
    return out
