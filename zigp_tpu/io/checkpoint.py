"""Orbax checkpointing of model + optimizer state pytrees.

Replaces the reference's tf.train.Saver / ``modelmanager`` dance
(onofftf/utils.py:61-73) and its rebuild-the-graph-then-restore predict
modules (onofftf/onoffpred.py:16-271): a model here is just a pytree, so
save/restore is structural — no graph reconstruction, no shape bookkeeping.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str, model: Any, opt_state: Optional[Any] = None, step: Optional[int] = None):
    """Save a (model, opt_state) pytree to ``path`` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    payload = {"model": model, "opt_state": opt_state, "step": int(step or 0)}
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    return path


def restore(path: str, like: Any, opt_state_like: Optional[Any] = None) -> Tuple[Any, Any, Optional[int]]:
    """Restore into the structure of ``like`` (and optionally opt state).

    With ``opt_state_like=None`` only the model (and step) are read — a
    partial restore, so checkpoints written by any optimizer (Adam, natgrad)
    can be loaded for prediction without knowing its state structure.
    """
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if opt_state_like is None:
        # Itemless (raw) restore, then re-impose the template's pytree
        # structure. Orbax's partial_restore cannot be used here: it asserts
        # on None leaves, which our model pytrees legitimately contain
        # (optional fields like q_sqrt_factors in the diag family).
        raw = ckptr.restore(path)
        return _fill_like(like, raw["model"]), None, raw.get("step")
    payload = {"model": like, "opt_state": opt_state_like, "step": 0}
    restored = ckptr.restore(path, item=payload)
    return restored["model"], restored.get("opt_state"), restored.get("step")


def _fill_like(like: Any, raw: Any) -> Any:
    """Map a raw (nested dict/list) orbax restore onto the pytree structure
    of ``like``: each template leaf is replaced by the raw value at the same
    tree path. Static (non-pytree) fields keep the template's values; None
    subtrees in the template stay None."""
    from jax import tree_util as jtu

    def lookup(path):
        node = raw
        for p in path:
            if isinstance(p, jtu.DictKey):
                node = node[p.key]
            elif isinstance(p, jtu.GetAttrKey):
                node = node[p.name]
            elif isinstance(p, jtu.SequenceKey):
                node = node[p.idx]
            elif isinstance(p, jtu.FlattenedIndexKey):
                node = node[str(p.key)]
            else:  # pragma: no cover - unknown key kind
                raise TypeError(f"unsupported pytree path entry: {p!r}")
        return node

    return jtu.tree_map_with_path(lambda path, _: lookup(path), like)


class CheckpointManager:
    """Periodic save with resume-from-latest, mirroring the reference's
    every-10k-iters cadence (scripts/onoff.py:390-392)."""

    def __init__(self, directory: str, every: int = 10_000):
        self.directory = os.path.abspath(directory)
        self.every = every
        os.makedirs(self.directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:010d}")

    def maybe_save(self, step: int, model, opt_state=None):
        if self.every and step % self.every == 0:
            return self.save_at(step, model, opt_state)
        return None

    def save_at(self, step: int, model, opt_state=None):
        """Unconditional save at ``step``."""
        jax.block_until_ready(model)
        return save(self._path(step), model, opt_state, step)

    def crossed(self, prev_step: int, step: int) -> bool:
        """True when (prev_step, step] contains a checkpoint boundary — the
        cadence test for loops that advance many steps per host iteration
        (the scanned trainer advances num_inner steps at a time)."""
        return bool(self.every) and (prev_step // self.every) != (step // self.every)

    def latest_step(self) -> Optional[int]:
        if not os.path.isdir(self.directory):
            return None
        steps = [
            int(d.split("_")[1])
            for d in os.listdir(self.directory)
            if d.startswith("step_") and d.split("_")[1].isdigit()
        ]
        return max(steps) if steps else None

    def restore_latest(self, like, opt_state_like=None):
        step = self.latest_step()
        if step is None:
            return None
        model, opt_state, _ = restore(self._path(step), like, opt_state_like)
        return model, opt_state, step
