"""Ahead-of-time model export for serving (jax.export → StableHLO artifact).

TPU-native replacement for the reference's serving story. The reference's
predict modules rebuild the entire TF1 graph in-process and ``Saver.restore``
it (onofftf/onoffpred.py:15-106, svgppred.py:15, svcppred.py:15) — serving
there needs the model-building code, the checkpoint directory, and a live TF
session. Here the trained model's predict function is lowered ONCE to
StableHLO with the learned parameters baked in as constants and serialized to
a single portable file. Loading needs jax only — no zigp_tpu model code, no
checkpoint, no graph rebuild — and the batch dimension is exported
symbolically, so one artifact serves any request size.

Artifact layout: one file, a single JSON metadata line (kind, input width,
export platforms, jax version) followed by ``\\n`` and the raw
``jax.export.Exported.serialize()`` bytes.

Notes
-----
- The artifact is lowered for the platform(s) requested at export time
  (default: the exporting process's backend). An artifact exported on TPU
  embeds the TPU lowering — including the Pallas ``chol_inv`` custom calls
  the dispatcher picks there — and will not run on CPU; pass
  ``platforms=("cpu",)`` from a CPU process to build a CPU-serving artifact.
- Parameters are constants in the artifact: re-export after further training.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = "zigp-export-v1"


def _predict_dict_fn(model, kind: str) -> Callable:
    """A predict function returning a plain dict of arrays (no custom pytree
    types, so deserialization needs no registrations)."""
    if kind == "onoff":

        def fn(X):
            return dict(model.predict(X)._asdict())

    elif kind == "svgp":

        def fn(X):
            mean, var = model.predict_f(X)
            return {"fmean": mean, "fvar": var}

    elif kind == "classifier":

        def fn(X):
            mean, var = model.predict_f(X)
            return {"fmean": mean, "fvar": var, "p": model.predict_prob(X)}

    elif kind == "hurdlej":

        def fn(X):
            return dict(model.predict(X)._asdict())

    else:
        raise ValueError(
            f"unknown export kind {kind!r} (onoff|svgp|classifier|hurdlej)"
        )
    return fn


def export_predictor(
    model,
    kind: str,
    d_in: int,
    path: str,
    *,
    batch_size: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    dtype=None,
) -> str:
    """Serialize ``model``'s predict function to a standalone artifact.

    ``batch_size=None`` (default) exports a symbolic batch dimension — the
    loaded predictor accepts any number of rows. A fixed ``batch_size`` pins
    the shape (marginally cheaper to compile at load time).
    Returns ``path``.
    """
    from jax import export as jexport

    fn = _predict_dict_fn(model, kind)
    if dtype is None:
        # match the model's parameter dtype (f32 on TPU, f64 in CPU-x64 mode)
        leaf = jax.tree_util.tree_leaves(model)[0]
        dtype = leaf.dtype if hasattr(leaf, "dtype") else jnp.float32
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, d_in), dtype)
    else:
        spec = jax.ShapeDtypeStruct((int(batch_size), d_in), dtype)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    exported = jexport.export(jax.jit(fn), **kwargs)(spec)
    blob = exported.serialize()

    meta = {
        "magic": _MAGIC,
        "kind": kind,
        "d_in": int(d_in),
        "batch_size": batch_size,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "outputs": sorted(fn(jnp.zeros((2, d_in), dtype)).keys()),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(json.dumps(meta).encode("utf-8"))
        f.write(b"\n")
        f.write(bytes(blob))
    return path


class ServedPredictor:
    """A deserialized export artifact: ``pred(X) -> dict[str, np.ndarray]``."""

    def __init__(self, exported, meta: Dict):
        self._exported = exported
        self.meta = meta

    def __call__(self, X, *, as_numpy: bool = True) -> Dict[str, np.ndarray]:
        """Serve one request. ``as_numpy=False`` returns device arrays
        without syncing — bulk callers can pipeline chunk dispatches and
        fetch everything in one ``jax.device_get`` (the same transfer
        scheduling that makes ``predict_batched`` fast)."""
        X = jnp.asarray(X)
        if X.ndim != 2 or X.shape[1] != self.meta["d_in"]:
            raise ValueError(
                f"expected (n, {self.meta['d_in']}) input, got {X.shape}"
            )
        b = self.meta.get("batch_size")
        if b is not None and X.shape[0] != b:
            raise ValueError(
                f"artifact was exported with fixed batch {b}, got {X.shape[0]} "
                "rows (re-export with batch_size=None for a symbolic batch)"
            )
        out = self._exported.call(X)
        if not as_numpy:
            return out
        return {k: np.asarray(v) for k, v in out.items()}


def load_predictor(path: str) -> ServedPredictor:
    """Load an artifact written by :func:`export_predictor`."""
    from jax import export as jexport

    with open(path, "rb") as f:
        raw = f.read()
    head, _, blob = raw.partition(b"\n")
    try:
        meta = json.loads(head.decode("utf-8"))
    except Exception as e:  # noqa: BLE001 — uniform bad-file error below
        raise ValueError(f"{path} is not a zigp export artifact: {e}") from None
    if meta.get("magic") != _MAGIC:
        raise ValueError(f"{path} is not a zigp export artifact")
    return ServedPredictor(jexport.deserialize(bytearray(blob)), meta)
