"""Training observability: scalar/histogram metric logging.

Replaces the reference's TensorBoard plumbing (tf.summary scalars for
kl/var_exp/cost at scripts/onoff.py:289-319, histograms of every latent and
every gradient at :295-303,341-342, FileWriter flush every 200 iters at
:387-388) with a dependency-free JSONL writer: one JSON object per log step,
scalars inline, histograms as percentile summaries. Any dashboard (pandas,
jq) can consume it directly; ``python -m zigp_tpu.utils.tb_export
metrics.jsonl`` converts a run into TensorBoard event files
(utils.tb_export).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


def _summarize_array(a: np.ndarray) -> Dict[str, float]:
    a = np.asarray(a, dtype=np.float64).ravel()
    if a.size == 0:
        return {}
    pct = np.percentile(a, [0, 5, 25, 50, 75, 95, 100])
    return {
        "n": int(a.size),
        "mean": float(a.mean()),
        "std": float(a.std()),
        "p0": float(pct[0]),
        "p5": float(pct[1]),
        "p25": float(pct[2]),
        "p50": float(pct[3]),
        "p75": float(pct[4]),
        "p95": float(pct[5]),
        "p100": float(pct[6]),
    }


class MetricLogger:
    def __init__(self, path: Optional[str] = None, *, also_print: bool = False):
        self.path = path
        self.also_print = also_print
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, step: int, scalars: Optional[Dict[str, Any]] = None,
            histograms: Optional[Dict[str, Any]] = None):
        record: Dict[str, Any] = {"step": int(step), "wall": round(time.time() - self._t0, 3)}
        for k, v in (scalars or {}).items():
            record[k] = float(v)
        for k, v in (histograms or {}).items():
            record[f"hist/{k}"] = _summarize_array(np.asarray(v))
        line = json.dumps(record)
        if self._fh:
            self._fh.write(line + "\n")
        if self.also_print:
            print(line)
        return record

    def log_param_tree(self, step: int, tree, prefix: str = "param"):
        """Histogram-summarize every Parameter leaf (reference: histograms of
        all latents/gradients via Param.variable_summaries)."""
        import jax

        from ..core.parameters import is_parameter

        hists = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            tree, is_leaf=is_parameter
        )[0]:
            name = jax.tree_util.keystr(path)
            arr = leaf.raw if is_parameter(leaf) else leaf
            hists[f"{prefix}{name}"] = np.asarray(arr)
        return self.log(step, histograms=hists)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
