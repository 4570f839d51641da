"""Dataset loading, CV-split generation, and pptr preprocessing.

Replaces the reference's data plumbing: ``data/toydata.mat`` loading (notebook
cell 3), ``data/pptr.pickle``, ``scripts/create_cvsplits.py`` (5-fold KFold
with random_state=1234 over concatenated train+test, time column ÷1000), and
``onofftf/utils_pptr.py`` (time filter, min-max scaling, heuristic kernel
init).
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

DEFAULT_DATA_DIR = os.environ.get("ZIGP_DATA_DIR", "/root/reference/data")


@dataclass
class Split:
    Xtrain: np.ndarray
    Ytrain: np.ndarray
    Xtest: np.ndarray
    Ytest: np.ndarray


def load_toydata(path: Optional[str] = None) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(x, y, f) each (450, 1) float64 from the toy 1-D on/off dataset."""
    from scipy.io import loadmat

    path = path or os.path.join(DEFAULT_DATA_DIR, "toydata.mat")
    m = loadmat(path)
    return m["x"], m["y"], m["f"]


def load_pptr(path: Optional[str] = None) -> Split:
    """Finnish precipitation: Xtrain (105280, 3)=[lat,lon,ndatehour]."""
    path = path or os.path.join(DEFAULT_DATA_DIR, "pptr.pickle")
    with open(path, "rb") as f:
        d = pickle.load(f)
    return Split(d["Xtrain"], d["Ytrain"], d["Xtest"], d["Ytest"])


def make_cv_splits(
    data: Split, n_splits: int = 5, seed: int = 1234, time_scale: float = 1000.0
) -> List[Split]:
    """5-fold CV over concatenated train+test with the time column rescaled,
    matching scripts/create_cvsplits.py:14-34 (KFold shuffle, random_state)."""
    from sklearn.model_selection import KFold

    Xraw = np.concatenate([data.Xtrain, data.Xtest])
    Yraw = np.concatenate([data.Ytrain, data.Ytest])
    Xraw = Xraw.copy()
    Xraw[:, 2] = Xraw[:, 2] / time_scale

    kf = KFold(n_splits=n_splits, random_state=seed, shuffle=True)
    splits = []
    for train_index, test_index in kf.split(Xraw):
        splits.append(
            Split(Xraw[train_index], Yraw[train_index], Xraw[test_index], Yraw[test_index])
        )
    return splits


def make_forecast_splits(
    data: Split,
    n_origins: int = 5,
    *,
    horizon_frac: float = 0.1,
    start_frac: float = 0.5,
    time_scale: float = 1000.0,
) -> List[Split]:
    """Rolling-origin temporal-extrapolation splits: fold k trains on every
    point strictly before its origin time and tests on the following window
    of ``horizon_frac`` of the time range — a true FORECAST protocol (past →
    future), unlike the reference's random KFold (scripts/create_cvsplits.py),
    whose test points are interpolated between observed times.

    With the defaults the 5 origins sit at 50/60/70/80/90 % of the time range,
    the windows tile its second half, and the training set expands with each
    origin (the standard rolling-origin evaluation design). Time is rescaled
    ÷1000 to match ``make_cv_splits``.
    """
    Xraw = np.concatenate([data.Xtrain, data.Xtest]).copy()
    Yraw = np.concatenate([data.Ytrain, data.Ytest])
    Xraw[:, 2] = Xraw[:, 2] / time_scale
    t = Xraw[:, 2]
    lo, hi = float(t.min()), float(t.max())
    span = hi - lo
    splits = []
    for k in range(n_origins):
        t0 = lo + (start_frac + k * horizon_frac) * span
        t1 = t0 + horizon_frac * span
        train = t < t0
        test = (t >= t0) & ((t < t1) if k < n_origins - 1 else (t <= hi))
        if not train.any() or not test.any():
            raise ValueError(
                f"forecast origin {k}: empty train ({train.sum()}) or test "
                f"({test.sum()}) window — check start_frac/horizon_frac"
            )
        splits.append(Split(Xraw[train], Yraw[train], Xraw[test], Yraw[test]))
    return splits


def kron_inducing_init(
    Xtrain: np.ndarray,
    num_spatial: int = 10,
    num_temporal: int = 100,
    *,
    seed: int = 0,
    spatial_factors: tuple | None = None,
) -> List[np.ndarray]:
    """Reference inducing-grid init (scripts/onoff.py:67-68): kmeans centres
    over (lat, lon) and a linspace over the time column.

    ``spatial_factors=(n_lat, n_lon)`` instead factorizes the spatial axis
    itself: axis-wise linspace knots over lat and lon (same convention as
    the time axis), returning THREE one-column factors lat ⊗ lon ⊗ time —
    the reference's graph hard-codes two factors and cannot express this.
    """
    from scipy.cluster.vq import kmeans

    np.random.seed(seed)
    if spatial_factors is not None:
        n_lat, n_lon = spatial_factors
        Z_t = np.linspace(Xtrain[:, 2].min(), Xtrain[:, 2].max(), num_temporal)
        return [
            np.linspace(Xtrain[:, 0].min(), Xtrain[:, 0].max(), n_lat)[:, None],
            np.linspace(Xtrain[:, 1].min(), Xtrain[:, 1].max(), n_lon)[:, None],
            Z_t[:, None],
        ]
    Z_s = kmeans(Xtrain[:, 0:2], num_spatial)[0]
    if Z_s.shape[0] < num_spatial:
        # scipy kmeans drops empty clusters, so some seeds return fewer than
        # k centres — a shape hazard for anything that stacks models across
        # seeds (training.batched). Top up with random training points
        # (deterministic under the same seed); a no-op when kmeans returns k.
        extra = Xtrain[
            np.random.choice(Xtrain.shape[0], num_spatial - Z_s.shape[0], replace=False),
            0:2,
        ]
        Z_s = np.concatenate([Z_s, extra], axis=0)
    Z_t = np.linspace(Xtrain[:, 2].min(), Xtrain[:, 2].max(), num_temporal)[:, None]
    return [Z_s, Z_t]


@dataclass
class ScaleParams:
    mins: Dict[str, float] = field(default_factory=dict)
    ranges: Dict[str, float] = field(default_factory=dict)


class Preprocessing:
    """pptr preprocessing pipeline (onofftf/utils_pptr.py:4-123): time-window
    filter on the ndatehour column, min-max scaling of lat/lon/time with
    recorded scale params, heuristic kernel initialisation."""

    COLS = ("lat", "lon", "ndatehour")

    def __init__(self, split: Split):
        self.split = Split(
            split.Xtrain.copy(), split.Ytrain.copy(), split.Xtest.copy(), split.Ytest.copy()
        )
        self.scale_params = ScaleParams()
        self._scaled_loc = False
        self._scaled_time = False

    def filter_time(self, min_idx: float = 0.0, max_idx: float = np.inf) -> "Preprocessing":
        s = self.split
        tr = (s.Xtrain[:, 2] >= min_idx) & (s.Xtrain[:, 2] <= max_idx)
        te = (s.Xtest[:, 2] >= min_idx) & (s.Xtest[:, 2] <= max_idx)
        self.split = Split(s.Xtrain[tr], s.Ytrain[tr], s.Xtest[te], s.Ytest[te])
        return self

    def scale(self, scale_loc: bool = True, scale_time: bool = True) -> "Preprocessing":
        s = self.split
        allX = np.concatenate([s.Xtrain, s.Xtest])
        cols = []
        if scale_loc:
            cols += [0, 1]
            self._scaled_loc = True
        if scale_time:
            cols += [2]
            self._scaled_time = True
        for c in cols:
            name = self.COLS[c]
            lo, hi = allX[:, c].min(), allX[:, c].max()
            self.scale_params.mins[name] = float(lo)
            self.scale_params.ranges[name] = float(hi - lo)
            s.Xtrain[:, c] = (s.Xtrain[:, c] - lo) / (hi - lo)
            s.Xtest[:, c] = (s.Xtest[:, c] - lo) / (hi - lo)
        return self

    @property
    def model_data(self) -> Split:
        return self.split

    @property
    def kernel_params(self) -> Tuple[float, List[float]]:
        """Heuristic init (utils_pptr.py:104-123): variance = max(Y);
        lengthscale 3/range per scaled dim, 3.0 otherwise."""
        variance = float(np.max(self.split.Ytrain))
        ells = []
        for name in ("lat", "lon"):
            if self._scaled_loc:
                ells.append(round(3.0 / self.scale_params.ranges[name], 4))
            else:
                ells.append(3.0)
        if self._scaled_time:
            ells.append(round(3.0 / self.scale_params.ranges["ndatehour"], 4))
        else:
            ells.append(3.0)
        return variance, ells
