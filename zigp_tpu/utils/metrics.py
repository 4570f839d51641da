"""Evaluation metrics matching the reference's conventions.

RMSE/MAE clip predictions at zero first (precipitation can't be negative —
scripts/zero_inflated.py:65-70, scripts/onoff.py:471-478). Classification
metrics threshold probabilities at 0.5 (scripts/classifier.py:337-345); AUC is
a pure-numpy rank-based implementation equivalent to sklearn's
``roc_auc_score``.
"""

from __future__ import annotations

import numpy as np


def rmse(predict: np.ndarray, actual: np.ndarray, *, clip_at_zero: bool = True) -> float:
    predict = np.asarray(predict)
    if clip_at_zero:
        predict = np.maximum(predict, 0)
    return float(np.sqrt(np.mean((np.asarray(actual) - predict) ** 2)))


def mae(predict: np.ndarray, actual: np.ndarray, *, clip_at_zero: bool = True) -> float:
    predict = np.asarray(predict)
    if clip_at_zero:
        predict = np.maximum(predict, 0)
    return float(np.mean(np.abs(np.asarray(actual) - predict)))


def _binarize(p, threshold=0.5):
    return (np.asarray(p).reshape(-1) > threshold).astype(np.int64)


def accuracy(predict_prob, actual, threshold: float = 0.5) -> float:
    yhat = _binarize(predict_prob, threshold)
    y = np.asarray(actual).reshape(-1).astype(np.int64)
    return float(np.mean(yhat == y))


def precision(predict_prob, actual, threshold: float = 0.5) -> float:
    yhat = _binarize(predict_prob, threshold)
    y = np.asarray(actual).reshape(-1).astype(np.int64)
    tp = np.sum((yhat == 1) & (y == 1))
    fp = np.sum((yhat == 1) & (y == 0))
    return float(tp / (tp + fp)) if (tp + fp) > 0 else 0.0


def recall(predict_prob, actual, threshold: float = 0.5) -> float:
    yhat = _binarize(predict_prob, threshold)
    y = np.asarray(actual).reshape(-1).astype(np.int64)
    tp = np.sum((yhat == 1) & (y == 1))
    fn = np.sum((yhat == 0) & (y == 1))
    return float(tp / (tp + fn)) if (tp + fn) > 0 else 0.0


def roc_auc(predict_prob, actual) -> float:
    """Mann-Whitney U form of ROC-AUC (ties get half credit)."""
    p = np.asarray(predict_prob).reshape(-1).astype(np.float64)
    y = np.asarray(actual).reshape(-1).astype(np.int64)
    n_pos = int(np.sum(y == 1))
    n_neg = int(np.sum(y == 0))
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(p, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    sorted_p = p[order]
    # average ranks for ties
    i = 0
    n = len(p)
    while i < n:
        j = i
        while j + 1 < n and sorted_p[j + 1] == sorted_p[i]:
            j += 1
        ranks[order[i : j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    sum_pos_ranks = float(np.sum(ranks[y == 1]))
    return (sum_pos_ranks - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def gaussian_nlpd(mean, var, actual, *, noise_var: float = 0.0) -> float:
    """Mean negative log predictive density under the moment-matched Gaussian
    predictive N(mean, var + noise_var).

    Not reported by the reference (RMSE/MAE only) but the standard
    probabilistic-quality metric for GP models: unlike RMSE it penalizes
    both over- and under-confident predictive variances. For the on/off
    model pass the gated moments (gfmean, gfvar + gfmeanu) plus the learned
    noise variance.
    """
    mean = np.asarray(mean, dtype=np.float64).reshape(-1)
    var = np.asarray(var, dtype=np.float64).reshape(-1) + float(noise_var)
    y = np.asarray(actual, dtype=np.float64).reshape(-1)
    var = np.maximum(var, 1e-12)
    return float(np.mean(0.5 * np.log(2.0 * np.pi * var) + 0.5 * (y - mean) ** 2 / var))
