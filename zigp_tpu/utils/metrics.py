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


def lognormal_mean_var(fmean, fvar, *, noise_var: float):
    """y-scale predictive mean/var of the LogNormal head, in numpy float64.

    Eval-side counterpart of ``likelihoods.LogNormal.predict_mean_and_var``:
    the exp of a latent variance overflows float32 long before float64
    (exp(89) vs exp(709)) and metric blocks run on the host anyway."""
    mu = np.asarray(fmean, dtype=np.float64)
    s2 = np.asarray(fvar, dtype=np.float64) + float(noise_var)
    mean = np.exp(mu + 0.5 * s2)
    var = np.expm1(s2) * np.exp(2.0 * mu + s2)
    return mean, var


def gamma_mean_var(fmean, fvar, *, shape: float):
    """y-scale predictive mean/var of the Gamma head, in numpy float64
    (see ``lognormal_mean_var`` for why eval-side moments avoid float32)."""
    a = float(shape)
    mu = np.asarray(fmean, dtype=np.float64)
    v = np.asarray(fvar, dtype=np.float64)
    mean = np.exp(mu + 0.5 * v)
    var = np.exp(2.0 * mu + 2.0 * v) / a + np.expm1(v) * np.exp(2.0 * mu + v)
    return mean, var


def lognormal_nlpd_pointwise(fmean, fvar, actual, *, noise_var: float) -> np.ndarray:
    """Per-point −log p(y) under the exact LogNormal predictive
    LogNormal(fmean, fvar + noise_var) — the posterior predictive of the
    ``likelihoods.LogNormal`` head (log y | data is exactly Gaussian)."""
    mu = np.asarray(fmean, dtype=np.float64).reshape(-1)
    s2 = np.asarray(fvar, dtype=np.float64).reshape(-1) + float(noise_var)
    y = np.asarray(actual, dtype=np.float64).reshape(-1)
    s2 = np.maximum(s2, 1e-12)
    logy = np.log(y)
    return logy + 0.5 * np.log(2.0 * np.pi * s2) + 0.5 * (logy - mu) ** 2 / s2


def lognormal_nlpd(fmean, fvar, actual, *, noise_var: float) -> float:
    """Mean of ``lognormal_nlpd_pointwise``."""
    return float(np.mean(lognormal_nlpd_pointwise(fmean, fvar, actual, noise_var=noise_var)))


def gamma_nlpd_pointwise(fmean, fvar, actual, *, shape: float, num_gh: int = 64) -> np.ndarray:
    """Per-point −log E_{f~N(fmean,fvar)}[Gamma(y; α, α e^{−f})] by
    Gauss-Hermite quadrature (float64, log-sum-exp over nodes) — the
    predictive NLPD of the ``likelihoods.Gamma`` head."""
    from scipy.special import gammaln, logsumexp

    a = float(shape)
    mu = np.asarray(fmean, dtype=np.float64).reshape(-1)
    v = np.maximum(np.asarray(fvar, dtype=np.float64).reshape(-1), 0.0)
    y = np.asarray(actual, dtype=np.float64).reshape(-1)
    x, w = np.polynomial.hermite.hermgauss(num_gh)
    x = x * np.sqrt(2.0)
    w = w / np.sqrt(np.pi)
    f = mu[:, None] + np.sqrt(v)[:, None] * x[None, :]
    logp = (
        a * np.log(a)
        - gammaln(a)
        + (a - 1.0) * np.log(y)[:, None]
        - a * f
        - a * y[:, None] * np.exp(-f)
    )
    return -logsumexp(logp + np.log(w)[None, :], axis=1)


def gamma_nlpd(fmean, fvar, actual, *, shape: float, num_gh: int = 64) -> float:
    """Mean of ``gamma_nlpd_pointwise``."""
    return float(
        np.mean(gamma_nlpd_pointwise(fmean, fvar, actual, shape=shape, num_gh=num_gh))
    )


def gaussian_nlpd_pointwise(mean, var, actual, *, noise_var: float = 0.0) -> np.ndarray:
    """Per-point −log N(y; mean, var + noise_var) (see ``gaussian_nlpd``)."""
    mean = np.asarray(mean, dtype=np.float64).reshape(-1)
    var = np.asarray(var, dtype=np.float64).reshape(-1) + float(noise_var)
    y = np.asarray(actual, dtype=np.float64).reshape(-1)
    var = np.maximum(var, 1e-12)
    return 0.5 * np.log(2.0 * np.pi * var) + 0.5 * (y - mean) ** 2 / var


# --- CRPS (continuous ranked probability score) -----------------------------
#
# A strictly proper scoring rule on the FULL predictive distribution —
# standard in precipitation forecasting, where the predictive is mixed
# (mass at zero + a right-skewed density). The reference reports clipped
# point metrics only (scripts/onoff.py:471-481); CRPS is what its intended
# application domain actually scores models with.


def crps_gaussian_pointwise(mean, var, actual, *, noise_var: float = 0.0) -> np.ndarray:
    """Per-point CRPS of the Gaussian predictive N(mean, var + noise_var):
    the Gneiting-Raftery closed form σ·[z(2Φ(z)−1) + 2φ(z) − 1/√π]."""
    from scipy.special import ndtr

    mu = np.asarray(mean, dtype=np.float64).reshape(-1)
    s2 = np.asarray(var, dtype=np.float64).reshape(-1) + float(noise_var)
    y = np.asarray(actual, dtype=np.float64).reshape(-1)
    s = np.sqrt(np.maximum(s2, 0.0))
    out = np.abs(y - mu)  # σ → 0 limit: a point mass at mu
    ok = s > 0
    z = (y[ok] - mu[ok]) / s[ok]
    phi = np.exp(-0.5 * z**2) / np.sqrt(2.0 * np.pi)
    out[ok] = s[ok] * (z * (2.0 * ndtr(z) - 1.0) + 2.0 * phi - 1.0 / np.sqrt(np.pi))
    return out


def crps_gaussian(mean, var, actual, *, noise_var: float = 0.0) -> float:
    """Mean of ``crps_gaussian_pointwise``."""
    return float(np.mean(crps_gaussian_pointwise(mean, var, actual, noise_var=noise_var)))


def crps_from_samples_pointwise(samples, actual) -> np.ndarray:
    """Per-point CRPS from predictive draws, (S, N) or (S, N, 1) → (N,).

    The *fair* (unbiased-in-expectation) estimator
    CRPS ≈ (1/S)Σₛ|xₛ−y| − (1/(2S(S−1)))Σ_{s≠t}|xₛ−xₜ|, with the pairwise
    term computed in O(S log S) per point via the sorted-sample identity
    Σ_{s<t}(x₍ₜ₎−x₍ₛ₎) = Σₖ(2k−S+1)·x₍ₖ₎ (k 0-indexed ascending). Works for
    ANY predictive a model can sample — the gated on/off predictive and the
    hurdle's mixed zero-atom measure included."""
    x = np.asarray(samples, dtype=np.float64)
    x = x.reshape(x.shape[0], -1)  # (S, N)
    S = x.shape[0]
    if S < 2:
        raise ValueError("crps_from_samples needs at least 2 samples")
    y = np.asarray(actual, dtype=np.float64).reshape(-1)
    term1 = np.mean(np.abs(x - y[None, :]), axis=0)
    xs = np.sort(x, axis=0)
    k = np.arange(S, dtype=np.float64)
    pair_sum = np.sum((2.0 * k - S + 1.0)[:, None] * xs, axis=0)
    term2 = pair_sum / (S * (S - 1.0))
    return term1 - term2


def crps_from_samples(samples, actual) -> float:
    """Mean of ``crps_from_samples_pointwise``."""
    return float(np.mean(crps_from_samples_pointwise(samples, actual)))


# --- host-side predictive samplers (numpy float64) ---------------------------
#
# Eval-side mirrors of the models' device samplers (models/onoff.py:
# gated_y_samples, models/kron.py:KronHurdleSVGP.predict_y_samples), run in
# numpy float64 on the host where the metric blocks already live: CRPS /
# exceedance need hundreds of draws per test point and float64 tails.


def sample_gated_predictive(
    pred: dict, *, noise_var: float, num_samples: int = 256, seed: int = 0
) -> np.ndarray:
    """(S, N) draws of the on/off model's gated predictive
    y* = Φ(g*)·f* + ε from an OnOffPrediction dict's marginal moments
    (keys fmean/fvar/gmean/gvar — what ``KronOnOffSVGP.predict`` returns)."""
    from scipy.special import ndtr

    rng = np.random.RandomState(seed)
    fm = np.asarray(pred["fmean"], dtype=np.float64).reshape(-1)
    fv = np.maximum(np.asarray(pred["fvar"], dtype=np.float64).reshape(-1), 0.0)
    gm = np.asarray(pred["gmean"], dtype=np.float64).reshape(-1)
    gv = np.maximum(np.asarray(pred["gvar"], dtype=np.float64).reshape(-1), 0.0)
    n = fm.shape[0]
    f = fm[None] + np.sqrt(fv)[None] * rng.randn(num_samples, n)
    g = gm[None] + np.sqrt(gv)[None] * rng.randn(num_samples, n)
    eps = rng.randn(num_samples, n)
    return ndtr(g) * f + np.sqrt(float(noise_var)) * eps


def sample_gated_mixture(
    member_preds, *, noise_var: float, num_samples: int = 256, seed: int = 0
) -> np.ndarray:
    """(S, N) iid draws from a uniform MIXTURE of gated predictives (seed
    ensembles): each draw picks a member uniformly, then samples its gated
    predictive. The mixture of Φ(g)·f predictives has no single (f, g)
    moment-pair representation, so moment matching (the mixers' approach for
    the point metrics) cannot feed ``sample_gated_predictive`` — this samples
    the mixture exactly instead."""
    rng = np.random.RandomState(seed)
    E = len(member_preds)
    n = np.asarray(member_preds[0]["fmean"]).reshape(-1).shape[0]
    idx = rng.randint(E, size=num_samples)
    out = np.empty((num_samples, n), dtype=np.float64)
    for e, pred in enumerate(member_preds):
        rows = np.flatnonzero(idx == e)
        if rows.size:
            out[rows] = sample_gated_predictive(
                pred, noise_var=noise_var, num_samples=rows.size, seed=seed + 1 + e
            )
    return out


def sample_hurdle_predictive(
    p_on,
    fmean,
    fvar,
    *,
    head: str,
    num_samples: int = 256,
    seed: int = 0,
    noise_var: float | None = None,
    shape: float | None = None,
) -> np.ndarray:
    """(S, N) draws of the hurdle's mixed predictive: an exact atom at y = 0
    with probability 1−p_on, else an amount draw from the head's
    latent-marginal predictive (``head`` ∈ gaussian/lognormal/gamma, matching
    ``likelihoods.{Gaussian,LogNormal,Gamma}.sample_y`` semantics)."""
    rng = np.random.RandomState(seed)
    p = np.asarray(p_on, dtype=np.float64).reshape(-1)
    mu = np.asarray(fmean, dtype=np.float64).reshape(-1)
    v = np.maximum(np.asarray(fvar, dtype=np.float64).reshape(-1), 0.0)
    n = mu.shape[0]
    if head in ("gaussian", "lognormal"):
        # y|f ~ N(f, σ²) (or log y|f): the latent marginal collapses to one
        # Gaussian with variance fvar + σ²
        s2 = v + float(noise_var)
        z = mu[None] + np.sqrt(s2)[None] * rng.randn(num_samples, n)
        amount = np.exp(z) if head == "lognormal" else z
    elif head == "gamma":
        a = float(shape)
        f = mu[None] + np.sqrt(v)[None] * rng.randn(num_samples, n)
        amount = rng.standard_gamma(a, size=(num_samples, n)) * np.exp(f) / a
    else:
        raise ValueError(f"unknown amount head: {head!r}")
    on = rng.rand(num_samples, n) < p[None]
    return np.where(on, amount, 0.0)


# --- exceedance probabilities P(y > τ) ---------------------------------------


def brier(prob, actual_binary) -> float:
    """Brier score (mean squared error of the event probability) — a proper
    score for the exceedance forecast P(y > τ)."""
    p = np.asarray(prob, dtype=np.float64).reshape(-1)
    o = np.asarray(actual_binary, dtype=np.float64).reshape(-1)
    return float(np.mean((p - o) ** 2))


def exceedance_summary(samples, actual, thresholds=(0.1, 1.0, 5.0)) -> dict:
    """Per-threshold exceedance forecast quality from predictive draws:
    p̂ᵢ(τ) = mean(xᵢₛ > τ) scored with the Brier score and rank AUC against
    the observed event 1[yᵢ > τ], plus the event base rate. The applied
    deliverable of a precipitation model — 'probability of more than τ mm' —
    which point predictions cannot express."""
    x = np.asarray(samples, dtype=np.float64)
    x = x.reshape(x.shape[0], -1)
    y = np.asarray(actual, dtype=np.float64).reshape(-1)
    out = {}
    for tau in thresholds:
        p_hat = np.mean(x > float(tau), axis=0)
        event = (y > float(tau)).astype(np.float64)
        out[str(tau)] = {
            "brier": brier(p_hat, event),
            "auc": roc_auc(p_hat, event.astype(np.int64)),
            "base_rate": float(np.mean(event)),
        }
    return out


def exceedance_summary_gaussian(
    mean, var, actual, thresholds=(0.1, 1.0, 5.0), *, noise_var: float = 0.0
) -> dict:
    """``exceedance_summary`` with the Gaussian predictive's exact tail
    P(y > τ) = Φ̄((τ − μ)/σ) instead of sample counts."""
    from scipy.special import ndtr

    mu = np.asarray(mean, dtype=np.float64).reshape(-1)
    s2 = np.asarray(var, dtype=np.float64).reshape(-1) + float(noise_var)
    s = np.sqrt(np.maximum(s2, 1e-12))
    y = np.asarray(actual, dtype=np.float64).reshape(-1)
    out = {}
    for tau in thresholds:
        p_hat = ndtr((mu - float(tau)) / s)
        event = (y > float(tau)).astype(np.float64)
        out[str(tau)] = {
            "brier": brier(p_hat, event),
            "auc": roc_auc(p_hat, event.astype(np.int64)),
            "base_rate": float(np.mean(event)),
        }
    return out


def gated_exceedance_prob(pred: dict, tau: float, *, noise_var: float, num_gh: int = 64):
    """Exact P(y* > τ) of the gated predictive y* = Φ(g*)·f* + ε, (N,).

    Conditional on g, y* ~ N(a·fμ, a²·fσ² + σ²) with a = Φ(g); the g
    marginal is integrated by Gauss-Hermite quadrature, so rare thresholds
    (τ = 5 mm) resolve exactly where a 256-draw sample estimate returns a
    constant 0 (round-4 fix of the degenerate onoff τ=5 AUC)."""
    from scipy.special import ndtr

    fm = np.asarray(pred["fmean"], dtype=np.float64).reshape(-1)
    fv = np.maximum(np.asarray(pred["fvar"], dtype=np.float64).reshape(-1), 0.0)
    gm = np.asarray(pred["gmean"], dtype=np.float64).reshape(-1)
    gv = np.maximum(np.asarray(pred["gvar"], dtype=np.float64).reshape(-1), 0.0)
    x, w = np.polynomial.hermite.hermgauss(num_gh)
    g = gm[:, None] + np.sqrt(2.0 * gv)[:, None] * x[None, :]  # (N, K)
    a = ndtr(g)
    s = np.sqrt(a**2 * fv[:, None] + float(noise_var))
    tails = ndtr((a * fm[:, None] - float(tau)) / s)
    return tails @ (w / np.sqrt(np.pi))


def exceedance_summary_gated(
    pred, actual, thresholds=(0.1, 1.0, 5.0), *, noise_var: float, num_gh: int = 64
) -> dict:
    """``exceedance_summary`` with the gated predictive's exact tails
    (``gated_exceedance_prob``). ``pred`` may be a single prediction dict or
    a list of member dicts (seed ensemble) — a uniform mixture's tail is
    exactly the mean of the member tails."""
    members = pred if isinstance(pred, (list, tuple)) else [pred]
    y = np.asarray(actual, dtype=np.float64).reshape(-1)
    out = {}
    for tau in thresholds:
        p_hat = np.mean(
            [gated_exceedance_prob(m, tau, noise_var=noise_var, num_gh=num_gh)
             for m in members],
            axis=0,
        )
        event = (y > float(tau)).astype(np.float64)
        out[str(tau)] = {
            "brier": brier(p_hat, event),
            "auc": roc_auc(p_hat, event.astype(np.int64)),
            "base_rate": float(np.mean(event)),
        }
    return out


def hurdle_exceedance_prob(
    p_on, fmean, fvar, tau: float, *, head: str,
    noise_var: float | None = None, shape: float | None = None, num_gh: int = 64,
):
    """Exact P(y > τ) of the hurdle's mixed predictive (τ ≥ 0): the zero
    atom never exceeds, so P = p_on · P(amount > τ) with the amount head's
    own tail — closed-form for gaussian/lognormal (the latent marginal is
    one Gaussian), Gauss-Hermite over f for the gamma head."""
    from scipy.special import gammaincc, ndtr

    p = np.asarray(p_on, dtype=np.float64).reshape(-1)
    mu = np.asarray(fmean, dtype=np.float64).reshape(-1)
    v = np.maximum(np.asarray(fvar, dtype=np.float64).reshape(-1), 0.0)
    tau = float(tau)
    if head in ("gaussian", "lognormal"):
        s = np.sqrt(v + float(noise_var))
        t = np.log(tau) if head == "lognormal" else tau
        amount_tail = ndtr((mu - t) / np.maximum(s, 1e-12))
    elif head == "gamma":
        a = float(shape)
        x, w = np.polynomial.hermite.hermgauss(num_gh)
        f = mu[:, None] + np.sqrt(2.0 * v)[:, None] * x[None, :]
        # amount | f ~ Gamma(a, rate = a e^{-f}): P(> τ) = Q(a, a τ e^{-f})
        amount_tail = gammaincc(a, a * tau * np.exp(-f)) @ (w / np.sqrt(np.pi))
    else:
        raise ValueError(f"unknown amount head: {head!r}")
    return p * amount_tail


def exceedance_summary_hurdle(
    p_on, fmean, fvar, actual, thresholds=(0.1, 1.0, 5.0), *, head: str,
    noise_var: float | None = None, shape: float | None = None, num_gh: int = 64,
) -> dict:
    """``exceedance_summary`` with the hurdle mixed measure's exact tails
    (``hurdle_exceedance_prob``)."""
    y = np.asarray(actual, dtype=np.float64).reshape(-1)
    out = {}
    for tau in thresholds:
        p_hat = hurdle_exceedance_prob(
            p_on, fmean, fvar, tau, head=head,
            noise_var=noise_var, shape=shape, num_gh=num_gh,
        )
        event = (y > float(tau)).astype(np.float64)
        out[str(tau)] = {
            "brier": brier(p_hat, event),
            "auc": roc_auc(p_hat, event.astype(np.int64)),
            "base_rate": float(np.mean(event)),
        }
    return out


def hurdle_nlpd(p_on, cond_nlpd_pos, actual, *, eps: float = 1e-6) -> float:
    """Mean NLPD of the hurdle's mixed discrete–continuous predictive:
    an atom 1−p at y = 0 and density p·q(y | on) on y > 0, i.e.

        −log(1−pᵢ)            where yᵢ = 0
        −log pᵢ − log q(yᵢ)   where yᵢ > 0.

    ``cond_nlpd_pos`` carries −log q(yᵢ) for the strictly-positive rows of
    ``actual``, in order (the conditional amount head's pointwise NLPD).
    A proper scoring rule over the FULL test set — the single probabilistic
    quality number for the composite; the reference reports clipped point
    metrics only (scripts/hurdle.py:338-377). ``p_on`` is clipped to
    [eps, 1−eps] (the classifier's own Φ̃ clip is 1e-3)."""
    p = np.clip(np.asarray(p_on, dtype=np.float64).reshape(-1), eps, 1.0 - eps)
    y = np.asarray(actual, dtype=np.float64).reshape(-1)
    pos = y > 0
    cond = np.asarray(cond_nlpd_pos, dtype=np.float64).reshape(-1)
    if cond.shape[0] != int(pos.sum()):
        raise ValueError(
            f"cond_nlpd_pos has {cond.shape[0]} rows but actual has "
            f"{int(pos.sum())} strictly-positive entries"
        )
    vals = -np.log1p(-p)
    vals[pos] = -np.log(p[pos]) + cond
    return float(np.mean(vals))
