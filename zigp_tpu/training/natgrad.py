"""Natural-gradient updates for the Gaussian variational parameters.

The BASELINE quality option beyond the reference's plain Adam: for a Gaussian
q(u) = N(m, S) with S = diag(s²) (the q_diag case used throughout), the
natural gradient in the expectation parameters (η₁ = m, η₂ = m² + s²-style)
has the classic closed form. We use the standard SVGP natural-gradient step in
(m, s) via the dual parameters:

    θ₁ = S⁻¹ m,  θ₂ = −½ S⁻¹          (natural parameters)
    ∂L/∂η step in natural space  ⇔  θ ← θ − γ · ∂L/∂η

with ∂L/∂η obtained from ∂L/∂(m, s²) by the chain rule:
    ∂L/∂η₁ = ∂L/∂m − 2 (∂L/∂S) m
    ∂L/∂η₂ = ∂L/∂S
(diagonal S; all elementwise). This is the Salimbeni-et-al. "natural gradients
in practice" recipe restricted to diagonal covariance.

Exposed as a ``NaturalGradientTrainer`` that alternates one nat-grad step on
each GP's (q_mu, q_sqrt) pair with an Adam step on all other parameters — the
standard SVGP training split.

Scale recipe (what makes this work on the full pptr config, where a fresh
gate produces ~1e9-magnitude expectation-space gradients): (1) γ warmup — a
log-linear ramp from ``gamma_init`` to ``gamma`` over ``gamma_warmup`` steps
(the Salimbeni schedule), (2) the whitened parameterization (q over v with
u = Lv; its expectation-space gradients are preconditioned by the prior), and
(3) the per-step variance clamp below as a backstop. γ is a *traced* scalar
argument of the jitted step, so the warmup schedule costs zero recompiles.

Supported families:

- diagonal covariance (dense OnOffSVGP and KronGP ``q_cov="diag"``): the full
  (m, s) natural-gradient step above.
- Kronecker-factored full covariance (``q_cov="kron"``): the covariance lives
  on the ⊗-factored manifold where the joint Fisher has no closed dual. Two
  steps are provided: (a) the *mean-block* natural step
  (``natgrad_update_mean_kron``; m ← m − γ S ∇_m L with S = ⊗_p C_p C_pᵀ
  applied factored, covariance factors to Adam) — stable but measured worse
  than plain Adam at the production pptr config (S is non-stationary under
  the factors' Adam updates); and (b) the *joint block-coordinate* step
  (``natgrad_update_block_kron``; exact (m, C_p) natural step per Kronecker
  factor, alternating factors; CLI ``--natgrad-joint``) — the best measured
  equal-steps optimizer at the reference 50k budget: post-precision-fix CV
  RMSE 0.5687 / MAE 0.1054 / CRPS 0.2010 vs Adam's 0.5693 / 0.1241 / 0.2022
  (results/cv_natgrad_r4.json; RESULTS.md "Natural gradients" — its MAE
  matches the 150k champion at a third of the steps, while Adam keeps the
  better exceedance AUCs). For production natgrad use the joint block step;
  the diag family is the fallback for models without the kron covariance.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def natgrad_update_diag(
    q_mu, q_sqrt, dL_dmu, dL_dsqrt, lr, *,
    max_var_growth: float = 10.0, max_mean_step: float = 0.0,
):
    """One natural-gradient step on (m, s) for diagonal N(m, diag(s²)).

    dL_dmu/dL_dsqrt are ordinary gradients of the *loss* (−ELBO) w.r.t. the
    constrained m and s; ``lr`` (γ) may be a traced scalar. Returns new (m, s).

    Safeguards for large-scale use (an unclamped natural step on a freshly
    initialised model can blow the variance up by orders of magnitude and
    diverge): per-step variance growth is capped at ``max_var_growth``×;
    ``max_mean_step`` > 0 is a trust region in natural units — the mean may
    move at most that many current standard deviations per step (a full
    conjugate γ=1 jump is ≲ a few σ, so a cap of ~10 only binds on the
    explosive overshoots); non-finite updates fall back to previous values.
    """
    s2 = jnp.square(q_sqrt)
    # gradients wrt (m, S=s²): dL/dS = dL/ds · ds/dS = dL_dsqrt / (2 s)
    dL_dS = dL_dsqrt / (2.0 * q_sqrt)
    # natural params
    theta1 = q_mu / s2
    theta2 = -0.5 / s2
    # expectation-space gradients
    dL_deta1 = dL_dmu - 2.0 * dL_dS * q_mu
    dL_deta2 = dL_dS
    # step in natural space
    theta1_new = theta1 - lr * dL_deta1
    theta2_new = theta2 - lr * dL_deta2
    # precision must stay negative and finite
    theta2_new = jnp.minimum(theta2_new, -1e-12)
    s2_new = -0.5 / theta2_new
    # symmetric per-step variance clamp: a single natural step may neither
    # grow nor shrink s² by more than max_var_growth× (an unclamped step on a
    # freshly initialised model can send the precision to ±inf, after which
    # the softplus-inverse of s = 0 is -inf and the run is poisoned)
    s2_new = jnp.clip(s2_new, s2 / max_var_growth, s2 * max_var_growth)
    m_new = s2_new * theta1_new
    if max_mean_step:
        cap = max_mean_step * q_sqrt
        m_new = jnp.clip(m_new, q_mu - cap, q_mu + cap)
    # non-finite fallback: keep the previous parameters for those entries
    m_new = jnp.where(jnp.isfinite(m_new), m_new, q_mu)
    s2_new = jnp.where(jnp.isfinite(s2_new), s2_new, s2)
    return m_new, jnp.sqrt(s2_new)


def natgrad_update_mean_kron(
    q_mu, C_factors, dL_dmu, lr, *, max_mean_step: float = 0.0,
    kl_cap: Optional[float] = None,
):
    """Exact natural-gradient step on the mean for N(m, S), S = ⊗_p C_p C_pᵀ.

    For fixed covariance the Fisher of the mean is S⁻¹, so the natural step is
    m ← m − γ S ∇_m L — one factored Kronecker matvec, no solves.

    ``kl_cap`` is the production stabilizer: the step moves the distribution
    by KL(q′‖q) = ½ Δmᵀ S⁻¹ Δm = ½ γ² ∇ᵀ S ∇ nats, available for free (one
    dot with the already-computed step). If that exceeds ``kl_cap`` the step
    is rescaled to land exactly on the cap. This is what makes the step safe
    when S is far from the loss curvature: the preconditioned iteration
    m ← m − γS∇ diverges whenever γ·λmax(S·H) > 2, and for the *unwhitened*
    kron family S sits at prior (Kuu) scale, giving λmax(S·H) ~ 1e6 at the
    pptr config — measured: loss 7.7e6 → 9e16 within 50 steps even at
    γ = 1e-5, while the same run with a 10-nat cap trains. A per-step KL
    budget bounds the move in the family's own metric, which rescales γ by
    exactly the explosive factor, whatever its source.

    ``max_mean_step`` > 0 additionally caps the move at that many current
    marginal standard deviations (σ² = diag S = ⊗_p rowsumsq(C_p)), mirroring
    the diagonal family's safeguard; non-finite updates fall back."""
    from ..ops import linalg

    # Full-f32 products throughout: this preconditioned step is applied every
    # iteration at full γ, and TPU-default bf16 matmul products measurably
    # degrade precision-sensitive training (see linalg.hdot).
    Cs = [jnp.tril(C) for C in C_factors]
    step = linalg.kron_mv(
        [linalg.hdot(C, C.T) for C in Cs], dL_dmu,
        precision=jax.lax.Precision.HIGHEST,
    )
    scale = lr
    if kl_cap is not None:
        kl = 0.5 * lr * lr * jnp.sum(dL_dmu * step)
        kl = jnp.where(jnp.isfinite(kl), jnp.maximum(kl, 1e-30), jnp.inf)
        scale = lr * jnp.minimum(1.0, jnp.sqrt(kl_cap / kl))
    m_new = q_mu - scale * step
    if max_mean_step:
        sigma = jnp.sqrt(
            linalg.kron_diag([jnp.sum(jnp.square(C), axis=1) for C in Cs])
        )[:, None]
        cap = max_mean_step * sigma
        m_new = jnp.clip(m_new, q_mu - cap, q_mu + cap)
    return jnp.where(jnp.isfinite(m_new), m_new, q_mu)


def natgrad_update_block_kron(
    q_mu, C_factors, p, dL_dmu, dL_dCp, lr, *,
    max_mean_step: float = 0.0, max_var_growth: float = 10.0,
    kl_cap: Optional[float] = None,
):
    """Exact joint natural-gradient step on (m, Σ_p) for N(m, ⊗_q Σ_q),
    Σ_q = C_q C_qᵀ, holding the other factors fixed (ROADMAP #9).

    Why this is exact: for fixed R = ⊗_{q≠p} Σ_q the set
    {N(m, Σ_p ⊗ R)} is an *exponential family* — the precision
    S⁻¹ = A ⊗ R⁻¹ is linear in A = Σ_p⁻¹, so (θ₁ = S⁻¹m, A) are natural
    parameters with sufficient statistics (u, −½ U R⁻¹ Uᵀ) where U is u
    reshaped (M_p, M/M_p) with factor p's index leading. The natural-gradient
    step therefore has the classic mirror form  θ ← θ − γ ∂L/∂η  with
    expectation parameters available in closed *factored* form:

        η₁ = m,    η_A = −½ (Ū R⁻¹ Ūᵀ + (M/M_p) Σ_p),  Ū = reshape(m).

    ∂L/∂η is obtained from the ordinary gradients (∂L/∂m, ∂L/∂C_p)
    analytically via the Cholesky pullback D = ∂L/∂Σ_p evaluated at the
    current Σ_p, and the mean is stepped in exact delta form (see the inline
    derivation) — both choices are f32-critical, not cosmetic. Everything is
    per-factor sized — no M×M matrix is ever formed (contrast the reference's
    dense Kronecker materialization, onofftf/main.py:356). Alternating p over
    steps gives block-coordinate natural descent on the full ⊗-manifold,
    replacing the mean-only step (natgrad_update_mean_kron) whose fixed-S
    assumption was measured non-stationary under Adam-moving factors
    (RESULTS.md, natgrad × kron).

    Safeguards mirror the diagonal family: per-step marginal-variance growth
    of factor p is capped at ``max_var_growth``×, the mean move at
    ``max_mean_step`` current marginal σ, and a non-PD / non-finite update
    falls back to the previous (m, C_p). ``kl_cap`` bounds the whole step at
    that many nats of KL(q′‖q) (exact factored computation, γ rescaled once)
    — the same production stabilizer as natgrad_update_mean_kron, see there
    for why this is the one that matters.

    Returns (m_new, Cp_new); ``lr`` (γ) may be a traced scalar.
    """
    from jax.scipy.linalg import solve_triangular

    from ..ops import linalg

    HI = jax.lax.Precision.HIGHEST
    sizes = [C.shape[0] for C in C_factors]
    M = math.prod(sizes)
    Mp = sizes[p]
    Mrest = M // Mp
    Cs = [jnp.tril(C) for C in C_factors]
    Cp = Cs[p]
    eyep = jnp.eye(Mp, dtype=q_mu.dtype)

    # R⁻¹ factors (other factors' inverses), original relative order
    def _inv_from_tril(C):
        Ci = solve_triangular(C, jnp.eye(C.shape[0], dtype=C.dtype), lower=True)
        return jnp.dot(Ci.T, Ci, precision=HI)

    Rinv = [_inv_from_tril(C) for q, C in enumerate(Cs) if q != p]
    Rmats = [jnp.dot(C, C.T, precision=HI) for q, C in enumerate(Cs) if q != p]

    def _apply_R(mats, X):
        # (⊗ mats) Xᵀ for X of shape (Mp, Mrest): returns same shape
        if not mats:
            return X
        return linalg.kron_mv(mats, X.T, precision=HI).T

    # permute factor p's index to the front of the row-major mean layout
    def _perm(v):
        t = v.reshape(sizes)
        return jnp.moveaxis(t, p, 0).reshape(Mp, Mrest)

    def _unperm(U):
        t = U.reshape([Mp] + [s for q, s in enumerate(sizes) if q != p])
        return jnp.moveaxis(t, 0, p).reshape(M, 1)

    Mu = _perm(q_mu)
    Sigma_p = jnp.dot(Cp, Cp.T, precision=HI)

    # current natural parameter A = Σ_p⁻¹.
    # (chol of Σ_p, not C_p itself: the tril parameterization does not
    # constrain C_p's diagonal sign, the canonical Cholesky does.)
    Cpi = solve_triangular(jnp.linalg.cholesky(Sigma_p), eyep, lower=True)
    A = jnp.dot(Cpi.T, Cpi, precision=HI)
    MuRinv = _apply_R(Rinv, Mu)

    # ∂L/∂η analytically. The f32 production path cannot afford the naive
    # route (VJP through the η → (m, C_p) map): evaluating that map's primal
    # reconstructs Σ_p = (−2η_A − U R⁻¹Uᵀ)/M_rest, a difference of two large
    # terms that cancels catastrophically in f32 once ‖m‖ grows (measured:
    # instant divergence at the pptr 10×100 config even at γ=1e-4). Instead
    # take the Cholesky pullback D = ∂L/∂Σ_p at the *well-conditioned primal*
    # Σ_p, then
    #     ∂L/∂η_A = −(2/M_rest)·D,
    #     ∂L/∂η₁  = ∂L/∂m − (2/M_rest)·D·(U R⁻¹)   [η₁ = U = perm(m)].
    #
    # The model's C_p may have sign-flipped columns vs the canonical Cholesky
    # (tril raw is unconstrained, e.g. after an Adam warm-start). L depends on
    # C_p only through Σ_p = C_pC_pᵀ, so ∇L(C_p·D_s) = ∇L(C_p)·D_s for the
    # diagonal sign flip D_s that canonicalizes C_p — transform the cotangent
    # accordingly before the pullback.
    d = jnp.sign(linalg.masked_diag(Cp))
    d = jnp.where(d == 0, jnp.ones((), d.dtype), d)
    G = jnp.tril(dL_dCp) * d[None, :]
    _, chol_vjp = jax.vjp(jnp.linalg.cholesky, Sigma_p)
    D = chol_vjp(G)[0]
    D = 0.5 * (D + D.T)
    g1 = _perm(dL_dmu) - (2.0 / Mrest) * jnp.dot(D, MuRinv, precision=HI)

    # map back. Σ_p' = A'⁻¹ via its Cholesky, with A' = A − γ∂L/∂η_A =
    # A + (2γ/M_rest)D. The mean is updated in exact *delta form* —
    # substituting θ₁ = (A ⊗ R⁻¹)m and A = A' + γ∂L/∂η_A into
    # m' = (Σ_p' ⊗ R)(θ₁ − γ∂L/∂η₁) cancels (Σ_p'⊗R)(A⊗R⁻¹) → Σ_p'A ⊗ I →
    # I + γΣ_p'∂L/∂η_A ⊗ I, giving
    #     m' = m − γ (Σ_p' ⊗ I)[(2/M_rest)·D·U + (I ⊗ R)·∂L/∂η₁].
    # Unlike the literal roundtrip (m → θ₁ → m'), this is exactly m at γ→0:
    # no cond(Σ_p)²·cond(R)² f32 amplification of the current mean.
    # γ-independent step direction of the mean update (shared by the map-back
    # and both KL passes): (2/M_rest)·D·U + (I ⊗ R)·∂L/∂η₁.
    step_dir = (2.0 / Mrest) * jnp.dot(D, Mu, precision=HI) + _apply_R(Rmats, g1)

    def _map_back(gam):
        A_new = A + (2.0 * gam / Mrest) * D
        La = jnp.linalg.cholesky(A_new)
        Lai = solve_triangular(
            jnp.where(jnp.isfinite(La), La, eyep), eyep, lower=True
        )
        Sigma_new = jnp.dot(Lai.T, Lai, precision=HI)
        Mu_new = Mu - gam * jnp.dot(Sigma_new, step_dir, precision=HI)
        return La, Sigma_new, Mu_new

    if kl_cap is not None:
        # Per-step KL(q′‖q) budget — the same production stabilizer as the
        # mean step (see natgrad_update_mean_kron). Two passes:
        #
        # (1) Quadratic pre-scale, computed BEFORE A' is ever inverted (so it
        # is finite even when the raw step would leave the PD cone):
        #   KL_cov ≈ (M_rest/4)·tr((Σ_p ΔA)²) with ΔA = (2γ/M_rest)D
        #          = (γ²/M_rest)·tr((Σ_p D)²),
        #   KL_mean ≈ ½ Δm₀ᵀ S⁻¹ Δm₀ at the *current* Σ_p.
        SpD = jnp.dot(Sigma_p, D, precision=HI)
        kl_cov_q = (lr * lr / Mrest) * jnp.sum(SpD * SpD.T)
        dm0 = lr * jnp.dot(Sigma_p, step_dir, precision=HI)
        kl_mean_q = 0.5 * jnp.sum(
            dm0 * jnp.dot(A, _apply_R(Rinv, dm0), precision=HI)
        )
        kl_q = jnp.maximum(kl_cov_q + kl_mean_q, 1e-30)
        kl_q = jnp.where(jnp.isfinite(kl_q), kl_q, jnp.inf)
        lr = lr * jnp.minimum(1.0, jnp.sqrt(kl_cap / kl_q))

    La, Sigma_new, Mu_new = _map_back(lr)

    if kl_cap is not None:
        # (2) Exact factored KL refinement of the pre-scaled candidate: with
        # S = Σ_p ⊗ R,
        #   KL = ½[M_rest·tr(AΣ_p') − M + ΔUᵀ(A ⊗ R⁻¹)ΔU
        #         + M_rest·(logdet Σ_p − logdet Σ_p')],
        # rescaling γ once more by √(cap/KL) (KL is quadratic in γ to leading
        # order). Small-matrix algebra only — the ELBO gradient dwarfs it —
        # and the re-map only runs when the exact KL actually exceeds the cap
        # (post-warmup steps usually pass untouched).
        dU = Mu_new - Mu
        quad = jnp.sum(dU * jnp.dot(A, _apply_R(Rinv, dU), precision=HI))
        # logdet Σ_p = −2Σ log diag(Cpi) (Cpi = chol(Σ_p)⁻¹);
        # logdet Σ_p' = −logdet A' = −2Σ log diag(La)
        logdet_old = -2.0 * jnp.sum(jnp.log(jnp.diag(Cpi)))
        logdet_new = -2.0 * jnp.sum(jnp.log(jnp.diag(La)))
        tr = jnp.sum(A * Sigma_new)
        kl = 0.5 * (
            Mrest * tr - M + quad + Mrest * (logdet_old - logdet_new)
        )
        kl = jnp.where(jnp.isfinite(kl), jnp.maximum(kl, 1e-30), jnp.inf)
        rescale = jnp.minimum(1.0, jnp.sqrt(kl_cap / kl))
        La, Sigma_new, Mu_new = jax.lax.cond(
            rescale < 1.0,
            lambda: _map_back(lr * rescale),
            lambda: (La, Sigma_new, Mu_new),
        )

    Cp_new = jnp.linalg.cholesky(Sigma_new)
    m_new = _unperm(Mu_new)

    # safeguards: PD + finite + bounded marginal-variance growth, else revert
    growth = linalg.masked_diag(Sigma_new) / jnp.maximum(
        linalg.masked_diag(Sigma_p), 1e-30
    )
    ok = (
        jnp.all(jnp.isfinite(La))
        & jnp.all(jnp.isfinite(Cp_new))
        & jnp.all(jnp.isfinite(m_new))
        & jnp.all(growth < max_var_growth)
        & jnp.all(growth > 1.0 / max_var_growth)
    )
    if max_mean_step:
        # marginal σ² = diag(⊗ Σ_q): rowsumsq of each C_q, the new Σ for p
        diags = [
            linalg.masked_diag(Sigma_new) if q == p
            else jnp.sum(jnp.square(C), axis=1)
            for q, C in enumerate(Cs)
        ]
        sigma = jnp.sqrt(linalg.kron_diag(diags))[:, None]
        cap = max_mean_step * sigma
        m_new = jnp.clip(m_new, q_mu - cap, q_mu + cap)
    m_new = jnp.where(ok, m_new, q_mu)
    Cp_new = jnp.where(ok, Cp_new, Cp)
    return m_new, Cp_new


def gamma_schedule(step, *, gamma: float, warmup: int, gamma_init: float = 1e-4):
    """Log-linear γ ramp: gamma_init → gamma over ``warmup`` steps, then
    constant (Salimbeni et al.'s natural-gradient warmup). ``step`` may be a
    traced array; returns a jnp scalar."""
    if warmup <= 0:
        # match the step argument's shape so (K,) schedule blocks stay (K,)
        return jnp.broadcast_to(jnp.asarray(gamma, jnp.float32), jnp.shape(step))
    frac = jnp.clip(jnp.asarray(step, jnp.float32) / warmup, 0.0, 1.0)
    return jnp.asarray(gamma_init * (gamma / gamma_init) ** frac, jnp.float32)


class NaturalGradientTrainer:
    """Alternating optimizer: natural gradient on every KronGP/SVGP
    (q_mu, q_sqrt) pair, Adam on everything else (kernels, Z, likelihood).

    Works on any model exposing ``.loss(X, Y)`` whose variational Parameters
    are named ``q_mu``/``q_sqrt`` (KronGP) or ``u_*m``/``u_*s_sqrt``
    (OnOffSVGP); discovery is by those name patterns over the pytree paths.
    """

    def __init__(
        self,
        model,
        *,
        gamma: float = 0.1,
        adam_lr: float = 1e-3,
        gamma_warmup: int = 0,
        gamma_init: float = 1e-4,
        max_mean_step: float = 10.0,
        kron_joint: bool = False,
        kl_cap: Optional[float] = 10.0,
    ):
        from ..core.parameters import is_parameter

        # Kron-factored covariance family (q_sqrt_factors present): the mean
        # gets the exact fixed-covariance natural step; the covariance factors
        # train under Adam (they live on the ⊗ manifold, no diagonal dual) —
        # unless ``kron_joint=True``: then each step takes the exact joint
        # natural step on (m, Σ_p) for one factor p (alternating by step
        # parity; see natgrad_update_block_kron) and the factors are frozen
        # for Adam like every other variational parameter.
        self._kron_cov = any(
            "q_sqrt_factors" in jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(
                model, is_leaf=is_parameter
            )[0]
        )
        self.kron_joint = bool(kron_joint) and self._kron_cov

        self.gamma = float(gamma)
        self.gamma_warmup = int(gamma_warmup)
        self.gamma_init = float(gamma_init)
        self.max_mean_step = float(max_mean_step)
        # per-step KL(q′‖q) budget for the kron-family natural steps (nats);
        # None or any value ≤ 0 disables (matching the CLI's "0 disables"
        # semantics — a literal 0 cap would silently freeze the variational
        # step at scale 0). See natgrad_update_mean_kron — this is what keeps
        # the unwhitened kron family from diverging at any γ.
        self.kl_cap = float(kl_cap) if kl_cap is not None and kl_cap > 0 else None

        # freeze variational params for the Adam side by labelling them frozen
        def label(path, leaf):
            name = jax.tree_util.keystr(path)
            if is_parameter(leaf) and self._is_variational(name):
                return jax.tree_util.tree_map(lambda _: "frozen", leaf)
            if is_parameter(leaf):
                if not leaf.trainable:
                    return jax.tree_util.tree_map(lambda _: "frozen", leaf)
                return jax.tree_util.tree_map(lambda _: "adam", leaf)
            return jax.tree_util.tree_map(lambda _: "adam", leaf)

        labels = jax.tree_util.tree_map_with_path(label, model, is_leaf=is_parameter)
        self.adam = optax.chain(
            optax.zero_nans(),
            optax.multi_transform(
                {"adam": optax.adam(adam_lr), "frozen": optax.set_to_zero()}, labels
            ),
        )
        self._step = None

    def _is_variational(self, path_name: str) -> bool:
        # In the default kron mode the covariance factors train under Adam
        # (only the mean gets the natural step), so they must not be frozen
        # here; in kron_joint mode the block natural step owns them.
        if "q_sqrt_factors" in path_name:
            return self.kron_joint
        return (
            "q_mu" in path_name
            or "q_sqrt" in path_name
            or "u_fm" in path_name
            or "u_gm" in path_name
            or "u_fs_sqrt" in path_name
            or "u_gs_sqrt" in path_name
        )

    def gamma_at(self, step):
        return gamma_schedule(
            step, gamma=self.gamma, warmup=self.gamma_warmup, gamma_init=self.gamma_init
        )

    def init(self, model):
        return self.adam.init(model)

    def _natgrad_apply(self, model, grads, gamma, step=0):
        """Apply one natural-gradient step to every variational pair; grads
        are raw-space loss gradients. ``step`` (traced ok) selects which
        Kronecker factor the joint block step updates in kron_joint mode."""
        from ..core.parameters import is_parameter

        flat_m, treedef = jax.tree_util.tree_flatten_with_path(
            model, is_leaf=is_parameter
        )
        flat_g = jax.tree_util.tree_flatten_with_path(grads, is_leaf=is_parameter)[0]
        by_name = {
            jax.tree_util.keystr(p): (leaf, g[1]) for (p, leaf), g in zip(flat_m, flat_g)
        }

        new_leaves = {}
        for name, (leaf, gleaf) in by_name.items():
            if not (
                is_parameter(leaf)
                and ("q_mu" in name or "u_fm" in name or "u_gm" in name)
            ):
                continue
            # Kron-factored covariance: exact natural step on the mean with
            # S = ⊗ C_p C_pᵀ fixed (factors themselves train under Adam).
            # Gated on the kron family AND on the replace actually rewriting
            # the name: for dense models (u_fm/u_gm, or q_mu with no factors)
            # the replace is a no-op, factors_prefix == name would match the
            # mean leaf itself, and the mean would take a bogus rank-1
            # "natural" step while the diag (m, s) update below is skipped —
            # silently freezing u_*s_sqrt (Adam has them labelled frozen).
            factor_names = []
            if self._kron_cov and "q_mu" in name:
                factors_prefix = name.replace("q_mu", "q_sqrt_factors")
                if factors_prefix != name:
                    factor_names = sorted(
                        n for n in by_name if n.startswith(factors_prefix)
                    )
            if factor_names and self.kron_joint:
                # exact joint natural step on (m, Σ_p), factor p alternating
                # by step parity — block-coordinate natural descent on the
                # full ⊗-manifold (ROADMAP #9)
                C_leaves = [by_name[n][0] for n in factor_names]
                C_vals = tuple(c.value for c in C_leaves)
                g_Cs = tuple(by_name[n][1].raw for n in factor_names)
                P = len(C_vals)

                def make_branch(p):
                    def branch(m_val, C_vals, g_m, g_Cs, gam):
                        m_new, Cp_new = natgrad_update_block_kron(
                            m_val, list(C_vals), p, g_m, g_Cs[p], gam,
                            max_mean_step=self.max_mean_step,
                            kl_cap=self.kl_cap,
                        )
                        return m_new, tuple(
                            Cp_new if q == p else C for q, C in enumerate(C_vals)
                        )

                    return branch

                m_new, Cs_new = jax.lax.switch(
                    jnp.mod(jnp.asarray(step, jnp.int32), P),
                    [make_branch(p) for p in range(P)],
                    leaf.value, C_vals, gleaf.raw, g_Cs, gamma,
                )
                new_leaves[name] = leaf.replace(raw=m_new)
                for n, cl, cn in zip(factor_names, C_leaves, Cs_new):
                    new_leaves[n] = cl.replace(raw=cn)
                continue
            if factor_names:
                C_factors = [by_name[n][0].value for n in factor_names]
                m_new = natgrad_update_mean_kron(
                    leaf.value, C_factors, gleaf.raw, gamma,
                    max_mean_step=self.max_mean_step,
                    kl_cap=self.kl_cap,
                )
                new_leaves[name] = leaf.replace(raw=m_new)
                continue
            sq_name = (
                name.replace("q_mu", "q_sqrt")
                .replace("u_fm", "u_fs_sqrt")
                .replace("u_gm", "u_gs_sqrt")
            )
            if sq_name not in by_name:
                continue
            sq_leaf, sq_g = by_name[sq_name]
            mu = leaf.value
            s = sq_leaf.value
            # d loss / d constrained: mu is identity; s via softplus jac
            dmu = gleaf.raw
            ds_draw = jax.nn.sigmoid(sq_leaf.raw)  # softplus'
            ds = sq_g.raw / jnp.maximum(ds_draw, 1e-12)
            m_new, s_new = natgrad_update_diag(
                mu, s, dmu, ds, gamma, max_mean_step=self.max_mean_step
            )
            new_leaves[name] = leaf.replace(raw=m_new)
            new_leaves[sq_name] = sq_leaf.replace_value(s_new)

        if new_leaves:
            rebuilt = [
                new_leaves.get(jax.tree_util.keystr(p), leaf) for p, leaf in flat_m
            ]
            model = jax.tree_util.tree_unflatten(treedef, rebuilt)
        return model

    def _step_body(self, model, opt_state, X, Y, gamma, step=0):
        loss, grads = jax.value_and_grad(lambda m: m.loss(X, Y))(model)
        # Adam on non-variational params
        updates, opt_state = self.adam.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        # natural gradient on each (q_mu, q_sqrt) pair; γ and step are traced
        model = self._natgrad_apply(model, grads, gamma, step)
        return model, opt_state, loss

    def make_step(self):
        """Jitted (model, opt_state, X, Y[, gamma, step]) — γ and the step
        index are always passed as traced scalars (defaults: the trainer's γ,
        step 0), so every (γ, step) of the schedule reuses one compilation."""
        jitted = jax.jit(self._step_body)
        default = jnp.asarray(self.gamma, jnp.float32)

        def step(model, opt_state, X, Y, gamma=None, step_idx=0):
            g = default if gamma is None else jnp.asarray(gamma, jnp.float32)
            return jitted(
                model, opt_state, X, Y, g, jnp.asarray(step_idx, jnp.int32)
            )

        return step

    def make_scan_step(self, *, unroll: int = 4, mesh=None):
        """Jitted (model, opt_state, Xs, Ys, gammas, steps) running K
        natgrad+Adam steps per dispatch (Xs: (K,B,D), gammas/steps: (K,));
        buffers donated.

        With a ``mesh`` (parallel.make_mesh) each step's (B, D) minibatch is
        sharded over the mesh ``data`` axis — pure data parallelism. The
        parameters stay replicated; XLA inserts one gradient psum over ICI per
        scan iteration and the natural-gradient algebra (small per-factor
        matrices) runs replicated on every device, so the dp trajectory is
        the single-device one (equivalence-tested on the 8-virtual-device CPU
        mesh, tests/test_parallel_scan.py). B must divide by the data-axis
        size."""

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _step(model, opt_state, Xs, Ys, gammas, steps):
            def body(carry, batch):
                model, opt_state = carry
                X, Y, gamma, i = batch
                model, opt_state, loss = self._step_body(
                    model, opt_state, X, Y, gamma, i
                )
                return (model, opt_state), loss

            (model, opt_state), losses = jax.lax.scan(
                body, (model, opt_state), (Xs, Ys, gammas, steps), unroll=unroll
            )
            return model, opt_state, losses

        if mesh is None:
            return _step

        from jax.sharding import NamedSharding, PartitionSpec as P

        block_sh = NamedSharding(mesh, P(None, "data", None))
        n_data = mesh.shape["data"]

        def step(model, opt_state, Xs, Ys, gammas, steps):
            assert Xs.shape[1] % n_data == 0, (
                f"batch size {Xs.shape[1]} not divisible by data axis {n_data}"
            )
            Xs = jax.device_put(Xs, block_sh)
            Ys = jax.device_put(Ys, block_sh)
            return _step(model, opt_state, Xs, Ys, gammas, steps)

        step.jitted = _step
        return step

    def _q_only_step(self, model, X, Y, gamma, step_idx, factor_state):
        """One natural step on the variational partition at frozen hypers:
        q-gradients are taken with the factorization injected (no chol_inv,
        no hyper cotangents in the backward) and the Adam chain is untouched
        — the natgrad analogue of training.alternating's q-step."""
        from .alternating import partition_model

        q, h, merge = partition_model(model)

        def q_loss(q_leaves):
            return merge(q_leaves, h).loss(X, Y, factor_state=factor_state)

        loss, gq = jax.value_and_grad(q_loss)(q)
        zero_h = jax.tree_util.tree_map(jnp.zeros_like, h)
        grads = merge(gq, zero_h)
        model = self._natgrad_apply(model, grads, gamma, step_idx)
        return model, loss

    def make_device_scan_step(
        self, Xtrain, Ytrain, batch_size: int, *, unroll: int = 4, mesh=None,
        hyper_every: int = 0,
    ):
        """Device-sampling variant of make_scan_step (mirrors
        training/scan.make_device_sampling_scan_step): the training set lives
        in HBM, the whole dispatch's minibatches are drawn with one gather
        inside the jitted step, and the host ships one PRNG key + the (K,)
        γ/step schedules per dispatch. (model, opt_state, block_key, gammas,
        steps) -> (model, opt_state, losses).

        With a ``mesh`` the training set lives replicated on every device and
        the drawn minibatch is constrained to the mesh ``data`` axis — same
        dp semantics (and identical index sequence) as the single-device
        sampler for the same key.

        ``hyper_every`` > 0: block-coordinate cadence (see
        training.alternating) — the full natgrad+Adam step runs once per
        group, the remaining steps take the natural step on q only with the
        factorization precomputed (zero chol_inv in the q-scan body).
        Requires a Kron-family model (factor_state()/loss(factor_state=))
        and K must divide the dispatch length; does not compose with
        ``mesh``."""
        Xtrain = jnp.asarray(Xtrain)
        Ytrain = jnp.asarray(Ytrain)
        N = Xtrain.shape[0]
        if hyper_every:
            if hyper_every < 2:
                raise ValueError(f"hyper_every must be >= 2 (got {hyper_every})")
            if mesh is not None:
                raise ValueError("hyper_every does not compose with mesh")

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def alt_step(model, opt_state, block_key, gammas, steps):
                K = gammas.shape[0]
                if K % hyper_every:
                    raise ValueError(
                        f"dispatch length ({K}) must divide by hyper_every "
                        f"({hyper_every})"
                    )
                idx = jax.random.randint(block_key, (K * batch_size,), 0, N)
                G = K // hyper_every
                Xs = Xtrain[idx].reshape(
                    G, hyper_every, batch_size, *Xtrain.shape[1:]
                )
                Ys = Ytrain[idx].reshape(
                    G, hyper_every, batch_size, *Ytrain.shape[1:]
                )
                gg = gammas.reshape(G, hyper_every)
                ii = steps.reshape(G, hyper_every)

                def outer(carry, inp):
                    model, opt_state = carry
                    Xg, Yg, gams, idxs = inp
                    model, opt_state, loss0 = self._step_body(
                        model, opt_state, Xg[0], Yg[0], gams[0], idxs[0]
                    )
                    st = jax.lax.stop_gradient(model.factor_state())

                    def q_body(m, inp1):
                        X, Y, gamma, i = inp1
                        m, loss = self._q_only_step(m, X, Y, gamma, i, st)
                        return m, loss

                    model, q_losses = jax.lax.scan(
                        q_body, model, (Xg[1:], Yg[1:], gams[1:], idxs[1:]),
                        unroll=unroll,
                    )
                    losses = jnp.concatenate([loss0[None], q_losses])
                    return (model, opt_state), losses

                (model, opt_state), losses = jax.lax.scan(
                    outer, (model, opt_state), (Xs, Ys, gg, ii)
                )
                return model, opt_state, losses.reshape(-1)

            return alt_step

        blk_sh = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            assert batch_size % mesh.shape["data"] == 0, (
                f"batch size {batch_size} not divisible by data axis "
                f"{mesh.shape['data']}"
            )
            blk_sh = NamedSharding(mesh, P(None, "data", None))
            rep = NamedSharding(mesh, P())
            Xtrain = jax.device_put(Xtrain, rep)
            Ytrain = jax.device_put(Ytrain, rep)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(model, opt_state, block_key, gammas, steps):
            # ONE draw + ONE gather per dispatch (same staging rationale as
            # training/scan.make_device_sampling_scan_step: a per-step gather
            # re-stages the training set into scoped VMEM every step).
            K = gammas.shape[0]
            idx = jax.random.randint(block_key, (K * batch_size,), 0, N)
            Xs = Xtrain[idx].reshape(K, batch_size, *Xtrain.shape[1:])
            Ys = Ytrain[idx].reshape(K, batch_size, *Ytrain.shape[1:])
            if blk_sh is not None:
                Xs = jax.lax.with_sharding_constraint(Xs, blk_sh)
                Ys = jax.lax.with_sharding_constraint(Ys, blk_sh)

            def body(carry, inp):
                model, opt_state = carry
                X, Y, gamma, i = inp
                model, opt_state, loss = self._step_body(
                    model, opt_state, X, Y, gamma, i
                )
                return (model, opt_state), loss

            (model, opt_state), losses = jax.lax.scan(
                body, (model, opt_state), (Xs, Ys, gammas, steps), unroll=unroll
            )
            return model, opt_state, losses

        return step


def fit_natgrad_scanned(
    model,
    data,
    *,
    num_iter: int,
    batch_size: int,
    num_inner: int = 50,
    gamma: float = 0.1,
    gamma_warmup: int = 2000,
    gamma_init: float = 1e-4,
    adam_lr: float = 1e-3,
    adam_warmup: int = 0,
    max_mean_step: float = 10.0,
    kron_joint: bool = False,
    kl_cap: Optional[float] = 10.0,
    log_every_blocks: int = 4,
    log_fn=print,
    ckpt_manager=None,
    recover_on_nan: bool = True,
    metric_logger=None,
    resume: bool = False,
    sampler: str = "host",
    sampler_seed: int = 0,
    mesh=None,
    hyper_every: int = 0,
):
    """Production natural-gradient training: scanned K-step dispatches with
    the γ-warmup schedule threaded through as per-step traced scalars.

    ``adam_warmup``: number of initial steps trained with plain (all-param)
    Adam before switching to the natgrad/Adam split — the freshly-initialised
    gate's expectation-space gradients are the divergence driver; a short
    Adam phase moves the model into the basin where natural steps are stable.

    Production machinery (same contract as ``fit_scanned``, which see):

    - ``ckpt_manager``: periodic Orbax checkpoints of (model, trainer adam
      state) at the manager's cadence, plus one at the start of the natgrad
      phase so NaN recovery always has a restore target. Checkpoint steps are
      *global* (warmup + natgrad); the γ schedule is keyed to the natgrad
      phase, so a restored run resumes the schedule exactly.
    - ``recover_on_nan``: a non-finite block loss restores from the latest
      checkpoint instead of poisoning the run; poisoned state is never saved.
    - ``resume=True``: restore the latest checkpoint (skipping the Adam
      warmup, which is only run on a fresh start) and fast-forward the host
      minibatch stream — the resumed trajectory reproduces the uninterrupted
      one.
    - ``metric_logger``: JSONL scalars (loss/elbo/gamma) at the log cadence.
    - ``sampler="device"``: training set lives in HBM, minibatches drawn
      inside the jitted step (make_device_scan_step) — host traffic per
      dispatch is one PRNG key + the (K,) γ schedule. Requires ``data`` to
      expose the ``.arrays`` property.
    - ``mesh``: data-parallel training over a jax.sharding.Mesh — the
      per-step minibatch shards over the mesh ``data`` axis, parameters
      replicated, one gradient psum per scan iteration; the trajectory is
      the single-device one (the natural-gradient algebra runs replicated).
      Tensor parallelism (``model`` axis > 1) is not supported with natgrad:
      the factored natural steps need the full variational rows.
    - Ctrl-C checkpoints the current step and returns ``interrupted=True``.
    """
    import time

    import numpy as _np

    from .loop import FitResult, block_for_interrupt, save_final
    from .scan import fit_scanned, stage_batches

    # Honor small budgets: a --iters 500 probe must not silently train the
    # full 1000-step Adam warm-start plus a 50-step natgrad block (87× the
    # asked budget at --iters 12). Cap the warm-start at half the requested
    # steps and the natgrad block size at the remainder; production budgets
    # (num_iter ≥ 2·adam_warmup) are unchanged.
    num_iter = int(num_iter)
    adam_warmup = min(int(adam_warmup), num_iter // 2)
    num_inner = max(1, min(int(num_inner), num_iter - adam_warmup))
    if hyper_every and num_inner % hyper_every:
        raise ValueError(
            f"num_inner ({num_inner}) must divide by hyper_every "
            f"({hyper_every}) — adjust scan_inner or the step budget"
        )
    if hyper_every and not hasattr(model, "factor_state"):
        raise ValueError(
            "hyper_every requires a Kron-family model exposing "
            "factor_state()/loss(factor_state=...)"
        )

    trainer = NaturalGradientTrainer(
        model, gamma=gamma, adam_lr=adam_lr,
        gamma_warmup=gamma_warmup, gamma_init=gamma_init,
        max_mean_step=max_mean_step, kron_joint=kron_joint, kl_cap=kl_cap,
    )

    start_step = None
    opt_state = None
    if resume and ckpt_manager is not None:
        restored = ckpt_manager.restore_latest(model, trainer.init(model))
        if restored is not None:
            model, opt_state, start_step = restored
            log_fn(f"resumed natgrad from checkpoint at step {start_step}")
            if sampler != "device" and start_step and hasattr(data, "skip"):
                data.skip(batch_size, start_step)

    if start_step is not None and start_step >= num_iter:
        # resumed a completed run: training past the requested budget (and
        # advancing the checkpoint) would make --resume non-idempotent —
        # mirror the Adam path's guard (runners._fit_auto). final_loss is
        # evaluated on the first training rows when the dataset exposes them
        # so health-signal consumers see the restored state, not NaN-unknown.
        log_fn("checkpoint is already at or past num_iter; nothing to train")
        final = float("nan")
        if hasattr(data, "arrays"):
            Xa, Ya = data.arrays
            b0 = min(batch_size, Xa.shape[0])
            final = float(
                jax.jit(lambda m, X, Y: m.loss(X, Y))(
                    model, jnp.asarray(Xa[:b0]), jnp.asarray(Ya[:b0])
                )
            )
        return FitResult(model=model, opt_state=opt_state, final_loss=final)

    if start_step is None:
        if adam_warmup:
            warm = fit_scanned(
                model, data, num_iter=adam_warmup, batch_size=batch_size,
                num_inner=min(num_inner, adam_warmup), learning_rate=adam_lr,
                log_every_blocks=0, log_fn=log_fn,
                sampler=sampler, sampler_seed=sampler_seed, mesh=mesh,
            )
            if warm.interrupted:
                return warm
            model = warm.model
        opt_state = trainer.init(model)
        start_step = adam_warmup

    num_iter = max(num_iter, start_step + num_inner)
    device_mode = sampler == "device"
    place = None
    if mesh is not None:
        from ..parallel import replicate

        place = replicate
        model = place(mesh, model)
        opt_state = place(mesh, opt_state)
    if hyper_every and (not device_mode or mesh is not None):
        raise ValueError(
            "hyper_every (block-coordinate natgrad) requires "
            "sampler='device' and no mesh"
        )
    if device_mode:
        Xd, Yd = data.arrays
        step = trainer.make_device_scan_step(
            Xd, Yd, batch_size, mesh=mesh, hyper_every=hyper_every
        )
    else:
        step = trainer.make_scan_step(mesh=mesh)

    if ckpt_manager is not None and ckpt_manager.latest_step() is None:
        ckpt_manager.save_at(start_step, model, opt_state)

    losses = []
    # ceil, matching fit_scanned: never train fewer steps than asked
    num_blocks = max(1, -(-(num_iter - start_step) // num_inner))
    t_start = time.time()
    timed_steps = 0
    steps_done = start_step
    restored_this_block = False
    try:
        for b in range(num_blocks):
            restored_this_block = False
            # γ schedule is keyed to the natgrad-phase-local step so warmup /
            # resume offsets don't distort the ramp
            local = steps_done - adam_warmup
            local_steps = jnp.arange(local, local + num_inner, dtype=jnp.int32)
            gammas = trainer.gamma_at(local_steps)
            if device_mode:
                # ceil, not floor: when adam_warmup is not a multiple of
                # num_inner, floor(steps_done/num_inner) would reuse the
                # warmup phase's block-0 key and replay its exact minibatch
                # sequence; ceil always starts strictly past the warmup's
                # block indices (identical to floor when the warmup length
                # is a multiple of num_inner — the production case)
                block_key = jnp.asarray(
                    _np.array(
                        [sampler_seed, -(-steps_done // num_inner)], dtype=_np.uint32
                    )
                )
                model, opt_state, block_losses = step(
                    model, opt_state, block_key, gammas, local_steps
                )
            else:
                Xs, Ys = stage_batches(data, batch_size, num_inner)
                model, opt_state, block_losses = step(
                    model, opt_state, Xs, Ys, gammas, local_steps
                )
            prev_steps = steps_done
            steps_done += num_inner
            if b == 0:
                jax.block_until_ready(block_losses)
                t_start = time.time()
            else:
                timed_steps += num_inner

            is_log = log_every_blocks and b % log_every_blocks == 0
            ckpt_due = ckpt_manager is not None and ckpt_manager.crossed(
                prev_steps, steps_done
            )
            # Sync only when this block needs the loss value (see fit_scanned
            # for the measured cost of per-block syncs). Never checkpoint
            # unverified state.
            if is_log or ckpt_due:
                last = float(block_losses[-1])
                if not jnp.isfinite(last):
                    log_fn(f"step {steps_done:>8d}  NON-FINITE loss")
                    if ckpt_manager is not None and recover_on_nan:
                        restored = ckpt_manager.restore_latest(model, opt_state)
                        if restored is not None:
                            model, opt_state, from_step = restored
                            if place is not None:
                                # restored leaves are host arrays; re-place to
                                # keep the compiled executable's shardings
                                model = place(mesh, model)
                                opt_state = place(mesh, opt_state)
                            restored_this_block = True
                            log_fn(f"restored from checkpoint at step {from_step}")
                    continue
                if ckpt_due:
                    ckpt_manager.save_at(steps_done, model, opt_state)
                if is_log:
                    losses.append(last)
                    log_fn(f"step {steps_done:>8d}  loss {last:.6f}")
                    if metric_logger is not None:
                        metric_logger.log(
                            steps_done,
                            scalars={
                                "loss": last,
                                "elbo": -last,
                                "gamma": float(trainer.gamma_at(steps_done - adam_warmup)),
                            },
                        )
    except KeyboardInterrupt as ki:
        block_for_interrupt(model, log_fn, ki)
        log_fn(f"interrupted at step {steps_done} — checkpointing for resume")
        if ckpt_manager is not None:
            last = float(block_losses[-1]) if steps_done > start_step else 0.0
            if jnp.isfinite(last):
                ckpt_manager.save_at(steps_done, model, opt_state)
            else:
                log_fn("interrupt state is non-finite — not checkpointed")
        elapsed = max(time.time() - t_start, 1e-12)
        return FitResult(
            model=model,
            opt_state=opt_state,
            losses=losses,
            steps_per_sec=timed_steps / elapsed if timed_steps else 0.0,
            interrupted=True,
        )
    jax.block_until_ready(model)
    # same silent-NaN closure as fit_scanned: one final sync regardless of
    # logging/checkpoint cadence
    final_loss = float(block_losses[-1]) if num_blocks else 0.0
    if not jnp.isfinite(final_loss) and not restored_this_block:
        raise FloatingPointError(
            f"fit_natgrad_scanned finished at step {steps_done} with a "
            f"non-finite loss ({final_loss}); the trained state is unusable. "
            "Enable checkpointing (ckpt_manager) to get NaN recovery mid-run."
        )
    save_final(ckpt_manager, steps_done, restored_this_block, model, opt_state, log_fn)
    elapsed = max(time.time() - t_start, 1e-12)
    return FitResult(
        model=model,
        opt_state=opt_state,
        losses=losses,
        steps_per_sec=timed_steps / elapsed if timed_steps else 0.0,
        final_loss=(
            final_loss if num_blocks and not restored_this_block else float("nan")
        ),
    )
