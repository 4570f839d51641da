"""Kronecker-structured (separable space ⊗ time) sparse variational GPs.

Re-design of the pptr experiment graphs: scripts/onoff.py (two-GP on/off),
scripts/svgp.py (regression), scripts/classifier.py (probit classifier), and
the predict modules onofftf/{onoffpred,svgppred,svcppred}.py — the reference's
seven copy-pasted ``kron_inf``/``build_prior_kl`` closures collapse into the
shared ``KronGP`` component here.

The inducing grid is Z = Z_s × Z_t (e.g. 10 spatial kmeans centres × 100
temporal knots ⇒ M=1000) but no M×M or B×B matrix is ever materialized: KL
and conditional use the factored algebra in ops.{gauss_kl,conditionals}.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.config import default_jitter
from ..core.parameters import Parameter, param, positive_param
from ..ops import conditionals, gauss_kl, linalg
from ..ops.probit import probit_expectations
from .onoff import OnOffPrediction


def gen_input_masks(Zs: Sequence[np.ndarray]) -> Tuple[Tuple[int, ...], ...]:
    """Columns of X handled by each factor — reference ``_gen_inp_mask``
    (scripts/onoff.py:243-250): factors consume consecutive column blocks."""
    masks = []
    start = 0
    for Z in Zs:
        d = Z.shape[1]
        masks.append(tuple(range(start, start + d)))
        start += d
    return tuple(masks)


@struct.dataclass
class KronGP:
    """One GP with a Kronecker inducing grid. Posterior covariance families:
    diagonal (the reference's only option) or Kronecker-factored full
    (S = ⊗_p C_p C_pᵀ, our extension — set ``q_cov="kron"`` in create)."""

    kernels: Tuple[Any, ...]
    Zs: Tuple[Parameter, ...]
    q_mu: Parameter
    q_sqrt: Parameter  # diagonal std-devs, (M, 1), positive
    input_masks: Tuple[Tuple[int, ...], ...] = struct.field(pytree_node=False)
    jitter: float = struct.field(pytree_node=False)
    whiten: bool = struct.field(pytree_node=False, default=False)
    # Kronecker-factored full covariance: per-factor lower-tri (M_p, M_p)
    # Cholesky parameters. None = diagonal family (q_sqrt used instead).
    q_sqrt_factors: Optional[Tuple[Parameter, ...]] = None

    @classmethod
    def create(
        cls,
        kernels: Sequence,
        Zs: Sequence[np.ndarray],
        *,
        jitter: Optional[float] = None,
        q_mu_init: Optional[np.ndarray] = None,
        q_mu_scale: float = 0.1,
        lr: Optional[float] = None,
        seed: int = 0,
        whiten: bool = False,
        q_cov: str = "diag",
    ) -> "KronGP":
        M = int(np.prod([Z.shape[0] for Z in Zs]))
        rng = np.random.RandomState(seed)
        q_mu = q_mu_init if q_mu_init is not None else rng.randn(M, 1) * q_mu_scale
        factors = None
        if q_cov == "kron":
            from ..core.bijectors import FillLowerTriangular

            factors = tuple(
                param(np.eye(Z.shape[0]), FillLowerTriangular(), lr=lr) for Z in Zs
            )
        elif q_cov != "diag":
            raise ValueError(f"unknown q_cov family: {q_cov!r}")
        return cls(
            kernels=tuple(kernels),
            Zs=tuple(param(Z, lr=lr) for Z in Zs),
            q_mu=param(q_mu, lr=lr),
            # unused (frozen) when the kron-factored covariance is active
            q_sqrt=positive_param(np.ones((M, 1)), lr=lr, trainable=factors is None),
            input_masks=gen_input_masks(Zs),
            jitter=float(jitter if jitter is not None else default_jitter()),
            whiten=whiten,
            q_sqrt_factors=factors,
        )

    @property
    def factor_sizes(self) -> Tuple[int, ...]:
        return tuple(p.shape[0] for p in self.Zs)

    def gram_factors(self):
        return [
            linalg.add_jitter(k.K(Z.value), self.jitter)
            for k, Z in zip(self.kernels, self.Zs)
        ]

    def factor_state(self):
        """(Ls, Linvs) = chol_inv of the factor grams — computed ONCE per step
        and shared by prior_kl and predict_f, so the whole ELBO graph contains
        exactly one small factorization per Kronecker factor and is otherwise
        solve-free (matmuls against L_p⁻¹; see linalg.chol_inv)."""
        pairs = [linalg.chol_inv(Kp) for Kp in self.gram_factors()]
        return tuple(L for L, _ in pairs), tuple(Li for _, Li in pairs)

    def prior_kl(self, factor_state=None) -> jnp.ndarray:
        if self.whiten:
            # white prior: no factor grams in the KL at all
            if self.q_sqrt_factors is not None:
                return gauss_kl.gauss_kl_kron_full(
                    self.q_mu.value, [C.value for C in self.q_sqrt_factors], None
                )
            return gauss_kl.gauss_kl(self.q_mu.value, self.q_sqrt.value, None)
        if factor_state is None:
            factor_state = self.factor_state()
        if self.q_sqrt_factors is not None:
            return gauss_kl.gauss_kl_kron_full(
                self.q_mu.value,
                [C.value for C in self.q_sqrt_factors],
                factor_state=factor_state,
            )
        return gauss_kl.gauss_kl_kron(
            self.q_mu.value, self.q_sqrt.value, factor_state=factor_state
        )

    def predict_f(self, Xnew: jnp.ndarray, factor_state=None, *, full_cov: bool = False):
        return conditionals.kron_conditional(
            Xnew,
            self.kernels,
            [Z.value for Z in self.Zs],
            self.q_mu.value,
            self.q_sqrt.value,
            self.input_masks,
            jitter=self.jitter,
            whiten=self.whiten,
            q_sqrt_factors=None
            if self.q_sqrt_factors is None
            else [C.value for C in self.q_sqrt_factors],
            factor_state=factor_state if factor_state is not None else self.factor_state(),
            full_cov=full_cov,
        )

    def predict_f_samples(
        self, key, Xnew: jnp.ndarray, num_samples: int = 1, *, full_cov: bool = False
    ) -> jnp.ndarray:
        """Posterior samples, (S, B, 1). ``full_cov=True`` draws *jointly*
        from the (B, B) predictive covariance (matching the dense path's
        ``SVGP.predict_f_samples(full_cov=True)``; reference full_cov branch
        onofftf/main.py:277-289) instead of independent marginals."""
        import jax

        if full_cov:
            mu, cov = self.predict_f(Xnew, full_cov=True)
            C = linalg.add_jitter(cov[:, :, 0], self.jitter)
            Lc = linalg.cholesky(C)
            eps = jax.random.normal(
                key, (num_samples, Xnew.shape[0]), dtype=mu.dtype
            )
            return (mu[:, 0][None] + eps @ Lc.T)[:, :, None]
        mu, var = self.predict_f(Xnew)
        eps = jax.random.normal(key, (num_samples,) + mu.shape, dtype=mu.dtype)
        return mu[None] + jnp.sqrt(jnp.maximum(var, 0.0))[None] * eps


@struct.dataclass
class KronSVGP:
    """Single-GP Kronecker SVGP — regression (Gaussian) or classification
    (Bernoulli), replacing scripts/svgp.py and scripts/classifier.py."""

    gp: KronGP
    likelihood: Any
    mean_const: Optional[Parameter]
    num_data: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, kernels, Zs, likelihood, *, num_data, mean_const=None, **kw) -> "KronSVGP":
        return cls(
            gp=KronGP.create(kernels, Zs, **kw),
            likelihood=likelihood,
            mean_const=None if mean_const is None else param(mean_const),
            num_data=int(num_data),
        )

    def prior_kl(self):
        return self.gp.prior_kl()

    def predict_f(self, Xnew, *, full_cov: bool = False):
        fmean, fvar = self.gp.predict_f(Xnew, full_cov=full_cov)
        if self.mean_const is not None:
            fmean = fmean + self.mean_const.value
        return fmean, fvar

    def predict_f_samples(self, key, Xnew, num_samples: int = 1, *, full_cov: bool = False):
        s = self.gp.predict_f_samples(key, Xnew, num_samples, full_cov=full_cov)
        if self.mean_const is not None:
            s = s + self.mean_const.value
        return s

    def predict_prob(self, Xnew):
        """Classifier head: p(y=1|x) = Φ̃(μ/√(1+v)) (scripts/classifier.py:139).

        Returns (pfmean, pfvar) with pfvar = p − p² as in the reference."""
        fmean, fvar = self.predict_f(Xnew)
        p = self.likelihood.predict_prob(fmean, fvar)
        return p, p - jnp.square(p)

    def elbo(
        self, X: jnp.ndarray, Y: jnp.ndarray, *, num_data=None, factor_state=None
    ) -> jnp.ndarray:
        """``num_data`` optionally overrides the (static) dataset size with a
        traced value — the hook that lets ragged batched-fold training
        (training.batched) stack models whose true N differs per fold.

        ``factor_state`` optionally injects a precomputed ``gp.factor_state()``
        — the block-coordinate trainer (training.alternating) factorizes once
        per hyper update and runs its q-only steps against that state, so the
        scan body contains no chol_inv at all."""
        # one factorization for KL + conditional
        st = self.gp.factor_state() if factor_state is None else factor_state
        kl = self.gp.prior_kl(st)
        fmean, fvar = self.gp.predict_f(X, st)
        if self.mean_const is not None:
            fmean = fmean + self.mean_const.value
        var_exp = self.likelihood.variational_expectations(fmean, fvar, Y)
        n = self.num_data if num_data is None else num_data
        scale = jnp.asarray(n, dtype=X.dtype) / X.shape[0]
        return jnp.sum(var_exp) * scale - kl

    def loss(self, X, Y, *, num_data=None, factor_state=None):
        return -self.elbo(X, Y, num_data=num_data, factor_state=factor_state)

    def factor_state(self):
        """Precomputable factorization for elbo(factor_state=...) — see
        training.alternating."""
        return self.gp.factor_state()


class HurdlePrediction(NamedTuple):
    """Joint-hurdle predictive moments: gate probability + amount latent."""

    p_on: jnp.ndarray  # P(y > 0 | x) = Φ̃(gmean/√(1+gvar))
    fmean: jnp.ndarray  # amount latent mean (log scale for LogNormal/Gamma)
    fvar: jnp.ndarray
    gmean: jnp.ndarray
    gvar: jnp.ndarray


@struct.dataclass
class KronHurdleSVGP:
    """Jointly-trained hurdle model: a Bernoulli gate GP ``g`` on 1[y>0] and a
    positive-support amount GP ``f`` on y | y>0, trained in ONE ELBO.

    The hurdle density factorizes exactly —
    log p(y) = log Bern(1[y>0] | π(x)) + 1[y>0]·log q(y | amount) — so the
    variational objective separates into a gate term over every point and an
    amount term over the positives only:

        ELBO = Σᵢ E_q(g)[log Bern(1[yᵢ>0] | Φ(gᵢ))]
             + Σ_{i: yᵢ>0} E_q(f)[log q(yᵢ | fᵢ)]  − KL_f − KL_g.

    This replaces the reference's two-stage pipeline (train a classifier,
    scripts/classifier.py; threshold; retrain a regressor on the 'on' subset,
    scripts/hurdle.py:49-57) with a single training run: both GPs see every
    minibatch, the amount term is masked (not subset) so the minibatch stream
    and the dispatch count are exactly those of a single model, and there is
    no intermediate thresholding step whose miscalls contaminate the amount
    model's training set. The amount likelihood is one of the positive-support
    heads (likelihoods.LogNormal/Gamma) or Gaussian.

    Structure mirrors KronOnOffSVGP (paired f/g vmap, shared factor_state
    hoisting for the block-coordinate trainer).
    """

    f: KronGP  # amount
    g: KronGP  # gate
    gate_likelihood: Any  # Bernoulli
    amount_likelihood: Any  # LogNormal | Gamma | Gaussian
    mean_const: Optional[Parameter]  # amount prior mean (log-scale init)
    num_data: int = struct.field(pytree_node=False)
    pair_gps: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(
        cls,
        fkernels,
        Zfs,
        gkernels,
        Zgs,
        gate_likelihood,
        amount_likelihood,
        *,
        num_data,
        mean_const=None,
        jitter=None,
        seed: int = 0,
        lr: Optional[float] = None,
        q_mu_scale: float = 0.1,
        whiten: bool = False,
        q_cov: str = "diag",
    ) -> "KronHurdleSVGP":
        import jax

        # defensive copy against aliased kernel objects (see KronOnOffSVGP)
        gkernels = jax.tree_util.tree_map(jnp.array, tuple(gkernels))
        return cls(
            f=KronGP.create(fkernels, Zfs, jitter=jitter, seed=seed, lr=lr,
                            q_mu_scale=q_mu_scale, whiten=whiten, q_cov=q_cov),
            g=KronGP.create(gkernels, Zgs, jitter=jitter, seed=seed + 1, lr=lr,
                            q_mu_scale=q_mu_scale, whiten=whiten, q_cov=q_cov),
            gate_likelihood=gate_likelihood,
            amount_likelihood=amount_likelihood,
            mean_const=None if mean_const is None else param(mean_const),
            num_data=int(num_data),
        )

    # -- paired-vmap plumbing (identical to KronOnOffSVGP) -------------------
    def _pairable(self) -> bool:
        import jax

        if not self.pair_gps:
            return False
        if jax.tree_util.tree_structure(self.f) != jax.tree_util.tree_structure(self.g):
            return False
        return all(
            a.shape == b.shape
            for a, b in zip(
                jax.tree_util.tree_leaves(self.f), jax.tree_util.tree_leaves(self.g)
            )
        )

    def prior_kl(self) -> jnp.ndarray:
        import jax

        if self._pairable():
            stacked = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]), self.f, self.g
            )
            return jnp.sum(jax.vmap(lambda gp: gp.prior_kl())(stacked))
        return self.f.prior_kl() + self.g.prior_kl()

    def _predict_fg(self, Xnew: jnp.ndarray):
        import jax

        if self._pairable():
            stacked = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]), self.f, self.g
            )
            mu, var = jax.vmap(lambda gp: gp.predict_f(Xnew))(stacked)
            return (mu[0], var[0]), (mu[1], var[1])
        return self.f.predict_f(Xnew), self.g.predict_f(Xnew)

    def factor_state(self):
        import jax

        if self._pairable():
            stacked = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]), self.f, self.g
            )
            return jax.vmap(lambda gp: gp.factor_state())(stacked)
        return (self.f.factor_state(), self.g.factor_state())

    # -- prediction -----------------------------------------------------------
    def predict(self, Xnew: jnp.ndarray) -> HurdlePrediction:
        (fmean, fvar), (gmean, gvar) = self._predict_fg(Xnew)
        if self.mean_const is not None:
            fmean = fmean + self.mean_const.value
        p = self.gate_likelihood.predict_prob(gmean, gvar)
        return HurdlePrediction(p, fmean, fvar, gmean, gvar)

    def predict_y_samples(self, key, Xnew: jnp.ndarray, num_samples: int = 1):
        """(S, B, 1) draws from the mixed predictive: gate ~ Bernoulli(p_on)
        (p_on = E[Φ(g)], the marginalized gate), amount from a latent-marginal
        draw pushed through the amount head's ``sample_y``. Zeros appear with
        probability 1−p_on — the predictive-interval companion of the point
        metrics, which the reference's predict modules cannot produce."""
        import jax

        pr = self.predict(Xnew)
        k_f, k_y, k_gate = jax.random.split(key, 3)
        eps = jax.random.normal(
            k_f, (num_samples,) + pr.fmean.shape, dtype=pr.fmean.dtype
        )
        f = pr.fmean[None] + jnp.sqrt(jnp.maximum(pr.fvar, 0.0))[None] * eps
        y = self.amount_likelihood.sample_y(k_y, f)
        on = (
            jax.random.uniform(k_gate, f.shape, dtype=f.dtype) < pr.p_on[None]
        )
        return jnp.where(on, y, jnp.zeros_like(y))

    # -- objective ------------------------------------------------------------
    def elbo(
        self, X: jnp.ndarray, Y: jnp.ndarray, *, num_data=None, factor_state=None
    ) -> jnp.ndarray:
        """``Y`` carries the raw amounts (zeros included); the gate target and
        the amount mask are derived in-graph. ``num_data``/``factor_state`` as
        in KronSVGP.elbo."""
        import jax

        def kl_and_predict(gp, Xb, st):
            st = gp.factor_state() if st is None else st
            return gp.prior_kl(st), gp.predict_f(Xb, st)

        if self._pairable():
            stacked = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]), self.f, self.g
            )
            if factor_state is None:
                kls, (mu, var) = jax.vmap(lambda gp: kl_and_predict(gp, X, None))(stacked)
            else:
                kls, (mu, var) = jax.vmap(
                    lambda gp, st: kl_and_predict(gp, X, st)
                )(stacked, factor_state)
            kl = jnp.sum(kls)
            (fmean, fvar), (gmean, gvar) = (mu[0], var[0]), (mu[1], var[1])
        else:
            stf, stg = (None, None) if factor_state is None else factor_state
            klf, (fmean, fvar) = kl_and_predict(self.f, X, stf)
            klg, (gmean, gvar) = kl_and_predict(self.g, X, stg)
            kl = klf + klg
        if self.mean_const is not None:
            fmean = fmean + self.mean_const.value

        on = (Y > 0).astype(X.dtype)
        ve_gate = self.gate_likelihood.variational_expectations(gmean, gvar, on)
        # mask-not-subset: keeps the batch shape static. Y is replaced by a
        # safe positive value at the off rows so the amount term stays FINITE
        # there (log(0) would poison the masked product's gradient — 0·inf);
        # the mask then zeroes it in both the primal and the backward pass.
        Ysafe = jnp.where(on > 0, Y, jnp.ones_like(Y))
        ve_amount = self.amount_likelihood.variational_expectations(fmean, fvar, Ysafe)
        var_exp = ve_gate + on * ve_amount
        n = self.num_data if num_data is None else num_data
        scale = jnp.asarray(n, dtype=X.dtype) / X.shape[0]
        return jnp.sum(var_exp) * scale - kl

    def loss(self, X, Y, *, num_data=None, factor_state=None):
        return -self.elbo(X, Y, num_data=num_data, factor_state=factor_state)


@struct.dataclass
class KronOnOffSVGP:
    """Two-GP zero-inflated on/off model with Kronecker inducing grids —
    the flagship pptr model (scripts/onoff.py)."""

    f: KronGP
    g: KronGP
    likelihood: Any  # OnOffGaussian
    mean_const: Optional[Parameter]
    g_mean_shift: float = struct.field(pytree_node=False)
    num_data: int = struct.field(pytree_node=False)
    exact_owen_t: bool = struct.field(pytree_node=False)
    # Batch the f and g conditionals through one vmapped pass when their
    # structures match — halves the per-step op count (one batched Cholesky/
    # solve chain instead of two). Identical math; disable to force the
    # sequential path.
    pair_gps: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(
        cls,
        fkernels,
        Zfs,
        gkernels,
        Zgs,
        likelihood,
        *,
        num_data,
        mean_const=None,
        g_mean_shift: float = 0.0,
        exact_owen_t: bool = False,
        jitter=None,
        seed: int = 0,
        lr: Optional[float] = None,
        q_mu_scale: float = 0.1,
        whiten: bool = False,
        q_cov: str = "diag",
    ) -> "KronOnOffSVGP":
        import jax

        # Defensive copy: callers often pass the same kernel objects for f and
        # g; aliased parameter buffers appearing twice in the model pytree
        # break donated train steps ("attempt to donate the same buffer
        # twice") and would silently TIE the kernels' parameters.
        gkernels = jax.tree_util.tree_map(jnp.array, tuple(gkernels))
        return cls(
            f=KronGP.create(fkernels, Zfs, jitter=jitter, seed=seed, lr=lr,
                            q_mu_scale=q_mu_scale, whiten=whiten, q_cov=q_cov),
            g=KronGP.create(gkernels, Zgs, jitter=jitter, seed=seed + 1, lr=lr,
                            q_mu_scale=q_mu_scale, whiten=whiten, q_cov=q_cov),
            likelihood=likelihood,
            mean_const=None if mean_const is None else param(mean_const),
            g_mean_shift=float(g_mean_shift),
            num_data=int(num_data),
            exact_owen_t=exact_owen_t,
        )

    def prior_kl(self) -> jnp.ndarray:
        import jax

        if self._pairable():
            stacked = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]), self.f, self.g
            )
            return jnp.sum(jax.vmap(lambda gp: gp.prior_kl())(stacked))
        return self.f.prior_kl() + self.g.prior_kl()

    def _pairable(self) -> bool:
        import jax

        if not self.pair_gps:
            return False
        tf_ = jax.tree_util.tree_structure(self.f)
        tg_ = jax.tree_util.tree_structure(self.g)
        if tf_ != tg_:
            return False
        return all(
            a.shape == b.shape
            for a, b in zip(jax.tree_util.tree_leaves(self.f), jax.tree_util.tree_leaves(self.g))
        )

    def _predict_fg(self, Xnew: jnp.ndarray):
        """(fmean, fvar), (gmean, gvar) — paired (vmapped) when possible."""
        import jax

        if self._pairable():
            stacked = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]), self.f, self.g
            )
            mu, var = jax.vmap(lambda gp: gp.predict_f(Xnew))(stacked)
            return (mu[0], var[0]), (mu[1], var[1])
        return self.f.predict_f(Xnew), self.g.predict_f(Xnew)

    def predict(self, Xnew: jnp.ndarray) -> OnOffPrediction:
        (fmean, fvar), (gmean, gvar) = self._predict_fg(Xnew)
        if self.mean_const is not None:
            fmean = fmean + self.mean_const.value
        # Optional constant prior-mean shift on g. The reference *predict*
        # module applies −1.0 (onofftf/onoffpred.py:141) though training never
        # does (scripts/onoff.py:172) — a train/predict inconsistency. Here it
        # is one explicit config knob, default 0 (the training behaviour).
        gmean = gmean + self.g_mean_shift
        e_phi, e_phi_sq, var_phi = probit_expectations(gmean, gvar, exact=self.exact_owen_t)
        gfmean = e_phi * fmean
        gfvar = e_phi_sq * fvar
        gfmeanu = var_phi * jnp.square(fmean)
        return OnOffPrediction(gfmean, gfvar, gfmeanu, fmean, fvar, gmean, gvar, e_phi, var_phi)

    def factor_state(self):
        """The f/g pair's chol_inv factorizations, in the same layout elbo
        consumes: stacked (leading f/g axis) on the paired-vmap path, a
        ((f state), (g state)) tuple otherwise. Precompute and pass to
        ``elbo(factor_state=...)`` to run steps with the factorization
        hoisted out (training.alternating)."""
        import jax

        if self._pairable():
            stacked = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]), self.f, self.g
            )
            return jax.vmap(lambda gp: gp.factor_state())(stacked)
        return (self.f.factor_state(), self.g.factor_state())

    def predict_y_samples(
        self, key, Xnew: jnp.ndarray, num_samples: int = 1
    ) -> jnp.ndarray:
        """(S, B, 1) per-point samples of the gated predictive
        y* = Φ(g*)·f* + ε — the predictive-interval companion of the
        reference's point predictions (its predict modules return moments
        only, onofftf/onoffpred.py:273-281). f*/g* are drawn from their
        posterior *marginals* at each test point (use
        ``f.predict_f_samples(full_cov=True)`` for cross-point-correlated
        latent draws); ε ~ N(0, likelihood.variance)."""
        from .onoff import gated_y_samples

        return gated_y_samples(
            self.predict(Xnew), self.likelihood.variance.value, key, num_samples
        )

    def elbo(
        self, X: jnp.ndarray, Y: jnp.ndarray, *, num_data=None, factor_state=None
    ) -> jnp.ndarray:
        """``num_data`` optionally overrides the static dataset size with a
        traced value (see KronSVGP.elbo). ``factor_state`` optionally injects
        a precomputed ``self.factor_state()`` (block-coordinate q-steps,
        training.alternating)."""
        import jax

        # One pass per GP: factorize the Kronecker grams once (chol_inv) and
        # feed both the KL and the conditional from that state; f and g run
        # through a single vmap so every small op is batched across the pair.
        def kl_and_predict(gp, Xb, st):
            st = gp.factor_state() if st is None else st
            return gp.prior_kl(st), gp.predict_f(Xb, st)

        if self._pairable():
            stacked = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]), self.f, self.g
            )
            if factor_state is None:
                kls, (mu, var) = jax.vmap(
                    lambda gp: kl_and_predict(gp, X, None)
                )(stacked)
            else:
                kls, (mu, var) = jax.vmap(
                    lambda gp, st: kl_and_predict(gp, X, st)
                )(stacked, factor_state)
            kl = jnp.sum(kls)
            (fmean, fvar), (gmean, gvar) = (mu[0], var[0]), (mu[1], var[1])
        else:
            stf, stg = (None, None) if factor_state is None else factor_state
            klf, (fmean, fvar) = kl_and_predict(self.f, X, stf)
            klg, (gmean, gvar) = kl_and_predict(self.g, X, stg)
            kl = klf + klg
        if self.mean_const is not None:
            fmean = fmean + self.mean_const.value
        gmean = gmean + self.g_mean_shift
        e_phi, e_phi_sq, var_phi = probit_expectations(
            gmean, gvar, exact=self.exact_owen_t
        )
        pred_gfmean = e_phi * fmean
        pred_gfvar = e_phi_sq * fvar
        pred_gfmeanu = var_phi * jnp.square(fmean)
        var_exp = self.likelihood.variational_expectations(
            pred_gfmean, pred_gfvar, pred_gfmeanu, Y
        )
        n = self.num_data if num_data is None else num_data
        scale = jnp.asarray(n, dtype=X.dtype) / X.shape[0]
        return jnp.sum(var_exp) * scale - kl

    def loss(self, X, Y, *, num_data=None, factor_state=None):
        return -self.elbo(X, Y, num_data=num_data, factor_state=factor_state)
