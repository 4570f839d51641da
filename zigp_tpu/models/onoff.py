"""Dense-inducing OnOffSVGP: the zero-inflated two-GP model.

Re-design of ``onoffgpf/OnOffSVGP.py``: a signal GP ``f`` and a support GP
``g`` are coupled through a probit gate, y ≈ Φ(g) ⊙ f + ε. The ELBO is

    Σ E_q[log N(y | E[Φ(g)]·m_f, σ²)]-terms · (N/B)  −  KL_f  −  KL_g

with the gate expectations computed in closed form (ops.probit). Matches the
reference's math term-for-term (build_prior_KL OnOffSVGP.py:73-105,
build_likelihood :107-122, build_predict :124-152).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.config import default_jitter
from ..core.parameters import Parameter, param, positive_param
from ..ops import conditionals, gauss_kl, linalg
from ..ops.probit import probit_expectations


def gated_y_samples(pred: "OnOffPrediction", noise_var, key, num_samples: int):
    """(S, B, 1) per-point samples of y* = Φ(g*)·f* + ε from an
    OnOffPrediction's marginal moments (shared by the dense and Kron
    models' ``predict_y_samples``)."""
    import jax

    kf, kg, ke = jax.random.split(key, 3)
    shape = (num_samples,) + pred.fmean.shape
    dt = pred.fmean.dtype
    f = pred.fmean[None] + jnp.sqrt(
        jnp.maximum(pred.fvar, 0.0)
    )[None] * jax.random.normal(kf, shape, dtype=dt)
    g = pred.gmean[None] + jnp.sqrt(
        jnp.maximum(pred.gvar, 0.0)
    )[None] * jax.random.normal(kg, shape, dtype=dt)
    eps = jax.random.normal(ke, shape, dtype=dt)
    return jax.scipy.special.ndtr(g) * f + jnp.sqrt(noise_var) * eps


class OnOffPrediction(NamedTuple):
    """The 9-tuple returned by the reference's build_predict (OnOffSVGP.py:152)."""

    gfmean: jnp.ndarray  # E[Φ(g)]·E[f]
    gfvar: jnp.ndarray  # E[Φ²(g)]·Var[f]
    gfmeanu: jnp.ndarray  # Var[Φ(g)]·E[f]²
    fmean: jnp.ndarray
    fvar: jnp.ndarray
    gmean: jnp.ndarray
    gvar: jnp.ndarray
    pgmean: jnp.ndarray  # E[Φ(g)]
    pgvar: jnp.ndarray  # Var[Φ(g)]


@struct.dataclass
class OnOffSVGP:
    kernf: Any
    kerng: Any
    likelihood: Any  # OnOffGaussian
    Zf: Parameter
    Zg: Parameter
    u_fm: Parameter
    u_gm: Parameter
    u_fs_sqrt: Parameter
    u_gs_sqrt: Parameter
    mean_const: Optional[Parameter]
    num_data: int = struct.field(pytree_node=False)
    whiten: bool = struct.field(pytree_node=False)
    q_diag: bool = struct.field(pytree_node=False)
    jitter: float = struct.field(pytree_node=False)
    exact_owen_t: bool = struct.field(pytree_node=False)

    @classmethod
    def create(
        cls,
        kernf,
        kerng,
        likelihood,
        Zf: np.ndarray,
        Zg: np.ndarray,
        *,
        num_data: int,
        num_latent: int = 1,
        whiten: bool = False,
        q_diag: bool = True,
        jitter: Optional[float] = None,
        mean_const: Optional[float] = None,
        exact_owen_t: bool = False,
        u_fm_init: Optional[np.ndarray] = None,
        u_gm_init: Optional[np.ndarray] = None,
        seed: int = 0,
    ) -> "OnOffSVGP":
        Mf, Mg = Zf.shape[0], Zg.shape[0]
        rng = np.random.RandomState(seed)
        u_fm = u_fm_init if u_fm_init is not None else rng.randn(Mf, num_latent) * 0.01
        u_gm = u_gm_init if u_gm_init is not None else rng.randn(Mg, num_latent) * 0.01
        if q_diag:
            u_fs = positive_param(np.ones((Mf, num_latent)))
            u_gs = positive_param(np.ones((Mg, num_latent)))
        else:
            from ..core.bijectors import FillLowerTriangular

            u_fs = param(np.stack([np.eye(Mf)] * num_latent, 2), FillLowerTriangular())
            u_gs = param(np.stack([np.eye(Mg)] * num_latent, 2), FillLowerTriangular())
        return cls(
            kernf=kernf,
            kerng=kerng,
            likelihood=likelihood,
            Zf=param(Zf),
            Zg=param(Zg),
            u_fm=param(u_fm),
            u_gm=param(u_gm),
            u_fs_sqrt=u_fs,
            u_gs_sqrt=u_gs,
            mean_const=None if mean_const is None else param(mean_const),
            num_data=int(num_data),
            whiten=whiten,
            q_diag=q_diag,
            jitter=float(jitter if jitter is not None else default_jitter()),
            exact_owen_t=exact_owen_t,
        )

    # ---- math ----
    def prior_kl(self) -> jnp.ndarray:
        if self.whiten:
            return gauss_kl.gauss_kl(self.u_fm.value, self.u_fs_sqrt.value) + gauss_kl.gauss_kl(
                self.u_gm.value, self.u_gs_sqrt.value
            )
        Kfmm = linalg.add_jitter(self.kernf.K(self.Zf.value), self.jitter)
        Kgmm = linalg.add_jitter(self.kerng.K(self.Zg.value), self.jitter)
        return gauss_kl.gauss_kl(self.u_fm.value, self.u_fs_sqrt.value, Kfmm) + gauss_kl.gauss_kl(
            self.u_gm.value, self.u_gs_sqrt.value, Kgmm
        )

    def predict(self, Xnew: jnp.ndarray) -> OnOffPrediction:
        fmean, fvar = conditionals.conditional(
            Xnew,
            self.Zf.value,
            self.kernf,
            self.u_fm.value,
            q_sqrt=self.u_fs_sqrt.value,
            whiten=self.whiten,
            jitter=self.jitter,
        )
        if self.mean_const is not None:
            fmean = fmean + self.mean_const.value
        gmean, gvar = conditionals.conditional(
            Xnew,
            self.Zg.value,
            self.kerng,
            self.u_gm.value,
            q_sqrt=self.u_gs_sqrt.value,
            whiten=self.whiten,
            jitter=self.jitter,
        )
        e_phi, e_phi_sq, var_phi = probit_expectations(gmean, gvar, exact=self.exact_owen_t)
        gfmean = e_phi * fmean
        gfvar = e_phi_sq * fvar
        gfmeanu = var_phi * jnp.square(fmean)
        return OnOffPrediction(gfmean, gfvar, gfmeanu, fmean, fvar, gmean, gvar, e_phi, var_phi)

    def predict_y_samples(
        self, key, Xnew: jnp.ndarray, num_samples: int = 1
    ) -> jnp.ndarray:
        """(S, B, 1) per-point samples of the gated predictive
        y* = Φ(g*)·f* + ε (see gated_y_samples; the reference returns
        moments only)."""
        return gated_y_samples(
            self.predict(Xnew), self.likelihood.variance.value, key, num_samples
        )

    def elbo(self, X: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
        kl = self.prior_kl()
        pred = self.predict(X)
        var_exp = self.likelihood.variational_expectations(
            pred.gfmean, pred.gfvar, pred.gfmeanu, Y
        )
        scale = jnp.asarray(self.num_data, dtype=X.dtype) / X.shape[0]
        return jnp.sum(var_exp) * scale - kl

    def loss(self, X: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
        return -self.elbo(X, Y)
