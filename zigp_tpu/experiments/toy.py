"""Toy 1-D on/off GP experiment — the notebook workflow
(zero-inflated-gpflow.ipynb cells 3-12) as a function.

Builds the dense OnOffSVGP on data/toydata.mat with the notebook's config
(M=10 inducing per GP at linspace over the x-range, RBF ℓ=2, σ²f=1, σ²g=5,
noise 0.01) and optimizes with scipy L-BFGS-B like gpflow's Model.optimize().
The reference's converged ELBO is 488.7130771963765 (cell 10 output).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..io.datasets import load_toydata
from ..likelihoods import OnOffGaussian
from ..models import OnOffSVGP
from ..ops.kernels import RBF
from .configs import ToyOnOffConfig

REFERENCE_TOY_ELBO = 488.7130771963765


def build_toy_model(
    cfg: Optional[ToyOnOffConfig] = None,
    x: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
) -> Tuple[OnOffSVGP, np.ndarray, np.ndarray]:
    cfg = cfg or ToyOnOffConfig()
    if x is None or y is None:
        x, y, _ = load_toydata()
    # Notebook cell 7: linspace with endpoint=False and the first point
    # dropped — 9 interior knots for num_inducing=10.
    Z = np.delete(
        np.linspace(x.min(), x.max(), cfg.num_inducing, endpoint=False), 0
    ).reshape(-1, 1)
    model = OnOffSVGP.create(
        RBF.create([cfg.f_lengthscale], cfg.f_variance),
        RBF.create([cfg.g_lengthscale], cfg.g_variance),
        OnOffGaussian.create(cfg.noise_variance),
        Z,
        Z.copy(),
        num_data=x.shape[0],
        jitter=cfg.jitter,
        seed=cfg.seed,
    )
    return model, x, y


def run_toy(cfg: Optional[ToyOnOffConfig] = None, *, log_fn=print) -> dict:
    cfg = cfg or ToyOnOffConfig()
    model, x, y = build_toy_model(cfg)
    X, Y = jnp.asarray(x), jnp.asarray(y)

    elbo0 = float(model.elbo(X, Y))
    log_fn(f"initial ELBO: {elbo0:.4f}")

    if cfg.optimizer == "lbfgs":
        from ..training.scipy_opt import scipy_optimize

        model, res = scipy_optimize(
            model, lambda m: m.loss(X, Y), maxiter=cfg.maxiter,
            options={"maxcor": cfg.lbfgs_maxcor},
        )
    else:
        from ..training import DataSet, fit

        out = fit(
            model, DataSet(x, y), num_iter=cfg.maxiter, batch_size=x.shape[0],
            learning_rate=1e-2, log_every=0,
        )
        model = out.model

    elbo = float(model.elbo(X, Y))
    log_fn(f"final ELBO: {elbo:.10f}  (reference: {REFERENCE_TOY_ELBO:.10f})")
    pred = model.predict(X)
    return {
        "model": model,
        "elbo": elbo,
        "initial_elbo": elbo0,
        "prediction": pred,
        "x": x,
        "y": y,
    }
