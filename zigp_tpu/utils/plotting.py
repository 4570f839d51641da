"""Diagnostic plots.

- ``plot_onoff_1d``: the full toy diagnostic (onoffgpf/PlotOnOff1D.py:8-157):
  4 main panels — data + gated prediction, signal GP f, gate probability Φ(g),
  support GP g — plus the kernel-matrix heatmap column (PlotOnOff1D.py:115-126):
  the sparse kernel Φ(g)Φ(g)ᵀ∘K_f, the latent kernel K_f, the probit kernel
  Φ(g)Φ(g)ᵀ, and the latent kernel K_g, each over the training inputs.
- ``plot_inducing_monitor``: training-time inducing-point monitoring
  (scripts/onoff.py:394-423): mean precipitation bars over time and the
  per-station temporal slices of u_fm / u_gm.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def plot_onoff_1d(
    model, x: np.ndarray, y: np.ndarray, save_path: Optional[str] = None,
    heatmaps: bool = True,
):
    """Toy diagnostic for a 1-D OnOff model (dense or Kron): 4 time-series
    panels; with ``heatmaps`` (default, needs model.kernf/kerng — the dense
    OnOffSVGP) also the reference's 4 kernel-matrix side panels."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.gridspec as gridspec
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    pred = model.predict(jnp.asarray(x))
    order = np.argsort(x[:, 0])
    xs = x[order, 0]

    def _col(a):
        return np.asarray(a)[order, 0]

    heatmaps = heatmaps and hasattr(model, "kernf") and hasattr(model, "kerng")
    if heatmaps:
        fig = plt.figure(figsize=(13, 12))
        gs = gridspec.GridSpec(4, 4)
        axes = [plt.subplot(gs[i, 0:-1]) for i in range(4)]
        heat_axes = [plt.subplot(gs[i, -1]) for i in range(4)]
    else:
        fig, axes = plt.subplots(4, 1, figsize=(10, 12), sharex=True)

    ax = axes[0]
    ax.plot(xs, _col(y[order] if y.ndim > 1 else y[order, None]), "k.", ms=3, label="y")
    gf = _col(pred.gfmean)
    fs0 = np.sqrt(np.maximum(_col(pred.fvar), 0.0))
    pgm0 = _col(pred.pgmean)
    pgs0 = np.sqrt(np.maximum(_col(pred.pgvar), 0.0))
    noise_sd = 0.0
    lik = getattr(model, "likelihood", None)
    if lik is not None and hasattr(lik, "variance"):
        noise_sd = float(np.sqrt(np.asarray(lik.variance.value)))
    # the reference's predictive band composes gate and signal uncertainty:
    # ±1.5·(√fvar·Φ̄ + √pgvar·(1−Φ̄) + √σ)  (PlotOnOff1D.py:56-58)
    band = 1.5 * (fs0 * pgm0 + pgs0 * (1.0 - pgm0) + noise_sd)
    ax.plot(xs, gf, "b-", label="E[Φ(g)·f]")
    ax.fill_between(xs, gf - band, gf + band, alpha=0.2)
    ax.set_title("data and gated prediction")
    ax.legend(loc="best", fontsize=8)

    ax = axes[1]
    fm = _col(pred.fmean)
    fs = np.sqrt(np.maximum(_col(pred.fvar), 0.0))
    ax.plot(xs, fm, "g-", label="E[f]")
    ax.fill_between(xs, fm - 2 * fs, fm + 2 * fs, alpha=0.2, color="g")
    if hasattr(model, "Zf"):
        Zf = np.asarray(model.Zf.value)[:, 0]
        ax.plot(Zf, np.full_like(Zf, fm.min()), "k^", ms=6)
    ax.set_title("signal GP f")

    ax = axes[2]
    ax.plot(xs, _col(pred.pgmean), "r-", label="E[Φ(g)]")
    ax.set_ylim(-0.05, 1.05)
    ax.set_title("gate probability Φ(g)")

    ax = axes[3]
    gm = _col(pred.gmean)
    gs = np.sqrt(np.maximum(_col(pred.gvar), 0.0))
    ax.plot(xs, gm, "m-", label="E[g]")
    ax.fill_between(xs, gm - 2 * gs, gm + 2 * gs, alpha=0.2, color="m")
    if hasattr(model, "Zg"):
        Zg = np.asarray(model.Zg.value)[:, 0]
        ax.plot(Zg, np.full_like(Zg, gm.min()), "k^", ms=6)
    ax.set_title("support GP g")

    if heatmaps:
        # kernel-matrix column over the (sorted) training inputs
        # (PlotOnOff1D.py:28-29,115-126)
        Xs = jnp.asarray(x[order])
        Kf = np.asarray(model.kernf.K(Xs))
        Kg = np.asarray(model.kerng.K(Xs))
        pg = _col(pred.pgmean)
        Kpg = pg[:, None] * pg[None, :]
        panels = (
            (Kpg * Kf, "sparse kernel  Φ(g)Φ(g)ᵀ∘K_f"),
            (Kf, "latent kernel  K_f"),
            (Kpg, "probit kernel  Φ(g)Φ(g)ᵀ"),
            (Kg, "latent kernel  K_g"),
        )
        for ax, (K, title) in zip(heat_axes, panels):
            im = ax.imshow(K, cmap="viridis")
            fig.colorbar(im, ax=ax, fraction=0.046, pad=0.03)
            ax.set_title(title, fontsize=9)
            ax.set_xticks([])
            ax.set_yticks([])

    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=110)
        plt.close(fig)
        return save_path
    return fig


def plot_inducing_monitor(
    model, Xtrain: np.ndarray, Ytrain: np.ndarray, save_path: Optional[str] = None,
    time_scale: float = 1000.0,
):
    """Kron on/off training monitor: mean target over time + temporal slices
    of both GPs' inducing means (scripts/onoff.py:394-423)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    traindf = pd.DataFrame(
        {"t": Xtrain[:, 2].ravel() * time_scale, "y": Ytrain.ravel()}
    )
    fig, (ax1, ax2, ax3) = plt.subplots(3, 1, figsize=(16, 8), sharex=True)
    mean_y = traindf.groupby("t")["y"].mean()
    ax1.bar(mean_y.index, mean_y.values, align="center")
    ax1.set_title("mean target per time index")

    for ax, gp, name in ((ax2, model.f, "u_fm"), (ax3, model.g, "u_gm")):
        # temporal factor = the one consuming input column 2 (its mask is
        # (2,)). The reference layout puts it last, but an appended
        # exogenous factor (forecast covariates) comes AFTER it — selecting
        # by mask keeps the monitor correct for 2-, 3- and exog-factor
        # grids. q_mu is row-major over factors; move the temporal axis
        # last and slice.
        sizes = gp.factor_sizes
        t_idx = len(sizes) - 1
        for i, mask in enumerate(getattr(gp, "input_masks", ()) or ()):
            if tuple(mask) == (2,):
                t_idx = i
                break
        Mt = sizes[t_idx]
        U = np.asarray(gp.q_mu.value).ravel().reshape(tuple(sizes))
        U = np.moveaxis(U, t_idx, -1).reshape(-1, Mt)
        zt = np.asarray(gp.Zs[t_idx].value).ravel()
        srt = np.argsort(zt)
        # cap the plotted slices: an exog grid multiplies the site count
        for m in range(min(U.shape[0], 128)):
            ax.plot(np.round(zt[srt] * time_scale, 4), U[m][srt], alpha=0.7)
        ax.scatter(
            np.round(zt[srt] * time_scale, 4), np.full(Mt, U.min()), color="#514A30", s=8
        )
        ax.set_title(f"{name} temporal slices per station")

    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=110)
        plt.close(fig)
        return save_path
    return fig
