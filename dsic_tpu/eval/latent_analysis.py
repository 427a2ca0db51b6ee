"""Latent-distribution analysis: fit Student-t to empirical latent histograms
to justify the prior, and plot per-channel fits / feature maps.

Capability match for the reference's missing-but-invoked distribution_check.py
(SURVEY.md section 2 #24 — only its output artifacts remain in the repo:
latent_fit.png, latent_fit_channels.png, latent_histograms.png,
studentt_best_featuremaps.png, studentt_best_histograms.png).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import scipy.stats


def collect_latents(model, params, images: np.ndarray) -> np.ndarray:
    """(B,H,W,3) -> continuous (pre-round) y latents (B, h, w, M), so the
    Student-t MLE fit and the t-vs-Gaussian likelihood comparison run on the
    continuous density the prior actually models."""
    y_fn = jax.jit(lambda p, x: model.apply(p, x, method=model.raw_latents))
    y = y_fn(params, jnp.asarray(images))
    return np.asarray(y)


def fit_student_t(values: np.ndarray) -> dict:
    """Fit a zero-mean Student-t (nu, sigma) by scipy MLE; also fit a Gaussian
    for comparison. Returns fit params + log-likelihoods."""
    values = np.asarray(values, dtype=np.float64).ravel()
    nu, loc, sigma = scipy.stats.t.fit(values, floc=0.0)
    ll_t = float(np.sum(scipy.stats.t.logpdf(values, df=nu, loc=0.0,
                                             scale=sigma)))
    g_sigma = float(values.std())
    ll_g = float(np.sum(scipy.stats.norm.logpdf(values, scale=max(g_sigma,
                                                                  1e-9))))
    return {"nu": float(nu), "sigma": float(sigma), "loglik_t": ll_t,
            "gauss_sigma": g_sigma, "loglik_gauss": ll_g,
            "t_beats_gauss": ll_t > ll_g}


def analyze_latents(model, params, images: np.ndarray, out_dir: str,
                    n_channels_plot: int = 8) -> dict:
    """Produce the reference's analysis artifacts: overall latent fit plot,
    per-channel fits, best-channel feature maps + histograms. Returns the
    overall fit dict."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    y = collect_latents(model, params, images)
    m = y.shape[-1]

    overall = fit_student_t(y)
    xs = np.linspace(np.percentile(y, 0.5), np.percentile(y, 99.5), 400)

    fig, ax = plt.subplots(figsize=(7, 5))
    ax.hist(y.ravel(), bins=200, density=True, alpha=0.4, label="latents")
    ax.plot(xs, scipy.stats.t.pdf(xs, df=overall["nu"],
                                  scale=overall["sigma"]),
            label=f"Student-t fit (nu={overall['nu']:.2f})")
    ax.plot(xs, scipy.stats.norm.pdf(xs, scale=overall["gauss_sigma"]),
            "--", label="Gaussian fit")
    ax.set_yscale("log")
    ax.legend(); ax.set_title("latent distribution vs fits")
    fig.savefig(os.path.join(out_dir, "latent_fit.png"), dpi=120,
                bbox_inches="tight")
    plt.close(fig)

    # per-channel fits for the highest-energy channels
    energy = np.mean(np.abs(y), axis=(0, 1, 2))
    best = np.argsort(-energy)[:n_channels_plot]
    fig, axes = plt.subplots(2, (n_channels_plot + 1) // 2,
                             figsize=(3.2 * ((n_channels_plot + 1) // 2), 6))
    per_channel = []
    for ax, c in zip(np.ravel(axes), best):
        vals = y[..., c].ravel()
        fit = fit_student_t(vals)
        per_channel.append({"channel": int(c), **fit})
        ax.hist(vals, bins=100, density=True, alpha=0.4)
        xc = np.linspace(vals.min(), vals.max(), 200)
        ax.plot(xc, scipy.stats.t.pdf(xc, df=fit["nu"], scale=fit["sigma"]))
        ax.set_title(f"ch {c} nu={fit['nu']:.1f}", fontsize=8)
    fig.savefig(os.path.join(out_dir, "latent_fit_channels.png"), dpi=120,
                bbox_inches="tight")
    plt.close(fig)

    # best-channel feature maps
    fig, axes = plt.subplots(1, min(4, len(best)), figsize=(12, 3))
    for ax, c in zip(np.ravel(axes), best[:4]):
        ax.imshow(y[0, :, :, c], cmap="viridis")
        ax.set_title(f"ch {c}"); ax.axis("off")
    fig.savefig(os.path.join(out_dir, "studentt_best_featuremaps.png"),
                dpi=120, bbox_inches="tight")
    plt.close(fig)

    # raw per-channel histogram grid (reference artifact latent_histograms.png)
    n_grid = min(16, m)
    ncols = 4
    nrows = -(-n_grid // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(3.0 * ncols, 2.2 * nrows))
    for k, ax in enumerate(np.ravel(axes)):
        if k >= n_grid:
            ax.axis("off")
            continue
        ax.hist(y[..., k].ravel(), bins=80, density=True, alpha=0.6)
        ax.set_title(f"ch {k}", fontsize=8)
        ax.tick_params(labelsize=6)
    fig.suptitle("latent histograms (first channels)")
    fig.savefig(os.path.join(out_dir, "latent_histograms.png"), dpi=120,
                bbox_inches="tight")
    plt.close(fig)

    # channels where the Student-t fit beats the Gaussian by the most
    # (reference artifact studentt_best_histograms.png): rank by per-channel
    # log-likelihood gain and overlay both fits.
    gains = []
    for c in range(m):
        fit = fit_student_t(y[..., c].ravel())
        gains.append((fit["loglik_t"] - fit["loglik_gauss"], c, fit))
    gains.sort(reverse=True)
    top = gains[:min(6, m)]
    fig, axes = plt.subplots(2, 3, figsize=(11, 6))
    for ax, (gain, c, fit) in zip(np.ravel(axes), top):
        vals = y[..., c].ravel()
        ax.hist(vals, bins=100, density=True, alpha=0.4, label="latents")
        xc = np.linspace(vals.min(), vals.max(), 200)
        ax.plot(xc, scipy.stats.t.pdf(xc, df=fit["nu"], scale=fit["sigma"]),
                label="t fit")
        ax.plot(xc, scipy.stats.norm.pdf(
            xc, scale=max(fit["gauss_sigma"], 1e-9)), "--", label="gauss")
        ax.set_yscale("log")
        ax.set_title(f"ch {c} (t gain {gain:.0f} nats)", fontsize=8)
        ax.tick_params(labelsize=6)
    np.ravel(axes)[0].legend(fontsize=7)
    fig.suptitle("channels where Student-t most beats Gaussian")
    fig.savefig(os.path.join(out_dir, "studentt_best_histograms.png"),
                dpi=120, bbox_inches="tight")
    plt.close(fig)

    overall["per_channel"] = per_channel
    return overall
