"""Numeric telemetry: exponent histograms and dynamic-range plots.

Equivalent of the reference's histogram subsystem (reference:
fake_quantize.py:348-350 recording, histogram.py:24-105 plotting): every
observer can accumulate a 254-bin histogram of floor(log2 |x|) over
[-126, 127], and the plot helpers render per-layer spline-smoothed exponent
distributions and dynamic-range bars.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["exponent_histogram", "plot_histogram", "plot_layer_range",
           "histogram_summary"]

NUM_BINS = 254
MIN_EXP, MAX_EXP = -126, 127


def exponent_histogram(x: jax.Array) -> jax.Array:
    """254-bin histogram of floor(log2 |x|); zeros/non-finite excluded."""
    xf = jnp.abs(x.astype(jnp.float32))
    valid = jnp.isfinite(xf) & (xf > 0)
    exp = jnp.floor(jnp.log2(jnp.where(valid, xf, 1.0)))
    idx = jnp.clip(exp, MIN_EXP, MAX_EXP).astype(jnp.int32) - MIN_EXP
    weights = valid.astype(jnp.float32).reshape(-1)
    return jnp.bincount(
        idx.reshape(-1), weights=weights, length=NUM_BINS
    ).astype(jnp.float32)


def histogram_summary(hist: np.ndarray) -> Dict[str, float]:
    """Min/max/mean exponent + total count from a 254-bin histogram."""
    hist = np.asarray(hist)
    total = hist.sum()
    if total == 0:
        return {"count": 0.0, "min_exp": 0.0, "max_exp": 0.0, "mean_exp": 0.0}
    exps = np.arange(MIN_EXP, MAX_EXP + 1)
    nz = np.nonzero(hist)[0]
    return {
        "count": float(total),
        "min_exp": float(exps[nz[0]]),
        "max_exp": float(exps[nz[-1]]),
        "mean_exp": float((exps * hist).sum() / total),
    }


def _collect(histograms: Dict) -> Dict[str, np.ndarray]:
    """Flatten a 'quant_histogram' collection to {site_path: 254-bin array}."""
    import jax.tree_util as jtu

    flat = {}
    for path, leaf in jtu.tree_flatten_with_path(histograms)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        flat[name.replace("/hist", "")] = np.asarray(leaf)
    return flat


def plot_histogram(histograms: Dict, output_dir: str = "histograms",
                   smooth: bool = True):
    """Spline-smoothed exponent-distribution plot per observer group
    (reference: histogram.py:24-53).  Writes one PNG per top-level group."""
    import os
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    flat = _collect(histograms)
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for name, hist in flat.items():
        group = name.split("/")[0]
        groups.setdefault(group, {})[name] = hist

    exps = np.arange(MIN_EXP, MAX_EXP + 1)
    for group, members in groups.items():
        fig, ax = plt.subplots(figsize=(8, 4))
        for name, hist in members.items():
            y = hist
            if smooth and hist.sum() > 0:
                try:
                    from scipy.interpolate import make_interp_spline
                    nz = np.nonzero(hist)[0]
                    lo, hi = max(nz[0] - 2, 0), min(nz[-1] + 3, NUM_BINS)
                    xs = exps[lo:hi]
                    spline = make_interp_spline(xs, hist[lo:hi], k=min(3, len(xs) - 1))
                    xf = np.linspace(xs[0], xs[-1], 200)
                    ax.plot(xf, np.maximum(spline(xf), 0), label=name)
                    continue
                except Exception:
                    pass
            ax.plot(exps, y, label=name)
        ax.set_xlabel("exponent (floor(log2|x|))")
        ax.set_ylabel("count")
        ax.legend(fontsize=5)
        fig.tight_layout()
        fig.savefig(os.path.join(output_dir, f"{group}.png"), dpi=120)
        plt.close(fig)


def plot_layer_range(histograms: Dict, output_path: str = "layer_range.png"):
    """Per-observer dynamic-range bar chart (reference: histogram.py:55-105)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    flat = _collect(histograms)
    names, mins, maxs, means = [], [], [], []
    for name, hist in flat.items():
        s = histogram_summary(hist)
        if s["count"] == 0:
            continue
        names.append(name)
        mins.append(s["min_exp"])
        maxs.append(s["max_exp"])
        means.append(s["mean_exp"])
    if not names:
        return
    fig, ax = plt.subplots(figsize=(max(6, len(names) * 0.3), 4))
    x = np.arange(len(names))
    ax.bar(x, np.array(maxs) - np.array(mins), bottom=mins, width=0.6,
           alpha=0.6)
    ax.plot(x, means, "k.", markersize=3)
    ax.set_xticks(x)
    ax.set_xticklabels(names, rotation=90, fontsize=4)
    ax.set_ylabel("exponent range")
    fig.tight_layout()
    fig.savefig(output_path, dpi=120)
    plt.close(fig)
