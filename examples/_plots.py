"""Shared figure helpers for the examples (optional PNG artifacts).

Figures are written only when the ``PLOTS`` environment variable is truthy
(``PLOTS=1 python examples/...``), into ``docs/figures/`` by default — the
committed artifacts referenced from the docs. Matplotlib renders offscreen
(Agg); the examples never open windows.

Styling follows the dataviz ground rules: categorical hues in fixed order
(blue, orange, aqua), 2px lines, recessive grid, text in ink colors (never
the series color), a legend only for >= 2 series.
"""

from __future__ import annotations

import os

# categorical slots 1-3 (fixed order), surface and ink colors
PALETTE = ("#2a78d6", "#eb6834", "#1baf7a")
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2 = "#52514e"
GRID = "#e8e7e3"


def enabled() -> bool:
    return os.environ.get("PLOTS", "0") not in ("0", "")


def _fig_dir() -> str:
    d = os.environ.get(
        "PLOTS_DIR", os.path.join(os.path.dirname(__file__), "..", "docs", "figures")
    )
    os.makedirs(d, exist_ok=True)
    return d


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def save_learning_curve(
    name: str,
    curves: dict[str, list[float]],
    *,
    xlabel: str = "epoch",
    ylabel: str = "train NLL (nats)",
    title: str | None = None,
) -> str | None:
    """Line chart of one-or-more loss curves -> docs/figures/<name>.png."""
    if not enabled():
        return None
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6.4, 4.0), dpi=120)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    for i, (label, ys) in enumerate(curves.items()):
        xs = range(1, len(ys) + 1)
        ax.plot(xs, ys, color=PALETTE[i % len(PALETTE)], linewidth=2, label=label)
    ax.grid(True, color=GRID, linewidth=0.8)
    ax.set_axisbelow(True)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color(INK_2)
    ax.tick_params(colors=INK_2)
    ax.set_xlabel(xlabel, color=INK)
    ax.set_ylabel(ylabel, color=INK)
    if title:
        ax.set_title(title, color=INK, loc="left")
    if len(curves) >= 2:
        ax.legend(frameon=False, labelcolor=INK)
    path = os.path.join(_fig_dir(), f"{name}.png")
    fig.tight_layout()
    fig.savefig(path, facecolor=SURFACE)
    plt.close(fig)
    print(f"figure saved to {path}")
    return path


def save_image_grid(
    name: str,
    rows: dict[str, "object"],
    side: int,
    *,
    ncols: int = 8,
    title: str | None = None,
) -> str | None:
    """Grid of grayscale images -> docs/figures/<name>.png.

    ``rows`` maps a row label to an (N, side*side) array; each array's first
    ``ncols`` images render as one labeled row (original / masked /
    completed, samples, ...). NaN pixels render as blanks (missing).
    """
    if not enabled():
        return None
    import numpy as np

    plt = _plt()
    nrows = len(rows)
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(1.1 * ncols + 0.9, 1.15 * nrows), dpi=120, squeeze=False
    )
    fig.patch.set_facecolor(SURFACE)
    for r, (label, imgs) in enumerate(rows.items()):
        imgs = np.asarray(imgs, dtype=float)
        for c in range(ncols):
            ax = axes[r][c]
            img = imgs[c].reshape(side, side)
            masked = np.ma.masked_invalid(img)
            cmap = plt.get_cmap("gray_r").copy()
            cmap.set_bad(color="#f0dcd2")  # missing pixels as a flat warm tint
            ax.imshow(masked, cmap=cmap, vmin=0, vmax=255, interpolation="nearest")
            ax.set_xticks(())
            ax.set_yticks(())
            for spine in ax.spines.values():
                spine.set_color(GRID)
        axes[r][0].set_ylabel(label, color=INK, rotation=0, ha="right", va="center")
    if title:
        fig.suptitle(title, color=INK, x=0.02, ha="left")
    path = os.path.join(_fig_dir(), f"{name}.png")
    fig.tight_layout()
    fig.savefig(path, facecolor=SURFACE)
    plt.close(fig)
    print(f"figure saved to {path}")
    return path
