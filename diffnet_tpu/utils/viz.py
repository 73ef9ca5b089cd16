"""Matplotlib visualization utilities (host-side).

Port of the reference plot helpers (reference: DiffNet/visualization.py:18-150
and the epoch-end contour callbacks, e.g. examples/poisson/parametric/
e1_complex_immersed_background.py:95-147). Kept out of jit; consumes numpy.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["plot_contours", "plot_line_cuts", "ContourPlotCallback",
           "plot_losses", "plot_point_histograms"]


def plot_contours(save_path, fields: dict, ncols=None, cmap="jet",
                  suptitle=None):
    """Grid of imshow panels with colorbars; fields: {title: 2D array}
    (reference visualization.py:18-53)."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    names = list(fields)
    n = len(names)
    ncols = ncols or n
    nrows = (n + ncols - 1) // ncols
    fig, axs = plt.subplots(nrows, ncols, figsize=(3.2 * ncols, 2.6 * nrows),
                            squeeze=False)
    for i, name in enumerate(names):
        ax = axs[i // ncols][i % ncols]
        im = ax.imshow(np.asarray(fields[name]), cmap=cmap, origin="lower")
        ax.set_title(name, fontsize=9)
        ax.set_xticks([]); ax.set_yticks([])
        fig.colorbar(im, ax=ax)
    if suptitle:
        fig.suptitle(suptitle, fontsize=10)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return save_path


def plot_line_cuts(save_path, u, u_exact=None, cuts=(0.2, 0.5, 0.8),
                   lengths=(1.0, 1.0)):
    """Line cuts of u (and optional exact overlay) at x and y in `cuts`
    (reference visualization.py:55-139)."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    u = np.asarray(u)
    ny, nx = u.shape
    x = np.linspace(0, lengths[0], nx)
    y = np.linspace(0, lengths[1], ny)
    fig, axs = plt.subplots(2, len(cuts), figsize=(3.0 * len(cuts), 5.2),
                            squeeze=False)
    for j, c in enumerate(cuts):
        iy = int(round(c * (ny - 1)))
        ix = int(round(c * (nx - 1)))
        axs[0][j].plot(x, u[iy, :], "-", label="u")
        axs[1][j].plot(y, u[:, ix], "-", label="u")
        if u_exact is not None:
            ue = np.asarray(u_exact)
            axs[0][j].plot(x, ue[iy, :], "--", label="exact")
            axs[1][j].plot(y, ue[:, ix], "--", label="exact")
        axs[0][j].set_title(f"y = {c}", fontsize=9)
        axs[1][j].set_title(f"x = {c}", fontsize=9)
    axs[0][0].legend(fontsize=8)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return save_path


class ContourPlotCallback:
    """Trainer callback: save contour panels every `every` epochs (the
    reference's on_epoch_end plot callbacks)."""

    def __init__(self, every=50, out_dir="."):
        self.every = every
        self.out_dir = out_dir

    def on_train_start(self, trainer, module, state):
        pass

    def on_train_end(self, trainer, module, state):
        pass

    def on_epoch_end(self, trainer, module, state, epoch, metrics):
        if epoch % self.every:
            return
        import jax.numpy as jnp

        if module.dataset is None:
            return
        sample = module.dataset[0]
        batch = tuple(jnp.asarray(a)[None] for a in sample)
        u, inputs, forcing = module.forward(state.params, batch)
        u = module.apply_bcs(u, inputs)
        if isinstance(u, tuple):
            u = u[0]
        u2 = np.asarray(u)[0]
        while u2.ndim > 2:
            u2 = u2[..., 0] if u2.shape[-1] <= 4 else u2[0]
        plot_contours(
            os.path.join(self.out_dir, f"contour_{epoch}.png"),
            {"u": u2})


def plot_losses(run_dir, save_name="losses.png", log_scale=True):
    """Loss curve(s) from the run's metrics.csv (reference
    examples/poisson/single_instance/utils.py:20-34 plot_losses)."""
    import csv

    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    path = os.path.join(run_dir, "metrics.csv")
    with open(path, newline="") as fh:
        rows = list(csv.DictReader(fh))
    epochs = [int(float(r["epoch"])) for r in rows]
    fig, ax = plt.subplots(figsize=(5, 3.2))
    for key in rows[0]:
        if "loss" in key.lower():
            ax.plot(epochs, [float(r[key]) for r in rows], label=key)
    if log_scale:
        ax.set_yscale("log")
    ax.set_xlabel("epoch")
    ax.legend(fontsize=8)
    out = os.path.join(run_dir, save_name)
    fig.savefig(out, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return out


def plot_point_histograms(save_path, histograms, bins=30):
    """Histograms of the solution value at probe points across a UQ ensemble
    (reference query.py point-histogram accumulation, :152-158).
    `histograms`: {point: samples} from train.query.point_histograms."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    pts = list(histograms)
    fig, axs = plt.subplots(1, len(pts), figsize=(3.0 * len(pts), 2.6),
                            squeeze=False)
    for i, pt in enumerate(pts):
        axs[0][i].hist(np.asarray(histograms[pt]), bins=bins)
        axs[0][i].set_title(f"u at {pt}", fontsize=9)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return save_path
