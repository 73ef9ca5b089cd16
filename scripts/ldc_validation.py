"""Solve NS/Stokes lid-driven cavity and overlay midline cuts against the
conventional-solver data checked into the reference repo — the visual
counterpart of the reference's epoch-end overlay plots
(e1_ns_ldc_resmin.py:414-424).

    python scripts/ldc_validation.py --re 100 --domain-size 48

Re=1000 (beyond the reference's regularized Re=1/100 data) validates
against the classic Ghia, Ghia & Shin (1982) 129^2 benchmark table
(unregularized unit lid) via the Newton-Krylov solver with the
reaction-shifted momentum preconditioner:

    python scripts/ldc_validation.py --re 1000 --solver newton \
        --domain-size 129
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

_REF = ("/root/reference/examples/navier-stokes/single_instance/"
        "ns-ldc-numerical-results")

# Ghia, Ghia & Shin, J. Comput. Phys. 48 (1982), Re=1000, 129^2 grid:
# u along the vertical centerline x=0.5 (col: y, u) and v along the
# horizontal centerline y=0.5 (col: x, v).
GHIA_RE1000_U = np.array([
    [1.0000, 1.00000], [0.9766, 0.65928], [0.9688, 0.57492],
    [0.9609, 0.51117], [0.9531, 0.46604], [0.8516, 0.33304],
    [0.7344, 0.18719], [0.6172, 0.05702], [0.5000, -0.06080],
    [0.4531, -0.10648], [0.2813, -0.27805], [0.1719, -0.38289],
    [0.1016, -0.29730], [0.0703, -0.22220], [0.0625, -0.20196],
    [0.0547, -0.18109], [0.0000, 0.00000]])
GHIA_RE1000_V = np.array([
    [1.0000, 0.00000], [0.9688, -0.21388], [0.9609, -0.27669],
    [0.9531, -0.33714], [0.9453, -0.39188], [0.9063, -0.51550],
    [0.8594, -0.42665], [0.8047, -0.31966], [0.5000, 0.02526],
    [0.2344, 0.32235], [0.2266, 0.33075], [0.1563, 0.37095],
    [0.0938, 0.32627], [0.0781, 0.30353], [0.0703, 0.29012],
    [0.0625, 0.27485], [0.0000, 0.00000]])


def _solve_newton(n, re):
    """Grid-continuation Newton-Krylov solve (49 -> ... -> n, node-aligned
    halvings) with the reaction-shifted momentum MG; unregularized lid for
    the Ghia comparison."""
    import jax.numpy as jnp

    from diffnet_tpu.data.flow import NSLDCDataset
    from diffnet_tpu.pde import NavierStokes, ldc_bcs
    from diffnet_tpu.train.continuation import prolong_field
    from diffnet_tpu.train.linear import ns_newton_solve

    grids = [n]
    while grids[0] > 49:
        if (grids[0] - 1) % 2:
            break
        grids.insert(0, (grids[0] - 1) // 2 + 1)
    x0 = None
    for nn_ in grids:
        ds = NSLDCDataset(domain_sizes=(nn_, nn_), Re=re)
        ds.n_samples = 1
        u_bc, v_bc, p_bc = ldc_bcs((nn_, nn_), regularized=(re != 1000))
        m = NavierStokes(None, ds, domain_size=nn_, batch_size=1, Re=re,
                         u_bc=u_bc, v_bc=v_bc, p_bc=p_bc)
        (u, v, p), info = ns_newton_solve(
            m, newton_iters=30, tol=1e-6, gmres_iters=max(150, 2 * nn_),
            restart=30, x0=x0, lm0=(1e-3 if re >= 400 else 0.0),
            momentum_reaction="auto")
        print(f"n={nn_}: newton iters={info['newton_iters']} "
              f"|F|={info['residual_history'][-1]:.1e}")
        if nn_ != n:
            fs = (2 * nn_ - 1,) * 2
            x0 = {k: prolong_field(jnp.asarray(f), fs)
                  for k, f in (("u", u), ("v", v), ("p", p))}
    return u, v


def main():
    p = argparse.ArgumentParser(description=__doc__)
    # choices are the Re values with benchmark data to validate AGAINST:
    # reference-repo files at 1/100, the Ghia table at 1000 (plain solves
    # at other Re: examples/ns_ldc.py)
    p.add_argument("--re", type=int, default=100, choices=[1, 100, 1000])
    p.add_argument("--domain-size", type=int, default=48)
    p.add_argument("--max-epochs", type=int, default=500)
    p.add_argument("--solver", choices=("train", "newton"), default="train",
                   help="'newton' = ns_newton_solve with grid continuation "
                        "(required for re >= 400; odd domain-size)")
    p.add_argument("--out", default="runs/ldc_validation.png")
    p.add_argument("--ref-dir", default=_REF)
    args = p.parse_args()

    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    from diffnet_tpu.data.flow import NSLDCDataset
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde import NavierStokes, ldc_bcs
    from diffnet_tpu.train import Trainer

    if args.re == 1000:
        # no reference-repo file at this Re; Ghia et al. is the anchor
        ref = None
        ghia = (GHIA_RE1000_U, GHIA_RE1000_V)
    else:
        fname = f"midline_cuts_Re{args.re}_regularized_128x128.txt"
        ref_path = os.path.join(args.ref_dir, fname)
        ref = (np.loadtxt(ref_path, delimiter=",", skiprows=1)
               if os.path.exists(ref_path) else None)
        ghia = None

    from diffnet_tpu.train.continuation import coarse_to_fine

    n = args.domain_size
    if args.re >= 400 and args.solver != "newton":
        p.error("--re >= 400 needs --solver newton (the training path is "
                "validated at Re <= 100)")
    if args.solver == "newton":
        if n % 2 == 0:
            p.error("--solver newton needs an odd --domain-size "
                    "(node-aligned grid continuation), e.g. 49/97/129")
        u, v = _solve_newton(n, args.re)
        _plot(args, n, u, v, ref, ghia, plt)
        return

    def factory(nn_):
        ds = NSLDCDataset(domain_sizes=(nn_, nn_), Re=args.re)
        ds.n_samples = 1
        u_bc, v_bc, p_bc = ldc_bcs((nn_, nn_))
        net = DirectField((nn_, nn_), init=np.zeros((nn_, nn_)), n_fields=3)
        m_ = NavierStokes(net, ds, domain_size=nn_, batch_size=1, Re=args.re,
                          u_bc=u_bc, v_bc=v_bc, p_bc=p_bc,
                          loss_norm="squared")
        return m_, net

    # coarse-to-fine continuation for fine grids (see train/continuation.py)
    grids = [48, n] if n > 48 else [n]
    epochs = ([args.max_epochs, args.max_epochs]
              if len(grids) == 2 else [args.max_epochs])
    m, st = coarse_to_fine(factory, grids=grids, epochs=epochs)
    ds = NSLDCDataset(domain_sizes=(n, n), Re=args.re)
    inputs = jnp.asarray(ds[0][0])[None]
    u, v, _ = m.apply_bcs(m.network.apply(st.params, inputs), inputs)
    u = np.asarray(u)[0]
    v = np.asarray(v)[0]
    _plot(args, n, u, v, ref, None, plt)


def _plot(args, n, u, v, ref, ghia, plt):
    y = np.linspace(0, 1, n)
    fig, axs = plt.subplots(1, 2, figsize=(8, 3.2))
    axs[0].plot(y, u[:, n // 2], "-", label=f"diffnet_tpu {n}^2")
    axs[1].plot(y, v[n // 2, :], "-", label=f"diffnet_tpu {n}^2")
    if ref is not None:
        axs[0].plot(ref[:, 0], ref[:, 1], "--",
                    label="conventional solver 128^2")
        axs[1].plot(ref[:, 0], ref[:, 2], "--",
                    label="conventional solver 128^2")
        err_u = np.abs(u[:, n // 2] - np.interp(y, ref[:, 0], ref[:, 1]))
        err_v = np.abs(v[n // 2, :] - np.interp(y, ref[:, 0], ref[:, 2]))
        print(f"Re={args.re}: u-midline max err {err_u.max():.4f}, "
              f"v-midline max err {err_v.max():.4f}")
    if ghia is not None:
        gu, gv = ghia
        axs[0].plot(gu[:, 0], gu[:, 1], "o", ms=4, mfc="none",
                    label="Ghia et al. 1982 (129^2)")
        axs[1].plot(gv[:, 0], gv[:, 1], "o", ms=4, mfc="none",
                    label="Ghia et al. 1982 (129^2)")
        err_u = np.abs(np.interp(gu[:, 0], y, u[:, n // 2]) - gu[:, 1])
        err_v = np.abs(np.interp(gv[:, 0], y, v[n // 2, :]) - gv[:, 1])
        print(f"Re={args.re}: Ghia u-midline max err {err_u.max():.4f}, "
              f"v-midline max err {err_v.max():.4f}")
    axs[0].set_title(f"u at x=0.5 (Re={args.re})", fontsize=10)
    axs[1].set_title("v at y=0.5", fontsize=10)
    axs[0].legend(fontsize=8)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, bbox_inches="tight", dpi=130)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
