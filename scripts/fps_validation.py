"""Flow-past-square validation against the reference's checked-in anchors
(counterpart of scripts/ldc_validation.py for the channel configs).

Solves the NS (Re 10/20/30, L12 x H6) and Stokes (Re 1, L12/L18 x H5)
flow-past-square cases with the direct solver stack on a chosen grid
spacing, overlays the midline cuts on the anchor CSVs, and prints a
markdown error table.

    python scripts/fps_validation.py --h 0.25 --out /tmp/fps_val
    python scripts/fps_validation.py --h 0.125 --cases ns30  # finer, one case

Measured at h=1/4 (see tests/test_fps_reference_data.py for the pinned
bounds): NS uX/uY/vY max errs 0.046/0.066/0.018 (Re=10),
0.063/0.114/0.034 (Re=20), 0.078/0.166/0.051 (Re=30); Stokes u 0.071,
inlet p within 4%. At h=1/8 the Stokes u err drops to 0.022.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

_REF = "/root/reference/examples/navier-stokes/single_instance/"


def solve_case(eq, Re, Lx, Ly, h):
    from diffnet_tpu.data.flow import NSFPSChannelDataset
    from diffnet_tpu.pde.flow import NavierStokes, StokesNSBase
    from diffnet_tpu.train.linear import ns_newton_solve, stokes_linear_solve

    nx, ny = int(round(Lx / h)) + 1, int(round(Ly / h)) + 1
    y0 = (Ly - 1.0) / 2.0
    ds = NSFPSChannelDataset(domain_lengths=(Lx, Ly), domain_sizes=(nx, ny),
                             obstacle=((2.0, y0), (3.0, y0 + 1.0)), Re=Re)
    cls = NavierStokes if eq == "ns" else StokesNSBase
    m = cls(None, ds, domain_lengths=(Lx, Ly), domain_sizes=(nx, ny),
            batch_size=1, Re=Re, u_bc=ds.u_bc, v_bc=ds.v_bc, p_bc=ds.p_bc,
            pressure_gauge="dirichlet")
    if eq == "ns":
        (u, v, p), info = ns_newton_solve(m, newton_iters=30, tol=1e-6,
                                          gmres_iters=80, restart=20)
    else:
        (u, v, p), info = stokes_linear_solve(m, tol=1e-7, maxiter=200,
                                              restart=20)
    return u, v, p, nx, ny


def load_anchor(fname, Lx):
    ref = np.genfromtxt(fname, delimiter=",", skip_header=1)
    ok = ~np.isnan(ref[:, 2]) & (ref[:, 0] <= Lx + 1e-9)
    return ref[ok, 0], ref[ok, 1], ref[ok, 2], ref[ok, 3]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--h", type=float, default=0.25)
    ap.add_argument("--cases", nargs="*",
                    default=["ns10", "ns20", "ns30", "stokes12", "stokes18"])
    ap.add_argument("--out", default="runs/fps_validation")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    os.makedirs(args.out, exist_ok=True)
    rows = []
    for case in args.cases:
        if case.startswith("ns"):
            Re, Lx, Ly = int(case[2:]), 12.0, 6.0
            fX = (_REF + "ns-ldc-numerical-results/"
                  f"re-{Re}-ns-L12-H6-midlineX.csv")
            fY = (_REF + "ns-ldc-numerical-results/"
                  f"re-{Re}-ns-L12-H6-midlineY.csv")
            eq = "ns"
        else:
            Re, Lx, Ly = 1, float(case[6:]), 5.0
            tag = "-L12" if int(Lx) == 12 else ""
            fX = _REF + f"stokes-fps/re-1-stokes{tag}-midlineX.csv"
            fY = None
            eq = "stokes"
        if not os.path.exists(fX):
            print(f"skip {case}: anchor not mounted"); continue

        u, v, p, nx, ny = solve_case(eq, Re, Lx, Ly, args.h)
        x = np.linspace(0, Lx, nx)
        y = np.linspace(0, Ly, ny)
        jmid = ny // 2
        xs, ps, us, _ = load_anchor(fX, Lx)
        eu = np.abs(np.interp(xs, x, u[jmid, :]) - us).max()
        ep = np.abs(np.interp(xs, x, p[jmid, :]) - ps).mean()
        row = {"case": case, "grid": f"{nx}x{ny}", "uX_max": eu,
               "pX_mean": ep}

        fig, axs = plt.subplots(1, 2 if fY else 1, figsize=(11, 4),
                                squeeze=False)
        axs[0, 0].plot(xs, us, "k.", ms=2, label="anchor")
        axs[0, 0].plot(x, u[jmid, :], "r-", lw=1, label="diffnet_tpu")
        axs[0, 0].set_title(f"{case} u @ midline-X"); axs[0, 0].legend()
        if fY:
            ys, _, usY, vsY = load_anchor(fY, Ly)
            i = int(round(2.5 / args.h))
            row["uY_max"] = np.abs(np.interp(ys, y, u[:, i]) - usY).max()
            row["vY_max"] = np.abs(np.interp(ys, y, v[:, i]) - vsY).max()
            axs[0, 1].plot(ys, usY, "k.", ms=2)
            axs[0, 1].plot(y, u[:, i], "r-", lw=1)
            axs[0, 1].set_title(f"{case} u @ x=2.5")
        fig.savefig(os.path.join(args.out, f"{case}.png"), dpi=110)
        plt.close(fig)
        rows.append(row)
        print(row, flush=True)

    print("\n| case | grid | uX max | pX mean | uY max | vY max |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['case']} | {r['grid']} | {r['uX_max']:.4f} | "
              f"{r['pX_mean']:.4f} | {r.get('uY_max', float('nan')):.4f} | "
              f"{r.get('vY_max', float('nan')):.4f} |")


if __name__ == "__main__":
    main()
