"""Measure MMS convergence rates across formulations/degrees and write
CONVERGENCE.md — the reproducible accuracy evidence for the framework
(the reference's acceptance criterion is exactly these L2 decays,
SURVEY.md §4).

    python scripts/convergence_study.py [--quick]
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def solve_poisson(n, deg, loss_type, epochs=120):
    import jax.numpy as jnp

    from diffnet_tpu.data.single_instances import RectangleManufactured
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde import Poisson2D
    from diffnet_tpu.train import Trainer

    exact = lambda x, y: np.sin(math.pi * x) * np.sin(math.pi * y)
    forcing = lambda x, y: 2 * math.pi**2 * np.sin(math.pi * x) * np.sin(
        math.pi * y)
    ds = RectangleManufactured(domain_size=n)
    ds.n_samples = 1
    m = Poisson2D(DirectField((n, n), init=np.zeros((n, n))), ds,
                  domain_size=n, batch_size=1, fem_basis_deg=deg,
                  loss_type=loss_type, exact_solution=exact, forcing=forcing,
                  mms_dirichlet=True)
    st = Trainer(max_epochs=epochs, optimizer="lbfgs",
                 lbfgs_max_iter=10).fit(m)
    eL2, _, uex = m.calc_l2_err(m.network.apply(st.params)[0])
    return float(eL2 / uex)


def solve_helmholtz(n, epochs=100):
    from diffnet_tpu.data.single_instances import \
        RectangleHelmholtzManufactured
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde import Helmholtz2D
    from diffnet_tpu.train import Trainer

    ds = RectangleHelmholtzManufactured(domain_size=n)
    ds.n_samples = 1
    m = Helmholtz2D(DirectField((n, n), init=np.zeros((n, n))), ds,
                    domain_size=n, batch_size=1, exact_solution=ds.exact)
    st = Trainer(max_epochs=epochs, optimizer="lbfgs",
                 lbfgs_max_iter=10).fit(m)
    eL2, _, uex = m.calc_l2_err(m.network.apply(st.params)[0])
    return float(eL2 / uex)


def solve_spacetime(n, epochs=300):
    import jax.numpy as jnp

    from diffnet_tpu.data.single_instances import \
        SpaceTimeRectangleManufactured
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde import SpaceTimeHeat
    from diffnet_tpu.train import Trainer

    ds = SpaceTimeRectangleManufactured(domain_size=n)
    ds.n_samples = 1
    decay, nu = ds.decay_rt, ds.diffusivity
    exact = lambda x, y: np.sin(math.pi * x) * np.exp(-decay * y)
    forcing = lambda x, y: (np.sin(math.pi * x) * np.exp(-decay * y)
                            * (nu * math.pi**2 - decay))
    m = SpaceTimeHeat(DirectField((n, n), init=np.zeros((n, n))), ds,
                      domain_size=n, batch_size=1, exact_solution=exact,
                      forcing=forcing, u0=ds.u0)
    st = Trainer(max_epochs=epochs, optimizer="lbfgs",
                 lbfgs_max_iter=10).fit(m)
    u = m.apply_bcs(m.network.apply(st.params),
                    jnp.asarray(ds[0][0])[None])[0]
    eL2, _, uex = m.calc_l2_err(u)
    return float(eL2 / uex)


def solve_poisson3d(n, epochs=60):
    from diffnet_tpu.data.single_instances import CuboidManufactured
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde import Poisson3D
    from diffnet_tpu.train import Trainer

    ds = CuboidManufactured(domain_size=n)
    ds.n_samples = 1
    m = Poisson3D(DirectField((n, n, n), init=np.zeros((n, n, n))), ds,
                  domain_size=n, batch_size=1, loss_type="resmin",
                  exact_solution=ds.exact, forcing=ds.forcing_func,
                  mms_dirichlet=True)
    st = Trainer(max_epochs=epochs, optimizer="lbfgs",
                 lbfgs_max_iter=10).fit(m)
    eL2, _, uex = m.calc_l2_err(m.network.apply(st.params)[0])
    return float(eL2 / uex)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true",
                   help="fewer grids (CI-speed)")
    p.add_argument("--out", default="CONVERGENCE.md")
    args = p.parse_args()

    rows = []
    t0 = time.time()

    def rate_row(name, grids, solver, expect):
        errs = [solver(n) for n in grids]
        rates = [math.log2(errs[i] / errs[i + 1])
                 for i in range(len(errs) - 1)]
        rows.append((name, grids, errs, rates, expect))
        print(f"{name}: errs={['%.2e' % e for e in errs]} "
              f"rates={['%.2f' % r for r in rates]}", flush=True)

    g2 = [17, 33] if args.quick else [17, 33, 65]
    rate_row("Poisson 2D resmin deg1", g2,
             lambda n: solve_poisson(n, 1, "resmin"), "2 (O(h^2))")
    rate_row("Poisson 2D energy deg1", g2,
             lambda n: solve_poisson(n, 1, "energy", epochs=200), "2 (O(h^2))")
    rate_row("Poisson 2D resmin deg2", [9, 17] if args.quick else [9, 17, 33],
             lambda n: solve_poisson(n, 2, "resmin"), "3 (O(h^3))")
    rate_row("Poisson 2D resmin deg3", [7, 13] if args.quick else [7, 13, 25],
             lambda n: solve_poisson(n, 3, "resmin"), "4 (O(h^4))")
    rate_row("Helmholtz 2D (k=0.5)", g2, solve_helmholtz, "2 (O(h^2))")
    rate_row("Space-time heat (SUPG)", [9, 17] if args.quick else [9, 17, 33],
             lambda n: solve_spacetime(n, epochs=300), "2 (O(h^2))")
    rate_row("Poisson 3D resmin deg1", [9, 17],
             solve_poisson3d, "2 (O(h^2))")

    lines = [
        "# Measured MMS convergence rates",
        "",
        "Generated by `scripts/convergence_study.py` (direct-field LBFGS",
        "solves; rates = log2(err ratio) between successive grids). The",
        "reference's acceptance criterion is exactly these decays",
        "(SURVEY.md §4).",
        "",
        "| problem | grids | rel. L2 errors | measured rates | expected |",
        "|---|---|---|---|---|",
    ]
    for name, grids, errs, rates, expect in rows:
        lines.append(
            "| %s | %s | %s | %s | %s |" % (
                name, ",".join(map(str, grids)),
                " / ".join("%.2e" % e for e in errs),
                " / ".join("%.2f" % r for r in rates), expect))
    lines.append("")
    lines.append(f"_Total runtime: {time.time() - t0:.0f}s on "
                 f"{'quick' if args.quick else 'full'} grids._")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
