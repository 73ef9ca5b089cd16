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

if "--tpu" not in sys.argv:
    # accuracy artifact — run CPU-pinned by default: this image's axon relay
    # wedges under sustained training load (CLAUDE.md), and the numbers are
    # platform-independent. Must happen before the first jax computation.
    import jax

    jax.config.update("jax_platforms", "cpu")


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


def solve_advdiff(n, epochs=200):
    """Advection-diffusion + SUPG MMS (u = sin(pi x) sin(pi y), skew
    advection a = (cos30, sin30), nu = 0.05)."""
    from diffnet_tpu.data.single_instances import RectangleManufactured
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde.advection import AdvDiff2D
    from diffnet_tpu.train import Trainer

    ax, ay = math.cos(math.pi / 6), math.sin(math.pi / 6)
    nu = 0.05
    pi = math.pi
    exact = lambda x, y: np.sin(pi * x) * np.sin(pi * y)
    forcing = lambda x, y: (
        ax * pi * np.cos(pi * x) * np.sin(pi * y)
        + ay * pi * np.sin(pi * x) * np.cos(pi * y)
        + nu * 2 * pi**2 * np.sin(pi * x) * np.sin(pi * y))
    ds = RectangleManufactured(domain_size=n)
    ds.n_samples = 1
    m = AdvDiff2D(DirectField((n, n), init=np.zeros((n, n))), ds,
                  adv=(ax, ay), diffusivity=nu, domain_size=n, batch_size=1,
                  forcing=forcing, exact_solution=exact, bc1_value=0.0)
    st = Trainer(max_epochs=epochs, optimizer="lbfgs",
                 lbfgs_max_iter=10).fit(m)
    eL2, _, uex = m.calc_l2_err(m.network.apply(st.params)[0])
    return float(eL2 / uex)


def solve_stokes(n, epochs=400):
    """Stokes PSPG MMS; returns the u-velocity rel L2 error."""
    import jax.numpy as jnp

    from diffnet_tpu.data.flow import StokesMMSDataset
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde.flow import StokesMMS
    from diffnet_tpu.train import Trainer

    def factory(nn_):
        ds_ = StokesMMSDataset(domain_size=nn_)
        ds_.n_samples = 1
        net_ = DirectField((nn_, nn_), n_fields=3)
        # row-equalized momentum scaling h/visco (momentum rows ~visco/h^2,
        # continuity ~1/h): gives monotone O(h^2) decay on smooth MMS,
        # measured 5.7e-3/1.5e-3/6.2e-4 at 17/33/49. The module default
        # 'auto' (h^2/visco) is tuned for the corner-singular LDC problem
        # and over-damps momentum here (49^2 err regresses to 4.4e-3).
        m_ = StokesMMS(net_, ds_, domain_size=nn_, batch_size=1, Re=1,
                       loss_norm="squared",
                       momentum_scale=1.0 / (nn_ - 1))
        return m_, net_

    if n > 33:
        # cold LBFGS stalls/diverges on the fine-grid least squares
        # (cond(K)^2 growth) — warm-start from 33^2 (train/continuation.py)
        from diffnet_tpu.train.continuation import coarse_to_fine

        m, st = coarse_to_fine(factory, grids=[33, n], epochs=[400, epochs])
    else:
        m, net = factory(n)
        st = Trainer(max_epochs=epochs, optimizer="lbfgs",
                     lbfgs_max_iter=10).fit(m)
    ds = StokesMMSDataset(domain_size=n)
    net = m.network
    inputs = jnp.asarray(ds[0][0])[None]
    u, v, p = m.apply_bcs(net.apply(st.params, inputs), inputs)
    jxw = m.jxw_c()
    u_gp = m.gauss_pt_evaluation(u[0])
    ex_gp = np.sin(math.pi * m.xgp) * np.cos(math.pi * m.ygp)
    e = float(jnp.sqrt(jnp.sum((u_gp - ex_gp) ** 2 * jxw)))
    ref = float(jnp.sqrt(jnp.sum(jnp.asarray(ex_gp) ** 2 * jxw)))
    return e / ref


def solve_burgers(n, epochs=300):
    """Space-time Burgers (deg-2 strong-form collocation) MMS:
    u = sin(pi x) exp(-t), f = u_t + u u_x."""
    import jax.numpy as jnp

    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde import BurgersSpaceTime
    from diffnet_tpu.train import Trainer

    pi = math.pi

    class _BurgersMMS:
        n_samples = 1

        def __init__(self, n):
            x = np.linspace(0, 1, n)
            self.xx, self.yy = np.meshgrid(x, x)  # y axis = time
            bc1 = np.full((n, n), -10.0)
            bc1_val = np.zeros((n, n))
            bc1[0, :] = 1.0
            bc1_val[0, :] = np.sin(pi * x)          # IC row t=0
            bc2 = np.full((n, n), -10.0)
            bc2[:, 0] = 1.0
            bc2[:, -1] = 1.0                        # x walls, u = 0
            self.inputs = np.stack([self.xx, bc1, bc2, bc1_val],
                                   -1).astype(np.float32)
            self.forcing = np.zeros((n, n, 1), np.float32)

        def __len__(self):
            return self.n_samples

        def __getitem__(self, idx):
            return self.inputs, self.forcing

    exact = lambda x, y: np.sin(pi * x) * np.exp(-y)
    forcing = lambda x, y: (-np.sin(pi * x) * np.exp(-y)
                            + np.sin(pi * x) * np.exp(-y)
                            * pi * np.cos(pi * x) * np.exp(-y))
    ds = _BurgersMMS(n)
    m = BurgersSpaceTime(DirectField((n, n), init=np.zeros((n, n))), ds,
                         domain_size=n, batch_size=1, forcing=forcing,
                         exact_solution=exact)
    st = Trainer(max_epochs=epochs, optimizer="lbfgs",
                 lbfgs_max_iter=10).fit(m)
    inputs = jnp.asarray(ds[0][0])[None]
    u = _squeeze_burgers(m, st, inputs)
    eL2, _, uex = m.calc_l2_err(u)
    return float(eL2 / uex)


def _squeeze_burgers(m, st, inputs):
    import jax.numpy as jnp

    u = m.network.apply(st.params, inputs)
    u = u[0] if u.ndim > 2 else u
    bc1 = inputs[0, ..., 1]
    bc2 = inputs[0, ..., 2]
    bc1_val = inputs[0, ..., 3]
    u = jnp.where(bc1 > 0.5, bc1_val, u)
    return jnp.where(bc2 > 0.5, jnp.zeros_like(u), u)


def solve_allencahn(n, epochs=250):
    """Allen-Cahn space-time MMS with manufactured source:
    u = sin(pi x) sin(pi y); operator u_t + D G(u) - D Cn^2 lap(u)."""
    import jax.numpy as jnp

    from diffnet_tpu.data.single_instances import AllenCahnIceMeltRectangle
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde import AllenCahnIceMelt
    from diffnet_tpu.train import Trainer

    pi = math.pi
    A, Cn, D, k = 16.0, 0.1, 1.0, 2.0
    exact = lambda x, y: np.sin(pi * x) * np.sin(pi * y)

    def forcing(x, y):
        u = np.sin(pi * x) * np.sin(pi * y)
        u_t = pi * np.sin(pi * x) * np.cos(pi * y)
        G = 2.0 * D * A * (u - 3 * u**2 + 2 * u**3) - D * k
        return u_t + D * G + D * Cn**2 * 2 * pi**2 * u

    def linforcing(x, y):
        # reaction-free (A = 0) counterpart used for the homotopy stage
        u = np.sin(pi * x) * np.sin(pi * y)
        u_t = pi * np.sin(pi * x) * np.cos(pi * y)
        return u_t - D * D * k + D * Cn**2 * 2 * pi**2 * u

    ds = AllenCahnIceMeltRectangle(domain_size=n)
    ds.n_samples = 1
    # MMS Dirichlet frame: IC row (bc1) + sides AND top row (bc2) — the
    # Cn^2 u_tt term makes the operator elliptic in time, so the exact
    # solution's nonzero terminal slope must be pinned, not left natural
    ds.bc2 = np.zeros((n, n))
    ds.bc2[:, [0, -1]] = 1.0
    ds.bc2[-1, :] = 1.0
    ds.u0 = np.zeros((n, n))
    # homotopy in the reaction strength: the double-well G(u) makes the
    # resmin landscape nonconvex (LBFGS from zero strands in a spinodal
    # local minimum at rel err ~0.3); solve the A=0 linear problem first,
    # then warm-start the full nonlinear solve from it
    m1 = AllenCahnIceMelt(DirectField((n, n), init=np.zeros((n, n))), ds,
                          domain_size=n, batch_size=1, ac_A=0.0,
                          forcing=linforcing, exact_solution=exact, u0=ds.u0)
    st1 = Trainer(max_epochs=epochs, optimizer="lbfgs",
                  lbfgs_max_iter=10).fit(m1)
    u1 = np.asarray(m1.network.apply(st1.params)[0])
    m = AllenCahnIceMelt(DirectField((n, n), init=u1), ds,
                         domain_size=n, batch_size=1, forcing=forcing,
                         exact_solution=exact, u0=ds.u0)
    st = Trainer(max_epochs=epochs, optimizer="lbfgs",
                 lbfgs_max_iter=10).fit(m)
    u = m.network.apply(st.params)[0]
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
    p.add_argument("--tpu", action="store_true",
                   help="run on the default accelerator instead of the "
                        "CPU pin (consumed at import time, above)")
    p.add_argument("--out", default="CONVERGENCE.md")
    args = p.parse_args()

    rows = []
    t0 = time.time()

    def rate_row(name, grids, solver, expect):
        errs = [solver(n) for n in grids]
        # per-h rate: log(e_i/e_{i+1}) / log(h_i/h_{i+1}) — exact for any
        # refinement ratio (log2 of the error ratio only when grids halve)
        rates = [math.log(errs[i] / errs[i + 1])
                 / math.log((grids[i + 1] - 1) / (grids[i] - 1))
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
    rate_row("Adv-diff 2D (SUPG, nu=0.05)", g2, solve_advdiff, "2 (O(h^2))")
    rate_row("Stokes 2D PSPG (u field)", [17, 33] if args.quick
             else [17, 33, 49], solve_stokes, "2 (O(h^2))")
    rate_row("Burgers space-time deg2 (strong)",
             [9, 17] if args.quick else [9, 17, 33], solve_burgers,
             ">=2 (O(h^2))")
    rate_row("Allen-Cahn space-time (MMS src)",
             [9, 17] if args.quick else [9, 17, 33], solve_allencahn,
             "2 (O(h^2))")
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
