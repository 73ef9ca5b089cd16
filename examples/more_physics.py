"""One CLI for the remaining single-instance physics: Helmholtz,
advection-diffusion (SUPG), Allen-Cahn ice melt, Burgers space-time,
FSDT plate, topology optimization — counterparts of the reference examples
14_helmholtz_mms, e17_adv_diff_2d_resmin, e18_allen_cahn_ice_melt,
burgers 01_2d_space_time, e1_plate_bending_fsdt, 16_topopt.

    python examples/more_physics.py helmholtz --domain-size 32
    python examples/more_physics.py topopt --max-epochs 200
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("physics", choices=["helmholtz", "advdiff", "allen-cahn",
                                       "burgers", "fsdt", "topopt"])
    p.add_argument("--domain-size", type=int, default=32)
    p.add_argument("--max-epochs", type=int, default=100)
    p.add_argument("--solver", choices=("lbfgs", "direct"), default="lbfgs",
                   help="direct: Krylov/Newton solver path instead of the "
                        "reference-style LBFGS descent (helmholtz: gmres; "
                        "allen-cahn: Newton with A=0 homotopy)")
    p.add_argument("--out-dir", default="runs")
    args = p.parse_args()

    import jax.numpy as jnp

    from diffnet_tpu.data.loader import NumpyLoader
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.train import Trainer, make_run_dir
    from diffnet_tpu.utils import plot_contours

    n = args.domain_size
    run_dir = make_run_dir(args.out_dir, args.physics)
    zero = np.zeros((n, n))

    if args.physics == "helmholtz":
        from diffnet_tpu.data.single_instances import \
            RectangleHelmholtzManufactured
        from diffnet_tpu.pde import Helmholtz2D

        ds = RectangleHelmholtzManufactured(domain_size=n)
        ds.n_samples = 1
        m = Helmholtz2D(DirectField((n, n), init=zero), ds, domain_size=n,
                        batch_size=1, exact_solution=ds.exact)
        if args.solver == "direct":
            from diffnet_tpu.train import module_linear_solve

            u, _ = module_linear_solve(m, method="gmres", tol=1e-10,
                                       maxiter=2000)
        else:
            st = Trainer(max_epochs=args.max_epochs, optimizer="lbfgs",
                         lbfgs_max_iter=10, run_dir=run_dir).fit(m)
            u = np.asarray(m.network.apply(st.params)[0])
        eL2, _, uex = m.calc_l2_err(u)
        print(f"helmholtz rel_L2: {float(eL2/uex):.3e}")

    elif args.physics == "advdiff":
        from diffnet_tpu.data.single_instances import AdvDiff1dRectangle
        from diffnet_tpu.pde import AdvDiff2D

        ds = AdvDiff1dRectangle(domain_size=n)
        ds.n_samples = 1
        m = AdvDiff2D(DirectField((n, n), init=zero), ds, adv=(1.0, 0.0),
                      diffusivity=1e-3, domain_size=n, batch_size=1,
                      bc1_value=0.0, forcing=lambda x, y: np.ones_like(x))
        st = Trainer(max_epochs=args.max_epochs, optimizer="lbfgs",
                     lbfgs_max_iter=10, run_dir=run_dir).fit(m)
        u = np.asarray(m.network.apply(st.params)[0])
        print(f"advdiff u range: [{u.min():.3f}, {u.max():.3f}] (bounded ->"
              " SUPG active)")

    elif args.physics == "allen-cahn":
        from diffnet_tpu.data.single_instances import AllenCahnIceMeltRectangle
        from diffnet_tpu.pde import AllenCahnIceMelt

        ds = AllenCahnIceMeltRectangle(domain_size=n)
        ds.n_samples = 1
        m = AllenCahnIceMelt(DirectField((n, n), init=ds.initial_guess), ds,
                             domain_size=n, batch_size=1)
        if args.solver == "direct":
            from diffnet_tpu.train import newton_solve, solve_linear

            jin = jnp.asarray(ds[0][0])[None]
            bc1, bc2 = jin[..., 1], jin[..., 2]

            # stage 1 (A=0 homotopy): with the double-well dropped the
            # system is AFFINE — one Krylov call gives the warm start the
            # cold double-well Newton needs (same staging as
            # tests/test_linear_solve.py::test_newton_allen_cahn_mms)
            m1 = AllenCahnIceMelt(None, ds, domain_size=n, batch_size=1,
                                  ac_A=0.0)

            def F1(u):
                return m1.residual(m1.apply_bcs(u[None], jin), bc1, bc2)[0]

            u_lin, _ = solve_linear(F1, (n, n), method="gmres", tol=1e-8,
                                    maxiter=400, restart=30)

            def F(u):
                return m.residual(m.apply_bcs(u[None], jin), bc1, bc2)[0]

            x, info = newton_solve(F, u_lin,
                                   newton_iters=30, gmres_iters=150,
                                   restart=25, tol=1e-8)
            print(f"newton iters: {info['newton_iters']}  "
                  f"|F|: {info['residual_history'][-1]:.3e}")
            u = np.asarray(m.apply_bcs(x[None], jin)[0])
        else:
            st = Trainer(max_epochs=args.max_epochs, optimizer="lbfgs",
                         lbfgs_max_iter=10, run_dir=run_dir).fit(m)
            u = np.asarray(m.network.apply(st.params)[0])
        print(f"allen-cahn phase range: [{u.min():.3f}, {u.max():.3f}]")

    elif args.physics == "burgers":
        from diffnet_tpu.data.geometry_datasets import Burg2DXT
        from diffnet_tpu.pde import BurgersSpaceTime

        n = n if (n - 1) % 2 == 0 else n + 1
        ds = Burg2DXT(domain_size=n)
        ds.n_samples = 1
        # Burg2DXT's x grid spans [-1, 1] (length 2): pass the physical
        # extents or u_x comes out doubled (wave speed 2x)
        m = BurgersSpaceTime(DirectField((n, n), init=ds.initial_guess), ds,
                             domain_sizes=(n, n), domain_lengths=(2.0, 1.0),
                             batch_size=1)
        st = Trainer(max_epochs=args.max_epochs, optimizer="lbfgs",
                     lbfgs_max_iter=10, run_dir=run_dir).fit(m)
        batch = (jnp.asarray(ds[0][0])[None], jnp.asarray(ds[0][1])[None])
        print(f"burgers final loss: "
              f"{float(m.training_loss(st.params, batch)):.3e}")

    elif args.physics == "fsdt":
        from diffnet_tpu.data.geometry_datasets import ElasticFSDTDataset
        from diffnet_tpu.pde import ElasticFSDT

        ds = ElasticFSDTDataset(domain_size=n)
        ds.n_samples = 1
        m = ElasticFSDT(DirectField((n, n), init=np.zeros((n, n)),
                                    n_fields=3), ds, domain_size=n, batch_size=1,
                        loss_norm="squared")
        st = Trainer(max_epochs=args.max_epochs, optimizer="lbfgs",
                     lbfgs_max_iter=10, run_dir=run_dir).fit(
                         m, NumpyLoader(ds, batch_size=1))
        batch = (jnp.asarray(ds[0][0])[None], jnp.asarray(ds[0][1])[None])
        w = np.asarray(m.apply_bcs(m.network.apply(st.params, batch[0]),
                                   batch[0])[0])[0]
        print(f"fsdt center deflection: {w[n//2, n//2]:.4f}")

    else:  # topopt
        from diffnet_tpu.pde import TopOpt2D

        x = np.linspace(0, 1, n)
        xx, yy = np.meshgrid(x, x)
        bc1 = np.zeros((n, n)); bc1[0, :] = 1
        bc2 = np.zeros((n, n)); bc2[-1, :] = 1
        inputs = np.stack([bc1, bc2, xx, yy], -1).astype(np.float32)
        forcing = np.ones((n, n, 1), np.float32)
        from diffnet_tpu.data.loader import InMemoryDataset

        ds = InMemoryDataset(inputs[None], forcing[None])

        class JointField:
            def init(self, rng, sample=None):
                return {"u": jnp.zeros((n, n)), "rho": jnp.zeros((n, n))}

            def apply(self, params, inputs=None):
                b = 1 if inputs is None else inputs.shape[0]
                return (jnp.broadcast_to(params["u"][None], (b, n, n)),
                        jnp.broadcast_to(params["rho"][None], (b, n, n)))

        m = TopOpt2D(JointField(), ds, domain_size=n, batch_size=1,
                     target_vf=0.4, compliance_form="variational")
        # demonstrated alternating optimization: exact CG state solve /
        # compliance-sensitivity step / exact vf projection per outer
        # iteration (TopOpt2D.optimize docstring)
        rho_raw, u, hist = m.optimize(inputs, forcing,
                                      n_outer=args.max_epochs)
        rho = np.asarray(m.project_density(rho_raw))
        plot_contours(os.path.join(run_dir, "density.png"),
                      {"rho": rho, "u": np.asarray(u)})
        np.savetxt(os.path.join(run_dir, "compliance.csv"), hist,
                   header="compliance", comments="")
        print(f"topopt volume fraction: {rho.mean():.4f} (target 0.4)  "
              f"compliance {hist[0]:.3f} -> {hist[-1]:.3f}  "
              f"solid frac {np.mean(rho > 0.5):.2f}")

    print(f"run_dir: {run_dir}")


if __name__ == "__main__":
    main()
