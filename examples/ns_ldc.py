"""Navier-Stokes lid-driven cavity (VMS) — counterpart of
examples/navier-stokes/single_instance/e1_ns_ldc_resmin.py.

    python examples/ns_ldc.py --domain-size 32 --re 100 --max-epochs 200
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--domain-size", type=int, default=32)
    p.add_argument("--re", type=float, default=100)
    p.add_argument("--max-epochs", type=int, default=200)
    p.add_argument("--solver", choices=("lbfgs", "newton"), default="lbfgs",
                   help="lbfgs: reference-style residual-norm descent; "
                        "newton: Newton-Krylov on the full VMS system "
                        "(train.linear.ns_newton_solve — quadratic "
                        "convergence, ~4 iterations at Re=100)")
    p.add_argument("--out-dir", default="runs")
    args = p.parse_args()

    import jax.numpy as jnp

    from diffnet_tpu.data.flow import NSLDCDataset
    from diffnet_tpu.pde import NavierStokes, ldc_bcs
    from diffnet_tpu.train import Trainer, make_run_dir
    from diffnet_tpu.utils import plot_contours

    n = args.domain_size

    ds = NSLDCDataset(domain_sizes=(n, n), Re=args.re)
    ds.n_samples = 1
    u_bc, v_bc, p_bc = ldc_bcs((n, n))
    from diffnet_tpu.models import DirectField

    module = NavierStokes(
        DirectField((n, n), init=np.zeros((n, n)), n_fields=3), ds, domain_size=n, batch_size=1,
                          Re=args.re, u_bc=u_bc, v_bc=v_bc, p_bc=p_bc,
                          loss_norm="squared")
    run_dir = make_run_dir(args.out_dir, f"ns-ldc-re{int(args.re)}")
    inputs = jnp.asarray(ds[0][0])[None]
    if args.solver == "newton":
        from diffnet_tpu.train import ns_newton_solve

        if n % 2 == 0:
            raise SystemExit(
                f"--solver newton needs an odd --domain-size (got {n}): "
                "the momentum-MG hierarchy halves node-aligned grids "
                "(2^k + 1); an even n degenerates it to a dense "
                "pseudo-inverse of the full fine operator")
        # advection-dominated regimes need the damped + reaction-shifted
        # configuration (see ns_newton_solve docstring: Re=400 stalls
        # undamped, Re=1000 stalls without the screened-Laplacian shift)
        high_re = args.re >= 400
        (u, v, pr), info = ns_newton_solve(
            module, lm0=(1e-3 if high_re else 0.0),
            momentum_reaction=("auto" if high_re else 0.0),
            gmres_iters=(150 if high_re else 40),
            restart=(30 if high_re else 10), newton_iters=30)
        print(f"newton iters: {info['newton_iters']}  "
              f"|F|: {info['residual_history'][-1]:.3e}")
    else:
        trainer = Trainer(max_epochs=args.max_epochs, optimizer="lbfgs",
                          lbfgs_max_iter=10, run_dir=run_dir,
                          checkpoint=True)
        state = trainer.fit(module)
        u, v, pr = module.apply_bcs(
            module.network.apply(state.params, inputs), inputs)
        u, v, pr = (np.asarray(a)[0] for a in (u, v, pr))
    plot_contours(os.path.join(run_dir, "fields.png"),
                  {"u": u, "v": v, "p": pr})
    # midline cuts (the reference's comparison format,
    # ns-ldc-numerical-results/midline_cuts_*.txt)
    mid = n // 2
    x = np.linspace(0, 1, n)
    np.savetxt(os.path.join(run_dir, "midline_cuts.csv"),
               np.column_stack([x, u[:, mid], v[mid, :], pr[-1, :]]),
               delimiter=",", header="coord,u_at_x0.5,v_at_y0.5,p_at_y1",
               comments="")
    print(f"run_dir: {run_dir}")


if __name__ == "__main__":
    main()
