"""Poisson 2D MMS solve — counterpart of the reference's
examples/poisson/single_instance/{0_base,e2_manufactured_resmin,
e8_2d_poisson_mms}.py workflows.

    python examples/poisson_mms_2d.py --domain-size 64 --loss-type resmin \
        --optimizer lbfgs --max-epochs 80
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--domain-size", type=int, default=64)
    p.add_argument("--loss-type", default="resmin",
                   choices=["energy", "resmin", "strong"])
    p.add_argument("--optimizer", default="lbfgs",
                   choices=["adam", "sgd", "lbfgs", "cg", "mg-cg"],
                   help="cg / mg-cg = direct matrix-free Krylov solve of "
                        "the linear system (train.linear), no training "
                        "loop; mg-cg adds the geometric-multigrid V-cycle "
                        "preconditioner (needs n = 2^k + 1)")
    p.add_argument("--fem-basis-deg", type=int, default=1)
    p.add_argument("--max-epochs", type=int, default=80)
    p.add_argument("--learning-rate", type=float, default=3e-4)
    p.add_argument("--out-dir", default="runs")
    p.add_argument("--fast-dev-run", action="store_true")
    args = p.parse_args()

    from diffnet_tpu.data.single_instances import RectangleManufactured
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde import Poisson2D
    from diffnet_tpu.train import Trainer, make_run_dir
    from diffnet_tpu.utils import plot_contours, write_vti

    n = args.domain_size
    exact = lambda x, y: np.sin(math.pi * x) * np.sin(math.pi * y)
    forcing = lambda x, y: 2 * math.pi**2 * np.sin(math.pi * x) * np.sin(
        math.pi * y)
    ds = RectangleManufactured(domain_size=n)
    ds.n_samples = 1
    net = DirectField((n, n), init=np.zeros((n, n)))
    if args.loss_type == "strong" and args.fem_basis_deg < 2:
        args.fem_basis_deg = 2
    if (n - 1) % args.fem_basis_deg:
        n += args.fem_basis_deg - (n - 1) % args.fem_basis_deg
        print(f"adjusted domain size to {n} "
              f"((size-1) % deg == 0 required)")
        ds = RectangleManufactured(domain_size=n)
        ds.n_samples = 1
        net = DirectField((n, n), init=np.zeros((n, n)))
    module = Poisson2D(net, ds, domain_size=n, batch_size=1,
                       fem_basis_deg=args.fem_basis_deg,
                       loss_type=args.loss_type, exact_solution=exact,
                       forcing=forcing, mms_dirichlet=True,
                       learning_rate=args.learning_rate)
    run_dir = make_run_dir(args.out_dir, f"poisson-mms-{args.loss_type}")
    if args.optimizer in ("cg", "mg-cg"):
        from diffnet_tpu.train import (module_linear_solve,
                                       multigrid_preconditioner)

        M = None
        if args.optimizer == "mg-cg":
            if (n - 1) & (n - 2):
                p.error(f"--optimizer mg-cg needs a 2^k + 1 grid "
                        f"(got {n}); try 65 or 129")
            def factory(nn_):
                ds_ = RectangleManufactured(domain_size=nn_)
                ds_.n_samples = 1
                return Poisson2D(
                    DirectField((nn_, nn_)), ds_, domain_size=nn_,
                    batch_size=1, fem_basis_deg=args.fem_basis_deg,
                    loss_type="resmin", exact_solution=exact,
                    forcing=forcing, mms_dirichlet=True)

            M, _ = multigrid_preconditioner(factory, n)
        u, _ = module_linear_solve(module, tol=1e-10, M=M)
        u = np.asarray(u)
    else:
        trainer = Trainer(max_epochs=args.max_epochs,
                          optimizer=args.optimizer,
                          learning_rate=args.learning_rate, run_dir=run_dir,
                          checkpoint=True, fast_dev_run=args.fast_dev_run)
        state = trainer.fit(module)
        u = np.asarray(module.network.apply(state.params)[0])
    eL2, uL2, uexL2 = module.calc_l2_err(u, verbose=True)
    x = np.linspace(0, 1, n)
    xx, yy = np.meshgrid(x, x)
    plot_contours(os.path.join(run_dir, "contours.png"),
                  {"u": u, "u_exact": exact(xx, yy),
                   "error": u - exact(xx, yy)})
    write_vti(os.path.join(run_dir, "u.vti"), u)
    print(f"run_dir: {run_dir}  rel_L2: {float(eL2 / uexL2):.3e}")


if __name__ == "__main__":
    main()
