"""Stokes MMS with PSPG — counterpart of
examples/stokes/single_instance/e1_stokes_mms_resmin.py.

    python examples/stokes_mms.py --domain-size 32 --max-epochs 300
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--domain-size", type=int, default=32)
    p.add_argument("--max-epochs", type=int, default=300)
    p.add_argument("--solver", choices=("lbfgs", "gmres"), default="lbfgs",
                   help="lbfgs: reference-style residual-norm descent; "
                        "gmres: block-preconditioned Krylov solve of the "
                        "mixed system (train.linear.stokes_linear_solve)")
    p.add_argument("--out-dir", default="runs")
    args = p.parse_args()

    import jax.numpy as jnp

    from diffnet_tpu.data.flow import StokesMMSDataset
    from diffnet_tpu.pde import StokesMMS
    from diffnet_tpu.train import Trainer, make_run_dir
    from diffnet_tpu.utils import plot_contours

    n = args.domain_size

    ds = StokesMMSDataset(domain_size=n)
    ds.n_samples = 1
    from diffnet_tpu.models import DirectField

    module = StokesMMS(
        DirectField((n, n), init=np.zeros((n, n)), n_fields=3), ds, domain_size=n, batch_size=1, Re=1,
                       loss_norm="squared")
    run_dir = make_run_dir(args.out_dir, "stokes-mms")
    inputs = jnp.asarray(ds[0][0])[None]
    if args.solver == "gmres":
        from diffnet_tpu.train import stokes_linear_solve

        (u, v_, p_), _ = stokes_linear_solve(module)
        v, pr = v_[None], p_[None]
    else:
        trainer = Trainer(max_epochs=args.max_epochs, optimizer="lbfgs",
                          lbfgs_max_iter=10, run_dir=run_dir,
                          checkpoint=True)
        state = trainer.fit(module)
        u, v, pr = module.apply_bcs(
            module.network.apply(state.params, inputs), inputs)
        u = np.asarray(u)[0]
    jxw = module.jxw_c()
    ugp = module.gauss_pt_evaluation(jnp.asarray(u))
    ex = np.sin(math.pi * module.xgp) * np.cos(math.pi * module.ygp)
    rel = float(jnp.sqrt(jnp.sum((ugp - ex) ** 2 * jxw))
                / jnp.sqrt(jnp.sum(jnp.asarray(ex) ** 2 * jxw)))
    plot_contours(os.path.join(run_dir, "uvp.png"),
                  {"u": u, "v": np.asarray(v)[0], "p": np.asarray(pr)[0]})
    print(f"run_dir: {run_dir}  u rel_L2: {rel:.3e}")


if __name__ == "__main__":
    main()
