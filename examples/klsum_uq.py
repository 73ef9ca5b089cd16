"""Stochastic KL-sum diffusivity UQ pipeline — train a parametric network
over an ensemble, then run the statistical query; counterpart of
examples/poisson/parametric/{2_klsum_fem.py,query.py,calc_mean_sdev.py}.

    python examples/klsum_uq.py --n-train 128 --n-query 256
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--domain-size", type=int, default=32)
    p.add_argument("--n-train", type=int, default=128)
    p.add_argument("--n-query", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-epochs", type=int, default=10)
    p.add_argument("--out-dir", default="runs")
    args = p.parse_args()

    from diffnet_tpu.data import NumpyLoader
    from diffnet_tpu.data.parametric import KLSumStochastic
    from diffnet_tpu.models import GoodNetwork
    from diffnet_tpu.pde import Poisson2D
    from diffnet_tpu.train import Trainer, make_run_dir, query_statistical
    from diffnet_tpu.utils import plot_contours

    n = args.domain_size
    from diffnet_tpu.data.gen_input import sobol_coefficients

    # Sobol low-discrepancy sampling, as in the reference's sobol_6d.npy
    train_coeffs = sobol_coefficients(args.n_train, dim=6, seed=0)
    query_coeffs = sobol_coefficients(args.n_query, dim=6, seed=1)
    train_ds = KLSumStochastic(train_coeffs, domain_size=n)
    module = Poisson2D(
        GoodNetwork(in_dim=n, out_dim=n, out_channels=1, filters=8),
        train_ds, domain_size=n, batch_size=args.batch_size,
        loss_type="energy", bc1_value=1.0, bc2_value=0.0)
    run_dir = make_run_dir(args.out_dir, "klsum")
    trainer = Trainer(max_epochs=args.max_epochs, optimizer="adam",
                      learning_rate=3e-4, run_dir=run_dir, checkpoint=True)
    state = trainer.fit(module, NumpyLoader(train_ds, args.batch_size,
                                            shuffle=True))

    query_ds = KLSumStochastic(query_coeffs, domain_size=n)
    mean, sdev, _ = query_statistical(module, state.params, query_ds,
                                      batch_size=args.batch_size,
                                      out_dir=run_dir)
    plot_contours(os.path.join(run_dir, "uq.png"),
                  {"mean": mean, "sdev": sdev})
    print(f"run_dir: {run_dir}  mean-range "
          f"[{mean.min():.3f},{mean.max():.3f}]  sdev-max {sdev.max():.3f}")


if __name__ == "__main__":
    main()
