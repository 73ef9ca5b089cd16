"""Load a trained run and perform the statistical query — counterpart of
examples/poisson/parametric/query.py + run-query.sh (which key off the
versioned `name/version_N` run dirs).

    python examples/query_run.py runs/klsum/version_0 --n-query 256
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir", help="versioned run dir containing best.ckpt")
    p.add_argument("--domain-size", type=int, default=32)
    p.add_argument("--n-query", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--filters", type=int, default=8)
    p.add_argument("--seed", type=int, default=123)
    args = p.parse_args()

    import jax

    from diffnet_tpu.data.parametric import KLSumStochastic
    from diffnet_tpu.models import GoodNetwork
    from diffnet_tpu.pde import Poisson2D
    from diffnet_tpu.train import load_params, query_statistical
    from diffnet_tpu.utils import plot_contours, write_vti

    n = args.domain_size
    net = GoodNetwork(in_dim=n, out_dim=n, out_channels=1,
                      filters=args.filters)
    sample = np.zeros((1, n, n, 3), np.float32)
    template = net.init(jax.random.key(0), sample)
    ckpt = os.path.join(args.run_dir, "best.ckpt")
    if not os.path.exists(ckpt):
        ckpt = os.path.join(args.run_dir, "last.ckpt")
    params = load_params(template, ckpt)

    coeffs = np.random.default_rng(args.seed).normal(
        0, 0.5, (args.n_query, 6))
    query_ds = KLSumStochastic(coeffs, domain_size=n)
    module = Poisson2D(net, query_ds, domain_size=n,
                       batch_size=args.batch_size, loss_type="energy")
    mean, sdev, all_u = query_statistical(module, params, query_ds,
                                          batch_size=args.batch_size,
                                          out_dir=args.run_dir)
    plot_contours(os.path.join(args.run_dir, "query_uq.png"),
                  {"mean": mean, "sdev": sdev})
    write_vti(os.path.join(args.run_dir, "q_mean.vti"), mean)
    write_vti(os.path.join(args.run_dir, "q_sdev.vti"), sdev)
    print(f"queried {len(all_u)} samples -> {args.run_dir}/q_mean.npy, "
          f"q_sdev.npy, query_uq.png, q_*.vti")


if __name__ == "__main__":
    main()
