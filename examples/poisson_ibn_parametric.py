"""Parametric immersed-boundary (IBN) Poisson — the flagship path;
counterpart of examples/poisson/parametric/IBN_2D.py and
e1_complex_immersed_background.py.

    python examples/poisson_ibn_parametric.py --batch-size 64 --max-epochs 5
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-b", "--batch-size", type=int, default=64)
    p.add_argument("--domain-size", type=int, default=32)
    p.add_argument("--n-samples", type=int, default=512)
    p.add_argument("--max-epochs", type=int, default=5)
    p.add_argument("--learning-rate", type=float, default=3e-4)
    p.add_argument("--network", default="ae", choices=["ae", "unet", "good"])
    p.add_argument("--data-path", default=None,
                   help="dir with point_cloud.npz/normals.npz; synthetic "
                        "ellipse clouds when omitted")
    p.add_argument("--out-dir", default="runs")
    p.add_argument("--debug", action="store_true", help="fast_dev_run")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from diffnet_tpu.data import NumpyLoader
    from diffnet_tpu.data.parametric import (PointClouds,
                                             SyntheticPointClouds)
    from diffnet_tpu.models import AE, GoodNetwork, UNet
    from diffnet_tpu.pde import IBNPoisson2D
    from diffnet_tpu.train import Trainer, make_run_dir
    from diffnet_tpu.utils import plot_contours

    n = args.domain_size
    if args.data_path:
        train_ds = PointClouds(args.data_path, "train", n)
    else:
        train_ds = SyntheticPointClouds(n_samples=args.n_samples,
                                        domain_size=n)
    loader = NumpyLoader(train_ds, batch_size=args.batch_size, shuffle=True)

    if args.network == "ae":
        net = AE(out_channels=1, dims=8, n_downsample=2)
    elif args.network == "unet":
        net = UNet(out_channels=1, base_filters=16)
    else:
        net = GoodNetwork(in_dim=n, out_dim=n, out_channels=1)

    module = IBNPoisson2D(net, domain_size=n, batch_size=args.batch_size,
                          learning_rate=args.learning_rate)
    run_dir = make_run_dir(args.out_dir, "ibn-2d")
    trainer = Trainer(max_epochs=args.max_epochs, optimizer="adam",
                      learning_rate=args.learning_rate, run_dir=run_dir,
                      checkpoint=True, fast_dev_run=args.debug)
    state = trainer.fit(module, loader)

    batch = jax.tree.map(jnp.asarray, next(iter(loader)))
    u, inputs, forcing = module.forward(state.params, batch)
    u = np.asarray(module.apply_bcs(u, inputs))
    plot_contours(os.path.join(run_dir, "sample.png"),
                  {"chi": np.asarray(inputs[0, ..., 1]),
                   "u": u[0]})  # apply_bcs squeezes the channel
    print(f"run_dir: {run_dir}")


if __name__ == "__main__":
    main()
