"""Parametric Navier-Stokes flow past embedded objects: an obstacle-image
ensemble drives a shared-encoder multi-head U-Net producing (u, v, p), trained
on the VMS residuals with per-field round-robin updates — counterpart of
examples/navier-stokes/parametric/e2_ns_fpc_embedded_airfoil.py:241-414.

Uses the real airfoil obstacle image from the reference mount when available
(af_images/fpa_bc_*.npy, augmented by shifts), synthetic ellipse obstacles
otherwise.

    python examples/ns_fpc_parametric.py --max-epochs 50 --n-samples 16
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

AF_IMAGE = ("/root/reference/examples/navier-stokes/single_instance/"
            "af_images/fpa_bc_128x64.npy")


def load_obstacles(n_samples, shape, domain_lengths, seed=0):
    """Real airfoil mask (+shift augmentations) when mounted, else synthetic
    ellipses (data-free stand-in for the reference image directory)."""
    from diffnet_tpu.data.flow import synthetic_obstacles

    if os.path.exists(AF_IMAGE):
        chi = np.load(AF_IMAGE)
        if chi.shape != tuple(shape):
            # nearest-neighbor resample to the requested grid
            iy = np.linspace(0, chi.shape[0] - 1, shape[0]).round().astype(int)
            ix = np.linspace(0, chi.shape[1] - 1, shape[1]).round().astype(int)
            chi = chi[np.ix_(iy, ix)]
        rng = np.random.default_rng(seed)
        chis = [chi]
        for _ in range(n_samples - 1):
            sy = int(rng.integers(-shape[0] // 8, shape[0] // 8 + 1))
            sx = int(rng.integers(-shape[1] // 10, shape[1] // 10 + 1))
            chis.append(np.roll(np.roll(chi, sy, 0), sx, 1))
        return chis, "airfoil"
    return synthetic_obstacles(n_samples, shape, domain_lengths,
                               seed=seed), "synthetic"


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--n-samples", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--re", type=float, default=100)
    p.add_argument("--max-epochs", type=int, default=50)
    p.add_argument("--base-filters", type=int, default=8)
    p.add_argument("--out-dir", default="runs")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from diffnet_tpu.data.flow import FlowPastObjectEnsemble
    from diffnet_tpu.data.loader import NumpyLoader
    from diffnet_tpu.models.networks import MultiOutUNet
    from diffnet_tpu.pde import NavierStokes
    from diffnet_tpu.train import Trainer, make_run_dir
    from diffnet_tpu.utils import plot_contours

    ny, nx = args.height, args.width
    L = (4.0, 1.0)
    chis, kind = load_obstacles(args.n_samples, (ny, nx), L)
    print(f"obstacle ensemble: {len(chis)} {kind} masks at {ny}x{nx}")
    ds = FlowPastObjectEnsemble(chis, domain_lengths=L, Re=args.re)

    net = MultiOutUNet(num_outputs=3, out_channels=1,
                       base_filters=args.base_filters)
    module = NavierStokes(net, ds, domain_lengths=L, domain_sizes=(nx, ny),
                          batch_size=args.batch_size, Re=args.re,
                          u_bc=ds.u_bc, loss_norm="squared")
    run_dir = make_run_dir(args.out_dir, f"ns-fpc-{kind}")
    trainer = Trainer(max_epochs=args.max_epochs, optimizer="adam",
                      learning_rate=3e-4, round_robin=True, run_dir=run_dir,
                      checkpoint=True)
    state = trainer.fit(module, NumpyLoader(ds, args.batch_size,
                                            shuffle=True, drop_last=False))

    # visualize the first instance
    batch = (jnp.asarray(ds[0][0])[None], jnp.asarray(ds[0][1])[None])
    u, v, pr = module.apply_bcs(net.apply(state.params, batch[0]), batch[0])
    u, v, pr = (np.asarray(a)[0] for a in (u, v, pr))
    plot_contours(os.path.join(run_dir, "fields.png"),
                  {"chi": chis[0], "u": u, "v": v, "p": pr})
    print(f"run_dir: {run_dir}  u range [{u.min():.3f}, {u.max():.3f}]  "
          f"no-slip max |u| on object: {np.abs(u[chis[0] > 0.5]).max():.2e}")


if __name__ == "__main__":
    main()
