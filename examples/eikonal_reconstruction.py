"""Signed-distance reconstruction from an oriented point cloud —
counterpart of examples/eiqonal/single_instance/e01_curve_reconstruction.py.

    python examples/eikonal_reconstruction.py --domain-size 32
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--domain-size", type=int, default=32)
    p.add_argument("--max-epochs", type=int, default=300)
    p.add_argument("--xyzna", default=None,
                   help="optional .xyzna cloud file (2D: z ignored)")
    p.add_argument("--out-dir", default="runs")
    args = p.parse_args()

    import jax.numpy as jnp

    from diffnet_tpu.core.geometry import sample_ellipse_cloud
    from diffnet_tpu.data import InMemoryDataset, NumpyLoader
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde import Eikonal2D, signed_occupancy_init
    from diffnet_tpu.train import Trainer, make_run_dir
    from diffnet_tpu.utils import plot_contours, read_xyzna

    n = args.domain_size
    if args.xyzna:
        pts3, nrm3, area = read_xyzna(args.xyzna)
        pts, nrm = pts3[:, :2], nrm3[:, :2]
        if not area.any():
            d = np.linalg.norm(np.roll(pts, -1, 0) - pts, axis=-1)
            area = 0.5 * (d + np.roll(d, 1, 0))
    else:
        pts, nrm, area = sample_ellipse_cloud(n_points=150,
                                              center=(0.5, 0.5),
                                              radii=(0.28, 0.18))
    cloud = np.concatenate([pts, nrm, area[:, None]], -1).astype(np.float32)
    ds = InMemoryDataset(cloud[None], np.zeros((1, n, n, 1), np.float32))

    u0 = np.asarray(signed_occupancy_init(
        jnp.asarray(pts)[None], jnp.asarray(nrm)[None],
        jnp.asarray(area)[None], (n, n)))[0]
    net = DirectField((n, n), init=u0)
    module = Eikonal2D(net, ds, domain_size=n, batch_size=1,
                       sdf_weight=100.0, normals_weight=10.0)

    run_dir = make_run_dir(args.out_dir, "eikonal")
    trainer = Trainer(max_epochs=args.max_epochs, optimizer="lbfgs",
                      lbfgs_max_iter=10, run_dir=run_dir, checkpoint=True)
    state = trainer.fit(module, NumpyLoader(ds, batch_size=1))
    u = np.asarray(net.apply(state.params)[0])
    plot_contours(os.path.join(run_dir, "sdf.png"),
                  {"initial": u0, "sdf": u, "|sdf|<h band":
                   (np.abs(u) < 1.0 / n).astype(float)})
    print(f"run_dir: {run_dir}  sdf range [{u.min():.3f}, {u.max():.3f}]")


if __name__ == "__main__":
    main()
