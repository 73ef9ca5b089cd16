"""Parametric eikonal airfoil: a NURBS boundary cloud (real e864 airfoil
profile as the control polygon when the reference mount is present, analytic
teardrop otherwise) -> generalized winding-number occupancy -> signed-distance
reconstruction by eikonal residual minimization — counterpart of
examples/eiqonal/parametric/09_airfoil.py:238-291.

    python examples/eikonal_airfoil.py --domain-size 64 --max-epochs 200
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

E864 = ("/root/reference/examples/poisson/single_instance/airfoil-e864/"
        "e864.dat")


def airfoil_control_polygon(n_control=24):
    """Control polygon in the unit domain: the real e864 profile when
    mounted, else an analytic teardrop."""
    if os.path.exists(E864):
        pts = np.loadtxt(E864)[:, :2]
        # subsample to a control polygon, scale chord into [0.2, 0.8]
        idx = np.linspace(0, len(pts) - 1, n_control).astype(int)
        ctrl = pts[idx]
        lo, hi = ctrl.min(0), ctrl.max(0)
        scale = 0.6 / (hi[0] - lo[0])
        ctrl = (ctrl - lo) * scale
        ctrl[:, 0] += 0.2
        ctrl[:, 1] += 0.5 - ctrl[:, 1].mean()
        return ctrl, "e864"
    t = np.linspace(0, 2 * np.pi, n_control, endpoint=False)
    x = 0.5 + 0.3 * np.cos(t)
    y = 0.5 + 0.08 * np.sin(t) * (1.2 - np.cos(t))  # cambered teardrop
    return np.stack([x, y], -1), "teardrop"


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--domain-size", type=int, default=64)
    p.add_argument("--n-points", type=int, default=200)
    p.add_argument("--max-epochs", type=int, default=200)
    p.add_argument("--out-dir", default="runs")
    args = p.parse_args()

    import jax.numpy as jnp

    from diffnet_tpu.core.geometry import occupancy_from_cloud
    from diffnet_tpu.data.geometry_datasets import nurbs_curve
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde import Eikonal2D, signed_occupancy_init
    from diffnet_tpu.train import Trainer, make_run_dir
    from diffnet_tpu.utils import plot_contours

    n = args.domain_size
    ctrl, kind = airfoil_control_polygon()
    pts, nrm, area = nurbs_curve(ctrl, n_samples=args.n_points)
    print(f"{kind} NURBS cloud: {len(pts)} points, "
          f"bbox [{pts.min(0)}, {pts.max(0)}]")
    cloud = np.concatenate([pts, nrm, area[:, None]], -1).astype(np.float32)
    ds = InMemoryDataset(cloud[None], np.zeros((1, n, n, 1), np.float32))

    jp = lambda a: jnp.asarray(a)[None]
    chi = np.asarray(occupancy_from_cloud(jp(pts), jp(nrm), jp(area),
                                          (n, n)))[0]
    print(f"winding occupancy: {chi.mean():.4f} of the domain inside")

    u0 = np.asarray(signed_occupancy_init(jp(pts), jp(nrm), jp(area),
                                          (n, n)))[0]
    net = DirectField((n, n), init=u0)
    module = Eikonal2D(net, ds, domain_size=n, batch_size=1,
                       sdf_weight=100.0, normals_weight=10.0)
    run_dir = make_run_dir(args.out_dir, f"eikonal-airfoil-{kind}")
    trainer = Trainer(max_epochs=args.max_epochs, optimizer="lbfgs",
                      lbfgs_max_iter=10, run_dir=run_dir, checkpoint=True)
    state = trainer.fit(module, NumpyLoader(ds, batch_size=1))

    u = np.asarray(net.apply(state.params)[0])
    from diffnet_tpu.core.interp import grid_interp_2d

    u_pts, _ = grid_interp_2d(jnp.asarray(u)[None], jp(pts),
                              (1.0 / (n - 1), 1.0 / (n - 1)), deg=1)
    zero_err = float(np.abs(np.asarray(u_pts)).mean())
    plot_contours(os.path.join(run_dir, "sdf.png"),
                  {"chi": chi, "sdf": u, "abs_sdf": np.abs(u)})
    print(f"run_dir: {run_dir}  mean |u| on boundary: {zero_err:.2e} "
          f"(h = {1.0/(n-1):.2e})  sdf range [{u.min():.3f}, {u.max():.3f}]")


if __name__ == "__main__":
    main()
