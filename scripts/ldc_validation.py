"""Solve NS/Stokes lid-driven cavity and overlay midline cuts against the
conventional-solver data checked into the reference repo — the visual
counterpart of the reference's epoch-end overlay plots
(e1_ns_ldc_resmin.py:414-424).

    python scripts/ldc_validation.py --re 100 --domain-size 48
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

_REF = ("/root/reference/examples/navier-stokes/single_instance/"
        "ns-ldc-numerical-results")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--re", type=int, default=100, choices=[1, 100])
    p.add_argument("--domain-size", type=int, default=48)
    p.add_argument("--max-epochs", type=int, default=500)
    p.add_argument("--out", default="runs/ldc_validation.png")
    p.add_argument("--ref-dir", default=_REF)
    args = p.parse_args()

    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    from diffnet_tpu.data.flow import NSLDCDataset
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde import NavierStokes, ldc_bcs
    from diffnet_tpu.train import Trainer

    fname = f"midline_cuts_Re{args.re}_regularized_128x128.txt"
    ref_path = os.path.join(args.ref_dir, fname)
    ref = (np.loadtxt(ref_path, delimiter=",", skiprows=1)
           if os.path.exists(ref_path) else None)

    from diffnet_tpu.train.continuation import coarse_to_fine

    n = args.domain_size

    def factory(nn_):
        ds = NSLDCDataset(domain_sizes=(nn_, nn_), Re=args.re)
        ds.n_samples = 1
        u_bc, v_bc, p_bc = ldc_bcs((nn_, nn_))
        net = DirectField((nn_, nn_), init=np.zeros((nn_, nn_)), n_fields=3)
        m_ = NavierStokes(net, ds, domain_size=nn_, batch_size=1, Re=args.re,
                          u_bc=u_bc, v_bc=v_bc, p_bc=p_bc,
                          loss_norm="squared")
        return m_, net

    # coarse-to-fine continuation for fine grids (see train/continuation.py)
    grids = [48, n] if n > 48 else [n]
    epochs = ([args.max_epochs, args.max_epochs]
              if len(grids) == 2 else [args.max_epochs])
    m, st = coarse_to_fine(factory, grids=grids, epochs=epochs)
    ds = NSLDCDataset(domain_sizes=(n, n), Re=args.re)
    inputs = jnp.asarray(ds[0][0])[None]
    u, v, _ = m.apply_bcs(m.network.apply(st.params, inputs), inputs)
    u = np.asarray(u)[0]
    v = np.asarray(v)[0]
    y = np.linspace(0, 1, n)

    fig, axs = plt.subplots(1, 2, figsize=(8, 3.2))
    axs[0].plot(y, u[:, n // 2], "-", label=f"diffnet_tpu {n}^2")
    axs[1].plot(y, v[n // 2, :], "-", label=f"diffnet_tpu {n}^2")
    if ref is not None:
        axs[0].plot(ref[:, 0], ref[:, 1], "--",
                    label="conventional solver 128^2")
        axs[1].plot(ref[:, 0], ref[:, 2], "--",
                    label="conventional solver 128^2")
        err_u = np.abs(u[:, n // 2] - np.interp(y, ref[:, 0], ref[:, 1]))
        err_v = np.abs(v[n // 2, :] - np.interp(y, ref[:, 0], ref[:, 2]))
        print(f"Re={args.re}: u-midline max err {err_u.max():.4f}, "
              f"v-midline max err {err_v.max():.4f}")
    axs[0].set_title(f"u at x=0.5 (Re={args.re})", fontsize=10)
    axs[1].set_title("v at y=0.5", fontsize=10)
    axs[0].legend(fontsize=8)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, bbox_inches="tight", dpi=130)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
