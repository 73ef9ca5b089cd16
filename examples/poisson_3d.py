"""3D Poisson: MMS cube or solve-on-voxelized-object — counterpart of
examples/poisson/single_instance/{9_voxel_3d,e19_solve_on_object_3d}.py and
tests/test3D.py.

    python examples/poisson_3d.py --domain-size 17
    python examples/poisson_3d.py --voxel-prefix path/to/Hand  # *.raw object
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--domain-size", type=int, default=17)
    p.add_argument("--max-epochs", type=int, default=60)
    p.add_argument("--voxel-prefix", default=None,
                   help="prefix of <prefix>inouts.raw + <prefix>VoxelConfig.txt")
    p.add_argument("--out-dir", default="runs")
    args = p.parse_args()

    from diffnet_tpu.data.single_instances import (CuboidManufactured,
                                                   VoxelIMBackRAW)
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde import Poisson3D
    from diffnet_tpu.train import Trainer, make_run_dir
    from diffnet_tpu.utils import write_vti

    n = args.domain_size
    run_dir = make_run_dir(args.out_dir, "poisson-3d")
    if args.voxel_prefix:
        # reference embedding default is 64^3 (voxels.py); honor a LARGER
        # explicit --domain-size, never silently shrink below it
        n = max(args.domain_size, 64)
        ds = VoxelIMBackRAW(args.voxel_prefix, domain_size=n)
        ds.n_samples = 1
        net = DirectField((n, n, n), init=np.zeros((n, n, n)))
        module = Poisson3D(net, ds, domain_size=n, batch_size=1,
                           loss_type="energy")
    else:
        ds = CuboidManufactured(domain_size=n)
        ds.n_samples = 1
        net = DirectField((n, n, n), init=np.zeros((n, n, n)))
        module = Poisson3D(net, ds, domain_size=n, batch_size=1,
                           loss_type="resmin", exact_solution=ds.exact,
                           forcing=ds.forcing_func, mms_dirichlet=True)
    trainer = Trainer(max_epochs=args.max_epochs, optimizer="lbfgs",
                      lbfgs_max_iter=10, run_dir=run_dir, checkpoint=True)
    state = trainer.fit(module)
    u = np.asarray(module.network.apply(state.params)[0])
    write_vti(os.path.join(run_dir, "u3d.vti"), u)
    if args.voxel_prefix:
        # chi isosurface -> OBJ (the reference marching-cubes + trimesh
        # workflow, IBN_3D.py:36-69)
        from diffnet_tpu.utils.mesh3d import field_to_obj

        chi = ds[0][0][..., 1]
        field_to_obj(os.path.join(run_dir, "object.obj"), chi, level=0.5)
    if not args.voxel_prefix:
        eL2, _, uexL2 = module.calc_l2_err(
            module.network.apply(state.params)[0], verbose=True)
        print(f"rel_L2: {float(eL2 / uexL2):.3e}")
    print(f"run_dir: {run_dir}")


if __name__ == "__main__":
    main()
