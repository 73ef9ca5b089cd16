"""3D parametric IBN training — counterpart of the reference DDP flagship
IBN/poisson-3d/parametric/IBN_3D.py (32^3 voxel/topology ensembles, UNet3D,
2-GPU DDP). Data parallelism here is a device mesh: pass --data-devices N to
shard the batch (virtual CPU devices anywhere, real chips on TPU pods).

    python examples/ibn_3d.py --domain-size 32 --batch-size 8 --max-epochs 10
    python examples/ibn_3d.py --data-devices 8   # 8-way data parallel
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--domain-size", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--n-samples", type=int, default=16)
    p.add_argument("--max-epochs", type=int, default=10)
    p.add_argument("--topo-dir", default=None,
                   help="dir of npz topology files; synthetic bar lattices "
                        "when omitted")
    p.add_argument("--data-devices", type=int, default=0,
                   help=">0: build a data-parallel mesh over this many "
                        "devices (forces the virtual-CPU platform when the "
                        "backend has fewer)")
    p.add_argument("--out-dir", default="runs")
    args = p.parse_args()
    if args.data_devices and args.batch_size % args.data_devices:
        p.error(f"--batch-size {args.batch_size} must be divisible by "
                f"--data-devices {args.data_devices} (data sharding)")

    if args.data_devices > 0:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{args.data_devices}").strip()

    import jax

    if args.data_devices > 0:
        jax.config.update("jax_platforms", "cpu")

    from diffnet_tpu.data import NumpyLoader
    from diffnet_tpu.data.geometry_datasets import (TopoDataset3D,
                                                    synthesize_topology_3d)
    from diffnet_tpu.models import UNet3D
    from diffnet_tpu.parallel import make_mesh
    from diffnet_tpu.pde import IBNPoisson3D
    from diffnet_tpu.train import Trainer, make_run_dir
    from diffnet_tpu.utils import write_vti
    from diffnet_tpu.utils.mesh3d import field_to_obj

    n = args.domain_size
    if args.topo_dir:
        ds = TopoDataset3D(args.topo_dir, domain_size=n)
    else:
        ds = TopoDataset3D([synthesize_topology_3d(n=n, seed=s)
                            for s in range(args.n_samples)], domain_size=n)
    sharding = None
    if args.data_devices > 0:
        from diffnet_tpu.parallel import data_sharding

        mesh = make_mesh(data=args.data_devices)
        sharding = data_sharding(mesh, 5)
        print(f"data-parallel mesh: {mesh}")
    loader = NumpyLoader(ds, batch_size=args.batch_size, shuffle=True,
                         sharding=sharding)

    net = UNet3D(out_channels=1, base_filters=4)
    module = IBNPoisson3D(net, domain_size=n, batch_size=args.batch_size,
                          learning_rate=1e-3)
    run_dir = make_run_dir(args.out_dir, "ibn-3d")
    trainer = Trainer(max_epochs=args.max_epochs, optimizer="adam",
                      learning_rate=1e-3, run_dir=run_dir, checkpoint=True)
    state = trainer.fit(module, loader)

    # export one solved field + the object isosurface (reference IBN_3D
    # marching-cubes visualization, IBN_3D.py:36-69)
    import jax.numpy as jnp

    batch = jax.tree.map(jnp.asarray, next(iter(loader)))
    u, inputs, _ = module.forward(state.params, batch)
    u = np.asarray(module.apply_bcs(u[..., 0], inputs))[0]
    write_vti(os.path.join(run_dir, "u.vti"), u)
    field_to_obj(os.path.join(run_dir, "object.obj"),
                 np.asarray(batch[0][0, ..., 1]), level=0.5)
    print(f"run_dir: {run_dir}")


if __name__ == "__main__":
    main()
