"""Multi-chip scaling demo: data-parallel + spatially-sharded Poisson
training over a device mesh.

The reference's only multi-device mode is Lightning DDP (IBN_3D.py:193-199).
This demo goes further: the batch is sharded over the mesh 'data' axis
(DDP-equivalent; XLA emits the gradient all-reduce) AND the grid rows over
the 'space' axis (XLA inserts the 1-node halo exchanges for the FEM
gather/scatter). Runs anywhere via virtual CPU devices:

    python examples/multichip_scaling.py --devices 8 --data 4 --space 2
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--devices", type=int, default=8,
                   help="virtual CPU device count (ignored on real multichip)")
    p.add_argument("--data", type=int, default=4)
    p.add_argument("--space", type=int, default=2)
    p.add_argument("--domain-size", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    # pin the virtual-CPU platform BEFORE any backend init (this image's
    # sitecustomize force-registers a single-chip TPU backend and the first
    # jax.devices() call caches it); set DIFFNET_REAL_MESH=1 on machines
    # with real multi-chip topology
    if not os.environ.get("DIFFNET_REAL_MESH"):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diffnet_tpu.core import fem
    from diffnet_tpu.core.quadrature import make_basis
    from diffnet_tpu.parallel.mesh import make_mesh, replicated

    n = args.domain_size
    bs = args.batch_size
    h = 1.0 / (n - 1)
    basis = make_basis(2, 1, h=(h, h))
    mesh = make_mesh(data=args.data, space=args.space)
    print(f"mesh: {mesh}")

    rng = np.random.default_rng(0)
    nu = jnp.asarray(rng.random((bs, n, n)), jnp.float32)
    f_gp = jnp.asarray(rng.random((bs, n - 1, n - 1, 4)), jnp.float32)
    bc = jnp.zeros((n, n)).at[[0, -1], :].set(1.0).at[:, [0, -1]].set(1.0)

    spec = NamedSharding(mesh, P("data", "space", None))
    spec4 = NamedSharding(mesh, P("data", None, None, None))  # element rows are odd (n-1); GSPMD reshards as needed
    nu = jax.device_put(nu, spec)
    f_gp = jax.device_put(f_gp, spec4)

    params = jax.device_put({"u": jnp.zeros((n, n))}, replicated(mesh))
    opt = optax.adam(1e-2)
    opt_state = jax.device_put(opt.init(params), replicated(mesh))

    def loss_fn(params, nu, f_gp):
        u = jnp.broadcast_to(params["u"][None], nu.shape)
        u = jnp.where(bc > 0.5, 0.0, u)
        gp = fem.gp_eval(u, basis, ("dx", "dy"))
        nug = fem.gp_eval(nu, basis, ("N",))["N"]
        R = fem.galerkin_project_multi(
            [(nug * gp["dx"], "dx"), (nug * gp["dy"], "dy"), (-f_gp, "N")],
            basis, (n, n))
        R = jnp.where(bc > 0.5, 0.0, R)
        return jnp.sum(R**2)

    @jax.jit
    def step(params, opt_state, nu, f_gp):
        loss, grads = jax.value_and_grad(loss_fn)(params, nu, f_gp)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    with mesh:
        params, opt_state, loss = step(params, opt_state, nu, f_gp)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            params, opt_state, loss = step(params, opt_state, nu, f_gp)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.steps
    print(f"loss: {float(loss):.4e}  step: {dt*1e3:.2f} ms "
          f"({bs * (n-1)**2 / dt / 1e6:.1f} M elem-evals/s across "
          f"{args.data * args.space} devices)")


if __name__ == "__main__":
    main()
