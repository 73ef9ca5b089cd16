"""Multi-device tests on the virtual 8-CPU mesh: data-parallel equivalence,
spatial sharding through the FEM ops, halo exchange."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from diffnet_tpu.core import fem
from diffnet_tpu.core.quadrature import make_basis
from diffnet_tpu.parallel.mesh import (
    data_sharding,
    halo_exchange_y,
    make_mesh,
    shard_batch,
    spatial_sharding,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _residual_fn(basis, n, bc):
    def f(u, nu):
        gp = fem.gp_eval(u, basis, ("dx", "dy"))
        nu_gp = fem.gp_eval(nu, basis, ("N",))["N"]
        R = (fem.galerkin_project(nu_gp * gp["dx"], basis, "dx", (n, n))
             + fem.galerkin_project(nu_gp * gp["dy"], basis, "dy", (n, n)))
        return jnp.where(bc > 0.5, 0.0, R)
    return f


def test_data_parallel_matches_single_device():
    n = 33
    mesh = make_mesh(data=8, space=1)
    basis = make_basis(2, 1, h=(1 / (n - 1),) * 2)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((8, n, n)), jnp.float32)
    nu = jnp.asarray(rng.random((8, n, n)), jnp.float32)
    bc = jnp.zeros((n, n)).at[0].set(1.0)
    f = _residual_fn(basis, n, bc)
    R_single = jax.jit(f)(u, nu)
    u_s = jax.device_put(u, data_sharding(mesh, 3))
    nu_s = jax.device_put(nu, data_sharding(mesh, 3))
    R_sharded = jax.jit(f)(u_s, nu_s)
    np.testing.assert_allclose(np.asarray(R_single), np.asarray(R_sharded),
                               atol=1e-6)


def test_spatial_sharding_matches_single_device():
    """GSPMD inserts the halo exchanges for the strided-slice gather — the
    spatially sharded residual must equal the unsharded one exactly."""
    n = 64
    mesh = make_mesh(data=2, space=4)
    basis = make_basis(2, 1, h=(1 / (n - 1),) * 2)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.random((2, n, n)), jnp.float32)
    nu = jnp.ones((2, n, n), jnp.float32)
    bc = jnp.zeros((n, n))
    f = _residual_fn(basis, n, bc)
    R_single = jax.jit(f)(u, nu)
    sh = spatial_sharding(mesh, 3, y_axis=1)
    R_sharded = jax.jit(f)(jax.device_put(u, sh), jax.device_put(nu, sh))
    np.testing.assert_allclose(np.asarray(R_single), np.asarray(R_sharded),
                               atol=1e-5)


def test_halo_exchange_y():
    mesh = make_mesh(data=1, space=8)
    ny = 32
    x = jnp.arange(ny * 4, dtype=jnp.float32).reshape(ny, 4)

    def local(xl):
        return halo_exchange_y(xl, "space", halo=1)

    f = shard_map(local, mesh=mesh, in_specs=P("space", None),
                  out_specs=P("space", None))
    out = np.asarray(f(x))
    # each local block is 4 rows -> padded to 6; check a middle shard's halos
    blocks = out.reshape(8, 6, 4)
    xs = np.asarray(x).reshape(8, 4, 4)
    for s in range(1, 7):
        np.testing.assert_array_equal(blocks[s, 0], xs[s - 1, -1])  # prev bottom
        np.testing.assert_array_equal(blocks[s, -1], xs[s + 1, 0])  # next top
        np.testing.assert_array_equal(blocks[s, 1:-1], xs[s])
    # boundary shards zero-padded outside
    np.testing.assert_array_equal(blocks[0, 0], 0)
    np.testing.assert_array_equal(blocks[7, -1], 0)


def test_shard_batch_utility():
    mesh = make_mesh(data=8)
    batch = (np.ones((16, 8, 8, 3), np.float32), np.ones((16, 8, 8, 1),
                                                         np.float32))
    sharded = shard_batch(batch, mesh)
    assert sharded[0].sharding.spec == P("data", None, None, None)


def test_graft_dryrun():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_explicit_shard_map_residual_matches_global():
    """The explicit ppermute halo-exchange residual equals the single-device
    assembly exactly (parallel/spatial.py)."""
    from diffnet_tpu.parallel.spatial import poisson_residual_spatial

    n = 64
    mesh = make_mesh(data=1, space=8)
    basis = make_basis(2, 1, h=(1 / (n - 1),) * 2)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.random((2, n, n)), jnp.float32)
    nu = jnp.asarray(rng.random((2, n, n)), jnp.float32)

    def K_global(u, nu):
        gp = fem.gp_eval(u, basis, ("dx", "dy"))
        nug = fem.gp_eval(nu, basis, ("N",))["N"]
        return fem.galerkin_project_multi(
            [(nug * gp["dx"], "dx"), (nug * gp["dy"], "dy")], basis, (n, n))

    R_ref = K_global(u, nu)
    with mesh:
        R = poisson_residual_spatial(u, nu, basis, mesh)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_ref), atol=2e-5)


def test_spatial_sharding_3d():
    """GSPMD spatial sharding of a 3D field along z matches single-device."""
    n = 16
    mesh = make_mesh(data=2, space=4)
    basis = make_basis(3, 1, h=(1 / (n - 1),) * 3)
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.random((2, n, n, n)), jnp.float32)
    nu = jnp.ones((2, n, n, n), jnp.float32)

    def f(u, nu):
        gp = fem.gp_eval(u, basis, ("dx", "dy", "dz"))
        nug = fem.gp_eval(nu, basis, ("N",))["N"]
        return fem.galerkin_project_multi(
            [(nug * gp["dx"], "dx"), (nug * gp["dy"], "dy"),
             (nug * gp["dz"], "dz")], basis, (n, n, n))

    R_single = jax.jit(f)(u, nu)
    sh = NamedSharding(mesh, P("data", "space", None, None))
    R_shard = jax.jit(f)(jax.device_put(u, sh), jax.device_put(nu, sh))
    np.testing.assert_allclose(np.asarray(R_single), np.asarray(R_shard),
                               atol=1e-5)


def test_ns_vms_spatial_sharded_matches():
    """The full 13-quantity NS VMS 3-residual assembly under (data, space)
    sharding equals the single-device result — GSPMD inserts the halos for
    every derivative order including the second-derivative laplacians."""
    from diffnet_tpu.data.flow import NSLDCDataset
    from diffnet_tpu.pde.flow import NavierStokes

    n = 32
    mesh = make_mesh(data=2, space=4)
    ds = NSLDCDataset(domain_sizes=(n, n), Re=100)
    m = NavierStokes(None, ds, domain_size=n, batch_size=2, Re=100)
    rng = np.random.default_rng(5)
    inputs = jnp.asarray(np.broadcast_to(ds[0][0][None],
                                         (2,) + ds[0][0].shape), jnp.float32)
    u, v, p = (jnp.asarray(rng.random((2, n, n)), jnp.float32) * 0.1
               for _ in range(3))

    def f(u, v, p, inputs):
        R1, R2, R3 = m.calc_residuals((u, v, p), inputs, None)
        return jnp.stack([R1, R2, R3])

    R_single = jax.jit(f)(u, v, p, inputs)
    fld = NamedSharding(mesh, P("data", "space", None))
    inp = NamedSharding(mesh, P("data", "space", None, None))
    R_shard = jax.jit(f)(jax.device_put(u, fld), jax.device_put(v, fld),
                         jax.device_put(p, fld), jax.device_put(inputs, inp))
    np.testing.assert_allclose(np.asarray(R_single), np.asarray(R_shard),
                               atol=2e-5)


def test_spatially_sharded_cg_solve_matches():
    """The Krylov path is SPMD-transparent: CG on the assembled Poisson
    residual with the nodal fields spatially sharded over the mesh (GSPMD
    halo exchanges inside every matvec) produces the same solution as the
    unsharded solve."""
    from diffnet_tpu.train.linear import solve_linear

    n = 64
    mesh = make_mesh(data=1, space=8)
    basis = make_basis(2, 1, h=(1 / (n - 1),) * 2)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    bc = np.zeros((n, n))
    bc[[0, -1], :] = 1
    bc[:, [0, -1]] = 1
    jbc = jnp.asarray(bc)
    b = jnp.where(jbc > 0.5, 0.0, b)
    nu = jnp.ones((n, n), jnp.float32)

    from diffnet_tpu.core import fem

    def resfn(u):
        gp = fem.gp_eval(u[None], basis, ("dx", "dy"))
        R = fem.galerkin_project_multi(
            [(gp["dx"], "dx"), (gp["dy"], "dy")], basis, (n, n))[0]
        return jnp.where(jbc > 0.5, 0.0, R) - b

    u_single, _ = solve_linear(resfn, (n, n), tol=1e-8, maxiter=200)

    sh = NamedSharding(mesh, P("space", None))
    b_s = jax.device_put(b, sh)

    def resfn_s(u):
        gp = fem.gp_eval(u[None], basis, ("dx", "dy"))
        R = fem.galerkin_project_multi(
            [(gp["dx"], "dx"), (gp["dy"], "dy")], basis, (n, n))[0]
        return jnp.where(jbc > 0.5, 0.0, R) - b_s

    with mesh:
        u_sharded, _ = solve_linear(resfn_s, (n, n), tol=1e-8, maxiter=200,
                                    x0=jax.device_put(
                                        jnp.zeros((n, n), jnp.float32), sh))
    np.testing.assert_allclose(np.asarray(u_single), np.asarray(u_sharded),
                               atol=2e-4)


def test_stencil_matvec_spatially_sharded_matches():
    """The assembled-stencil fast path is SPMD-transparent: with the
    coefficient field C and the nodal field u spatially sharded over the
    mesh, stencil_matvec (one pad + 9 shifted FMAs — GSPMD inserts the
    width-1 halo exchanges) and CG over it match the unsharded results."""
    from diffnet_tpu.train.linear import solve_linear
    from diffnet_tpu.train.stencil import assemble_stencil, stencil_matvec

    n = 64
    mesh = make_mesh(data=1, space=8)
    basis = make_basis(2, 1, h=(1 / (n - 1),) * 2)
    rng = np.random.default_rng(7)
    bc = np.zeros((n, n))
    bc[[0, -1], :] = 1
    bc[:, [0, -1]] = 1
    jbc = jnp.asarray(bc)
    b = jnp.where(jbc > 0.5, 0.0,
                  jnp.asarray(rng.standard_normal((n, n)), jnp.float32))
    nu = jnp.asarray(1.0 + rng.random((n, n)), jnp.float32)

    def resfn(u):
        gp = fem.gp_eval(u[None], basis, ("dx", "dy"))
        nu_gp = fem.gp_eval(nu[None], basis, ("N",))["N"]
        R = fem.galerkin_project_multi(
            [(nu_gp * gp["dx"], "dx"), (nu_gp * gp["dy"], "dy")],
            basis, (n, n))[0]
        return jnp.where(jbc > 0.5, 0.0, R) - b

    matvec, rhs, C = assemble_stencil(resfn, (n, n))
    u_probe = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    want_mv = matvec(u_probe)
    u_single, _ = solve_linear(lambda u: matvec(u) - rhs, (n, n),
                               tol=1e-8, maxiter=200)

    sh = NamedSharding(mesh, P("space", None))
    shC = NamedSharding(mesh, P(None, "space", None))
    C_s = jax.device_put(C, shC)
    mv_s = jax.jit(lambda u: stencil_matvec(C_s, u))
    got_mv = mv_s(jax.device_put(u_probe, sh))
    np.testing.assert_allclose(np.asarray(want_mv), np.asarray(got_mv),
                               atol=1e-5)

    rhs_s = jax.device_put(rhs, sh)
    with mesh:
        u_sharded, _ = solve_linear(
            lambda u: mv_s(u) - rhs_s, (n, n), tol=1e-8, maxiter=200,
            x0=jax.device_put(jnp.zeros((n, n), jnp.float32), sh))
    np.testing.assert_allclose(np.asarray(u_single), np.asarray(u_sharded),
                               atol=2e-4)


def test_multigrid_spatially_sharded_matches():
    """The full MG V-cycle is SPMD-transparent: with the fine-level field
    spatially sharded over the mesh, the jitted V-cycle (Chebyshev
    smoothing matvecs + vjp restriction + prolongation + the probed
    coarse pinv) and 8 MG-CG iterations over it match the unsharded
    results. The hierarchy needs n = 2^k + 1, so the mesh uses 5 of the
    8 virtual devices (65 = 5 x 13 rows/shard; GSPMD chooses shardings
    for the coarser levels internally — explicit device_put requires
    divisibility only at the fine level)."""
    from jax.sharding import Mesh

    from diffnet_tpu.data.single_instances import RectangleManufactured
    from diffnet_tpu.models.field import DirectField
    from diffnet_tpu.pde import Poisson2D
    from diffnet_tpu.train import multigrid_preconditioner
    from diffnet_tpu.train.linear import solve_linear

    n = 65
    mesh = Mesh(np.array(jax.devices()[:5]).reshape(5,), ("space",))
    sh = NamedSharding(mesh, P("space", None))

    def factory(m_n):
        ds = RectangleManufactured(domain_size=m_n)
        ds.n_samples = 1
        return Poisson2D(DirectField((m_n, m_n)), ds, domain_size=m_n,
                         batch_size=1, loss_type="resmin")

    M, _ = multigrid_preconditioner(factory, n)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    want = np.asarray(M(v))
    with mesh:
        got = np.asarray(M(jax.device_put(v, sh)))
    np.testing.assert_allclose(want, got,
                               atol=2e-6 * np.abs(want).max())

    m = factory(n)
    inputs = jnp.asarray(m.dataset[0][0])[None]
    forcing = jnp.zeros((1, n, n, 1), jnp.float32)
    bcm = np.zeros((n, n)); bcm[[0, -1], :] = 1; bcm[:, [0, -1]] = 1
    b = jnp.where(jnp.asarray(bcm) > 0.5, 0.0,
                  jnp.asarray(rng.standard_normal((n, n)), jnp.float32))

    def resfn(u):
        return m.residual_for_field(u[None], inputs, forcing)[0] - b

    u_single, _ = solve_linear(resfn, (n, n), tol=1e-12, maxiter=8, M=M)
    b_s = jax.device_put(b, sh)

    def resfn_s(u):
        return m.residual_for_field(u[None], inputs, forcing)[0] - b_s

    with mesh:
        u_sharded, _ = solve_linear(
            resfn_s, (n, n), tol=1e-12, maxiter=8, M=M,
            x0=jax.device_put(jnp.zeros((n, n), jnp.float32), sh))
    np.testing.assert_allclose(np.asarray(u_single), np.asarray(u_sharded),
                               atol=2e-5)
