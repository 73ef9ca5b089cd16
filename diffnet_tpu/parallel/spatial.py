"""Explicitly spatially-parallel FEM residual via shard_map.

The jit/GSPMD path already handles spatially-sharded residuals automatically
(tests/test_parallel.py). This module is the EXPLICIT-collectives version —
each shard computes its local element contributions after a one-node-row
halo exchange with its neighbors via ppermute. It exists as (a) a verified reference for
the communication pattern any future multi-chip Pallas kernel needs, and
(b) an escape hatch when GSPMD's choices are suboptimal.

Decomposition: the global node grid [n, n] is sharded along rows (the
'space' mesh axis) into S contiguous blocks. Element row e touches node rows
{e, e+1}. Each shard receives one halo node row from each neighbor
(ppermute), recomputes the cut element rows redundantly, and keeps only the
contributions to its own node rows — so assembly needs NO reverse
communication (compute-overlap beats a second ppermute on TPU: one element
row of redundant FLOPs per cut vs an extra latency-bound collective).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core import fem
from ..core.quadrature import FEMBasis

__all__ = ["poisson_residual_spatial", "poisson_stiffness_spatial_fused",
           "poisson_stiffness_spatial_fused_3d"]


def _local_contrib(u_halo, nu_halo, basis, shard_idx, n_shards, nel_rows_loc):
    """Element contributions for the local element rows [-1, n_loc):
    u_halo [B, n_loc + 2, n] -> per-element residual scattered onto local
    node rows [-1, n_loc + 1) == [B, n_loc + 2, n]."""
    gp = fem.gp_eval(u_halo, basis, ("dx", "dy"))
    nug = fem.gp_eval(nu_halo, basis, ("N",))["N"]
    # mask out-of-domain element rows: global element row of local row k is
    # shard_idx * n_loc - 1 + k; valid range [0, n_shards * n_loc - 1)
    k = jax.lax.broadcasted_iota(jnp.int32, gp["dx"].shape[-3:], 0)
    e_glob = shard_idx * nel_rows_loc - 1 + k
    valid = ((e_glob >= 0) & (e_glob < n_shards * nel_rows_loc - 1)
             ).astype(u_halo.dtype)
    R = fem.galerkin_project_multi(
        [(valid * nug * gp["dx"], "dx"), (valid * nug * gp["dy"], "dy")],
        basis, u_halo.shape[-2:])
    return R


def poisson_residual_spatial(u, nu, basis: FEMBasis, mesh,
                             axis_name: str = "space"):
    """Assembled stiffness action K(nu)u with explicit halo exchange.

    u, nu: [B, ny, nx] with the ROW count divisible by the 'space' axis
    size (the grid is split along rows, axis -2). Returns [B, ny, nx]
    equal to the single-device assembly (pinned by test).
    """
    n = u.shape[-2]  # rows — the axis shard_map splits
    S = mesh.shape[axis_name]
    assert n % S == 0, f"rows {n} not divisible by space={S}"
    n_loc = n // S

    from .mesh import halo_exchange_y

    def local_fn(u_loc, nu_loc):
        # u_loc [B, n_loc, n]; one canonical halo-exchange implementation
        # (mesh.halo_exchange_y) instead of a second copy of the ppermute
        # edge logic
        idx = jax.lax.axis_index(axis_name)
        R_halo = _local_contrib(halo_exchange_y(u_loc, axis_name, 1),
                                halo_exchange_y(nu_loc, axis_name, 1),
                                basis, idx, S, n_loc)
        # compute-overlap scheme: the cut elements (global rows r0-1 and
        # r0+n_loc-1) are computed by BOTH adjacent shards, and each shard
        # keeps only the contributions landing on its OWN node rows — so no
        # reverse communication is needed (one ppermute halo each way total,
        # redundant compute of one element row per cut).
        return R_halo[:, 1:-1, :]

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, axis_name, None), P(None, axis_name, None)),
        out_specs=P(None, axis_name, None))
    spec = NamedSharding(mesh, P(None, axis_name, None))
    return fn(jax.device_put(u, spec), jax.device_put(nu, spec))


def poisson_stiffness_spatial_fused(u, nu, basis: FEMBasis, mesh,
                                    axis_name: str = "space",
                                    variant: str = "blockspec",
                                    tile_y: int = 128):
    """The fused Pallas stiffness kernel (ops/poisson_residual.py) composed
    with the explicit shard_map halo-exchange pattern above — the
    multi-chip Pallas path this module declared itself the blueprint for
    (VERDICT r3 item 6).

    Per shard: one ppermute halo row each way (mesh.halo_exchange_y), the
    rectangular fused kernel over the (n_loc + 2)-row block, keep own node
    rows. The kernel assembles ALL block element rows, so the two DOMAIN-
    EDGE shards see one phantom element row spanning the zero-filled outer
    halo; its (nonzero: nu interpolates from the real row) contribution to
    the kept edge node row is recomputed with the XLA element path on the
    2-row strip and subtracted — O(1/n_loc) extra work, exact equality
    with the unsharded kernel (pinned by tests/test_pallas_kernel.py).

    u, nu: [B, ny, nx], rows divisible by the 'space' axis size.
    """
    from ..ops import poisson_stiffness_action
    from .mesh import halo_exchange_y

    n = u.shape[-2]
    S = mesh.shape[axis_name]
    assert n % S == 0, f"rows {n} not divisible by space={S}"

    def strip_R(ub, nub):
        gp = fem.gp_eval(ub, basis, ("dx", "dy"))
        nug = fem.gp_eval(nub, basis, ("N",))["N"]
        return fem.galerkin_project_multi(
            [(nug * gp["dx"], "dx"), (nug * gp["dy"], "dy")],
            basis, ub.shape[-2:])

    def local_fn(u_loc, nu_loc):
        idx = jax.lax.axis_index(axis_name)
        ub = halo_exchange_y(u_loc, axis_name, 1)
        nub = halo_exchange_y(nu_loc, axis_name, 1)
        R = poisson_stiffness_action(ub, nub, basis, tile_y, variant)
        # phantom-element corrections at the domain edges (halo zero-fill)
        first = (idx == 0).astype(R.dtype)
        last = (idx == S - 1).astype(R.dtype)
        Rt = strip_R(ub[:, 0:2], nub[:, 0:2])
        Rb = strip_R(ub[:, -2:], nub[:, -2:])
        R = R.at[:, 1].add(-first * Rt[:, 1])
        R = R.at[:, -2].add(-last * Rb[:, 0])
        return R[:, 1:-1, :]

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, and this JAX's shard_map rejects that under its default
    # vma checking (the manual ppermute pattern is vma-opaque anyway)
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, axis_name, None), P(None, axis_name, None)),
        out_specs=P(None, axis_name, None), check_rep=False)
    spec = NamedSharding(mesh, P(None, axis_name, None))
    return fn(jax.device_put(u, spec), jax.device_put(nu, spec))


def poisson_stiffness_spatial_fused_3d(u, nu, basis: FEMBasis, mesh,
                                       axis_name: str = "space",
                                       variant: str = "dma",
                                       tile_z: int = 8):
    """3D counterpart of :func:`poisson_stiffness_spatial_fused`: the fused
    3D Pallas stiffness kernel (ops/poisson_residual_3d.py) composed with
    an explicit DEPTH-axis halo exchange (VERDICT r4 #8; reference 3D
    parallel workload IBN/poisson-3d/parametric/IBN_3D.py:193-199).

    Per shard: one ppermute halo node PLANE each way
    (mesh.halo_exchange_z), the rectangular-in-z fused kernel over the
    (nz_loc + 2)-plane slab, keep own node planes. The kernel assembles
    ALL slab element layers, so the two DOMAIN-EDGE shards see one phantom
    element layer spanning the zero-filled outer halo; its (nonzero: nu
    interpolates from the real plane) contribution to the kept edge node
    plane is recomputed with the XLA element path on the 2-plane slab and
    subtracted — O(1/nz_loc) extra work, exact equality with the unsharded
    kernel (pinned by tests/test_parallel.py).

    u, nu: [B, nz, ny, nx] with nz divisible by the 'space' axis size and
    ny == nx.
    """
    from ..ops import poisson_stiffness_action_3d
    from .mesh import halo_exchange_z

    nz = u.shape[-3]
    S = mesh.shape[axis_name]
    assert nz % S == 0, f"planes {nz} not divisible by space={S}"

    def slab_R(ub, nub):
        gp = fem.gp_eval(ub, basis, ("dx", "dy", "dz"))
        nug = fem.gp_eval(nub, basis, ("N",))["N"]
        return fem.galerkin_project_multi(
            [(nug * gp["dx"], "dx"), (nug * gp["dy"], "dy"),
             (nug * gp["dz"], "dz")], basis, ub.shape[-3:])

    def local_fn(u_loc, nu_loc):
        idx = jax.lax.axis_index(axis_name)
        ub = halo_exchange_z(u_loc, axis_name, 1)
        nub = halo_exchange_z(nu_loc, axis_name, 1)
        R = poisson_stiffness_action_3d(ub, nub, basis, tile_z, variant)
        # phantom-element-layer corrections at the domain edges (halo
        # zero-fill)
        first = (idx == 0).astype(R.dtype)
        last = (idx == S - 1).astype(R.dtype)
        Rt = slab_R(ub[:, 0:2], nub[:, 0:2])
        Rb = slab_R(ub[:, -2:], nub[:, -2:])
        R = R.at[:, 1].add(-first * Rt[:, 1])
        R = R.at[:, -2].add(-last * Rb[:, 0])
        return R[:, 1:-1]

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, axis_name, None, None),
                  P(None, axis_name, None, None)),
        out_specs=P(None, axis_name, None, None), check_rep=False)
    spec = NamedSharding(mesh, P(None, axis_name, None, None))
    return fn(jax.device_put(u, spec), jax.device_put(nu, spec))
