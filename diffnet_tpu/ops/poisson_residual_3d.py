"""Pallas TPU kernel: fused 3D Poisson Galerkin stiffness action.

3D counterpart of :mod:`diffnet_tpu.ops.poisson_residual` for the
reference's volumetric workloads (tests/test3D.py:36-85, voxel solves
9_voxel_3d.py, IBN/poisson-3d — 64^3 grids): computes

    Ku[b, k, j, i] = sum_{elements adjacent to node (k,j,i)} sum_gp
                     JxW_gp * nu(e,gp) * grad(N_(k,j,i)) · grad(u)(e,gp)

in ONE pass over HBM. The op-by-op 3D path materializes 3 gradient GP
fields at 8 GP/element (24x the nodal volume) plus nu_gp in HBM; here they
live in VMEM and HBM traffic is u + nu in, Ku out.

Structure: grid (B, z-tiles). Each program DMAs a (TZ+2)-node-plane halo
slab of u and nu into VMEM (z-extent 8-padded for DMA alignment, x padded
to the 128-lane boundary), computes the TZ+1 element layers covering its
TZ output node planes with 2x2x2 Gauss quadrature fully unrolled
(8 GP x 8 corner basis functions), masks out-of-domain element layers with
an iota validity mask, and accumulates the trilinear (Q1) assembly in VMEM.

Deg-1 (trilinear, 2x2x2 Gauss) only — the configuration of every 3D
reference workload. Differentiable via custom VJP (self-adjoint in u; one
Galerkin projection for d/d(nu)), mirroring the 2D kernel.

STATUS: interpret-mode validated against the XLA path (values + VJPs,
tests/test_pallas_kernel.py). On-device launch gated pending a standard
(non-axon-relay) TPU runtime, same as the rest of the family.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import fem
from ..core.quadrature import FEMBasis

__all__ = ["poisson_stiffness_action_3d", "poisson_residual_fused_3d"]


def _build_tables_3d(basis: FEMBasis):
    """Separable (sum-factorized) deg-1 tables: 1D shape values at the two
    Gauss points plus the folded quadrature/metric scales (W/h_axis^2).
    See the 2D `_build_tables_sep` — same algebra, one more axis."""
    assert basis.deg == 1 and basis.nsd == 3 and basis.ngp_1d == 2, (
        "fused 3D kernel supports deg-1 with 2x2x2 Gauss only")
    import numpy as np

    xi = np.asarray(basis.gp_1d, np.float64)
    cN = np.stack([(1.0 - xi) / 2.0, (1.0 + xi) / 2.0], -1)  # [gp, node]
    hx, hy, hz = (float(v) for v in basis.h)
    jxw = np.asarray(basis.jxw, np.float64)
    W = float(jxw[0])
    assert np.allclose(jxw, W), "2x2x2 Gauss has equal weights"
    cN_l = [[float(cN[g, j]) for j in range(2)] for g in range(2)]
    return cN_l, W / hx**2, W / hy**2, W / hz**2


def _kernel(u_hbm, nu_hbm, out_ref, u_s, nu_s, sems, *, tables, TZ, n, nel):
    b = pl.program_id(0)
    t = pl.program_id(1)

    # halo slab: padded node planes [t*TZ, t*TZ + TZ + 2) == real node
    # planes [t*TZ - 1, t*TZ + TZ + 1); z-extent padded to TZ+8 for DMA
    row0 = t * TZ
    cp_u = pltpu.make_async_copy(u_hbm.at[b, pl.ds(row0, TZ + 8)], u_s,
                                 sems.at[0])
    cp_nu = pltpu.make_async_copy(nu_hbm.at[b, pl.ds(row0, TZ + 8)], nu_s,
                                  sems.at[1])
    cp_u.start()
    cp_nu.start()
    cp_u.wait()
    cp_nu.wait()

    # per-element-layer body (shared with the blockspec variant): the
    # previous slab-at-once dataflow (_slab_contribs) held ~8 slab
    # accumulators + GP temporaries live and compile-OOM'd the 16 MB
    # scoped-VMEM budget at 128^3 (35.6 MB)
    _layer_assemble(lambda i: u_s[i, :n, :n],
                    lambda i: nu_s[i, :n, :n],
                    out_ref, row0, tables, TZ, n, nel)


def _kernel3d_bs(u_ref, nu_ref, out_ref, *, tables, TZ, n, nel):
    """BlockSpec-only 3D variant (see the 2D `_kernel_bs`): whole padded
    input volume per program via the automatic pipeline (constant index
    map along the z-tile grid axis, so it is fetched once per batch), the
    OUTPUT tiled over z — no manual DMA / semaphores / scratch.

    The body walks the TZ+1 ELEMENT LAYERS of its tile one at a time:
    per-layer temporaries are 2D planes (~tens of KB), not 3D slabs.
    Both structure choices were load-bearing on chip (round 4): the
    whole-volume out block + slab-sized temporaries overflowed the 16 MB
    scoped-VMEM budget at 64^3 bs4 (16.3-17.4 MB compile OOM)."""
    t = pl.program_id(1)
    row0 = t * TZ
    _layer_assemble(lambda i: u_ref[0, row0 + i, :n, :n],
                    lambda i: nu_ref[0, row0 + i, :n, :n],
                    out_ref, row0, tables, TZ, n, nel)


def _layer_assemble(uplane, nuplane, out_ref, row0, tables, TZ, n, nel):
    """Shared per-element-layer assembly body: walks the TZ+1 element
    layers of one z-tile, reading padded node planes via ``uplane(i)`` /
    ``nuplane(i)`` (i = local padded-plane index in [0, TZ+2)) and
    accumulating into ``out_ref[0, :TZ]``. Per-layer temporaries are 2D
    planes (~tens-hundreds of KB) — the slab-sized dataflow overflowed
    the 16 MB scoped-VMEM budget (compile OOM at 64^3 bs4 for blockspec,
    at 128^3 for the DMA variant: 35.6 MB)."""
    cN, wx2, wy2, wz2 = tables
    out_ref[0] = jnp.zeros((TZ, n, n), uplane(0).dtype)
    for lay in range(TZ + 1):
        # element layer between padded node planes lay, lay+1 == real
        # planes row0+lay-1, row0+lay; valid iff the global element-layer
        # index row0+lay-1 is in [0, nel)
        u0 = uplane(lay)
        u1 = uplane(lay + 1)
        n0 = nuplane(lay)
        n1 = nuplane(lay + 1)

        # corner views c[k][j][i] (k = z plane, j = y, i = x)
        def cview(p):
            return [[p[jb:jb + nel, ib:ib + nel] for ib in (0, 1)]
                    for jb in (0, 1)]

        uc = [cview(u0), cview(u1)]
        nc = [cview(n0), cview(n1)]
        glob = row0 + lay - 1
        valid = jnp.logical_and(glob >= 0, glob < nel).astype(u0.dtype)

        # SUM-FACTORIZED 3D body (see the 2D _strip_lr): deg-1 dN/dxi is
        # constant (+-1) along its own axis, so ux depends on (eta, zeta)
        # only and the gx Gauss sum collapses exactly onto x-summed nu
        # corners — ~200 vector ops/layer vs ~470 for the naive 8-GP x
        # 8-corner contraction (the kernel measured VPU-compute-bound).
        DX = [[uc[k][j][1] - uc[k][j][0] for j in (0, 1)] for k in (0, 1)]
        DY = [[uc[k][1][i] - uc[k][0][i] for i in (0, 1)] for k in (0, 1)]
        DZ = [[uc[1][j][i] - uc[0][j][i] for i in (0, 1)] for j in (0, 1)]
        SX = [[nc[k][j][0] + nc[k][j][1] for j in (0, 1)] for k in (0, 1)]
        SY = [[nc[k][0][i] + nc[k][1][i] for i in (0, 1)] for k in (0, 1)]
        SZ = [[nc[0][j][i] + nc[1][j][i] for i in (0, 1)] for j in (0, 1)]

        def part(D, S, scale):
            # D/S indexed [a][b]; per Gauss pair (ga, gb) build the
            # collapsed du and nu-sum interpolants, then project onto the
            # two test-function values per axis. p[ab][bb].
            t = {}
            for ga in (0, 1):
                for gb in (0, 1):
                    cc = [[cN[ga][a_] * cN[gb][b_] for b_ in (0, 1)]
                          for a_ in (0, 1)]
                    du = (cc[0][0] * D[0][0] + cc[0][1] * D[0][1]
                          + cc[1][0] * D[1][0] + cc[1][1] * D[1][1])
                    A = (cc[0][0] * S[0][0] + cc[0][1] * S[0][1]
                         + cc[1][0] * S[1][0] + cc[1][1] * S[1][1])
                    t[ga, gb] = du * A
            return [[scale * sum(cN[ga][ab] * cN[gb][bb] * t[ga, gb]
                                 for ga in (0, 1) for gb in (0, 1))
                     for bb in (0, 1)] for ab in (0, 1)]

        px = part(DX, SX, wx2)   # px[kb][jb]
        py = part(DY, SY, wy2)   # py[kb][ib]
        pz = part(DZ, SZ, wz2)   # pz[jb][ib]

        sgn = (-1.0, 1.0)
        acc = [sgn[ib] * px[kb][jb] + sgn[jb] * py[kb][ib]
               + sgn[kb] * pz[jb][ib]
               for kb in (0, 1) for jb in (0, 1) for ib in (0, 1)]
        for jbf in (0, 1):
            for ibf in (0, 1):
                ysl = slice(jbf, jbf + nel)
                xsl = slice(ibf, ibf + nel)
                if lay >= 1:      # kbf=0 -> node plane lay-1
                    out_ref[0, lay - 1, ysl, xsl] = (
                        out_ref[0, lay - 1, ysl, xsl]
                        + valid * acc[2 * jbf + ibf])
                if lay < TZ:      # kbf=1 -> node plane lay
                    out_ref[0, lay, ysl, xsl] = (
                        out_ref[0, lay, ysl, xsl]
                        + valid * acc[4 + 2 * jbf + ibf])


def _stiffness3d_fwd_bs(u, nu, basis: FEMBasis, tile_z: int = 8):
    """BlockSpec-only 3D forward: grid (B, z-tiles); full padded input
    volume per program (fetched once per batch — constant index along the
    tile axis), out block one z-slab. VMEM: ~2*(u+nu) double-buffered +
    2 slab out blocks + slab temporaries — ~12 MB at 64^3 f32 (the
    reference's 3D scale); guarded to n <= 64."""
    B, n, _, _ = u.shape
    if n > 64:
        raise ValueError(
            f"3D blockspec variant holds the full volume in VMEM; n={n} > "
            "64 would overflow — use variant='dma' or the XLA path")
    nel = n - 1
    TZ = min(tile_z, -(-n // 8) * 8)
    assert TZ % 8 == 0 or TZ == n, "tile_z must be a multiple of 8"
    ntiles = -(-n // TZ)
    pad_z = -(-(ntiles * TZ + 2) // 8) * 8
    CP = n if n % 8 == 0 else -(-n // 8) * 8
    cfg = ((0, 0), (1, pad_z - n - 1), (0, 0), (0, CP - n))
    u_p = jnp.pad(u, cfg)
    nu_p = jnp.pad(nu, cfg)
    tables = _build_tables_3d(basis)

    out = pl.pallas_call(
        partial(_kernel3d_bs, tables=tables, TZ=TZ, n=n, nel=nel),
        grid=(B, ntiles),
        in_specs=[
            pl.BlockSpec((1, pad_z, n, CP), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((1, pad_z, n, CP), lambda b, t: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TZ, n, n),
                               lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, ntiles * TZ, n, n), u.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(800 * B * nel**3),
            bytes_accessed=int(3 * 4 * B * n**3),
            transcendentals=0),
    )(u_p, nu_p)
    return out[:, :n]


def _stiffness3d_fwd_impl(u, nu, basis: FEMBasis, tile_z: int = 8,
                          variant: str = "dma"):
    if variant == "blockspec":
        return _stiffness3d_fwd_bs(u, nu, basis, tile_z)
    if variant != "dma":
        raise ValueError(f"unknown kernel variant {variant!r} "
                         "(expected 'dma' or 'blockspec')")
    B, n, _, _ = u.shape
    nel = n - 1
    TZ = min(tile_z, -(-n // 8) * 8)
    ntiles = -(-n // TZ)
    assert TZ % 8 == 0 or TZ == n, "tile_z must be a multiple of 8"
    pad_z = ntiles * TZ + 8
    CP = -(-n // 128) * 128
    cfg = ((0, 0), (1, pad_z - n - 1), (0, 0), (0, CP - n))
    u_p = jnp.pad(u, cfg)
    nu_p = jnp.pad(nu, cfg)
    tables = _build_tables_3d(basis)

    out = pl.pallas_call(
        partial(_kernel, tables=tables, TZ=TZ, n=n, nel=nel),
        grid=(B, ntiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, TZ, n, n), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ntiles * TZ, n, n), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((TZ + 8, n, CP), u.dtype),
            pltpu.VMEM((TZ + 8, n, CP), u.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(800 * B * nel**3),
            bytes_accessed=int(3 * 4 * B * n**3),
            transcendentals=0),
    )(u_p, nu_p)
    return out[:, :n]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def poisson_stiffness_action_3d(u, nu, basis: FEMBasis, tile_z: int = 8,
                                variant: str = "dma"):
    """Ku = assembled ∫ nu grad(N_i)·grad(u): [B, n, n, n] -> same."""
    return _stiffness3d_fwd_impl(u, nu, basis, tile_z, variant)


def _fwd(u, nu, basis, tile_z, variant):
    return _stiffness3d_fwd_impl(u, nu, basis, tile_z, variant), (u, nu)


def _bwd(basis, tile_z, variant, res, g):
    u, nu = res
    du = _stiffness3d_fwd_impl(g, nu, basis, tile_z, variant)
    gu = fem.gp_eval(u, basis, ("dx", "dy", "dz"))
    gg = fem.gp_eval(g, basis, ("dx", "dy", "dz"))
    integrand = (gu["dx"] * gg["dx"] + gu["dy"] * gg["dy"]
                 + gu["dz"] * gg["dz"])
    dnu = fem.galerkin_project(integrand, basis, "N", u.shape[-3:])
    return du, dnu


poisson_stiffness_action_3d.defvjp(_fwd, _bwd)


def poisson_residual_fused_3d(u, nu, Nf, bc_mask, basis: FEMBasis,
                              tile_z: int = 8, variant: str = "dma"):
    """Full assembled, Dirichlet-masked 3D residual R = K(nu) u - Nf
    (3D counterpart of :func:`diffnet_tpu.ops.poisson_residual.
    poisson_residual_fused`; `Nf` preassembled once)."""
    if nu.shape != u.shape:
        raise ValueError(f"nu.shape {nu.shape} != u.shape {u.shape} "
                         "(the fused kernel does not broadcast)")
    R = poisson_stiffness_action_3d(u, nu, basis, tile_z, variant) - Nf
    return jnp.where(bc_mask > 0.5, jnp.zeros_like(R), R)
