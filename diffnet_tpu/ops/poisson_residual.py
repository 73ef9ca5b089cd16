"""Pallas TPU kernel: fully-fused Poisson Galerkin stiffness action.

Computes, in ONE pass over HBM,

    Ku[b, j, i] = sum_{elements e adjacent to node (j,i)} sum_gp
                  JxW_gp * nu(e,gp) * grad(N_(j,i)) · grad(u)(e,gp)

i.e. the eval -> physics -> Galerkin-projection -> scatter-assembly chain of
the reference resmin path (DiffNet/DiffNetFEM.py:143-174 + tests/test.py:36-79)
as a single kernel: the op-by-op XLA path materializes the Gauss-point fields
(3x ngp x field size) in HBM between ops; here they live and die in VMEM and
HBM traffic is just u + nu in, Ku out.

Structure: grid (B, row-tiles). Each program DMAs a (TY+2)-node-row halo
strip of u and nu from HBM into VMEM scratch (overlapping strips are not
expressible with plain BlockSpec index maps, which address in block units),
computes the TY+1 element rows covering its TY output node rows, masks the
out-of-domain element rows at the top/bottom tiles, and accumulates the
Q1 assembly entirely in registers/VMEM.

Deg-1 (bilinear, 2x2 Gauss) 2D only — the configuration of every reference
benchmark workload. Differentiable via custom VJP: the stiffness action is
self-adjoint in u, and d/d(nu) is one Galerkin projection.

STATUS (round 4): numerics validated (matches the XLA path to round-off in
Pallas interpreter mode, including both VJPs — tests/test_pallas_kernel.py)
AND measured on-chip: the sum-factorized blockspec variant is the repo
headline (1.11e10 elem/s scan-chained at 512^2 f32, ~3.4x the XLA scan
loop — BENCH_MEASURED.md), and the kernel drives the production solver
path via ``module_linear_solve(fused_kernels=True)`` / MG-CG fine-level
matvecs. The manual-DMA variant (double-buffered halo strips, operands
pinned in HBM) covers grids past the blockspec VMEM guard (>512^2).
The early relay DMA hang was traced to Mosaic staging whole ANY-space
operands into VMEM — fixed by the HBM memory-space pin.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import fem
from ..core.quadrature import FEMBasis

__all__ = ["poisson_stiffness_action", "poisson_residual_fused"]


def _build_tables(basis: FEMBasis):
    """Full per-GP tables (NT, DXT, DYT, jxw) — consumed by the NS VMS and
    energy kernels (ops/ns_residual.py, ops/poisson_energy.py); the 2D
    stiffness kernels use the sum-factorized `_build_tables_sep`."""
    assert basis.deg == 1 and basis.nsd == 2 and basis.ngp_1d == 2, (
        "fused kernel supports deg-1 2D with 2x2 Gauss only")
    NT = [[float(v) for v in basis.tables["N"][g]] for g in range(4)]
    DXT = [[float(v) for v in basis.tables["dx"][g]] for g in range(4)]
    DYT = [[float(v) for v in basis.tables["dy"][g]] for g in range(4)]
    jxw = [float(v) for v in basis.jxw]
    return NT, DXT, DYT, jxw


def _build_tables_sep(basis: FEMBasis):
    """Separable (sum-factorized) deg-1 tables: 1D shape values at the two
    Gauss points plus the folded quadrature/metric scales. The kernel body
    exploits that deg-1 dN/dxi is CONSTANT (+-1) in its own axis, so the
    Gauss sum factorizes exactly (see _strip_lr)."""
    assert basis.deg == 1 and basis.nsd == 2 and basis.ngp_1d == 2, (
        "fused kernel supports deg-1 2D with 2x2 Gauss only")
    import numpy as np

    xi = np.asarray(basis.gp_1d, np.float64)
    cN = np.stack([(1.0 - xi) / 2.0, (1.0 + xi) / 2.0], -1)  # [gp, node]
    hx, hy = (float(v) for v in basis.h)
    jxw = np.asarray(basis.jxw, np.float64)
    W = float(jxw[0])
    assert np.allclose(jxw, W), "2x2 Gauss has equal weights"
    cN_l = [[float(cN[g, j]) for j in range(2)] for g in range(2)]
    return cN_l, W / hx**2, W / hy**2


def _strip_lr(u, nu, row0, tables, TY, nel_rows, nel_cols):
    """Assembled Q1 contributions for output node rows [row0, row0+TY).

    `u`/`nu` are (TY+2, >=nel_cols+1) node strips covering PADDED rows
    [row0, row0+TY+2) — i.e. real node rows [row0-1, row0+TY+1) under the
    1-top-pad-row convention shared by both kernel variants. Rectangular
    fields are supported: nel_rows bounds the element-ROW mask, nel_cols
    the column slicing. Returns (left, right): left is the ib=0 column
    contribution for node cols [0, nel_cols), right the ib=1 contribution
    for node cols [1, ncols).

    SUM-FACTORIZED body (round 4; the kernel measured VPU-compute-bound —
    bf16 did not speed it up): for deg-1, dN/dxi is CONSTANT (+-1) along
    its own axis, so ux depends only on the eta Gauss point and the gx
    Gauss sum collapses EXACTLY:  sum_gx nug(gx, gy) = Ny0(gy)(n00+n01) +
    Ny1(gy)(n10+n11)  (1D shape values sum to 1 over the Gauss pair).
    The 4-GP x 4-corner contraction (~88 vector ops/element) becomes two
    1D-factorized passes (~56), algebraically identical to the full
    quadrature loop.

    SECOND factorization layer (round 4, session 4): the two Gauss points
    are symmetric (cN[1] is cN[0] reversed, p + q = 1), so the per-GP
    products collapse into sum/difference form. With A=dxl, B=dxh,
    S=sxr0, T=sxr1, U=A+B, V=A-B, W=S+T, X=S-T, d=p-q:

        px0 + px1 = wx2 (UW + d^2 VX) / 2
        px0 - px1 = wx2 d^2 (AS - BT) = wx2 d^2 (UX + VW) / 2

    so px0/px1 = k1*UW + k2*(VX +- (UX + VW)), k1 = wx2/4,
    k2 = wx2 d^2/4 — the 2-GP loop disappears entirely (~56 -> ~49
    vector ops/element; exact, verified to f64 round-off). W = S+T is
    the total corner-nu sum, SHARED between the x- and y-parts."""
    cN, wx2, wy2 = tables   # 1D N at the 2 GPs; W/hx^2; W/hy^2
    d2 = (cN[0][0] - cN[0][1]) ** 2   # (p-q)^2 = 1/3 at +-1/sqrt(3)
    k1x, k2x = wx2 / 4.0, wx2 * d2 / 4.0
    k1y, k2y = wy2 / 4.0, wy2 * d2 / 4.0

    a = u[:, :nel_cols + 1]
    na = nu[:, :nel_cols + 1]
    c00, c01 = a[:-1, :-1], a[:-1, 1:]
    c10, c11 = a[1:, :-1], a[1:, 1:]
    n00, n01 = na[:-1, :-1], na[:-1, 1:]
    n10, n11 = na[1:, :-1], na[1:, 1:]

    # mask element ROWS whose global index is outside [0, nel_rows)
    e_row = (jax.lax.broadcasted_iota(jnp.int32, (TY + 1, nel_cols), 0)
             + row0 - 1)
    valid = jnp.logical_and(e_row >= 0, e_row < nel_rows).astype(u.dtype)

    dxl = c01 - c00          # x-difference on the y-lo row
    dxh = c11 - c10
    dyl = c10 - c00          # y-difference on the x-lo column
    dyh = c11 - c01
    sxr0 = n00 + n01         # nu row sums (over x)
    sxr1 = n10 + n11
    syc0 = n00 + n10         # nu column sums (over y)
    syc1 = n01 + n11
    nsum = sxr0 + sxr1       # total corner-nu sum (shared x/y)

    # x-part (test Ny0 / Ny1)
    Ux, Vx, Xx = dxl + dxh, dxl - dxh, sxr0 - sxr1
    Mx = Vx * Xx
    Qx = Ux * Xx + Vx * nsum
    Rx = k1x * (Ux * nsum)
    px0 = Rx + k2x * (Mx + Qx)
    px1 = Rx + k2x * (Mx - Qx)
    # y-part (test Nx0 / Nx1)
    Uy, Vy, Xy = dyl + dyh, dyl - dyh, syc0 - syc1
    My = Vy * Xy
    Qy = Uy * Xy + Vy * nsum
    Ry = k1y * (Uy * nsum)
    py0 = Ry + k2y * (My + Qy)
    py1 = Ry + k2y * (My - Qy)

    # acc[(jb, ib)] = sign_x(ib) * px_jb + sign_y(jb) * py_ib
    a0 = valid * (-px0 - py0)            # (jb=0, ib=0)
    a1 = valid * (px0 - py1)             # (jb=0, ib=1)
    a2 = valid * (py0 - px1)             # (jb=1, ib=0)
    a3 = valid * (px1 + py1)             # (jb=1, ib=1)

    # Q1 node assembly for output node rows [row0, row0 + TY):
    #   R[j, i] += acc[2*jb+ib][j+1-jb, i-ib]  for jb, ib in {0,1}
    # jb=0 -> element local row j+1; jb=1 -> element local row j
    left = a0[1:, :] + a2[:TY, :]    # ib=0 -> cols [0, nel_cols)
    right = a1[1:, :] + a3[:TY, :]   # ib=1 -> cols [1, ncols)
    return left, right


def _kernel(u_hbm, nu_hbm, out_ref, u_s, nu_s, sems, *, tables, TY, ncols,
            nel_rows, nel_cols):
    """DOUBLE-BUFFERED (round 4): scratch strips are (2, TY+8, CP) and each
    program prefetches the NEXT tile's halo strips (crossing batch
    boundaries — the flat tile index runs over the whole (B, ntiles) grid,
    t fastest) while computing its own. Scratch/semaphore state persists
    across sequential grid steps, so the copy started by program k is
    waited on by program k+1; the serial start->wait->compute chain of the
    original body left the DMA (~20-30% of tile time at 512^2+) exposed."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    nb = pl.num_programs(0)
    flat = b * nt + t

    # halo strip for tile (bb, tt): padded node rows [tt*TY, tt*TY + TY + 2)
    # == real node rows [tt*TY - 1, tt*TY + TY + 1), height 8-padded for DMA
    # row alignment; full (128-aligned) padded column width
    def dmas(slot, bb, tt):
        row0 = tt * TY
        return (pltpu.make_async_copy(u_hbm.at[bb, pl.ds(row0, TY + 8), :],
                                      u_s.at[slot], sems.at[0, slot]),
                pltpu.make_async_copy(nu_hbm.at[bb, pl.ds(row0, TY + 8), :],
                                      nu_s.at[slot], sems.at[1, slot]))

    slot = jax.lax.rem(flat, 2)

    @pl.when(flat == 0)
    def _():
        for c in dmas(slot, b, t):
            c.start()

    nxt = flat + 1

    @pl.when(nxt < nb * nt)
    def _():
        b2 = jax.lax.div(nxt, nt)
        t2 = jax.lax.rem(nxt, nt)
        for c in dmas(jax.lax.rem(nxt, 2), b2, t2):
            c.start()

    for c in dmas(slot, b, t):
        c.wait()

    row0 = t * TY
    left, right = _strip_lr(u_s[slot, : TY + 2], nu_s[slot, : TY + 2], row0,
                            tables, TY, nel_rows, nel_cols)
    out_ref[0] = jnp.zeros((TY, ncols), left.dtype)
    out_ref[0, :, :nel_cols] = left
    out_ref[0, :, 1:] = out_ref[0, :, 1:] + right


def _kernel_bs(u_ref, nu_ref, out_ref, *, tables, TY, ntiles, ncols,
               nel_rows, nel_cols):
    """BlockSpec-only variant: the whole (padded) field arrives in VMEM via
    the automatic pipeline (grid over batch only — no manual DMA, no
    semaphores, no scratch), and a STATIC Python loop walks row strips so
    per-strip temporaries stay small. Written after the manual-DMA variant
    above hung this image's axon relay at its first `cp.wait()`; this one
    exercises none of that machinery."""
    for t in range(ntiles):
        row0 = t * TY
        left, right = _strip_lr(u_ref[0, row0: row0 + TY + 2, :],
                                nu_ref[0, row0: row0 + TY + 2, :],
                                row0, tables, TY, nel_rows, nel_cols)
        out_ref[0, row0: row0 + TY, :] = jnp.zeros((TY, ncols), left.dtype)
        out_ref[0, row0: row0 + TY, :nel_cols] = left
        out_ref[0, row0: row0 + TY, 1:] = (
            out_ref[0, row0: row0 + TY, 1:] + right)


def _stiffness_fwd_bs(u, nu, basis: FEMBasis, tile_y: int = 128):
    """BlockSpec-only forward: grid (B,), full padded field per program.

    VMEM budget: with double-buffered in blocks this holds ~2*(u+nu) + out
    + per-strip temporaries; at 512^2 f32 that is ~6 MB of the ~16 MB
    VMEM. Guarded by the actual block-byte budget (2 input fields x 2
    buffers + 2 out buffers, leaving ~4 MB headroom for strip temporaries)
    — beyond that use the DMA variant (or the XLA path)."""
    B, nrows, ncols = u.shape
    nel_rows, nel_cols = nrows - 1, ncols - 1
    TY = min(tile_y, -(-nrows // 8) * 8)
    assert TY % 8 == 0 or TY == nrows, "tile_y must be a multiple of 8"
    ntiles = -(-nrows // TY)
    # 1 top halo pad row; bottom rows so every static strip
    # [t*TY, t*TY + TY + 2) is in range, rounded to the 8-row sublane
    # boundary; columns to the 128-lane boundary
    rows_pad = -(-(ntiles * TY + 2) // 8) * 8
    CP = -(-ncols // 128) * 128
    blk_bytes = 6 * rows_pad * CP * u.dtype.itemsize
    if blk_bytes > 12 * 2**20:
        raise ValueError(
            "blockspec variant holds the full field in VMEM; "
            f"{nrows}x{ncols} needs ~{blk_bytes / 2**20:.0f} MB of "
            "pipeline blocks (> 12 MB budget) — use variant='dma' or the "
            "XLA path")
    cfg = ((0, 0), (1, rows_pad - nrows - 1), (0, CP - ncols))
    u_p = jnp.pad(u, cfg)
    nu_p = jnp.pad(nu, cfg)
    tables = _build_tables_sep(basis)

    out = pl.pallas_call(
        partial(_kernel_bs, tables=tables, TY=TY, ntiles=ntiles,
                ncols=ncols, nel_rows=nel_rows, nel_cols=nel_cols),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows_pad, CP), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, rows_pad, CP), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ntiles * TY, ncols), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, ntiles * TY, ncols), u.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(100 * B * nel_rows * nel_cols),
            bytes_accessed=int(3 * 4 * B * nrows * ncols),
            transcendentals=0),
    )(u_p, nu_p)
    return out[:, :nrows]


def _stiffness_fwd_impl(u, nu, basis: FEMBasis, tile_y: int = 128,
                        variant: str = "dma"):
    if variant == "blockspec":
        return _stiffness_fwd_bs(u, nu, basis, tile_y)
    if variant != "dma":
        raise ValueError(f"unknown kernel variant {variant!r} "
                         "(expected 'dma' or 'blockspec')")
    B, nrows, ncols = u.shape
    nel_rows, nel_cols = nrows - 1, ncols - 1
    TY = min(tile_y, -(-nrows // 8) * 8)
    ntiles = -(-nrows // TY)
    # pad: 1 top halo row + bottom rows so every strip [t*TY, t*TY+TY+2) is
    # in range (padded rows are masked out of the element sums); columns
    # padded to the 128-lane boundary required by DMA slicing
    assert TY % 8 == 0 or TY == nrows, "tile_y must be a multiple of 8"
    pad_rows = ntiles * TY + 8
    CP = -(-ncols // 128) * 128
    cfg = ((0, 0), (1, pad_rows - nrows - 1), (0, CP - ncols))
    u_p = jnp.pad(u, cfg)
    nu_p = jnp.pad(nu, cfg)
    tables = _build_tables_sep(basis)

    out = pl.pallas_call(
        partial(_kernel, tables=tables, TY=TY, ncols=ncols,
                nel_rows=nel_rows, nel_cols=nel_cols),
        grid=(B, ntiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, TY, ncols), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ntiles * TY, ncols), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TY + 8, CP), u.dtype),
            pltpu.VMEM((2, TY + 8, CP), u.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(100 * B * nel_rows * nel_cols),
            bytes_accessed=int(3 * 4 * B * nrows * ncols),
            transcendentals=0),
    )(u_p, nu_p)
    return out[:, :nrows]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def poisson_stiffness_action(u, nu, basis: FEMBasis, tile_y: int = 128,
                             variant: str = "dma"):
    """Ku = assembled ∫ nu grad(N_i)·grad(u): [B, ny, nx] -> [B, ny, nx]
    (rectangular fields supported — channel grids, shard_map blocks)."""
    return _stiffness_fwd_impl(u, nu, basis, tile_y, variant)


def _fwd(u, nu, basis, tile_y, variant):
    return _stiffness_fwd_impl(u, nu, basis, tile_y, variant), (u, nu)


def _bwd(basis, tile_y, variant, res, g):
    u, nu = res
    # self-adjoint in u: dL/du = K(nu) g  (same fused kernel)
    du = _stiffness_fwd_impl(g, nu, basis, tile_y, variant)
    # d/d(nu): assembled N-projection of grad u · grad g
    gu = fem.gp_eval(u, basis, ("dx", "dy"))
    gg = fem.gp_eval(g, basis, ("dx", "dy"))
    integrand = gu["dx"] * gg["dx"] + gu["dy"] * gg["dy"]
    dnu = fem.galerkin_project(integrand, basis, "N", u.shape[-2:])
    return du, dnu


poisson_stiffness_action.defvjp(_fwd, _bwd)


def poisson_residual_fused(u, nu, Nf, bc_mask, basis: FEMBasis,
                           tile_y: int = 128, variant: str = "dma"):
    """Full assembled, Dirichlet-masked residual  R = K(nu) u - Nf.

    `Nf` is the preassembled load vector ∫ N_i f (constant during training;
    build once with ``fem.galerkin_project(f_gp, basis, "N", shape)``).
    Matches `poisson_resmin_residual` to round-off (pinned by tests)."""
    if nu.shape != u.shape:
        raise ValueError(f"nu.shape {nu.shape} != u.shape {u.shape} "
                         "(the fused kernel does not broadcast)")
    R = poisson_stiffness_action(u, nu, basis, tile_y, variant) - Nf
    return jnp.where(bc_mask > 0.5, jnp.zeros_like(R), R)
