"""Pallas TPU kernels: assembled-stencil apply (9-point 2D / 27-point 3D).

The production iteration of every linear solve in this framework is a
variable-coefficient stencil matvec: ``train.stencil.extract_stencil``
assembles a deg-1 Galerkin (or FDM) operator into ``width**nsd``
coefficient planes once, and Krylov/multigrid iterate
``(A u)[p] = sum_k C_k[p] * u[p+k]`` with the coefficients FIXED
(reference counterpart: the torch path re-runs conv quadrature per
iteration instead, DiffNet/DiffNetFEM.py:143-174 — it has no assembled
form at all).

Why a kernel when the nu-form fused kernels (ops/poisson_residual*.py)
already exist: those re-derive the stencil algebra from nu every call —
~56 (2D) / ~320 (3D) VPU ops per element — and measured VPU-COMPUTE-bound
on-chip (bf16 bought nothing; BENCH_MEASURED.md round 4). With C
precomputed, the apply needs only ``width**nsd`` multiply-adds per node
(~20 ops 2D, ~60 ops 3D *including* the shift overhead), at the price of
reading ``width**nsd + 2`` fields of HBM instead of 3. That flips the
kernel from compute-bound to bandwidth-bound — the right side of the
roofline for an iteration whose operator does not change. The XLA
``stencil_matvec`` fuses the FMAs but materializes its pad+shift
pieces; this kernel reads each C plane and the haloed u strip exactly
once per tile.

Layout: C is consumed in ``extract_stencil``'s native ``[width**nsd,
*u.shape]`` offset-major layout (offset m <-> ``train.stencil._offsets``
order, row-major over (dz, dy, dx)) — no per-call transposition, so a
solver can close over the extracted planes unchanged.

Structure mirrors the proven nu-kernel family (ops/poisson_residual.py):

- 2D ``variant='dma'``: grid (B, row-tiles); each program DMAs its
  (TY+2)-row haloed u strip plus the 9 aligned TY-row C strips HBM->VMEM
  (per-plane descriptors — C stays in offset-major HBM layout),
  double-buffered across the flat grid so tile k+1's copies overlap tile
  k's compute. Tile height shrinks under a byte budget.
- 2D ``variant='blockspec'``: grid (B, row-tiles) with the full padded u
  field per program (constant index along the tile axis — fetched once
  per batch) and the 9-plane C tile via the automatic pipeline. No
  manual DMA; byte-guarded.
- 3D ``variant='dma'`` only: grid (B, z-tiles); (TZ+2)-plane haloed u
  slab + 27 aligned TZ-plane C slabs, double-buffered, TZ byte-guarded
  (27 slabs dominate VMEM).

Gather form: every output node is computed in registers from shifted
input windows — there is no read-modify-write assembly scatter and no
misaligned output accumulation (the nu-kernels' remaining bottleneck,
ops/poisson_residual_3d.py STATUS).

Differentiable via custom VJP: d/du is the TRANSPOSED stencil apply
(offset-mirrored, coefficient planes shifted — computed with the same
fused kernel after an XLA plane-shift pass), d/dC the 9/27 shifted-u
products (XLA; C is constant in the solver loops this kernel serves).

STATUS (round 4): interpret-mode validated against
``train.stencil.stencil_matvec`` (values + both VJPs, 2D/3D, batched and
rectangular — tests/test_pallas_kernel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as _pl
from jax.experimental.pallas import tpu as pltpu


class _PallasCPUFallback:
    """pl namespace proxy: pallas_call gains interpret=True when the
    default backend is CPU, so solver knobs (``stencil_kernel=``) keep
    working in CPU dev/test runs instead of failing inside CG with
    'Only interpret mode is supported on CPU backend'. Small grids only
    — interpret mode is orders of magnitude slower than XLA."""

    def __getattr__(self, name):
        return getattr(_pl, name)

    @staticmethod
    def pallas_call(*a, **k):
        if "interpret" not in k and jax.default_backend() == "cpu":
            k["interpret"] = True
        return _pl.pallas_call(*a, **k)


pl = _PallasCPUFallback()

__all__ = ["stencil_apply", "stencil_apply_2d", "stencil_apply_3d",
           "stencil_transpose_planes"]


# ---------------------------------------------------------------- 2D ----

def _apply_strip_2d(us, cs, TY, ncols):
    """out[j, i] = sum_m cs[m, j, i] * us[j + dj(m), i + di(m)].

    ``us``: (>= TY+2, >= ncols+2) haloed u strip (node [j,i] of the
    output at strip position [j+1, i+1]); ``cs``: (9, >= TY, >= ncols)
    aligned coefficient strips, offset-major (m = dj*3 + di). The three
    lane-shifted u windows are built once and reused across the three
    row offsets, so the per-node cost is 9 FMA + 2 lane shifts."""
    acc = None
    for di in range(3):
        uw = us[:, di:di + ncols]            # lane shift, built once
        for dj in range(3):
            m = dj * 3 + di
            term = cs[m, :TY, :ncols] * uw[dj:dj + TY]
            acc = term if acc is None else acc + term
    return acc


def _kernel2d_dma(c_hbm, u_hbm, out_ref, c_s, u_s, sems, *, TY, ncols):
    """Double-buffered (see ops/poisson_residual.py::_kernel): program k
    prefetches tile k+1's u strip and 9 C strips across the flat
    (B*ntiles) grid while computing its own."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    nb = pl.num_programs(0)
    flat = b * nt + t

    def dmas(slot, bb, tt):
        row0 = tt * TY
        # ONE strided descriptor for all 9 C strips (round 5: the
        # per-plane descriptor fan — 10 DMAs/tile — left the apply at
        # ~35% of its bandwidth bound on-chip)
        return [pltpu.make_async_copy(
                    c_hbm.at[:, bb, pl.ds(row0, TY)], c_s.at[slot],
                    sems.at[slot, 0]),
                pltpu.make_async_copy(
                    u_hbm.at[bb, pl.ds(row0, TY + 8)], u_s.at[slot],
                    sems.at[slot, 1])]

    slot = jax.lax.rem(flat, 2)

    @pl.when(flat == 0)
    def _():
        for c in dmas(slot, b, t):
            c.start()

    nxt = flat + 1

    @pl.when(nxt < nb * nt)
    def _():
        for c in dmas(jax.lax.rem(nxt, 2), jax.lax.div(nxt, nt),
                      jax.lax.rem(nxt, nt)):
            c.start()

    for c in dmas(slot, b, t):
        c.wait()

    out_ref[0] = _apply_strip_2d(u_s[slot], c_s[slot], TY, ncols)


def _kernel2d_bs(c_ref, u_ref, out_ref, *, TY, ncols):
    t = pl.program_id(1)
    row0 = t * TY
    # pl.ds: strip offset is a traced program id
    out_ref[0] = _apply_strip_2d(u_ref[0, pl.ds(row0, TY + 2), :],
                                 c_ref[:, 0], TY, ncols)


def _tile_rows_2d(nrows, ncols, itemsize, budget=12 * 2**20):
    """Largest 8-multiple tile height whose double-buffered 9-plane C
    strips + u strips fit the VMEM byte budget. Cap 256 (round 5: at
    512^2/bs32 the apply measured ~11.5 us per grid step against ~3 us
    of DMA — fixed per-step overhead dominates, so fewer, fatter tiles
    win; compute per node is only 9 FMA)."""
    CP = -(-ncols // 128) * 128
    TY = min(256, -(-nrows // 8) * 8)
    while TY > 8 and 2 * (9 * TY + (TY + 8)) * CP * itemsize > budget:
        TY //= 2
    return TY


def _apply2d_fwd(C, u, tile_y: int | None, variant: str):
    B, nrows, ncols = u.shape
    TY = tile_y or _tile_rows_2d(nrows, ncols, u.dtype.itemsize)
    TY = min(TY, -(-nrows // 8) * 8)
    assert TY % 8 == 0 or TY >= nrows, "tile_y must be a multiple of 8"
    ntiles = -(-nrows // TY)
    # u: 1 halo row top (+ alignment bottom), 1 halo col left (+ one full
    # extra lane tile right so every di window slice stays in range)
    rows_pad = ntiles * TY + 8
    CP = -(-ncols // 128) * 128
    CPu = CP + 128
    u_p = jnp.pad(u, ((0, 0), (1, rows_pad - nrows - 1),
                      (1, CPu - ncols - 1)))
    # C: aligned (no halo); zero-padded rows/cols contribute zeros
    C_p = jnp.pad(C, ((0, 0), (0, 0), (0, ntiles * TY - nrows),
                      (0, CP - ncols)))

    if variant == "blockspec":
        blk_bytes = (2 * (9 * TY + TY) * CP + 2 * rows_pad * CPu) \
            * u.dtype.itemsize
        if blk_bytes > 12 * 2**20:
            raise ValueError(
                "blockspec stencil apply holds the full u field in VMEM; "
                f"{nrows}x{ncols} needs ~{blk_bytes / 2**20:.0f} MB of "
                "pipeline blocks (> 12 MB) — use variant='dma'")
        out = pl.pallas_call(
            partial(_kernel2d_bs, TY=TY, ncols=ncols),
            grid=(B, ntiles),
            in_specs=[
                pl.BlockSpec((9, 1, TY, CP), lambda b, t: (0, b, t, 0)),
                pl.BlockSpec((1, rows_pad, CPu), lambda b, t: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TY, ncols), lambda b, t: (b, t, 0)),
            out_shape=jax.ShapeDtypeStruct((B, ntiles * TY, ncols),
                                           u.dtype),
            cost_estimate=pl.CostEstimate(
                flops=int(18 * B * nrows * ncols),
                bytes_accessed=int(11 * u.dtype.itemsize * B * nrows
                                   * ncols),
                transcendentals=0),
        )(C_p, u_p)
        return out[:, :nrows]
    if variant != "dma":
        raise ValueError(f"unknown kernel variant {variant!r} "
                         "(expected 'dma' or 'blockspec')")

    out = pl.pallas_call(
        partial(_kernel2d_dma, TY=TY, ncols=ncols),
        grid=(B, ntiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, TY, ncols), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ntiles * TY, ncols), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 9, TY, CP), u.dtype),
            pltpu.VMEM((2, TY + 8, CPu), u.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(18 * B * nrows * ncols),
            bytes_accessed=int(11 * u.dtype.itemsize * B * nrows * ncols),
            transcendentals=0),
    )(C_p, u_p)
    return out[:, :nrows]


# ---------------------------------------------------------------- 3D ----

def _apply_slab_3d(us, cs, TZ, ny, ncols):
    """3D gather apply for one z-tile: ``us`` (>= TZ+2, >= ny+2,
    >= ncols+2) haloed u slab, ``cs`` (27, >= TZ, >= ny, >= ncols)
    aligned coefficient slabs (m = (dz*3 + dy)*3 + dx)."""
    acc = None
    for dx in range(3):
        uw = us[:, :, dx:dx + ncols]         # lane shift, built once
        for dz in range(3):
            for dy in range(3):
                m = (dz * 3 + dy) * 3 + dx
                term = (cs[m, :TZ, :ny, :ncols]
                        * uw[dz:dz + TZ, dy:dy + ny])
                acc = term if acc is None else acc + term
    return acc


def _kernel3d_dma(c_hbm, u_hbm, out_ref, c_s, u_s, sems, *, TZ, ny, ncols):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    nb = pl.num_programs(0)
    flat = b * nt + t

    def dmas(slot, bb, tt):
        z0 = tt * TZ
        # ONE strided descriptor for all 27 C slabs (see _kernel2d_dma)
        return [pltpu.make_async_copy(
                    c_hbm.at[:, bb, pl.ds(z0, TZ)], c_s.at[slot],
                    sems.at[slot, 0]),
                pltpu.make_async_copy(
                    u_hbm.at[bb, pl.ds(z0, TZ + 8)], u_s.at[slot],
                    sems.at[slot, 1])]

    slot = jax.lax.rem(flat, 2)

    @pl.when(flat == 0)
    def _():
        for c in dmas(slot, b, t):
            c.start()

    nxt = flat + 1

    @pl.when(nxt < nb * nt)
    def _():
        for c in dmas(jax.lax.rem(nxt, 2), jax.lax.div(nxt, nt),
                      jax.lax.rem(nxt, nt)):
            c.start()

    for c in dmas(slot, b, t):
        c.wait()

    out_ref[0] = _apply_slab_3d(u_s[slot], c_s[slot], TZ, ny, ncols)


def _kernel3d_dmaf(c_hbm, u_hbm, out_ref, c_s, u_s, sems, *, TZ, NY,
                   ncols):
    """FOLDED-Z 3D apply (round 5, same move as the nu-form kernel's
    dmaf): (z, y) pre-folded on the host into one row axis with a COMMON
    stride NY for u, C and out, so each of the 27 gather windows is a
    plain row slice ``uf[dz*NY + dy + r]`` of a rank-2 array — no
    doubly-misaligned rank-3 windows. Double-buffered as the rank-3
    variant."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    nb = pl.num_programs(0)
    flat = b * nt + t

    def dmas(slot, bb, tt):
        r0 = tt * TZ * NY
        # ONE strided descriptor for all 27 C slabs (see _kernel2d_dma).
        # u: +1 plane — the contiguous row window of the (dz=2, dy=2)
        # slice ends 2 rows past the (TZ+2)-plane halo (those rows only
        # pair with zero C on garbage out rows, but the buffer must
        # exist)
        return [pltpu.make_async_copy(
                    c_hbm.at[:, bb, pl.ds(r0, TZ * NY)], c_s.at[slot],
                    sems.at[slot, 0]),
                pltpu.make_async_copy(
                    u_hbm.at[bb, pl.ds(r0, (TZ + 3) * NY)], u_s.at[slot],
                    sems.at[slot, 1])]

    slot = jax.lax.rem(flat, 2)

    @pl.when(flat == 0)
    def _():
        for c in dmas(slot, b, t):
            c.start()

    nxt = flat + 1

    @pl.when(nxt < nb * nt)
    def _():
        for c in dmas(jax.lax.rem(nxt, 2), jax.lax.div(nxt, nt),
                      jax.lax.rem(nxt, nt)):
            c.start()

    for c in dmas(slot, b, t):
        c.wait()

    uf = u_s[slot]
    cf = c_s[slot]
    M = TZ * NY
    acc = None
    for dx in range(3):
        uw = uf[:, dx:dx + ncols]            # lane shift, built once
        for dz in range(3):
            for dy in range(3):
                m = (dz * 3 + dy) * 3 + dx
                term = (cf[m, :, :ncols]
                        * uw[dz * NY + dy: dz * NY + dy + M])
                acc = term if acc is None else acc + term
    out_ref[0] = acc


def _apply3d_fwd_folded(C, u, tile_z: int | None):
    """Forward for the folded 3D apply: pad y to the COMMON 8-aligned
    stride NY >= ny+2 for u (1-node halo), C and out, fold (z, y) with a
    host-side reshape, unfold the result. Folded C rows y >= ny are
    zero planes, so garbage out rows are exact zeros."""
    B, nz, ny, ncols = u.shape
    NY = -(-(ny + 2) // 8) * 8
    CP = -(-ncols // 128) * 128
    CPu = CP + 128
    TZ = tile_z or _tile_planes_3d(nz, NY, ncols, u.dtype.itemsize)
    TZ = min(TZ, nz)
    ntiles = -(-nz // TZ)
    planes_pad = ntiles * TZ + 3
    # u: (z, y) origins shifted by the 1-node halo — real (z', y') lives
    # at folded row (z'+1)*NY + (y'+1); neighbor (dz, dy) of out node
    # (z, y) is then folded row (z*NY + y) + dz*NY + dy
    u_p = jnp.pad(u, ((0, 0), (1, planes_pad - nz - 1),
                      (1, NY - ny - 1), (1, CPu - ncols - 1)))
    u_f = u_p.reshape(B, planes_pad * NY, CPu)
    C_p = jnp.pad(C, ((0, 0), (0, 0), (0, ntiles * TZ - nz),
                      (0, NY - ny), (0, CP - ncols)))
    C_f = C_p.reshape(C.shape[0], B, ntiles * TZ * NY, CP)

    out = pl.pallas_call(
        partial(_kernel3d_dmaf, TZ=TZ, NY=NY, ncols=ncols),
        grid=(B, ntiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, TZ * NY, ncols),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ntiles * TZ * NY, ncols),
                                       u.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 27, TZ * NY, CP), u.dtype),
            pltpu.VMEM((2, (TZ + 3) * NY, CPu), u.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(54 * B * nz * ny * ncols),
            bytes_accessed=int(29 * u.dtype.itemsize * B * nz * ny
                               * ncols),
            transcendentals=0),
    )(C_f, u_f)
    return out.reshape(B, ntiles * TZ, NY, ncols)[:, :nz, :ny]


def _tile_planes_3d(nz, ny, ncols, itemsize, budget=9 * 2**20):
    """Largest z-tile whose double-buffered 27 C slabs + u slabs fit the
    budget (z is a pure major dim — no alignment constraint)."""
    CP = -(-ncols // 128) * 128
    NYP = -(-(ny + 2) // 8) * 8
    TZ = min(8, nz)
    while TZ > 1 and 2 * (27 * TZ * ny + (TZ + 8) * NYP) * CP * itemsize \
            > budget:
        TZ //= 2
    return TZ


def _apply3d_fwd(C, u, tile_z: int | None, variant: str):
    if variant == "dmaf":
        return _apply3d_fwd_folded(C, u, tile_z)
    if variant != "dma":
        raise ValueError("3D stencil apply ships the 'dma' and folded-z "
                         "'dmaf' variants only (27 coefficient slabs "
                         "never fit a full-volume blockspec pipeline); "
                         f"got {variant!r}")
    B, nz, ny, ncols = u.shape
    TZ = tile_z or _tile_planes_3d(nz, ny, ncols, u.dtype.itemsize)
    TZ = min(TZ, nz)
    ntiles = -(-nz // TZ)
    planes_pad = ntiles * TZ + 8
    CP = -(-ncols // 128) * 128
    CPu = CP + 128
    NYP = -(-(ny + 2) // 8) * 8
    u_p = jnp.pad(u, ((0, 0), (1, planes_pad - nz - 1),
                      (1, NYP - ny - 1), (1, CPu - ncols - 1)))
    NYC = -(-ny // 8) * 8
    C_p = jnp.pad(C, ((0, 0), (0, 0), (0, ntiles * TZ - nz),
                      (0, NYC - ny), (0, CP - ncols)))

    out = pl.pallas_call(
        partial(_kernel3d_dma, TZ=TZ, ny=ny, ncols=ncols),
        grid=(B, ntiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, TZ, ny, ncols),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ntiles * TZ, ny, ncols),
                                       u.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 27, TZ, NYC, CP), u.dtype),
            pltpu.VMEM((2, TZ + 8, NYP, CPu), u.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(54 * B * nz * ny * ncols),
            bytes_accessed=int(29 * u.dtype.itemsize * B * nz * ny
                               * ncols),
            transcendentals=0),
    )(C_p, u_p)
    return out[:, :nz]


# --------------------------------------------------------- public API ----

def stencil_transpose_planes(C, nsd: int):
    """Coefficient planes of the TRANSPOSED operator: with
    ``(A u)[p] = sum_k C_k[p] u[p+k]``, the adjoint is
    ``(A^T g)[q] = sum_k C'_k[q] g[q+k]`` with
    ``C'_k[q] = C_{-k}[q+k]`` — offset-mirrored planes, each shifted by
    its own offset (zero-filled at the boundary, matching the zero-pad
    matvec semantics). One XLA pad+slice pass; symmetric operators
    (Galerkin stiffness) satisfy ``C' == C`` exactly."""
    w = 3
    M = C.shape[0]
    lead = C.ndim - 1 - nsd
    spatial = C.shape[-nsd:]
    planes = []
    for m in range(M):
        idx = []
        mm = m
        for _ in range(nsd):
            idx.append(mm % w - 1)
            mm //= w
        k = tuple(reversed(idx))                     # (dz, dy, dx)
        mneg = 0
        for kc in k:
            mneg = mneg * w + (-kc + 1)
        # shift C[mneg] by +k with zero fill
        pad = [(0, 0)] * (1 + lead)
        sl = [slice(None)] * (1 + lead)
        for kc, s in zip(k, spatial):
            pad.append((max(-kc, 0), max(kc, 0)))
            sl.append(slice(max(kc, 0), max(kc, 0) + s))
        planes.append(jnp.pad(C[mneg], pad[1:])[tuple(sl[1:])])
    return jnp.stack(planes)


def _shifted_u(u, nsd: int):
    """All width-3 shifted copies of u (zero-filled), offset-major —
    the dC cotangent factors."""
    w = 3
    outs = []
    for idx in np.ndindex(*((w,) * nsd)):
        k = tuple(int(c) - 1 for c in idx)
        pad = [(0, 0)] * (u.ndim - nsd)
        sl = [slice(None)] * (u.ndim - nsd)
        for kc, s in zip(k, u.shape[-nsd:]):
            pad.append((max(-kc, 0), max(kc, 0)))
            sl.append(slice(max(kc, 0), max(kc, 0) + s))
        outs.append(jnp.pad(u, pad)[tuple(sl)])
    return jnp.stack(outs)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def stencil_apply(C, u, nsd: int, tile: int | None = None,
                  variant: str = "dma"):
    """Fused width-3 stencil matvec: ``out[p] = sum_m C[m][p] u[p+k_m]``.

    C: ``[3**nsd, B, *spatial]`` coefficient planes in
       ``train.stencil.extract_stencil`` order (offset-major).
    u: ``[B, *spatial]`` (2D: [B, ny, nx]; 3D: [B, nz, ny, nx]).

    Zero-pad boundary semantics, bit-matching
    ``train.stencil.stencil_matvec`` (pinned by tests). Fixed-operator
    iteration kernel for Krylov/multigrid solves — see module docstring.
    """
    if nsd == 2:
        return _apply2d_fwd(C, u, tile, variant)
    if nsd == 3:
        return _apply3d_fwd(C, u, tile, variant)
    raise ValueError(f"nsd must be 2 or 3, got {nsd}")


def stencil_apply_2d(C, u, tile_y: int | None = None,
                     variant: str = "dma"):
    return stencil_apply(C, u, 2, tile_y, variant)


def stencil_apply_3d(C, u, tile_z: int | None = None,
                     variant: str = "dma"):
    return stencil_apply(C, u, 3, tile_z, variant)


def _sa_fwd(C, u, nsd, tile, variant):
    return stencil_apply(C, u, nsd, tile, variant), (C, u)


def _sa_bwd(nsd, tile, variant, res, g):
    C, u = res
    # d/du: transposed apply — same fused kernel on the mirrored/shifted
    # planes (== C itself for symmetric operators, but computed generally)
    Ct = stencil_transpose_planes(C, nsd)
    du = stencil_apply(Ct, g, nsd, tile, variant)
    # d/dC[m] = g ⊙ shift(u, k_m): one XLA pass (C is constant in the
    # solver loops this kernel serves; cotangent kept for completeness)
    dC = g[None] * _shifted_u(u, nsd)
    return dC, du


stencil_apply.defvjp(_sa_fwd, _sa_bwd)
