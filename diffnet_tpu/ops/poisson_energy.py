"""Pallas TPU kernel: fully-fused Poisson Ritz energy functional.

Computes, in ONE pass over HBM,

    E = mean_{b, e} sum_gp  gpw*J * (0.5 * nu(e,gp) * |grad u|^2(e,gp)
                                      - u(e,gp) * f(e,gp))

i.e. the reference energy loss (examples/poisson/single_instance/
0_base.py:31-56 and the parametric IBN variant
e1_complex_immersed_background.py:33-58) with the Gauss-point evaluation,
the physics, and the quadrature reduction fused into a single kernel: the
op-by-op path materializes 5 Gauss-point fields (u, u_x, u_y, nu, f — each
4x the nodal size at 2x2 GP) in HBM; here they live and die in VMEM and HBM
traffic is exactly u + nu + f in, one scalar per tile out.

The gradient is where this kernel family composes: the Ritz energy's
u-gradient IS the assembled Galerkin residual,

    dE/du = (K(nu) u - Nf) / n_cells,

so the custom VJP reuses :func:`diffnet_tpu.ops.poisson_residual.
poisson_stiffness_action` (the fused stiffness-action kernel) plus one fused
Galerkin projection for the load/nu/f cotangents — the whole
forward+backward of energy training runs through two fused kernels.

Deg-1 (bilinear, 2x2 Gauss) 2D only, same scope as the stiffness kernel —
the configuration of every reference energy workload (0_base.py runs 64^2
deg-1; CIB 256^2 deg-1).

STATUS: interpret-mode validated against the XLA path (value and all three
VJPs — tests/test_pallas_kernel.py). For TRAINING steps the XLA path in
:mod:`diffnet_tpu.pde.poisson` remains the production default (round-4
on-chip A/B: XLA wins the full fwd+bwd step — the kernel family's
production win is the solver path through the stiffness action).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import fem
from ..core.quadrature import FEMBasis
from .poisson_residual import _build_tables, poisson_stiffness_action

__all__ = ["poisson_energy_fused"]


def _build_tables_energy(basis: FEMBasis):
    """Separable energy tables (round 4, session 4): the folded constants
    of the SUM-FACTORIZED energy body (see `_kernel`). Asserts the
    tensor-product structure of the full per-GP tables under the repo's
    index conventions (IGP = jgp*ngp + igp, corner k = jb*2 + ib) so a
    convention drift fails loudly at module-construction time."""
    import numpy as np

    NT, DXT, DYT, jxw = _build_tables(basis)
    xi = np.asarray(basis.gp_1d, np.float64)
    cN = np.stack([(1.0 - xi) / 2.0, (1.0 + xi) / 2.0], -1)  # [gp, node]
    hx, hy = (float(v) for v in basis.h)
    W = float(jxw[0])
    assert np.allclose(jxw, W), "2x2 Gauss has equal weights"
    dNx = np.array([[-1.0 / hx, 1.0 / hx]] * 2)              # [gp, node]
    dNy = np.array([[-1.0 / hy, 1.0 / hy]] * 2)
    for gy in range(2):
        for gx in range(2):
            g = gy * 2 + gx
            for jb in range(2):
                for ib in range(2):
                    k = jb * 2 + ib
                    assert abs(NT[g][k] - cN[gy][jb] * cN[gx][ib]) < 1e-12
                    assert abs(DXT[g][k] - cN[gy][jb] * dNx[gx][ib]) < 1e-12
                    assert abs(DYT[g][k] - dNy[gy][jb] * cN[gx][ib]) < 1e-12
    d2 = float((cN[0, 0] - cN[0, 1]) ** 2)   # (p-q)^2 = 1/3
    c1x = W / (8.0 * hx * hx)
    c1y = W / (8.0 * hy * hy)
    return (c1x, d2 * c1x, 2.0 * d2 * c1x,
            c1y, d2 * c1y, 2.0 * d2 * c1y, W / 9.0)


def _kernel(u_hbm, nu_hbm, f_hbm, out_ref, u_s, nu_s, f_s, sems,
            *, tables_sep, TY, nel):
    b = pl.program_id(0)
    t = pl.program_id(1)

    # strip of TY element rows needs TY+1 node rows starting at the
    # tile's first node row (no top halo: elements, unlike assembled nodes,
    # tile cleanly — element row r reads node rows [r, r+2))
    row0 = t * TY
    cps = [pltpu.make_async_copy(h.at[b, pl.ds(row0, TY + 8), :], s,
                                 sems.at[i])
           for i, (h, s) in enumerate(((u_hbm, u_s), (nu_hbm, nu_s),
                                       (f_hbm, f_s)))]
    for c in cps:
        c.start()
    for c in cps:
        c.wait()

    # TY element rows per tile: element row e_global = row0 + local row,
    # using node rows [local, local+2)
    u = u_s[: TY + 1]
    nu = nu_s[: TY + 1]
    f = f_s[: TY + 1]

    def corners(a):
        return (a[:-1, :-1], a[:-1, 1:], a[1:, :-1], a[1:, 1:])

    uc = corners(u[:, :nel + 1])
    nc = corners(nu[:, :nel + 1])
    fc = corners(f[:, :nel + 1])

    e_row = jax.lax.broadcasted_iota(jnp.int32, (TY, nel), 0) + row0
    valid = (e_row < nel).astype(u.dtype)

    # SUM-FACTORIZED body (round 4, session 4; exact — see
    # _build_tables_energy's convention asserts and the derivation in
    # ops/poisson_residual._strip_lr). The GP loop collapses:
    #   sum_g W nug ux^2 = nsum (c1x Ux^2 + c2x Vx^2) + c3x Ux Vx Xx
    # (U/V = sum/diff of the two x-differences, W/X = sum/diff of the nu
    # row sums), and the load term sum_g W ug fg = W u^T (m (x) m) f with
    # the 1D Gauss mass m = [[2,1],[1,2]]/3 — ~61 vector ops/element vs
    # ~168 for the per-GP loop.
    c1x, c2x, c3x, c1y, c2y, c3y, cm = tables_sep
    c00, c01, c10, c11 = uc
    n00, n01, n10, n11 = nc
    f00, f01, f10, f11 = fc
    dxl, dxh = c01 - c00, c11 - c10
    dyl, dyh = c10 - c00, c11 - c01
    sxr0, sxr1 = n00 + n01, n10 + n11
    syc0, syc1 = n00 + n10, n01 + n11
    nsum = sxr0 + sxr1
    Xx, Xy = sxr0 - sxr1, syc0 - syc1
    Ux, Vx = dxl + dxh, dxl - dxh
    Uy, Vy = dyl + dyh, dyl - dyh
    ex = nsum * (c1x * (Ux * Ux) + c2x * (Vx * Vx)) + c3x * (Ux * Vx) * Xx
    ey = nsum * (c1y * (Uy * Uy) + c2y * (Vy * Vy)) + c3y * (Uy * Vy) * Xy
    ga, gb = 2.0 * f00 + f10, 2.0 * f01 + f11
    gc, gd = f00 + 2.0 * f10, f01 + 2.0 * f11
    load = cm * (c00 * (2.0 * ga + gb) + c01 * (ga + 2.0 * gb)
                 + c10 * (2.0 * gc + gd) + c11 * (gc + 2.0 * gd))
    acc = ex + ey - load

    s = jnp.sum(acc * valid)
    out_ref[0, 0] = jnp.full((128,), s, u.dtype)


def _energy_fwd_impl(u, nu, f, basis: FEMBasis, tile_y: int = 128):
    B, n, _ = u.shape
    nel = n - 1
    TY = min(tile_y, -(-nel // 8) * 8)
    ntiles = -(-nel // TY)
    assert TY % 8 == 0, "tile_y must be a multiple of 8"
    pad_rows = ntiles * TY + 8
    CP = -(-n // 128) * 128
    cfg = ((0, 0), (0, pad_rows - n), (0, CP - n))
    u_p = jnp.pad(u, cfg)
    nu_p = jnp.pad(nu, cfg)
    f_p = jnp.pad(f, cfg)
    tables_sep = _build_tables_energy(basis)

    out = pl.pallas_call(
        partial(_kernel, tables_sep=tables_sep, TY=TY, nel=nel),
        grid=(B, ntiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=pl.BlockSpec((1, 1, 128), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ntiles, 128), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((TY + 8, CP), u.dtype),
            pltpu.VMEM((TY + 8, CP), u.dtype),
            pltpu.VMEM((TY + 8, CP), u.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(70 * B * nel * nel),
            bytes_accessed=int(3 * 4 * B * n * n),
            transcendentals=0),
    )(u_p, nu_p, f_p)
    return jnp.sum(out[..., 0]) / (B * nel * nel)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def poisson_energy_fused(u, nu, f, basis: FEMBasis, tile_y: int = 128):
    """Ritz energy mean_{b,elem} sum_gp JxW (0.5 nu |grad u|^2 - u f).

    `u`, `nu`, `f` are nodal ``[B, n, n]`` fields (forcing interpolated at
    Gauss points through the Q1 basis, exact to the same order as the field
    itself). Matches :func:`diffnet_tpu.pde.poisson.poisson_energy_loss` to
    round-off; pinned by tests."""
    for name, arr in (("nu", nu), ("f", f)):
        if arr.shape != u.shape:
            # the XLA path broadcasts; the kernel DMAs by u's batch/rows
            # and would read out of bounds on a smaller operand
            raise ValueError(f"{name}.shape {arr.shape} != u.shape "
                             f"{u.shape} (the fused kernel does not "
                             "broadcast)")
    return _energy_fwd_impl(u, nu, f, basis, tile_y)


def _fwd(u, nu, f, basis, tile_y):
    return _energy_fwd_impl(u, nu, f, basis, tile_y), (u, nu, f)


def _bwd(basis, tile_y, res, g):
    u, nu, f = res
    B, n, _ = u.shape
    scale = g / (B * (n - 1) ** 2)
    # dE/du = K(nu) u - Nf : the fused stiffness-action kernel + one fused
    # projection of the nodal forcing evaluated at GP
    Ku = poisson_stiffness_action(u, nu, basis, tile_y)
    f_gp = fem.gp_eval(f, basis, ("N",))["N"]
    Nf = fem.galerkin_project(f_gp, basis, "N", (n, n))
    du = scale * (Ku - Nf)
    # dE/dnu = Galerkin N-projection of 0.5 |grad u|^2
    gu = fem.gp_eval(u, basis, ("dx", "dy"))
    dnu = scale * fem.galerkin_project(
        0.5 * (gu["dx"] ** 2 + gu["dy"] ** 2), basis, "N", (n, n))
    # dE/df = -Galerkin N-projection of u at GP
    u_gp = fem.gp_eval(u, basis, ("N",))["N"]
    df = -scale * fem.galerkin_project(u_gp, basis, "N", (n, n))
    return du, dnu, df


poisson_energy_fused.defvjp(_fwd, _bwd)
