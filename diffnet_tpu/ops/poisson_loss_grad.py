"""Pallas TPU kernel: fused resmin loss AND gradient in ONE launch.

Round-5 attack on the training-step gap (VERDICT r4 #6: the Pallas
training path lost to XLA 855 vs 977 steps/s at 512^2/bs8 because the
backward was a SECOND full kernel launch, with XLA elementwise glue
between the two).

For the Galerkin residual-minimization loss of the reference's field
solves (reference DiffNet/base.py:42-49 training loop over
e*_poisson_resmin losses)

    L = sum R^2,   R = M (K(nu) u - Nf),   M = 1 - Dirichlet mask,

the gradient is available in closed form from the SAME stencil machinery:
K is self-adjoint, so

    dL/du = 2 K(nu) M R  (and M R = R — R already carries M's zeros).

Both R and K(R) are one-element-halo stencil applications, so ONE kernel
pass per batch with a 2-node halo computes the loss AND its u-gradient:
per row strip, assemble R on TY+2 rows (strip + 1-halo, via the same
sum-factorized `_strip_lr` as the residual kernel), reduce the owned
rows' R^2 into a running scalar, apply the stiffness action to the R
strip, and store 2*K(R). A whole Adam/SGD training step then costs one
Pallas launch + the optimizer elementwise update — no second kernel
sweep, no XLA loss/cotangent glue, and R never round-trips HBM.

Exposed as `jax.custom_vjp`: the forward emits (loss, grad) and saves
grad, so `jax.value_and_grad(loss_fn)` costs exactly the one launch; the
nu/Nf cotangents (unused in field training and DCE-pruned there) are
recomputed lazily in the bwd.

BlockSpec-only structure (grid (B,), whole padded field per program,
static strip loop) — the variant family's relay-safe shape. Guarded to
fields whose pipeline blocks fit VMEM (~12 MB: 4 double-buffered inputs
+ out); larger fields use the two-launch path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import fem
from ..core.quadrature import FEMBasis
from .poisson_residual import (_build_tables_sep, _strip_lr,
                               poisson_residual_fused)

__all__ = ["poisson_resmin_loss_fused"]


def _kernel_lg(u_ref, nu_ref, nf_ref, bc_ref, out_ref, loss_ref, r_s, *,
               tables, TY, ntiles, nrows, ncols, nel_rows, nel_cols):
    acc = jnp.zeros((), u_ref.dtype)
    for t in range(ntiles):
        r0 = t * TY
        # R on the strip + 1-row halo: real rows [r0-1, r0+TY+1), from the
        # u slab real rows [r0-2, r0+TY+2) (padded coords shift by +2)
        uslab = u_ref[0, r0: r0 + TY + 4, :]
        nuslab = nu_ref[0, r0: r0 + TY + 4, :]
        lf, rt = _strip_lr(uslab, nuslab, r0 - 1, tables, TY + 2,
                           nel_rows, nel_cols)
        # assemble the R strip in the VMEM scratch (ref stores — a
        # value-level pad/concat of offset-layout vectors is a Mosaic
        # NotImplemented), then read it back as a clean-layout value
        r_s[...] = jnp.zeros(r_s.shape, u_ref.dtype)
        r_s[:, :nel_cols] = lf
        r_s[:, 1:ncols] = r_s[:, 1:ncols] + rt
        Rs = ((r_s[:, :ncols] - nf_ref[0, r0 + 1: r0 + TY + 3, :ncols])
              * (1.0 - bc_ref[0, r0 + 1: r0 + TY + 3, :ncols]))
        # loss: owned rows [r0, r0+TY), masked past the real field
        own = Rs[1: TY + 1]
        rmask = (jax.lax.broadcasted_iota(jnp.int32, (TY, 1), 0) + r0
                 < nrows).astype(Rs.dtype)
        own = own * rmask
        acc = acc + jnp.sum(own * own)
        # grad rows [r0, r0+TY): stiffness action on the R strip (the R
        # slab IS the (TY+2)-row input — halo garbage rows only feed
        # element rows the domain mask kills)
        glf, grt = _strip_lr(Rs, nuslab[1: TY + 3], r0, tables, TY,
                             nel_rows, nel_cols)
        out_ref[0, r0: r0 + TY, :] = jnp.zeros((TY, ncols), u_ref.dtype)
        out_ref[0, r0: r0 + TY, :nel_cols] = 2.0 * glf
        out_ref[0, r0: r0 + TY, 1:] = (out_ref[0, r0: r0 + TY, 1:]
                                       + 2.0 * grt)
    # one-hot write of the scalar (a .at[0,0].set is a `scatter` — not
    # lowerable by Mosaic)
    oh = jnp.logical_and(
        jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0,
        jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0)
    loss_ref[0] = jnp.where(oh, acc, jnp.zeros((), u_ref.dtype))


def _loss_grad_impl(u, nu, Nf, bc_mask, basis: FEMBasis, tile_y: int):
    B, nrows, ncols = u.shape
    nel_rows, nel_cols = nrows - 1, ncols - 1
    TY = min(tile_y, -(-nrows // 8) * 8)
    assert TY % 8 == 0, "tile_y must be a multiple of 8"
    ntiles = -(-nrows // TY)
    # 2 top halo pad rows; bottom so every u slab [t*TY, t*TY+TY+4) is in
    # range; columns to the 128-lane boundary (>= ncols + 0 needed: the
    # strip body slices real columns only)
    rows_pad = -(-(ntiles * TY + 4) // 8) * 8
    CP = -(-ncols // 128) * 128
    blk_bytes = 10 * rows_pad * CP * u.dtype.itemsize
    if blk_bytes > 14 * 2**20:
        raise ValueError(
            "poisson_resmin_loss_fused holds u/nu/Nf/bc in VMEM; "
            f"{nrows}x{ncols} needs ~{blk_bytes / 2**20:.0f} MB of "
            "pipeline blocks — use the two-launch fused-residual path")
    if bc_mask.ndim == u.ndim - 1:
        bc_mask = jnp.broadcast_to(bc_mask[None], u.shape)
    cfg = ((0, 0), (2, rows_pad - nrows - 2), (0, CP - ncols))
    u_p = jnp.pad(u, cfg)
    nu_p = jnp.pad(nu, cfg)
    nf_p = jnp.pad(Nf, cfg)
    bc_p = jnp.pad(bc_mask.astype(u.dtype), cfg)
    tables = _build_tables_sep(basis)

    grad, psums = pl.pallas_call(
        partial(_kernel_lg, tables=tables, TY=TY, ntiles=ntiles,
                nrows=nrows, ncols=ncols, nel_rows=nel_rows,
                nel_cols=nel_cols),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, rows_pad, CP), lambda b: (b, 0, 0))] * 4,
        out_specs=[
            pl.BlockSpec((1, ntiles * TY, ncols), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, ntiles * TY, ncols), u.dtype),
            jax.ShapeDtypeStruct((B, 8, 128), u.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((TY + 2, CP), u.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=int(220 * B * nel_rows * nel_cols),
            bytes_accessed=int(5 * 4 * B * nrows * ncols),
            transcendentals=0),
    )(u_p, nu_p, nf_p, bc_p)
    return jnp.sum(psums), grad[:, :nrows]


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def poisson_resmin_loss_fused(u, nu, Nf, bc_mask, basis: FEMBasis,
                              tile_y: int = 128):
    """sum(R^2) with R = (K(nu) u - Nf) masked by `bc_mask`, loss and
    u-gradient in ONE kernel launch (see module docstring). `bc_mask` may
    be [ny, nx] or [B, ny, nx]."""
    loss, _ = _loss_grad_impl(u, nu, Nf, bc_mask, basis, tile_y)
    return loss


def _lg_fwd(u, nu, Nf, bc_mask, basis, tile_y):
    loss, grad = _loss_grad_impl(u, nu, Nf, bc_mask, basis, tile_y)
    return loss, (grad, u, nu, Nf, bc_mask)


def _lg_bwd(basis, tile_y, res, g):
    grad, u, nu, Nf, bc_mask = res
    du = g * grad
    # nu/Nf cotangents: recomputed lazily (field training differentiates
    # u only — XLA DCE prunes this whole branch there)
    bcb = (bc_mask if bc_mask.ndim == u.ndim
           else jnp.broadcast_to(bc_mask[None], u.shape))
    R = poisson_residual_fused(u, nu, Nf, bcb, basis, variant="blockspec")
    dNf = -2.0 * g * R
    gu = fem.gp_eval(u, basis, ("dx", "dy"))
    gr = fem.gp_eval(R, basis, ("dx", "dy"))
    integrand = gu["dx"] * gr["dx"] + gu["dy"] * gr["dy"]
    dnu = 2.0 * g * fem.galerkin_project(integrand, basis, "N",
                                         u.shape[-2:])
    dbc = jnp.zeros_like(bc_mask)
    return du, dnu, dNf, dbc


poisson_resmin_loss_fused.defvjp(_lg_fwd, _lg_bwd)
