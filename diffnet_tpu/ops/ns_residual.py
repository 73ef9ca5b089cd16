"""Pallas TPU kernel: fully-fused Navier-Stokes VMS residual assembly.

The reference NS step (examples/navier-stokes/single_instance/
e1_ns_ldc_resmin.py:176-308) evaluates 13 Gauss-point quantities (u, v:
N/dx/dy/d2x/d2y; p: N/dx/dy) as 13 separate convolutions, forms the VMS
integrands, and runs three 3-term Galerkin projections + scatter
assemblies — re-reading the fields from HBM at every op. The XLA path in
:mod:`diffnet_tpu.pde.flow` already collapses this to one contraction +
three fused projections; this kernel goes the rest of the way: ONE pass
over HBM computes all Gauss-point values, all VMS stabilization terms
(tau_m/tau_c from the element metric, cross terms, Reynolds stress, PSPG,
grad-div), and the Q1 assembly of all three residuals. HBM traffic is
u + v + p (+ optional fx + fy) in, R1 + R2 + R3 out.

Deg-1 (bilinear, 2x2 Gauss) only — the reference's configuration for every
NS/Stokes benchmark (LDC 64^2, FPC 256x128). For Q1 elements the basis
second derivatives vanish identically, so the viscous Laplacian drops out
of the *strong* residual exactly as in the reference at deg 1 (the weak
viscous term is retained through the dx/dy projections).

Forcing is passed as NODAL fields (interpolated at Gauss points through the
same Q1 basis — exact to the discretization order); `None` means zero
(the LDC case).

Differentiable via custom JVP (round 5; was custom VJP): the primal runs
the fused kernel, the tangent rule is ``jax.jvp`` through the
mathematically-identical XLA path (:func:`ns_vms_residual_xla`), and
reverse mode is JAX's transposition of that tangent. This makes BOTH
forward-mode (Newton-Krylov Jacobian actions,
``train.linear.ns_newton_solve``) and reverse-mode (training) work —
the VMS residual is nonlinear, so a hand-derived in-kernel adjoint would
buy little over XLA's own fused tangent here, and this keeps gradients
bit-comparable with the production path (advective field detached inside
tau, both paths).

STATUS: interpret-mode validated against the XLA path (values and VJP —
tests/test_pallas_kernel.py). On-chip (round 3-4): the blockspec variant
runs at 256^2 (~2x the XLA path pre-factorization; bench.py pallas-probe
NS tiers). Round 4: the body is sum-factorized (see `_strip_accs`).
Round 5: the projection partials are accumulated inside the Gauss loop
(36 -> 8 live integrand slabs/family) — measured on-chip at 4.88e8
elem/s, the SAME 4.7-5.4e8 band: arithmetic (r4) and the integrand
live set (r5) are both ruled out as the limiter; what remains is the
3-residual output pipeline / per-grid-step overhead class.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import fem
from ..core.quadrature import FEMBasis

__all__ = ["ns_vms_residual_fused", "ns_vms_residual_xla"]


def _build_tables_ns(basis: FEMBasis):
    """Separable deg-1 tables for the sum-factorized NS body: 1D shape
    values at the two Gauss points plus the (equal) 2D quadrature weight."""
    assert basis.deg == 1 and basis.nsd == 2 and basis.ngp_1d == 2, (
        "fused NS kernel supports deg-1 2D with 2x2 Gauss only")
    import numpy as np

    xi = np.asarray(basis.gp_1d, np.float64)
    cN = np.stack([(1.0 - xi) / 2.0, (1.0 + xi) / 2.0], -1)  # [gp, node]
    jxw = np.asarray(basis.jxw, np.float64)
    W = float(jxw[0])
    assert np.allclose(jxw, W), "2x2 Gauss has equal weights"
    cN_l = [[float(cN[g, j]) for j in range(2)] for g in range(2)]
    return cN_l, W


def ns_vms_residual_xla(u, v, p, fx, fy, basis: FEMBasis, visco: float):
    """Pure-XLA VMS residual on nodal fields (reference
    e1_ns_ldc_resmin.py:241-300 semantics; advection detached in tau).

    Returns the three UNMASKED assembled residuals; Dirichlet rows are the
    caller's concern (as in :meth:`diffnet_tpu.pde.flow.StokesNSBase.
    calc_residuals`)."""
    n_shape = u.shape[-2:]
    hx, hy = basis.h
    # deg-1 second derivatives are identically zero: skip their GP fields
    # (this function is also the custom-VJP backward of the fused kernel,
    # so the saving applies to every fused training step)
    quants = (("N", "dx", "dy") if basis.deg == 1
              else ("N", "dx", "dy", "d2x", "d2y"))
    stacked = jnp.stack([u, v, p], axis=0)
    allgp = fem.gp_eval_stacked(stacked, basis, quants)
    ug = {q: allgp[0, ..., i, :] for i, q in enumerate(quants)}
    vg = {q: allgp[1, ..., i, :] for i, q in enumerate(quants)}
    pg = {q: allgp[2, ..., i, :] for i, q in enumerate(quants)}
    if fx is None:
        f1 = f2 = jnp.zeros_like(ug["N"])
    else:
        f1 = fem.gp_eval(fx, basis, ("N",))["N"]
        f2 = fem.gp_eval(fy, basis, ("N",))["N"]

    uN, ux, uy = ug["N"], ug["dx"], ug["dy"]
    vN, vx, vy = vg["N"], vg["dx"], vg["dy"]
    pN, px, py = pg["N"], pg["dx"], pg["dy"]
    div = ux + vy
    adv1 = uN * ux + vN * uy
    adv2 = uN * vx + vN * vy
    if basis.deg == 1:
        lap1 = lap2 = 0.0
    else:
        lap1 = ug["d2x"] + ug["d2y"]
        lap2 = vg["d2x"] + vg["d2y"]
    res1 = adv1 - visco * lap1 + px - f1
    res2 = adv2 - visco * lap2 + py - f2

    # one canonical copy of the stabilization physics (advection
    # detached inside calc_tau)
    from ..pde.flow import calc_tau

    taum, tauc = calc_tau((hx, hy), uN, vN, visco)

    def asm(terms):
        return fem.galerkin_project_multi(terms, basis, n_shape)

    R1 = asm([(adv1 - f1 - taum * (res1 * ux + res2 * uy), "N"),
              (visco * ux - pN + taum * uN * res1
               - taum**2 * res1 * res1 + tauc * div, "dx"),
              (visco * uy + taum * vN * res1 - taum**2 * res1 * res2, "dy")])
    R2 = asm([(adv2 - f2 - taum * (res1 * vx + res2 * vy), "N"),
              (visco * vx + taum * uN * res2 - taum**2 * res2 * res1, "dx"),
              (visco * vy - pN + taum * vN * res2
               - taum**2 * res2 * res2 + tauc * div, "dy")])
    R3 = asm([(div, "N"), (taum * res1, "dx"), (taum * res2, "dy")])
    return R1, R2, R3


def _strip_accs(u_s, v_s, p_s, fx_s, fy_s, row0,
                *, tables, TY, nel, hx, hy, visco, has_f):
    """VMS GP evaluation + per-basis-function accumulation for output node
    rows [row0, row0+TY).

    Inputs are (>=TY+2, >=nel+1) node strips covering PADDED rows
    [row0, row0+TY+2) (1-top-pad-row convention, as the Poisson kernels).
    Returns (acc1, acc2, acc3, valid): three lists of 4 unmasked
    accumulators [TY+1, nel] and the element-row validity mask.

    SUM-FACTORIZED body (round 4, same move as the 2D stiffness kernel's
    `_strip_lr`): for deg-1, dN/dxi is CONSTANT (+-1) along its own axis,
    so each spatial derivative takes only TWO distinct values across the
    four Gauss points (ux depends on gy only, uy on gx only), the
    N-evaluations reuse 1D x-interpolations, and the three Galerkin
    projections factorize into 1D Gauss passes (the dx/dy test-function
    sums collapse across their constant axis). taum uses `lax.rsqrt` +
    multiplies instead of sqrt + two divides. ~800 -> ~510 vector ops per
    element, algebraically identical to the full quadrature loop (parity
    pinned at 2e-5 by tests/test_pallas_kernel.py)."""
    cN, W = tables   # 1D shape values at the 2 GPs; 2D quadrature weight

    def corners(s):
        a = s[: TY + 2, : nel + 1]
        # (jb, ib) node order: (y-lo,x-lo), (y-lo,x-hi), (y-hi,x-lo), (y-hi,x-hi)
        return (a[:-1, :-1], a[:-1, 1:], a[1:, :-1], a[1:, 1:])

    e_row = (jax.lax.broadcasted_iota(jnp.int32, (TY + 1, nel), 0)
             + row0 - 1)
    dt = u_s.dtype
    valid = jnp.logical_and(e_row >= 0, e_row < nel).astype(dt)

    Gxx, Gyy = 4.0 / hx**2, 4.0 / hy**2
    diff_part = 36.0 * visco**2 * (Gxx**2 + Gyy**2)
    inv_hx, inv_hy = 1.0 / hx, 1.0 / hy
    inv_sumG = 1.0 / (Gxx + Gyy)

    def eval_field(c, derivs=True):
        """(FN[gx][gy], Fx[gy], Fy[gx]) — factorized deg-1 GP evaluation."""
        t = [[cN[gx][0] * c[2 * jb] + cN[gx][1] * c[2 * jb + 1]
              for jb in (0, 1)] for gx in (0, 1)]
        FN = [[cN[gy][0] * t[gx][0] + cN[gy][1] * t[gx][1]
               for gy in (0, 1)] for gx in (0, 1)]
        if not derivs:
            return FN, None, None
        dxl, dxh = (c[1] - c[0]) * inv_hx, (c[3] - c[2]) * inv_hx
        Fx = [cN[gy][0] * dxl + cN[gy][1] * dxh for gy in (0, 1)]
        dyl, dyh = (c[2] - c[0]) * inv_hy, (c[3] - c[1]) * inv_hy
        Fy = [cN[gx][0] * dyl + cN[gx][1] * dyh for gx in (0, 1)]
        return FN, Fx, Fy

    uN, ux, uy = eval_field(corners(u_s))
    vN, vx, vy = eval_field(corners(v_s))
    pN, px, py = eval_field(corners(p_s))
    if has_f:
        f1N, _, _ = eval_field(corners(fx_s), derivs=False)
        f2N, _, _ = eval_field(corners(fy_s), derivs=False)

    # Per-GP integrands ACCUMULATED into the factorized projection
    # partials inside the Gauss loop (round 5, VERDICT r4 #5): the
    # previous body materialized all 9 integrand families x 4 GPs (36
    # live strip arrays) before projecting; here each GP's integrands die
    # within the iteration and only the partials stay live — 8 arrays per
    # residual family (A: gx-summed N-part [gy][ib], X: gx-summed dx-part
    # [gy], Y: gy-summed dy-part [gx]) — identical algebra and op count
    # to the previous two-stage factorized projection.
    A1, A2, A3 = ([[None] * 2 for _ in range(2)] for _ in range(3))
    X1, X2, X3 = ([None] * 2 for _ in range(3))
    Y1, Y2, Y3 = ([None] * 2 for _ in range(3))

    def _acc(store, key, val):
        store[key] = val if store[key] is None else store[key] + val

    for gx in (0, 1):
        for gy in (0, 1):
            uNg, vNg, pNg = uN[gx][gy], vN[gx][gy], pN[gx][gy]
            uxg, vxg, pxg = ux[gy], vx[gy], px[gy]
            uyg, vyg, pyg = uy[gx], vy[gx], py[gx]
            div = uxg + vyg
            adv1 = uNg * uxg + vNg * uyg
            adv2 = uNg * vxg + vNg * vyg
            res1 = adv1 + pxg - (f1N[gx][gy] if has_f else 0.0)
            res2 = adv2 + pyg - (f2N[gx][gy] if has_f else 0.0)
            s2 = Gxx * uNg * uNg + Gyy * vNg * vNg + diff_part
            taum = jax.lax.rsqrt(s2)
            tauc = s2 * taum * inv_sumG
            tm1 = taum * res1           # = taum*res1; taum^2*res1*res2 etc.
            tm2 = taum * res2           #   become products of these
            t12 = tm1 * tm2
            tcd = tauc * div

            i1N = adv1 - (f1N[gx][gy] if has_f else 0.0) \
                - tm1 * uxg - tm2 * uyg
            i2N = adv2 - (f2N[gx][gy] if has_f else 0.0) \
                - tm1 * vxg - tm2 * vyg
            for ib in (0, 1):
                c = cN[gx][ib]
                _acc(A1[gy], ib, c * i1N)
                _acc(A2[gy], ib, c * i2N)
                _acc(A3[gy], ib, c * div)
            _acc(X1, gy, visco * uxg - pNg + uNg * tm1 - tm1 * tm1 + tcd)
            _acc(X2, gy, visco * vxg + uNg * tm2 - t12)
            _acc(X3, gy, tm1)
            _acc(Y1, gx, visco * uyg + vNg * tm1 - t12)
            _acc(Y2, gx, visco * vyg - pNg + vNg * tm2 - tm2 * tm2 + tcd)
            _acc(Y3, gx, tm2)

    # projection tail: N part via the second 1D Gauss pass; dx/dy parts
    # enter with the +-1/h sign of the test corner.
    Wx, Wy = W * inv_hx, W * inv_hy

    def project(A, X, Y):
        accN = [[(W * cN[0][jb]) * A[0][ib] + (W * cN[1][jb]) * A[1][ib]
                 for ib in (0, 1)] for jb in (0, 1)]
        Cj = [(Wx * cN[0][jb]) * X[0] + (Wx * cN[1][jb]) * X[1]
              for jb in (0, 1)]
        Di = [(Wy * cN[0][ib]) * Y[0] + (Wy * cN[1][ib]) * Y[1]
              for ib in (0, 1)]
        return [accN[0][0] - Cj[0] - Di[0],
                accN[0][1] + Cj[0] - Di[1],
                accN[1][0] - Cj[1] + Di[0],
                accN[1][1] + Cj[1] + Di[1]]

    acc1 = project(A1, X1, Y1)
    acc2 = project(A2, X2, Y2)
    acc3 = project(A3, X3, Y3)
    return acc1, acc2, acc3, valid


def _kernel(u_hbm, v_hbm, p_hbm, fx_hbm, fy_hbm,
            r1_ref, r2_ref, r3_ref,
            u_s, v_s, p_s, fx_s, fy_s, sems,
            *, tables, TY, n, nel, hx, hy, visco, has_f):
    b = pl.program_id(0)
    t = pl.program_id(1)

    row0 = t * TY
    srcs = [(u_hbm, u_s), (v_hbm, v_s), (p_hbm, p_s)]
    if has_f:
        srcs += [(fx_hbm, fx_s), (fy_hbm, fy_s)]
    cps = [pltpu.make_async_copy(h.at[b, pl.ds(row0, TY + 8), :], s,
                                 sems.at[i]) for i, (h, s) in enumerate(srcs)]
    for c in cps:
        c.start()
    for c in cps:
        c.wait()

    acc1, acc2, acc3, valid = _strip_accs(
        u_s, v_s, p_s, fx_s if has_f else None, fy_s if has_f else None,
        row0, tables=tables, TY=TY, nel=nel, hx=hx, hy=hy, visco=visco,
        has_f=has_f)
    dt = valid.dtype
    for acc, out_ref in ((acc1, r1_ref), (acc2, r2_ref), (acc3, r3_ref)):
        a = [x * valid for x in acc]
        left = a[0][1:, :] + a[2][:TY, :]
        right = a[1][1:, :] + a[3][:TY, :]
        out_ref[0] = jnp.zeros((TY, n), dt)
        out_ref[0, :, :nel] = left
        out_ref[0, :, 1:] = out_ref[0, :, 1:] + right


def _kernel_bs(u_ref, v_ref, p_ref, fx_ref, fy_ref,
               r1_ref, r2_ref, r3_ref,
               *, tables, TY, ntiles, n, nel, hx, hy, visco, has_f):
    """BlockSpec-only NS variant (see poisson_residual._kernel_bs): whole
    padded fields per program via the automatic pipeline, static strip
    loop — no manual DMA / semaphores / scratch."""
    for t in range(ntiles):
        row0 = t * TY
        sl = slice(row0, row0 + TY + 2)
        acc1, acc2, acc3, valid = _strip_accs(
            u_ref[0, sl, :], v_ref[0, sl, :], p_ref[0, sl, :],
            fx_ref[0, sl, :] if has_f else None,
            fy_ref[0, sl, :] if has_f else None,
            row0, tables=tables, TY=TY, nel=nel, hx=hx, hy=hy,
            visco=visco, has_f=has_f)
        dt = valid.dtype
        osl = slice(row0, row0 + TY)
        for acc, out_ref in ((acc1, r1_ref), (acc2, r2_ref), (acc3, r3_ref)):
            a = [x * valid for x in acc]
            left = a[0][1:, :] + a[2][:TY, :]
            right = a[1][1:, :] + a[3][:TY, :]
            out_ref[0, osl, :] = jnp.zeros((TY, n), dt)
            out_ref[0, osl, :nel] = left
            out_ref[0, osl, 1:] = out_ref[0, osl, 1:] + right


def _ns_fwd_bs(u, v, p, fx, fy, basis: FEMBasis, visco: float,
               tile_y: int = 128):
    """BlockSpec-only NS forward: grid (B,), full padded fields per
    program. VMEM: ~2*(3 + 2*has_f) input fields + 2*3 output fields +
    strip temporaries — ~13 MB at 512^2 f32 without forcing; guarded to
    n <= 512 (<= 384 with forcing)."""
    B, n, _ = u.shape
    has_f = fx is not None
    n_max = 384 if has_f else 512
    if n > n_max:
        raise ValueError(
            f"NS blockspec variant holds all fields in VMEM; n={n} > "
            f"{n_max} (has_f={has_f}) would overflow — use variant='dma' "
            "or the XLA path")
    nel = n - 1
    hx, hy = basis.h
    TY = min(tile_y, -(-n // 8) * 8)
    assert TY % 8 == 0 or TY == n, "tile_y must be a multiple of 8"
    ntiles = -(-n // TY)
    rows_pad = -(-(ntiles * TY + 2) // 8) * 8
    CP = -(-n // 128) * 128
    cfg = ((0, 0), (1, rows_pad - n - 1), (0, CP - n))
    fields = [u, v, p] + ([fx, fy] if has_f else [])
    padded = [jnp.pad(f, cfg) for f in fields]
    field_spec = pl.BlockSpec((1, rows_pad, CP), lambda b: (b, 0, 0))
    in_specs = [field_spec] * len(padded)
    if not has_f:
        dummy = jnp.zeros((1, 1, 1), u.dtype)
        padded += [dummy, dummy]
        in_specs += [pl.BlockSpec((1, 1, 1), lambda b: (0, 0, 0))] * 2
    tables = _build_tables_ns(basis)

    out_spec = pl.BlockSpec((1, ntiles * TY, n), lambda b: (b, 0, 0))
    out_shape = jax.ShapeDtypeStruct((B, ntiles * TY, n), u.dtype)
    R1, R2, R3 = pl.pallas_call(
        partial(_kernel_bs, tables=tables, TY=TY, ntiles=ntiles, n=n,
                nel=nel, hx=float(hx), hy=float(hy), visco=float(visco),
                has_f=has_f),
        grid=(B,),
        in_specs=in_specs,
        out_specs=[out_spec] * 3,
        out_shape=[out_shape] * 3,
        cost_estimate=pl.CostEstimate(
            flops=int(510 * B * nel * nel),
            bytes_accessed=int((6 + 2 * has_f) * 4 * B * n * n),
            transcendentals=int(4 * B * nel * nel)),
    )(*padded)
    return R1[:, :n], R2[:, :n], R3[:, :n]


def _ns_fwd_impl(u, v, p, fx, fy, basis: FEMBasis, visco: float,
                 tile_y: int = 128, variant: str = "dma"):
    if variant == "blockspec":
        return _ns_fwd_bs(u, v, p, fx, fy, basis, visco, tile_y)
    if variant != "dma":
        raise ValueError(f"unknown kernel variant {variant!r} "
                         "(expected 'dma' or 'blockspec')")
    B, n, _ = u.shape
    nel = n - 1
    hx, hy = basis.h
    has_f = fx is not None
    TY = min(tile_y, -(-n // 8) * 8)
    ntiles = -(-n // TY)
    assert TY % 8 == 0 or TY == n, "tile_y must be a multiple of 8"
    pad_rows = ntiles * TY + 8
    CP = -(-n // 128) * 128
    cfg = ((0, 0), (1, pad_rows - n - 1), (0, CP - n))
    fields = [u, v, p] + ([fx, fy] if has_f else [])
    padded = [jnp.pad(f, cfg) for f in fields]
    if not has_f:
        # minimal dummy operands keep the kernel signature static; the
        # kernel never DMAs from them when has_f is False
        dummy = jnp.zeros((1, 1, 1), u.dtype)
        padded += [dummy, dummy]
    tables = _build_tables_ns(basis)

    scratch = [pltpu.VMEM((TY + 8, CP), u.dtype) for _ in range(5)]
    out_spec = pl.BlockSpec((1, TY, n), lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, ntiles * TY, n), u.dtype)
    R1, R2, R3 = pl.pallas_call(
        partial(_kernel, tables=tables, TY=TY, n=n, nel=nel,
                hx=float(hx), hy=float(hy), visco=float(visco), has_f=has_f),
        grid=(B, ntiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 5,
        out_specs=[out_spec] * 3,
        out_shape=[out_shape] * 3,
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA((5,))],
        cost_estimate=pl.CostEstimate(
            flops=int(510 * B * nel * nel),
            bytes_accessed=int((6 + 2 * has_f) * 4 * B * n * n),
            transcendentals=int(4 * B * nel * nel)),
    )(*padded)
    return R1[:, :n], R2[:, :n], R3[:, :n]


def ns_vms_residual_fused(u, v, p, fx, fy, basis: FEMBasis, visco: float,
                          tile_y: int = 128, variant: str = "dma"):
    """(R1, R2, R3) = assembled VMS Navier-Stokes residuals of nodal
    (u, v, p) [B, n, n] with optional nodal forcing (fx, fy).

    Matches :func:`ns_vms_residual_xla` (and hence the production
    `StokesNSBase.calc_residuals` NS branch) to round-off; pinned by
    tests.

    Differentiable in BOTH modes: the primal runs the fused kernel; the
    tangent rule is ``jax.jvp`` through the mathematically-identical XLA
    path (custom_jvp), so forward-mode works — which is what
    :func:`train.linear.ns_newton_solve` needs for its Jacobian action
    (VERDICT r4 #4: custom_vjp made ``fused_kernels=True`` +
    Newton-Krylov a trace-time TypeError). Reverse-mode is JAX's
    transposition of that XLA tangent — same cost class as the previous
    explicit custom_vjp-through-XLA backward."""
    for name, arr in (("v", v), ("p", p), ("fx", fx), ("fy", fy)):
        if arr is not None and arr.shape != u.shape:
            # XLA paths broadcast; the kernel DMAs by u's batch/rows and
            # would read out of bounds
            raise ValueError(f"{name}.shape {arr.shape} != u.shape "
                             f"{u.shape} (the fused kernel does not "
                             "broadcast)")
    if not visco > 0.0:
        # tau = 1/sqrt(...) is inf on the kernel's zero-padded halo rows
        # at visco = 0, and inf * 0 masking turns boundary rows into NaN
        raise ValueError(f"visco must be > 0, got {visco}")
    # None-forcing is routed to a separate custom_jvp primitive: None is
    # not a differentiable operand, and custom_jvp (unlike the plain call)
    # cannot carry optional array arguments
    if fx is None:
        return _fused_nof(u, v, p, basis, visco, tile_y, variant)
    return _fused_f(u, v, p, fx, fy, basis, visco, tile_y, variant)


@partial(jax.custom_jvp, nondiff_argnums=(3, 4, 5, 6))
def _fused_nof(u, v, p, basis, visco, tile_y, variant):
    return _ns_fwd_impl(u, v, p, None, None, basis, visco, tile_y, variant)


@_fused_nof.defjvp
def _fused_nof_jvp(basis, visco, tile_y, variant, primals, tangents):
    primal_out = _ns_fwd_impl(*primals, None, None, basis, visco, tile_y,
                              variant)
    _, tangent_out = jax.jvp(
        lambda u, v, p: ns_vms_residual_xla(u, v, p, None, None, basis,
                                            visco), primals, tangents)
    return primal_out, tangent_out


@partial(jax.custom_jvp, nondiff_argnums=(5, 6, 7, 8))
def _fused_f(u, v, p, fx, fy, basis, visco, tile_y, variant):
    return _ns_fwd_impl(u, v, p, fx, fy, basis, visco, tile_y, variant)


@_fused_f.defjvp
def _fused_f_jvp(basis, visco, tile_y, variant, primals, tangents):
    primal_out = _ns_fwd_impl(*primals, basis, visco, tile_y, variant)
    _, tangent_out = jax.jvp(
        lambda *a: ns_vms_residual_xla(*a, basis, visco), primals, tangents)
    return primal_out, tangent_out
