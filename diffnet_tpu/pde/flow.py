"""Incompressible flow: Stokes (PSPG) and Navier-Stokes (full VMS).

Reference: examples/stokes/single_instance/e1_stokes_mms_resmin.py:71-220,
examples/navier-stokes/single_instance/e1_ns_ldc_resmin.py:100-345 and the
shared base b1_stokes_ns_resmin_base.py (eq_type in {stokes, ns}).

Mixed (u, v, p) equal-order Q1 discretization on the structured grid with
  * PSPG pressure stabilization (pspg_param = h^2 Re / 12) for Stokes,
  * residual-based VMS for NS: tau_m/tau_c from the element metric
    (calc_tau, e1_ns_ldc_resmin.py:147-167), cross terms C1/C2, Reynolds
    stress, and PSPG — advective field detached (lax.stop_gradient), as in
    the reference (u.clone().detach(), e1:246).

All 13 Gauss-point quantities (u,v: N,dx,dy,d2x,d2y; p: N,dx,dy) are
evaluated in ONE fused contraction per field. The reference's post-assembly
``R = where(bc, u_bc, R)`` (adds a constant ||u_bc||^2 to the loss,
e1_stokes:210-213) is implemented as the equivalent zeroing of Dirichlet
rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import fem
from .base import FEM2DModule
from .poisson import _squeeze_field


def calc_tau(h, u, v, visco):
    """VMS stabilization parameters at Gauss points (detached advection),
    reference e1_ns_ldc_resmin.py:147-167 / b1_stokes_ns_resmin_base.py:152-172.
    `h` may be a scalar or an (hx, hy) tuple (anisotropic grids)."""
    hx, hy = (h, h) if np.isscalar(h) else h
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    Gxx = 4.0 / hx**2
    Gyy = 4.0 / hy**2
    Cinv = 36.0
    adv_part = Gxx * u**2 + Gyy * v**2
    diff_part = Cinv * visco**2 * (Gxx**2 + Gyy**2)
    temp = jnp.sqrt(adv_part + diff_part)
    taum = 1.0 / temp
    tauc = temp / (Gxx + Gyy)
    return taum, tauc


class StokesNSBase(FEM2DModule):
    """Shared mixed-field residual machinery; subclasses set eq_type."""

    eq_type = "stokes"

    def __init__(self, network=None, dataset=None, **kwargs):
        super().__init__(network, dataset, **kwargs)
        self.Re = float(kwargs.get("Re", getattr(dataset, "Re", 1.0)))
        self.loss_norm = kwargs.get("loss_norm", "frobenius")
        self.viscosity = 1.0 / self.Re
        # diagonal row scaling for the squared loss: at low Re the viscous
        # momentum rows (~visco/h^2) dwarf the continuity rows (~1/h), and
        # first/quasi-second-order optimizers stall at a high loss floor.
        # 'auto' scales momentum residuals by h^2/visco when visco > h
        # (verified to cut the Re=1 LDC midline error 4-5x on the
        # corner-singular cavity); a number scales them explicitly; 1.0
        # disables. For SMOOTH problems the row-equalizing h/visco
        # (momentum ~visco/h^2 vs continuity ~1/h) converges O(h^2)
        # monotonically where h^2/visco over-damps at fine grids — see
        # scripts/convergence_study.py::solve_stokes (measured both).
        rs = kwargs.get("momentum_scale", "auto")
        if rs == "auto":
            rs = self.h**2 / self.viscosity if self.viscosity > self.h else 1.0
        self.momentum_scale = float(rs)
        # Opt-in fused Pallas VMS kernel (ops/ns_residual.py): all 13 GP
        # quantities + stabilization + 3-residual assembly in one HBM pass.
        # NS-only, deg-1 2x2-GP, zero body forcing (the LDC/FPC configs).
        # Differentiable both ways (custom_jvp, round 5): forward-mode
        # Newton-Krylov (train.linear.ns_newton_solve) and reverse-mode
        # training both work; the tangent/adjoint run the XLA path.
        # Default OFF for TRAINING: on-chip the kernel is ~2x the XLA
        # residual forward, but the backward re-runs the XLA tangent, so
        # full training steps favor the default — see BENCH_MEASURED.md.
        # For Newton/Krylov SOLVES the kernel accelerates every Jacobian
        # action's primal re-evaluation.
        self.fused_kernels = bool(kwargs.get("fused_kernels", False))
        self.fused_variant = str(kwargs.get("fused_variant", "dma"))
        if self.fused_variant not in ("dma", "blockspec"):
            raise ValueError(f"fused_variant must be 'dma' or 'blockspec', "
                             f"got {self.fused_variant!r}")
        if self.fused_kernels and (self.eq_type != "ns"
                                   or self.basis.deg != 1
                                   or self.basis.ngp_1d != 2
                                   or kwargs.get("forcing") is not None):
            raise ValueError("fused_kernels supports the forcing-free NS "
                             "deg-1 2x2-GP configuration only")
        self.pspg_param = self.h**2 * self.Re / 12.0
        # 'mean-control': the bc3 nodes are a pure GAUGE pin (LDC-style
        # corner pin) — the solver paths replace them by a rank-one mean
        # control and restore the pin by a constant shift (see
        # mixed_residual). 'dirichlet': the bc3 nodes carry a REAL
        # boundary condition (e.g. the FPS outlet column p = 0, reference
        # e2_ns_fps_resmin.py:88-89) that changes the solution — the
        # solver paths keep the rows as strong Dirichlet.
        self.pressure_gauge = kwargs.get("pressure_gauge", "mean-control")
        if self.pressure_gauge not in ("mean-control", "dirichlet"):
            raise ValueError("pressure_gauge must be 'mean-control' or "
                             f"'dirichlet', got {self.pressure_gauge!r}")
        # Dirichlet data fields (nodal), defaulting to zero
        zeros = np.zeros(self.node_shape, np.float32)
        self.u_bc = np.asarray(kwargs.get("u_bc", zeros), np.float32)
        self.v_bc = np.asarray(kwargs.get("v_bc", zeros), np.float32)
        self.p_bc = np.asarray(kwargs.get("p_bc", zeros), np.float32)
        forcing = kwargs.get("forcing", None)
        if forcing is not None:
            fx, fy = forcing(self.xgp, self.ygp)
            self.fx_gp = np.asarray(fx, np.float32)
            self.fy_gp = np.asarray(fy, np.float32)
        else:
            self.fx_gp = self.fy_gp = None
        self.exact_solution = kwargs.get("exact_solution", None)

    # -- helpers ---------------------------------------------------------
    def _apply_field_bcs(self, pred, inputs):
        u, v, p = (_squeeze_field(f) for f in pred)
        bc1 = inputs[..., 2]
        bc2 = inputs[..., 3]
        bc3 = inputs[..., 4]
        u = jnp.where(bc1 > 0.5, jnp.broadcast_to(
            jnp.asarray(self.u_bc, u.dtype), u.shape), u)
        v = jnp.where(bc2 > 0.5, jnp.broadcast_to(
            jnp.asarray(self.v_bc, v.dtype), v.shape), v)
        p = jnp.where(bc3 > 0.5, jnp.broadcast_to(
            jnp.asarray(self.p_bc, p.dtype), p.shape), p)
        return u, v, p, bc1, bc2, bc3

    def apply_bcs(self, pred, inputs_tensor):
        u, v, p, *_ = self._apply_field_bcs(pred, inputs_tensor)
        return u, v, p

    def calc_residuals(self, pred, inputs_tensor, forcing_tensor):
        visco = self.viscosity
        u_pred, v_pred, p_pred, bc1, bc2, bc3 = self._apply_field_bcs(
            pred, inputs_tensor)
        if self.fused_kernels:
            from ..ops import ns_vms_residual_fused
            # tail args passed positionally for symmetry with the other
            # fused-kernel call sites (kwargs also work on this JAX)
            R1, R2, R3 = ns_vms_residual_fused(
                u_pred, v_pred, p_pred, None, None, self.basis, visco,
                128, self.fused_variant)
            R1 = jnp.where(bc1 > 0.5, jnp.zeros_like(R1), R1)
            R2 = jnp.where(bc2 > 0.5, jnp.zeros_like(R2), R2)
            R3 = jnp.where(bc3 > 0.5, jnp.zeros_like(R3), R3)
            return R1, R2, R3
        dt = u_pred.dtype
        if self.fx_gp is not None:
            f1 = jnp.asarray(self.fx_gp, dt)
            f2 = jnp.asarray(self.fy_gp, dt)
        else:
            f1 = f2 = jnp.zeros((1, 1, 1, self.ngp_total), dt)

        # ONE fused evaluation for all three fields x all quantities: stack
        # (u, v, p) on a leading axis so the 13 reference conv calls
        # (e1_ns_ldc_resmin.py:217-231) collapse into a single contraction
        quants = ("N", "dx", "dy", "d2x", "d2y")
        stacked = jnp.stack([u_pred, v_pred, p_pred], axis=0)
        allgp = fem.gp_eval_stacked(stacked, self.basis, quants)
        ugp = {q: allgp[0, ..., i, :] for i, q in enumerate(quants)}
        vgp = {q: allgp[1, ..., i, :] for i, q in enumerate(quants)}
        pgp = {q: allgp[2, ..., i, :] for i, q in enumerate(quants)}
        u, u_x, u_y = ugp["N"], ugp["dx"], ugp["dy"]
        v, v_x, v_y = vgp["N"], vgp["dx"], vgp["dy"]
        p, p_x, p_y = pgp["N"], pgp["dx"], pgp["dy"]
        divergence = u_x + v_y

        if self.eq_type == "stokes":
            # PSPG-stabilized Stokes (e1_stokes_mms_resmin.py:159-198)
            R1 = self.assemble_multi([
                (visco * u_x, "dx"), (visco * u_y, "dy"),
                (-p, "dx"), (-f1, "N")])
            R2 = self.assemble_multi([
                (visco * v_x, "dx"), (visco * v_y, "dy"),
                (-p, "dy"), (-f2, "N")])
            R3 = self.assemble_multi([
                (divergence, "N"), (self.pspg_param * p_x, "dx"),
                (self.pspg_param * p_y, "dy")])
        else:
            # full VMS NS (e1_ns_ldc_resmin.py:248-300)
            lap1 = ugp["d2x"] + ugp["d2y"]
            lap2 = vgp["d2x"] + vgp["d2y"]
            adv1 = u * u_x + v * u_y
            adv2 = u * v_x + v * v_y
            res1 = adv1 - visco * lap1 + p_x - f1
            res2 = adv2 - visco * lap2 + p_y - f2
            taum, tauc = calc_tau((self.hx, self.hy), u, v, visco)

            # momentum-x: Galerkin + VMS terms (cross term 1 (u·grad W) tau
            # res, cross term 2 -W tau (res·grad U), Reynolds stress
            # -tau^2 res (res·grad W), grad-div), each fused into one
            # projection matmul + scatter per residual
            R1 = self.assemble_multi([
                (adv1 - f1 - taum * (res1 * u_x + res2 * u_y), "N"),
                (visco * u_x - p + taum * u * res1
                 - taum**2 * res1 * res1 + tauc * divergence, "dx"),
                (visco * u_y + taum * v * res1
                 - taum**2 * res1 * res2, "dy")])
            R2 = self.assemble_multi([
                (adv2 - f2 - taum * (res1 * v_x + res2 * v_y), "N"),
                (visco * v_x + taum * u * res2
                 - taum**2 * res2 * res1, "dx"),
                (visco * v_y - p + taum * v * res2
                 - taum**2 * res2 * res2 + tauc * divergence, "dy")])
            R3 = self.assemble_multi([
                (divergence, "N"), (taum * res1, "dx"), (taum * res2, "dy")])

        R1 = jnp.where(bc1 > 0.5, jnp.zeros_like(R1), R1)
        R2 = jnp.where(bc2 > 0.5, jnp.zeros_like(R2), R2)
        R3 = jnp.where(bc3 > 0.5, jnp.zeros_like(R3), R3)
        return R1, R2, R3

    def residual_for_field(self, fields, inputs_tensor, forcing_tensor):
        """Assembled mixed residual {'u','v','p'} -> {'u','v','p'} for the
        matrix-free Krylov path (train/linear.py). The PSPG-stabilized
        Stokes system is AFFINE in (u, v, p) — Dirichlet data is
        substituted by calc_residuals' masking, rows zeroed on the
        substituted nodes, exactly like the Poisson hook. Stokes only:
        the NS residual is quadratic (use Picard/continuation there)."""
        if self.eq_type != "stokes":
            raise ValueError(
                "residual_for_field is the AFFINE linear-solver hook; the "
                f"eq_type={self.eq_type!r} residual is nonlinear in the "
                "fields — use train.linear.ns_newton_solve (Newton-Krylov "
                "over mixed_residual) or the training path")
        return self.mixed_residual(fields, inputs_tensor, forcing_tensor)

    def mixed_residual(self, fields, inputs_tensor, forcing_tensor):
        """Gauge-controlled mixed residual {'u','v','p'} -> {'u','v','p'}
        for the solver paths (Krylov on Stokes; Newton-Krylov on NS).

        PRESSURE GAUGE: the training path controls the constant pressure
        mode by pinning one corner node (bc3 substitution + row mask,
        reference e1_stokes_mms_resmin.py). Through the masked system
        that control is O(h^2)-weak — the "constant except a dent at the
        pin" vector is a near-null mode, and an f32-floor Krylov
        residual admits an O(0.2) constant drift in p (measured). For
        the solver paths the pin is REMOVED from the operator (bc3
        channel zeroed) and replaced by a rank-one mean-control term
            R_p += s * mean(p) * 1,  s ~ the pressure-block diagonal,
        which anchors the constant mode at O(1) preconditioned strength
        with no dent. Callers restore the reference gauge afterwards by
        a pure-constant shift to the pinned value (a constant is exactly
        null for every other equation on the Dirichlet-masked system);
        :func:`train.linear.stokes_linear_solve` /
        :func:`train.linear.ns_newton_solve` do both steps.

        pressure_gauge='dirichlet' (FPS-style outlet column): the bc3
        nodes are a REAL boundary condition, not a gauge — a constant p
        is NOT null through the do-nothing outflow boundary — so the
        rows stay strong Dirichlet and no mean control is added."""
        if self.pressure_gauge == "dirichlet":
            R1, R2, R3 = self.calc_residuals(
                (fields["u"], fields["v"], fields["p"]),
                inputs_tensor, forcing_tensor)
            return {"u": R1, "v": R2, "p": R3}
        inputs_nopin = jnp.asarray(inputs_tensor).at[..., 4].set(0.0)
        R1, R2, R3 = self.calc_residuals(
            (fields["u"], fields["v"], fields["p"]),
            inputs_nopin, forcing_tensor)
        p_raw = _squeeze_field(fields["p"])
        s = (self.pspg_param * 8.0 / 3.0
             + (self.hx * self.hy) * (4.0 / 9.0) / self.viscosity)
        R3 = R3 + s * jnp.mean(p_raw, axis=(-2, -1), keepdims=True)
        return {"u": R1, "v": R2, "p": R3}

    # -- alternating-optimizer protocol (reference optimizer_idx,
    #    e1_ns_ldc_resmin.py:323-345): one objective per field residual ----
    num_objectives = 3

    def objective_loss(self, idx, params, batch):
        inputs_tensor, forcing_tensor = batch[0], batch[1]
        pred = self.network.apply(params, inputs_tensor)
        R = self.calc_residuals(pred, inputs_tensor, forcing_tensor)[idx]
        if self.loss_norm == "squared":
            return jnp.sum(R**2)
        return jnp.sqrt(jnp.sum(R**2) + 1e-12)

    def objective_param_mask(self, idx, params):
        """Scope objective `idx`'s update to its own field's params when the
        param tree is per-field (DirectField(n_fields=3) -> field_0/1/2),
        matching the reference's one-Adam-per-field-network setup
        (e1_ns_ldc_resmin.py:335-339). Returns None (update everything) for
        shared-parameter networks (e.g. MultiOutUNet's shared encoder)."""
        key = f"field_{idx}"
        if isinstance(params, dict) and key in params and len(
                params) == self.num_objectives:
            return {k: k == key for k in params}
        return None

    def loss(self, pred, inputs_tensor, forcing_tensor):
        R1, R2, R3 = self.calc_residuals(pred, inputs_tensor, forcing_tensor)
        s = self.momentum_scale
        if self.loss_norm == "squared":
            # better-conditioned for LBFGS (smooth at the optimum); the
            # reference's sum-of-Frobenius-norms is kept as the default for
            # loss-value parity (e1_stokes_mms_resmin.py:215-218)
            return (jnp.sum((s * R1) ** 2) + jnp.sum((s * R2) ** 2)
                    + jnp.sum(R3**2))
        norm = lambda R: jnp.sqrt(jnp.sum(R**2) + 1e-12)
        return norm(s * R1) + norm(s * R2) + norm(R3)


class StokesMMS(StokesNSBase):
    """Stokes with PSPG; MMS exact solution
    u = sin(pi x) cos(pi y), v = -cos(pi x) sin(pi y), p = sin(pi x) sin(pi y)
    (reference e1_stokes_mms_resmin.py:94-112)."""

    eq_type = "stokes"

    def __init__(self, network=None, dataset=None, **kwargs):
        pi, sin, cos = np.pi, np.sin, np.cos
        # the viscous part of the MMS forcing scales with viscosity = 1/Re
        # (the residual is visco*lap(u) - grad p = -f); the reference only
        # ever runs this at Re = 1 where the distinction vanishes
        visco = 1.0 / float(kwargs.get("Re", getattr(dataset, "Re", 1.0)))
        kwargs.setdefault("forcing", lambda x, y: (
            visco * 2 * pi**2 * sin(pi * x) * cos(pi * y)
            + pi * sin(pi * y) * cos(pi * x),
            -visco * 2 * pi**2 * sin(pi * y) * cos(pi * x)
            + pi * sin(pi * x) * cos(pi * y),
        ))
        super().__init__(network, dataset, **kwargs)
        x, y = self.xx, self.yy
        self.u_exact = np.sin(pi * x) * np.cos(pi * y)
        self.v_exact = -np.cos(pi * x) * np.sin(pi * y)
        self.p_exact = np.sin(pi * x) * np.sin(pi * y)
        if kwargs.get("mms_dirichlet", True):
            self.u_bc = self.u_exact.astype(np.float32)
            self.v_bc = self.v_exact.astype(np.float32)
            self.p_bc = self.p_exact.astype(np.float32)


class NavierStokes(StokesNSBase):
    """VMS-stabilized steady NS (lid-driven cavity & friends)."""

    eq_type = "ns"

    def __init__(self, network=None, dataset=None, **kwargs):
        super().__init__(network, dataset, **kwargs)


class FlowWeakFormLDC(FEM2DModule):
    """Older single-field squared weak-form NS/Stokes loss (reference
    examples/{navier-stokes,stokes}/single_instance/01_weak_form_ldc.py:77-119):
    mean over elements of 1000*(advection + viscous*f - pressure-div)^2 +
    divergence/pressure regularization. Batch inputs channels:
    (x, bc1 walls, bc2 lid, bc3 pressure pin)."""

    def __init__(self, network=None, dataset=None, **kwargs):
        super().__init__(network, dataset, **kwargs)

    def loss(self, pred, inputs_tensor, forcing_tensor):
        u, v, p = (_squeeze_field(f) for f in pred)
        bc1 = inputs_tensor[..., 1]
        bc2 = inputs_tensor[..., 2]
        bc3 = inputs_tensor[..., 3]
        f = _squeeze_field(forcing_tensor)
        u = self.apply_dirichlet(u, bc1, 0.0)
        u = self.apply_dirichlet(u, bc2, 1.0)
        v = jnp.where((bc1 > 0.5) | (bc2 > 0.5), jnp.zeros_like(v), v)
        p = self.apply_dirichlet(p, bc3, 0.0)

        ug = self.gp_all(u, ("N", "dx", "dy"))
        vg = self.gp_all(v, ("N", "dx", "dy"))
        pg = self.gp_all(p, ("N", "dx"))
        f_gp = self.gauss_pt_evaluation(f)
        w = jnp.asarray(self.gpw, u.dtype)

        advec = (ug["N"] * ug["N"] * ug["dx"] + ug["N"] * vg["N"] * ug["dy"]
                 + ug["N"] * vg["N"] * vg["dx"] + vg["N"] * vg["N"] * vg["dy"])
        stokes = (ug["dx"] ** 2 + ug["dy"] ** 2 + vg["dx"] ** 2
                  + vg["dy"] ** 2) * f_gp
        press = pg["N"] * (ug["dx"] + vg["dy"])
        r1 = w * (advec + stokes - press) ** 2
        r2 = w * (press**2 + 0.005 * pg["dx"] ** 2)
        return jnp.mean(1000.0 * jnp.sum(r1, -1) + jnp.sum(r2, -1))


def ldc_bcs(node_shape, lengths=(1.0, 1.0), regularized=True):
    """Lid-driven-cavity Dirichlet data: u = 1 - 16 (x - 1/2)^4 on the lid
    (regularized; reference e1_ns_ldc_resmin.py:119-125), no-slip elsewhere,
    pressure pinned at node (0,0)."""
    ny, nx = node_shape
    x = np.linspace(0, lengths[0], nx)
    u_bc = np.zeros(node_shape, np.float32)
    u_bc[-1, :] = (1.0 - 16.0 * (x - 0.5) ** 4) if regularized else 1.0
    v_bc = np.zeros(node_shape, np.float32)
    p_bc = np.zeros(node_shape, np.float32)
    return u_bc, v_bc, p_bc
