"""Space-time formulations on a 2D (x, t) grid — the y axis is time.

  * SpaceTimeHeat — parabolic heat as 2D FEM with SUPG-in-time
    (reference examples/poisson/single_instance/e3_st_mms_resmin.py:41-240;
    dataset rectangles.py:67-103): residual
      R_i = ∫ N_i u_t + nu ∫ N_i,x u_x + tau ∫ N_i,t u_t
            - ∫ (N_i + tau N_i,t) f,     tau = h/2
    IC imposed as a Dirichlet row at t=0, side walls Dirichlet-0.
  * AllenCahnIceMelt — nonlinear reaction G(u) = 2DA(u - 3u^2 + 2u^3) - Dk
    with Cn^2 interface diffusion (reference e18_allen_cahn_ice_melt.py:40-152).
  * Burgers space-time strong form: mean_el sum_gp gpw (u_t + u u_x)^2
    (reference examples/burgers/single_instance/01_2d_space_time.py:68-95),
    deg-2 basis, direct field + LBFGS.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import FEM2DModule
from .poisson import _squeeze_field


class SpaceTimeHeat(FEM2DModule):
    def __init__(self, network=None, dataset=None, **kwargs):
        super().__init__(network, dataset, **kwargs)
        self.diffusivity = float(
            kwargs.get("diffusivity", getattr(dataset, "diffusivity", 0.1)))
        # SUPG-in-time stabilization parameter. The reference hardcodes the
        # advection-limit value tau = h/2 (e3_st_mms_resmin.py:52), but the
        # stabilization term tau (u_t - f) v_t omits the diffusion part of
        # the residual (zero for Q1 elements), leaving an O(tau * nu * u_xx)
        # consistency error — with tau ~ h that caps convergence at O(h)
        # (measured 0.92, CONVERGENCE.md r1). The Peclet-weighted formula
        # the reference itself uses for adv-diff SUPG
        # (e17_adv_diff_2d_resmin.py:54-75), with unit "advection" along t
        # and diffusion in x, shrinks tau like h^2/nu in the
        # diffusion-dominated limit and restores O(h^2). tau="reference"
        # keeps the h/2 parity behavior.
        tau_mode = kwargs.get("tau", "pe")
        if tau_mode == "reference":
            self.tau = 1.0 / (2.0 / self.hy)
        elif tau_mode == "pe":
            self.tau = 1.0 / (2.0 / self.hy
                              + 4.0 * self.diffusivity / self.hx**2)
        else:
            self.tau = float(tau_mode)
        self.u0 = np.asarray(
            kwargs.get("u0", getattr(dataset, "u0", np.zeros(self.node_shape))),
            np.float32)
        forcing = kwargs.get("forcing", None)
        self.f_gp = (np.asarray(forcing(self.xgp, self.ygp), np.float32)
                     if forcing is not None else None)
        self.exact_solution = kwargs.get("exact_solution", None)
        self.loss_type = kwargs.get("loss_type", "resmin")

    def apply_bcs(self, u, inputs_tensor):
        u = _squeeze_field(u)
        u0 = jnp.asarray(self.u0, u.dtype)
        u = jnp.where(inputs_tensor[..., 1] > 0.5,
                      jnp.broadcast_to(u0, u.shape), u)
        return self.apply_dirichlet(u, inputs_tensor[..., 2], 0.0)

    def residual(self, u, f_gp, bc1, bc2):
        nu, tau = self.diffusivity, self.tau
        gp = self.gp_all(u, ("dx", "dy"))  # dy == d/dt
        f_b = jnp.broadcast_to(f_gp, gp["dy"].shape)
        R = self.assemble_multi([
            (gp["dy"] - f_b, "N"),
            (nu * gp["dx"], "dx"),
            (tau * (gp["dy"] - f_b), "dy")])
        R = jnp.where(bc2 > 0.5, jnp.zeros_like(R), R)
        R = jnp.where(bc1 > 0.5, jnp.zeros_like(R), R)
        return R

    def loss(self, u, inputs_tensor, forcing_tensor):
        u = _squeeze_field(u)
        bc1 = inputs_tensor[..., 1]   # IC row (t=0)
        bc2 = inputs_tensor[..., 2]   # spatial walls
        f = _squeeze_field(forcing_tensor)
        u0 = jnp.asarray(self.u0, u.dtype)
        u = jnp.where(bc1 > 0.5, jnp.broadcast_to(u0, u.shape), u)
        u = self.apply_dirichlet(u, bc2, 0.0)
        f_gp = (jnp.asarray(self.f_gp, u.dtype) if self.f_gp is not None
                else self.gauss_pt_evaluation(f))
        if self.loss_type == "energy":
            # quadratic space-time functional (e3:181-199)
            gp = self.gp_all(u, ("N", "dx", "dy"))
            w = jnp.asarray(self.gpw, u.dtype)
            res = (gp["N"] * gp["dy"] + self.diffusivity * gp["dx"] ** 2
                   + self.tau * gp["dy"] ** 2
                   - 2.0 * (gp["N"] + self.tau * gp["dy"]) * f_gp)
            return jnp.mean(jnp.sum(w * res, -1))
        R = self.residual(u, f_gp, bc1, bc2)
        return jnp.sum(R**2)


class AllenCahnIceMelt(FEM2DModule):
    def __init__(self, network=None, dataset=None, **kwargs):
        super().__init__(network, dataset, **kwargs)
        self.ac_A = float(kwargs.get("ac_A", getattr(dataset, "ac_A", 16.0)))
        self.ac_Cn = float(kwargs.get("ac_Cn", getattr(dataset, "ac_Cn", 0.1)))
        self.ac_D = float(kwargs.get("ac_D", getattr(dataset, "ac_D", 1.0)))
        self.ac_k = float(kwargs.get("ac_k", getattr(dataset, "ac_k", 2.0)))
        self.u0 = np.asarray(
            kwargs.get("u0", getattr(dataset, "u0", np.zeros(self.node_shape))),
            np.float32)
        # optional manufactured source (beyond the reference's e18, which has
        # none): residual gains a -∫ N f term, enabling MMS rate studies
        forcing = kwargs.get("forcing", None)
        self.f_gp = (np.asarray(forcing(self.xgp, self.ygp), np.float32)
                     if forcing is not None else None)
        self.exact_solution = kwargs.get("exact_solution", None)

    def apply_bcs(self, u, inputs_tensor):
        """IC row + wall substitution — the same masking loss() enforces,
        exposed for query/viz tooling (bc nodes carry no gradient, so the
        raw field there is untrained)."""
        u = _squeeze_field(u)
        u0 = jnp.asarray(self.u0, u.dtype)
        u = jnp.where(inputs_tensor[..., 1] > 0.5,
                      jnp.broadcast_to(u0, u.shape), u)
        return self.apply_dirichlet(u, inputs_tensor[..., 2], 0.0)

    def calcG(self, u_gp):
        """Allen-Cahn reaction (e18:77-78). The ac_A == 0 (homotopy /
        reaction-free) case drops the double-well term STATICALLY: tracing
        `0 * u**3` would leave integer_pow in the jaxpr and break the
        symbolic transpose jax.scipy's gmres needs on the then-affine
        residual."""
        lin = -self.ac_D * self.ac_k * jnp.ones_like(u_gp)
        if self.ac_A == 0.0:
            return lin
        return (2.0 * self.ac_D * self.ac_A
                * (u_gp - 3.0 * u_gp**2 + 2.0 * u_gp**3) + lin)

    def residual(self, u, bc1, bc2):
        D, Cn = self.ac_D, self.ac_Cn
        gp = self.gp_all(u, ("N", "dx", "dy"))
        G_gp = self.calcG(gp["N"])
        if self.f_gp is not None:
            G_gp = G_gp - jnp.asarray(self.f_gp, u.dtype) / D
        R = self.assemble_multi([
            (gp["dy"] + D * G_gp, "N"),
            (D * Cn**2 * gp["dx"], "dx"),
            (D * Cn**2 * gp["dy"], "dy")])
        R = jnp.where(bc1 > 0.5, jnp.zeros_like(R), R)
        R = jnp.where(bc2 > 0.5, jnp.zeros_like(R), R)
        return R

    def loss(self, u, inputs_tensor, forcing_tensor):
        bc1 = inputs_tensor[..., 1]
        bc2 = inputs_tensor[..., 2]
        u = self.apply_bcs(u, inputs_tensor)
        R = self.residual(u, bc1, bc2)
        return jnp.sum(R**2)


class BurgersSpaceTime(FEM2DModule):
    """Space-time Burgers, strong/weak mixed: loss = mean_el sum_gp
    gpw (u_t + u u_x)^2 (+ optional viscous term). Dataset channels:
    (x, bc1, bc2, bc1_val) with -10 sentinel for non-boundary
    (reference 01_2d_space_time.py:30-95)."""

    def __init__(self, network=None, dataset=None, viscosity=0.0, **kwargs):
        kwargs.setdefault("fem_basis_deg", 2)
        super().__init__(network, dataset, **kwargs)
        self.viscosity = float(viscosity)
        # optional manufactured source (res -> u_t + u u_x - f) for MMS
        # rate studies; the reference workload (01_2d_space_time.py) has none
        forcing = kwargs.get("forcing", None)
        self.f_gp = (np.asarray(forcing(self.xgp, self.ygp), np.float32)
                     if forcing is not None else None)
        self.exact_solution = kwargs.get("exact_solution", None)

    def apply_bcs(self, u, inputs_tensor):
        """IC row (bc1_val channel) + wall substitution for query/viz."""
        u = _squeeze_field(u)
        u = jnp.where(inputs_tensor[..., 1] > 0.5,
                      inputs_tensor[..., 3], u)
        return jnp.where(inputs_tensor[..., 2] > 0.5, jnp.zeros_like(u), u)

    def loss(self, u, inputs_tensor, forcing_tensor):
        u = self.apply_bcs(u, inputs_tensor)
        quants = ("N", "dx", "dy") + (("d2x",) if self.viscosity else ())
        gp = self.gp_all(u, quants)
        res = gp["dy"] + gp["N"] * gp["dx"]
        if self.viscosity:
            res = res - self.viscosity * gp["d2x"]
        if self.f_gp is not None:
            res = res - jnp.asarray(self.f_gp, u.dtype)
        w = jnp.asarray(self.gpw, u.dtype)
        return jnp.mean(jnp.sum(w * res**2, -1))
