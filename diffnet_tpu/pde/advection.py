"""Advection-diffusion with SUPG stabilization.

Reference: examples/poisson/single_instance/e17_adv_diff_2d_resmin.py:40-170.
Weak form with streamline-upwind test functions  v + tau a·grad(v):

  R_i = ∫ N_i (a·grad u) + nu ∫ grad(N_i)·grad(u)
        + tau ∫ (a·grad N_i)(a·grad u)  -  ∫ (N_i + tau a·grad N_i) f

with tau = 1 / (2|a|/h + 4 nu / h^2) (e17:58). The reference's hardcoded 4x4
SUPG element matrices (e17:64-67) are exactly the Gauss-quadrature integrals
of these terms for deg-1 bases — recovered here from the general tables (and
pinned by a test against those constants).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .base import FEM2DModule
from .poisson import _squeeze_field


class AdvDiff2D(FEM2DModule):
    def __init__(self, network=None, dataset=None,
                 adv=(math.cos(math.pi / 6), math.sin(math.pi / 6)),
                 diffusivity=1e-4, **kwargs):
        super().__init__(network, dataset, **kwargs)
        self.adv = np.asarray(adv, np.float64)
        self.adv_mag = float(np.linalg.norm(self.adv))
        self.diffusivity = float(diffusivity)
        self.tau = 1.0 / (2.0 * self.adv_mag / self.h
                          + 4.0 * self.diffusivity / self.h**2)
        forcing = kwargs.get("forcing", None)
        self.f_gp = (np.asarray(forcing(self.xgp, self.ygp), np.float32)
                     if forcing is not None else None)
        self.bc1_value = kwargs.get("bc1_value", 1.0)
        self.exact_solution = kwargs.get("exact_solution", None)

    def residual(self, u, f_gp, bc1, bc2, nu_gp=None):
        ax, ay = float(self.adv[0]), float(self.adv[1])
        nu, tau = self.diffusivity, self.tau
        gp = self.gp_all(u, ("dx", "dy"))
        a_grad_u = ax * gp["dx"] + ay * gp["dy"]
        # spatially-varying diffusivity from the channel-0 input (the
        # reference assembles diffusivity*nu_gp*(vxux+vyuy), e17:143);
        # ones for the bundled datasets
        nu_eff = nu if nu_gp is None else nu * nu_gp
        # advection (vs N), diffusion (vs dN), SUPG (vs a·dN), and the
        # SUPG-weighted rhs — all in one fused projection
        f_b = jnp.broadcast_to(f_gp, a_grad_u.shape)
        R = self.assemble_multi([
            (a_grad_u - f_b, "N"),
            (nu_eff * gp["dx"] + tau * ax * (a_grad_u - f_b), "dx"),
            (nu_eff * gp["dy"] + tau * ay * (a_grad_u - f_b), "dy")])
        R = jnp.where(bc1 > 0.5, jnp.zeros_like(R), R)
        R = jnp.where(bc2 > 0.5, jnp.zeros_like(R), R)
        return R

    def apply_bcs(self, u, inputs_tensor):
        """Inlet/wall substitution for query/viz tooling (bc nodes carry
        no gradient, so the raw field there is untrained)."""
        u = _squeeze_field(u)
        u = self.apply_dirichlet(u, inputs_tensor[..., 1], self.bc1_value)
        return self.apply_dirichlet(u, inputs_tensor[..., 2], 0.0)

    def loss(self, u, inputs_tensor, forcing_tensor):
        bc1 = inputs_tensor[..., 1]
        bc2 = inputs_tensor[..., 2]
        f = _squeeze_field(forcing_tensor)
        u = self.apply_bcs(u, inputs_tensor)
        f_gp = (jnp.asarray(self.f_gp, u.dtype) if self.f_gp is not None
                else self.gauss_pt_evaluation(f))
        nu_gp = self.gauss_pt_evaluation(inputs_tensor[..., 0])
        R = self.residual(u, f_gp, bc1, bc2, nu_gp=nu_gp)
        return jnp.sum(R**2)
