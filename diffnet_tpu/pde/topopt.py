"""Topology optimization (SIMP-style) on the Poisson/compliance problem.

Reference: examples/poisson/single_instance/16_topopt.py:110-260 — joint
(u, nu) optimization with a tri-objective rotation:
  0. PDE loss       — energy form with test function v=u and boundary
                      penalties (16_topopt.py:119-156)
  1. compliance     — -∫ u f (to be minimized over the design, :159-196)
  2. volume frac    — (sum(nu) - target)^2 (:245-252)
The density is projected by nu = median3x3(0.001 + sigmoid(rho)^3)
(SIMP-like; :123). The reference's (stubbed) MedianPool2d is implemented
here as a real 3x3 median filter.

This module exposes the three objectives; `loss` combines them with weights,
and `objective(idx)` supports the reference's alternating-optimizer protocol.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import FEM2DModule
from .poisson import _squeeze_field


def median_filter_3x3(x):
    """3x3 median with edge replication; x: [..., H, W]."""
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)], mode="edge")
    H, W = x.shape[-2:]
    patches = jnp.stack(
        [xp[..., i:i + H, j:j + W] for i in range(3) for j in range(3)],
        axis=-1)
    return jnp.median(patches, axis=-1)


class TopOpt2D(FEM2DModule):
    def __init__(self, network=None, dataset=None, target_vf=0.4,
                 weights=(1.0, 1.0, 1e-4), **kwargs):
        super().__init__(network, dataset, **kwargs)
        self.target_vf_sum = target_vf * self.domain_sizeX * self.domain_sizeY
        self.weights = weights

    def project_density(self, rho):
        """SIMP projection: median3x3(0.001 + sigmoid(rho)^3)
        (16_topopt.py:123)."""
        import jax.nn

        return median_filter_3x3(0.001 + jax.nn.sigmoid(rho) ** 3)

    def pde_loss(self, u, nu, bc1, bc2, f):
        dbc1 = jnp.mean(bc1 * (u - 1.0) ** 2)
        dbc2 = jnp.mean(bc2 * u**2)
        gp = self.gp_all(u, ("N", "dx", "dy"))
        nu_gp = self.gauss_pt_evaluation(nu)
        f_gp = self.gauss_pt_evaluation(f)
        w = jnp.asarray(self.gpw, u.dtype)
        res = w * (0.5 * nu_gp * (gp["dx"] ** 2 + gp["dy"] ** 2)
                   - gp["N"] * f_gp)
        return jnp.mean(jnp.sum(res, -1)) + dbc1 + dbc2

    def compliance(self, u, nu, bc1, bc2, f):
        u = self.apply_dirichlet(u, bc1, 1.0)
        u = self.apply_dirichlet(u, bc2, 0.0)
        u_gp = self.gauss_pt_evaluation(u)
        f_gp = self.gauss_pt_evaluation(f)
        w = jnp.asarray(self.gpw, u.dtype)
        return jnp.mean(jnp.sum(-w * u_gp * f_gp, -1))

    def vf_loss(self, nu):
        return (jnp.sum(nu) / max(1, nu.shape[0]) - self.target_vf_sum) ** 2

    def _unpack(self, pred, inputs_tensor, forcing_tensor):
        u, rho = pred
        u = _squeeze_field(u)
        rho = _squeeze_field(rho)
        nu = self.project_density(rho)
        bc1 = inputs_tensor[..., 0]
        bc2 = inputs_tensor[..., 1]
        f = _squeeze_field(forcing_tensor)
        return u, nu, bc1, bc2, f

    # alternating-optimizer protocol (reference 16_topopt.py:226-260)
    num_objectives = 3

    def objective_loss(self, idx, params, batch):
        inputs_tensor, forcing_tensor = batch
        pred = self.network.apply(params, inputs_tensor)
        return self.objective(idx, pred, inputs_tensor, forcing_tensor)

    def objective(self, idx, pred, inputs_tensor, forcing_tensor):
        u, nu, bc1, bc2, f = self._unpack(pred, inputs_tensor, forcing_tensor)
        if idx == 0:
            return self.pde_loss(u, nu, bc1, bc2, f)
        if idx == 1:
            return self.compliance(u, nu, bc1, bc2, f)
        return self.vf_loss(nu)

    def loss(self, pred, inputs_tensor, forcing_tensor):
        u, nu, bc1, bc2, f = self._unpack(pred, inputs_tensor, forcing_tensor)
        w0, w1, w2 = self.weights
        return (w0 * self.pde_loss(u, nu, bc1, bc2, f)
                + w1 * self.compliance(u, nu, bc1, bc2, f)
                + w2 * self.vf_loss(nu))
