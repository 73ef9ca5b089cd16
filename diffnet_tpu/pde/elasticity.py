"""Linear elasticity: FSDT (Mindlin-Reissner) plate bending.

Reference: examples/elasticity/single_instance/e1_plate_bending_fsdt.py:89-232.
Fields (w, phi_x, phi_y); bending stiffnesses D_11/D_22/D_12/D_66, shear
A_44/A_55 with correction K_s; moments M_xx/M_yy/M_xy and shears Q_x/Q_y;
three assembled Galerkin residuals:

  R_w   = ∫ grad(N)·(Q_x, Q_y) - ∫ N q
  R_phx = ∫ (N_x M_xx + N_y M_xy + N Q_x)
  R_phy = ∫ (N_x M_xy + N_y M_yy + N Q_y)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import FEM2DModule
from .poisson import _squeeze_field


class ElasticFSDT(FEM2DModule):
    def __init__(self, network=None, dataset=None, E=1.0, nu_poisson=0.25,
                 thickness=0.1, K_s=1.0, q_load=1.0, **kwargs):
        super().__init__(network, dataset, **kwargs)
        v, h = nu_poisson, thickness
        self.E, self.nu_poisson, self.thickness, self.K_s = E, v, h, K_s
        self.q_load = q_load
        self.D_11 = (E * h**3) / (12 * (1 - v**2))
        self.D_22 = self.D_11
        self.D_12 = (E * v * h**3) / (12 * (1 - v**2))
        self.D_66 = (E * h**3) / (12 * (1 + v))
        self.A_44 = (E * h) / (2 * (1 + v))
        self.A_55 = self.A_44
        zeros = np.zeros(self.node_shape, np.float32)
        self.w_bc = np.asarray(kwargs.get("w_bc", zeros), np.float32)
        self.phi_x_bc = np.asarray(kwargs.get("phi_x_bc", zeros), np.float32)
        self.phi_y_bc = np.asarray(kwargs.get("phi_y_bc", zeros), np.float32)
        self.loss_norm = kwargs.get("loss_norm", "frobenius")

    def _apply_field_bcs(self, pred, inputs):
        w, px, py = (_squeeze_field(f) for f in pred)
        bc2 = inputs[..., 3]
        sub = lambda f, bc_val: jnp.where(
            bc2 > 0.5,
            jnp.broadcast_to(jnp.asarray(bc_val, f.dtype), f.shape), f)
        return sub(w, self.w_bc), sub(px, self.phi_x_bc), sub(
            py, self.phi_y_bc), bc2

    def apply_bcs(self, pred, inputs_tensor):
        w, px, py, _ = self._apply_field_bcs(pred, inputs_tensor)
        return w, px, py

    def calc_residuals(self, pred, inputs_tensor, forcing_tensor):
        from ..core import fem

        w, phi_x, phi_y, bc2 = self._apply_field_bcs(pred, inputs_tensor)
        # one stacked contraction for all three fields (cf. flow.py)
        quants = ("N", "dx", "dy")
        allgp = fem.gp_eval_stacked(jnp.stack([w, phi_x, phi_y], 0),
                                    self.basis, quants)
        wgp = {q: allgp[0, ..., i, :] for i, q in enumerate(quants)}
        pxgp = {q: allgp[1, ..., i, :] for i, q in enumerate(quants)}
        pygp = {q: allgp[2, ..., i, :] for i, q in enumerate(quants)}

        Q_x = self.K_s * self.A_55 * (pxgp["N"] + wgp["dx"])
        Q_y = self.K_s * self.A_44 * (pygp["N"] + wgp["dy"])
        M_xx = self.D_11 * pxgp["dx"] + self.D_12 * pygp["dy"]
        M_yy = self.D_12 * pxgp["dx"] + self.D_22 * pygp["dy"]
        M_xy = self.D_66 * (pxgp["dy"] + pygp["dx"])
        q = jnp.full_like(wgp["N"], self.q_load)

        R1 = self.assemble_multi([(Q_x, "dx"), (Q_y, "dy"), (-q, "N")])
        R2 = self.assemble_multi([(M_xx, "dx"), (M_xy, "dy"), (Q_x, "N")])
        R3 = self.assemble_multi([(M_xy, "dx"), (M_yy, "dy"), (Q_y, "N")])
        z = jnp.zeros_like(R1)
        return (jnp.where(bc2 > 0.5, z, R1), jnp.where(bc2 > 0.5, z, R2),
                jnp.where(bc2 > 0.5, z, R3))

    def loss(self, pred, inputs_tensor, forcing_tensor):
        R1, R2, R3 = self.calc_residuals(pred, inputs_tensor, forcing_tensor)
        if self.loss_norm == "squared":
            return jnp.sum(R1**2) + jnp.sum(R2**2) + jnp.sum(R3**2)
        norm = lambda R: jnp.sqrt(jnp.sum(R**2) + 1e-12)
        return norm(R1) + norm(R2) + norm(R3)
