"""Helmholtz equation: -lap(u) - k^2 u = f.

Reference: examples/poisson/single_instance/14_helmholtz_mms.py with datasets
RectangleHelmholtzManufactured / RectangleHelmholtzDeltaForce
(DiffNet/datasets/single_instances/rectangles.py:259-327). Galerkin residual:
R_i = ∫ grad(N_i)·grad(u) - k^2 ∫ N_i u - ∫ N_i f.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import FEM2DModule
from .poisson import _squeeze_field


class Helmholtz2D(FEM2DModule):
    def __init__(self, network=None, dataset=None, khh=0.5, **kwargs):
        super().__init__(network, dataset, **kwargs)
        self.khh = float(getattr(dataset, "khh", khh))
        self.exact_solution = kwargs.get("exact_solution", None)
        forcing = kwargs.get("forcing", None)
        self.f_gp = (np.asarray(forcing(self.xgp, self.ygp), np.float32)
                     if forcing is not None else None)

    def residual(self, u, f_gp, bc2):
        gp = self.gp_all(u, ("N", "dx", "dy"))
        R = self.assemble_multi([
            (gp["dx"], "dx"), (gp["dy"], "dy"),
            (-self.khh**2 * gp["N"] - f_gp, "N")])
        return jnp.where(bc2 > 0.5, jnp.zeros_like(R), R)

    def residual_for_field(self, u, inputs_tensor, forcing_tensor):
        """Affine residual map for train.linear (indefinite operator for
        khh*h > O(1): use method='bicgstab' or 'gmres')."""
        u = _squeeze_field(u)
        bc2 = inputs_tensor[..., 2]
        u = self.apply_dirichlet(u, bc2, 0.0)
        if self.f_gp is not None:
            f_gp = jnp.asarray(self.f_gp, u.dtype)
        else:
            f_gp = self.gauss_pt_evaluation(_squeeze_field(forcing_tensor))
        return self.residual(u, f_gp, bc2)

    def loss(self, u, inputs_tensor, forcing_tensor):
        u = _squeeze_field(u)
        bc2 = inputs_tensor[..., 2]
        f = _squeeze_field(forcing_tensor)
        u = self.apply_dirichlet(u, bc2, 0.0)
        f_gp = (jnp.asarray(self.f_gp, u.dtype) if self.f_gp is not None
                else self.gauss_pt_evaluation(f))
        R = self.residual(u, f_gp, bc2)
        return jnp.sum(R**2)
