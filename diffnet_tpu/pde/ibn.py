"""Immersed-Boundary Network (IBN) parametric Poisson modules — the flagship
path of the reference (arXiv:2211.03241; examples/poisson/parametric/
IBN_2D.py:111-168, IBN/poisson-3d/parametric/IBN_3D.py:109-161, and the
Neumann variant e2_cib_neumann.py:33-61).

Pipeline per batch: oriented point cloud -> generalized winding number on the
node grid -> threshold -> characteristic function chi -> network(chi) -> u ->
immersed Dirichlet masking -> Ritz energy loss. Image-ensemble IBN (chi given
directly as a dataset channel) is the same module with
``source_from='inputs'``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.geometry import occupancy_from_cloud
from .base import FEM2DModule, FEM3DModule
from .poisson import poisson_energy_loss


class IBNPoisson2D(FEM2DModule):
    """Parametric immersed-boundary Poisson in 2D.

    source_from:
      * 'winding' — batch = (cloud[B, Np, 5], forcing, sink); chi computed
        on-device from the winding number (IBN_2D.py:136-148)
      * 'inputs'  — batch = (inputs[B, H, W, C], forcing); chi = inputs[...,1]
        (e1_complex_immersed_background.py:33-58)
    neumann: zero diffusivity inside the object instead of Dirichlet-1
      (e2_cib_neumann.py:33-61), with bc2/bc3 outer Dirichlet masks.
    """

    def __init__(self, network=None, dataset=None, source_from="winding",
                 winding_threshold=0.5, neumann=False,
                 ibn_loss_type="energy", network_input="chi", **kwargs):
        super().__init__(network, dataset, **kwargs)
        self.source_from = source_from
        self.winding_threshold = winding_threshold
        self.neumann = neumann
        # 'energy' (IBN_2D.py:116-134) or 'resmin' — the winding-number
        # Galerkin-residual variant (09_airfoil.py loss_poisson_windingnumber,
        # examples/eiqonal/parametric/09_airfoil.py:238-291)
        self.ibn_loss_type = ibn_loss_type
        # 'chi' (default: net consumes the occupancy grid) or 'cloud'
        # (net consumes the raw point cloud, e.g. DGCNN2D / ImmDiff)
        self.network_input = network_input

    # -- forward ---------------------------------------------------------
    def forward(self, params, batch):
        if self.source_from == "winding":
            cloud, forcing, sink = batch
            pts = cloud[..., 0:2]
            nrm = cloud[..., 2:4]
            area = cloud[..., 4]
            chi = occupancy_from_cloud(
                pts, nrm, area,
                (self.domain_sizeY, self.domain_sizeX),
                (self.domain_lengthX, self.domain_lengthY),
                threshold=self.winding_threshold)
            source = chi[..., None]  # [B, H, W, 1]
            if self.network_input == "cloud":
                # point-cloud-consuming networks (DGCNN / ImmDiff): the net
                # maps the raw cloud to the solution grid (reference
                # IBN_DGCNN2d wrapper, immdiff_networks.py:119-135); the
                # winding chi is still used for the immersed masking
                u = self.network.apply(params, cloud[..., 0:2])
            else:
                u = self.network.apply(params, source)
            inputs = jnp.concatenate(
                [jnp.ones_like(source), source, sink], axis=-1)
            return u, inputs, forcing
        inputs, forcing = batch
        u = self.network.apply(params, inputs)
        return u, inputs, forcing

    def init_params(self, rng, sample_batch):
        if self.source_from == "winding":
            if self.network_input == "cloud":
                return self.network.init(rng, sample_batch[0][..., 0:2])
            b = sample_batch[0].shape[0]
            chi = jnp.zeros((b, self.domain_sizeY, self.domain_sizeX, 1))
            return self.network.init(rng, chi)
        return super().init_params(rng, sample_batch)

    def apply_bcs(self, u, inputs_tensor):
        """Immersed Dirichlet substitution — the same masking loss()
        applies, exposed for query/viz/L2 tooling (train/query.py,
        utils/viz.py call module.apply_bcs on predictions; the 3D sibling
        always had this override)."""
        if u.ndim == inputs_tensor.ndim:
            u = u[..., 0]
        if self.neumann:
            u = self.apply_dirichlet(u, inputs_tensor[..., 2], 1.0)
            if inputs_tensor.shape[-1] > 3:
                u = self.apply_dirichlet(u, inputs_tensor[..., 3], 0.0)
            return u
        u = self.apply_dirichlet(u, inputs_tensor[..., 1], 1.0)
        return self.apply_dirichlet(u, inputs_tensor[..., 2], 0.0)

    # -- loss ------------------------------------------------------------
    def loss(self, u, inputs_tensor, forcing_tensor):
        if u.ndim == inputs_tensor.ndim:
            u = u[..., 0]
        nu = inputs_tensor[..., 0]
        bc1 = inputs_tensor[..., 1]
        bc2 = inputs_tensor[..., 2]
        f = forcing_tensor[..., 0] if forcing_tensor.ndim == u.ndim + 1 \
            else forcing_tensor

        if self.neumann:
            # natural zero-flux at the immersed boundary: nu := 0 inside;
            # the Dirichlet sets are bc2 (=1.0) and bc3 (=0.0) — bc1 is
            # the object interior, NOT constrained
            nu = jnp.where(bc1 > 0.5, jnp.zeros_like(nu), nu)
            dirichlet = bc2
            if inputs_tensor.shape[-1] > 3:
                dirichlet = jnp.maximum(bc2, inputs_tensor[..., 3])
        else:
            dirichlet = jnp.maximum(bc1, bc2)
        u = self.apply_bcs(u, inputs_tensor)

        if self.ibn_loss_type == "resmin":
            # one canonical residual implementation (pde/poisson.py);
            # rows zeroed exactly on the CONSTRAINED node set: with
            # neumann=True the object-interior (bc1) equations stay live —
            # they are what determines u inside under nu = 0
            from .poisson import poisson_resmin_residual
            R = poisson_resmin_residual(
                self, u, self.gauss_pt_evaluation(nu),
                self.gauss_pt_evaluation(f), dirichlet)
            return jnp.sum(R**2)
        # reference IBN uses gpw-only weighting (IBN_2D.py:129-130)
        w = jnp.asarray(self.gpw, u.dtype)
        return poisson_energy_loss(self, u, nu, f, w)


class IBNPoisson3D(FEM3DModule):
    """3D parametric IBN on voxel/topology ensembles
    (IBN/poisson-3d/parametric/IBN_3D.py:109-161). Batch = (inputs[B, D, H,
    W, C], forcing); chi = inputs[..., 1]."""

    def __init__(self, network=None, dataset=None, **kwargs):
        super().__init__(network, dataset, **kwargs)

    def apply_bcs(self, u, inputs_tensor):
        if u.ndim == inputs_tensor.ndim:
            u = u[..., 0]
        u = self.apply_dirichlet(u, inputs_tensor[..., 1], 1.0)
        return self.apply_dirichlet(u, inputs_tensor[..., 2], 0.0)

    def loss(self, u, inputs_tensor, forcing_tensor):
        u = self.apply_bcs(u, inputs_tensor)
        nu = inputs_tensor[..., 0]
        f = forcing_tensor[..., 0] if forcing_tensor.ndim == u.ndim + 1 \
            else forcing_tensor
        w = jnp.asarray(self.gpw, u.dtype)
        return poisson_energy_loss(self, u, nu, f, w)
