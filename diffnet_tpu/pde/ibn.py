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

import jax
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
        # Dirichlet value INSIDE the immersed object: 1.0 is the IBN
        # source convention (IBN_2D.py:136-148); the parametric eikonal
        # ensemble pins the zero level set instead — u = 0 inside
        # (02_sum.py:160 ``u = where(winding > 0.1, u*0, u)``)
        self.bc1_value = float(kwargs.get("bc1_value", 1.0))
        # 'energy' (IBN_2D.py:116-134), 'resmin' — the winding-number
        # Galerkin-residual variant (09_airfoil.py loss_poisson_windingnumber,
        # examples/eiqonal/parametric/09_airfoil.py:238-291) — or 'mask':
        # supervised regression of the raw winding field
        # (08_disjoint_map.py:155-186; winding batches only)
        self.ibn_loss_type = ibn_loss_type
        # 'chi' (default: net consumes the occupancy grid), 'cloud'
        # (net consumes the raw point cloud, e.g. DGCNN2D / ImmDiff), or
        # 'cloud_normals' (net consumes (points, normals) — the
        # ImmDiffLargeNormals two-input variant,
        # examples/eiqonal/parametric/06_normals.py:192)
        self.network_input = network_input
        # weight on the VAE KL term when the network returns
        # (out, mu, logvar) — the ImmDiffVAE ensemble trainer
        # (examples/eiqonal/parametric/03_sum_vae.py)
        self.vae_kl_weight = float(kwargs.get("vae_kl_weight", 1e-4))

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
            u = self._apply_net(params, cloud, source)
            if isinstance(u, tuple):   # VAE head: (out, mu, logvar)
                u = u[0]
            inputs = jnp.concatenate(
                [jnp.ones_like(source), source, sink], axis=-1)
            return u, inputs, forcing
        inputs, forcing = batch
        u = self.network.apply(params, inputs)
        return u, inputs, forcing

    def _apply_net(self, params, cloud, source):
        """Raw network application — may return (out, mu, logvar) for VAE
        heads (callers that cannot consume the tuple take [0])."""
        if self.network_input == "cloud":
            # point-cloud-consuming networks (DGCNN / ImmDiff): the net
            # maps the raw cloud to the solution grid (reference
            # IBN_DGCNN2d wrapper, immdiff_networks.py:119-135); the
            # winding chi is still used for the immersed masking
            return self.network.apply(params, cloud[..., 0:2])
        if self.network_input == "cloud_normals":
            return self.network.apply(params, cloud[..., 0:2],
                                      cloud[..., 2:4])
        return self.network.apply(params, source)

    def training_loss(self, params, batch):
        """Adds the beta-weighted KL regularizer when the network is a VAE
        head (returns (out, mu, logvar) — ImmDiffVAE, 03_sum_vae.py);
        ibn_loss_type='mask' trains the net to REGRESS the raw winding
        field instead of solving the PDE (the disjoint-map trainer,
        examples/eiqonal/parametric/08_disjoint_map.py:155-186);
        otherwise identical to the base loss-of-forward."""

        def _fwd_loss(params, batch):
            if self.source_from != "winding":
                u, inputs, forcing = self.forward(params, batch)
                return jnp.mean(self.loss(u, inputs, forcing))
            cloud, forcing, sink = batch
            pts = cloud[..., 0:2]
            nrm = cloud[..., 2:4]
            area = cloud[..., 4]
            grid_args = (pts, nrm, area,
                         (self.domain_sizeY, self.domain_sizeX),
                         (self.domain_lengthX, self.domain_lengthY))
            if self.ibn_loss_type == "mask":
                from ..core.geometry import winding_grid
                w = winding_grid(*grid_args)
                u = self._apply_net(params, cloud, w[..., None])
                if isinstance(u, tuple):
                    u = u[0]
                u = u[..., 0] if u.ndim == w.ndim + 1 else u
                return jnp.mean((u - w) ** 2)
            chi = occupancy_from_cloud(
                *grid_args, threshold=self.winding_threshold)
            source = chi[..., None]
            u = self._apply_net(params, cloud, source)
            kl = 0.0
            if isinstance(u, tuple):
                u, mu, logvar = u
                kl = -0.5 * jnp.mean(jnp.sum(
                    1.0 + logvar - mu**2 - jnp.exp(logvar), axis=-1))
            inputs = jnp.concatenate(
                [jnp.ones_like(source), source, sink], axis=-1)
            return (jnp.mean(self.loss(u, inputs, forcing))
                    + self.vae_kl_weight * kl)

        if self.remat:
            return jax.checkpoint(_fwd_loss)(params, batch)
        return _fwd_loss(params, batch)

    def init_params(self, rng, sample_batch):
        if self.source_from == "winding":
            if self.network_input == "cloud":
                return self.network.init(rng, sample_batch[0][..., 0:2])
            if self.network_input == "cloud_normals":
                return self.network.init(rng, sample_batch[0][..., 0:2],
                                         sample_batch[0][..., 2:4])
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
        u = self.apply_dirichlet(u, inputs_tensor[..., 1], self.bc1_value)
        return self.apply_dirichlet(u, inputs_tensor[..., 2], 0.0)

    def residual_for_field(self, u, inputs_tensor, forcing_tensor):
        """Assembled Galerkin residual for the matrix-free Krylov path
        (train.linear.module_linear_solve): the immersed Poisson problem
        is AFFINE in u — Dirichlet substitution on the constrained set
        (object interior chi=bc1 plus any outer bc2), rows zeroed there.
        inputs channels (nu, bc1, bc2) — the stack forward() assembles.
        Gives the direct single-geometry solution the parametric-ensemble
        network is evaluated against (held-out-geometry ground truth)."""
        from .poisson import _squeeze_field, poisson_resmin_residual

        u = _squeeze_field(u)
        nu = inputs_tensor[..., 0]
        bc1 = inputs_tensor[..., 1]
        bc2 = inputs_tensor[..., 2]
        f = _squeeze_field(forcing_tensor)
        if self.neumann:
            nu = jnp.where(bc1 > 0.5, jnp.zeros_like(nu), nu)
            dirichlet = bc2
            if inputs_tensor.shape[-1] > 3:
                dirichlet = jnp.maximum(bc2, inputs_tensor[..., 3])
        else:
            dirichlet = jnp.maximum(bc1, bc2)
        u = self.apply_bcs(u, inputs_tensor)
        return poisson_resmin_residual(
            self, u, self.gauss_pt_evaluation(nu),
            self.gauss_pt_evaluation(f), dirichlet)

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
