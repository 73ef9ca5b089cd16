"""Eikonal equation / signed-distance reconstruction from point clouds.

Reference: examples/eiqonal/single_instance/e01_curve_reconstruction.py
(loss4, lines 453-565) and the FDM variant (lossFDM, 234-285). Three-part
loss for |grad u| = 1 with zero level set on the cloud:

  * domain residual (stabilized weak form, tau = 0.25, e01:217):
      R_i = ∫ tau u (grad N_i · grad u) + (1+tau) N_i (|grad u|^2 - 1)
  * zero-level:  sum_p u(p)^2            (cloud points on the curve)
  * normal alignment: sum_p (grad u(p)·n_p - 1)^2

Point evaluation via :func:`diffnet_tpu.core.interp.grid_interp_2d`.
Batch = (cloud[B, Np, >=4], forcing) with cloud columns (x, y, nx, ny, ...).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.interp import grid_interp_2d, grid_interp_3d
from .base import FEM2DModule, FEM3DModule
from .poisson import _squeeze_field


def signed_occupancy_init(points, normals, areas, grid_shape, scale=0.1):
    """Crude signed initialization for direct-field eikonal solves:
    +scale outside / -scale inside from the winding-number occupancy.
    The eikonal landscape is nonconvex; starting from a field with the right
    sign structure (which the reference obtains implicitly through its
    network parameterization) is what makes direct LBFGS solves converge.
    2D or 3D by len(grid_shape)."""
    from ..core.geometry import occupancy_from_cloud, occupancy_from_cloud_3d

    occ = (occupancy_from_cloud if len(grid_shape) == 2
           else occupancy_from_cloud_3d)
    chi = occ(points, normals, areas, grid_shape)
    return scale * (1.0 - 2.0 * chi)


class Eikonal2D(FEM2DModule):
    def __init__(self, network=None, dataset=None, tau=0.25,
                 sdf_weight=1.0, normals_weight=1.0, **kwargs):
        super().__init__(network, dataset, **kwargs)
        self.tau = float(tau)
        self.sdf_weight = float(sdf_weight)
        self.normals_weight = float(normals_weight)
        self.exact_solution = kwargs.get("exact_solution", None)

    def domain_residual(self, u):
        """DELIBERATE deviation from the cited reference loss4
        (e01_curve_reconstruction.py:485-486): the rhs here is
        (1+tau)*N*1 instead of the reference's N*1, so the converged
        field satisfies |grad u| = 1 exactly rather than
        ~1/(1+tau) ≈ 0.8 — the stated physics of the SDF reconstruction
        (tests pin mean |u - sdf| against the analytic distance)."""
        tau = self.tau
        gp = self.gp_all(u, ("N", "dx", "dy"))
        grad2 = gp["dx"] ** 2 + gp["dy"] ** 2
        R = self.assemble_multi([
            (tau * gp["N"] * gp["dx"], "dx"),
            (tau * gp["N"] * gp["dy"], "dy"),
            ((1.0 + tau) * (grad2 - 1.0), "N")])
        return R

    def loss(self, u, cloud, forcing_tensor):
        u = _squeeze_field(u)
        pts = cloud[..., 0:2]
        normals = cloud[..., 2:4]
        R1 = self.domain_residual(u)
        u_pts, grad_pts = grid_interp_2d(u, pts, (self.hx, self.hy),
                                         deg=self.fem_basis_deg)
        sdf_recon = jnp.sum(u_pts**2)
        normals_loss = jnp.sum(
            (jnp.sum(grad_pts * normals, -1) - 1.0) ** 2)
        return (jnp.sqrt(jnp.sum(R1**2) + 1e-12)
                + self.sdf_weight * sdf_recon
                + self.normals_weight * normals_loss)

    def forward(self, params, batch):
        cloud, forcing = batch
        u = self.network.apply(params, cloud)
        return u, cloud, forcing

    def init_params(self, rng, sample_batch):
        return self.network.init(rng, sample_batch[0])


class Eikonal3D(FEM3DModule):
    """3D signed-distance reconstruction from an oriented surface cloud —
    reference examples/eiqonal/single_instance/05_3d_sphere_loss4.py
    (loss4, lines 272-345) and 04_3d_sphere_recon.py.

    Same three-part loss as :class:`Eikonal2D` with the z terms added:
    tau-stabilized domain eikonal residual + cloud zero-level +
    normal alignment. The reference's 3D normal term is a component-wise
    MSE of grad u(p) against the unit normals (05_3d:345) rather than the
    2D script's (grad·n - 1)^2; with unit normals and the zero-level term
    active the minimizers agree — component form used here.

    Batch = (cloud[B, Np, >=6], forcing) with columns
    (x, y, z, nx, ny, nz[, area...]).
    """

    def __init__(self, network=None, dataset=None, tau=0.25,
                 sdf_weight=1.0, normals_weight=1.0, **kwargs):
        super().__init__(network, dataset, **kwargs)
        self.tau = float(tau)
        self.sdf_weight = float(sdf_weight)
        self.normals_weight = float(normals_weight)
        self.exact_solution = kwargs.get("exact_solution", None)

    def domain_residual(self, u):
        """Same deliberate (1+tau) rhs scaling as Eikonal2D.domain_residual
        (the converged field satisfies |grad u| = 1 exactly; the cited
        reference rhs N*1 converges to ~1/(1+tau))."""
        tau = self.tau
        gp = self.gp_all(u, ("N", "dx", "dy", "dz"))
        grad2 = gp["dx"] ** 2 + gp["dy"] ** 2 + gp["dz"] ** 2
        return self.assemble_multi([
            (tau * gp["N"] * gp["dx"], "dx"),
            (tau * gp["N"] * gp["dy"], "dy"),
            (tau * gp["N"] * gp["dz"], "dz"),
            ((1.0 + tau) * (grad2 - 1.0), "N")])

    def loss(self, u, cloud, forcing_tensor):
        u = _squeeze_field(u)
        pts = cloud[..., 0:3]
        normals = cloud[..., 3:6]
        R1 = self.domain_residual(u)
        u_pts, grad_pts = grid_interp_3d(
            u, pts, (self.hx, self.hy, self.hz), deg=self.fem_basis_deg)
        sdf_recon = jnp.sum(u_pts**2)
        normals_loss = jnp.sum((grad_pts - normals) ** 2)
        return (jnp.sqrt(jnp.sum(R1**2) + 1e-12)
                + self.sdf_weight * sdf_recon
                + self.normals_weight * normals_loss)

    def forward(self, params, batch):
        cloud, forcing = batch
        u = self.network.apply(params, cloud)
        return u, cloud, forcing

    def init_params(self, rng, sample_batch):
        return self.network.init(rng, sample_batch[0])


def eikonal_gn_residual(module, cloud):
    """Least-squares residual builder for :func:`train.linear.
    gauss_newton_solve` on an eikonal module (2D or 3D): stacks the
    assembled domain residual with the weighted cloud zero-level and
    normal-alignment equations (the same three terms as ``loss`` with
    the sqrt taken per-equation instead of on the sums). Solves the
    reconstruction in a couple of seconds where the LBFGS training path
    needs hundreds of epochs:

        r = eikonal_gn_residual(m, cloud)       # cloud [1, Np, >=2*nsd]
        u, info = gauss_newton_solve(r, u0, lm=1e-4)
    """
    nsd = module.nsd
    jc = jnp.asarray(cloud)
    pts = jc[..., 0:nsd]
    normals = jc[..., nsd:2 * nsd]
    sw = float(module.sdf_weight) ** 0.5
    nw = float(module.normals_weight) ** 0.5
    if nsd == 2:
        interp = lambda u: grid_interp_2d(
            u, pts, (module.hx, module.hy), deg=module.fem_basis_deg)
    else:
        interp = lambda u: grid_interp_3d(
            u, pts, (module.hx, module.hy, module.hz),
            deg=module.fem_basis_deg)

    def residual(u):
        R1 = module.domain_residual(u[None])[0]
        u_pts, grad_pts = interp(u[None])
        zl = sw * u_pts[0]
        if nsd == 2:
            na = nw * (jnp.sum(grad_pts[0] * normals[0], -1) - 1.0)
        else:
            na = nw * (grad_pts[0] - normals[0]).reshape(-1)
        return {"domain": R1, "zero_level": zl, "normals": na}

    return residual


class EikonalFDM2D(Eikonal2D):
    """FDM variant: R1 = |grad u|^2 - 1 via stencils, mean-square over the
    grid, plus the same cloud terms (reference lossFDM, e01:234-285)."""

    def __init__(self, network=None, dataset=None, **kwargs):
        super().__init__(network, dataset, **kwargs)
        from ..core.fdm import make_fdm

        # actual X node count, not the scalar-alias default (the FDM
        # stencil scale bakes (n-1) in; same bug class as the base.py h
        # aliases). Square unit domains only — the FDM taps assume
        # isotropic unit-length spacing.
        if (self.domain_sizeX != self.domain_sizeY
                or (self.domain_lengthX, self.domain_lengthY) != (1.0, 1.0)):
            raise ValueError("EikonalFDM2D supports square unit domains "
                             "(the FDM stencil scale assumes them)")
        self.fdm = make_fdm(2, self.domain_sizeX)

    def loss(self, u, cloud, forcing_tensor):
        u = _squeeze_field(u)
        pts = cloud[..., 0:2]
        normals = cloud[..., 2:4]
        ux = self.fdm.dx(u, mode="full")
        uy = self.fdm.dy(u, mode="full")
        R1 = ux**2 + uy**2 - 1.0
        u_pts, grad_pts = grid_interp_2d(u, pts, (self.hx, self.hy),
                                         deg=self.fem_basis_deg)
        sdf_recon = jnp.sum(u_pts**2)
        normals_loss = (jnp.sum((grad_pts[..., 0] - normals[..., 0]) ** 2)
                        + jnp.sum((grad_pts[..., 1] - normals[..., 1]) ** 2))
        return (jnp.mean(R1**2) + self.sdf_weight * sdf_recon
                + self.normals_weight * normals_loss)
