"""Poisson / diffusion PDE formulations.

Covers the reference's Poisson capability surface (SURVEY.md §2.4):
  * energy minimization (Ritz)            — examples/poisson/single_instance/0_base.py:31-56,
                                            parametric IBN variant e1_complex_immersed_background.py:33-58
  * Galerkin residual minimization        — examples/poisson/single_instance/e8_2d_poisson_mms.py:92-150,
    (with optional left preconditioner)     tests/test.py:36-79, tests/test3D.py:36-85
  * strong-form collocation (deg>=2)      — 10_manufactured_strong_form_higher_order.py:70-97
  * FDM strong form                       — 12_fdm_mms.py:76-118
all in 2D and 3D, batched, channels-last.

Every loss takes ``(u, inputs, forcing)`` where inputs stacks channels-last
masks ``[..., (nu, bc1, bc2, ...)]``; semantics of bc channels match the
reference datasets (bc1 = source/Dirichlet-1, bc2 = sink/Dirichlet-0 unless a
``dirichlet`` spec overrides).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import FDMModule, FEM2DModule, FEM3DModule

__all__ = [
    "poisson_energy_loss",
    "poisson_resmin_residual",
    "poisson_resmin_residual_et",
    "poisson_strong_form_loss",
    "Poisson2D",
    "Poisson3D",
    "PoissonFDM2D",
    "PoissonTwoDof2D",
]


def _squeeze_field(u):
    """Accept [B, ..., 1] network outputs and [B, ...] direct fields."""
    if u.shape[-1] == 1 and u.ndim >= 3:
        return u[..., 0]
    return u


def poisson_energy_loss(module, u, nu, f, jxw):
    """Ritz energy: sum_gp gpw*J*(0.5 nu |grad u|^2 - u f), per element, then
    mean over elements+batch (reference 0_base.py:45-56)."""
    gp = module.gp_all(u, ("N", "dx", "dy") + (("dz",) if module.nsd == 3 else ()))
    nu_gp = module.gauss_pt_evaluation(nu)
    f_gp = module.gauss_pt_evaluation(f)
    grad2 = gp["dx"] ** 2 + gp["dy"] ** 2
    if module.nsd == 3:
        grad2 = grad2 + gp["dz"] ** 2
    res = jxw * (0.5 * nu_gp * grad2 - gp["N"] * f_gp)
    return jnp.mean(jnp.sum(res, axis=-1))


def poisson_resmin_residual(module, u, nu_gp, f_gp, bc_mask):
    """Assembled Galerkin residual  R_i = ∫ nu ∇N_i·∇u - ∫ N_i f  with
    Dirichlet rows zeroed (reference e8_2d_poisson_mms.py:122-141)."""
    quants = ("dx", "dy") + (("dz",) if module.nsd == 3 else ())
    gp = module.gp_all(u, quants)
    terms = [(nu_gp * gp[q], q) for q in quants] + [(-f_gp, "N")]
    R = module.assemble_multi(terms)
    return jnp.where(bc_mask > 0.5, jnp.zeros_like(R), R)


def poisson_resmin_residual_et(module, u, nu, f_gp, bc_mask):
    """Element-tensor formulation of the same assembled Galerkin residual:
    contract the NODAL nu patches against the static [nbf,nbf,nbf] element
    tensor (one matmul), then a batched per-element matvec with the u patches
    — zero Gauss-point intermediates in HBM (see core/fem.py:element_action).
    Mathematically identical to :func:`poisson_resmin_residual` up to
    round-off; the production default for deg-1 grids."""
    from ..core import fem as _fem
    # the forcing projection folds into the same stencil pass (gp_terms):
    # a few extra madds per element instead of a separate projection
    # matmul + scatter round-trip
    R = _fem.element_action(u, nu, module._poisson_et_tensor, module.basis,
                            module.node_shape, gp_terms=[(-f_gp, "N")])
    return jnp.where(bc_mask > 0.5, jnp.zeros_like(R), R)


def poisson_strong_form_loss(module, u, nu_gp, f_gp, jxw):
    """Collocation on the strong form via FEM 2nd derivatives (needs deg>=2):
    mean_elem sum_gp gpw * ((lap u) + f)^2 (reference
    10_manufactured_strong_form_higher_order.py:84-97; nu multiplies the
    laplacian when non-unit)."""
    quants = ("d2x", "d2y") + (("d2z",) if module.nsd == 3 else ())
    gp = module.gp_all(u, quants)
    lap = gp["d2x"] + gp["d2y"]
    if module.nsd == 3:
        lap = lap + gp["d2z"]
    res = jxw * (nu_gp * lap + f_gp) ** 2
    return jnp.mean(jnp.sum(res, axis=-1))


class _PoissonCommon:
    """Shared loss dispatch for 2D/3D Poisson modules."""

    def _setup_poisson(self, **kwargs):
        self.loss_type = kwargs.get("loss_type", "energy")
        # resmin formulation: "et" (element-tensor stencil path, default for
        # deg-1 2D — fastest, see core/fem.py:element_action) or "gp"
        # (general Gauss-point pipeline, any degree; faster for 3D where the
        # trilinear stencil expansion is too wide).
        # deg-1 defaults to the fused element-tensor STENCIL expansion in
        # both 2D and 3D (core/fem.py::element_action; the 3D form was
        # re-measured 3.3x the GP pipeline scan-chained in round 4)
        default_form = "et" if self.basis.deg == 1 else "gp"
        self.residual_formulation = kwargs.get("residual_formulation",
                                               default_form)
        if self.residual_formulation not in ("et", "gp"):
            raise ValueError(
                f"residual_formulation must be 'et' or 'gp', got "
                f"{self.residual_formulation!r}")
        if self.residual_formulation == "et":
            from ..core import fem as _fem
            grads = ("dx", "dy") + (("dz",) if self.nsd == 3 else ())
            self._poisson_et_tensor = _fem.element_tensor(self.basis, grads)
        # Opt-in fused Pallas kernel path (ops/poisson_energy.py,
        # ops/poisson_residual.py): one HBM pass for the whole
        # eval->physics->assembly chain. Default OFF: on this image's axon
        # relay compiled Pallas launches hang (CLAUDE.md); enable on a
        # standard TPU runtime (or under interpret mode for testing).
        self.fused_kernels = bool(kwargs.get("fused_kernels", False))
        # kernel structure: 'dma' (manual halo-strip copies) or 'blockspec'
        # (whole field per program, no manual DMA — grid-size-guarded; see
        # ops/poisson_residual.py)
        # 3D default is the FOLDED-Z body (round 5: +39% over the rank-3
        # slab body same-window on-chip at the reference's 64^3 scale —
        # BENCH_MEASURED.md); 2D keeps 'dma'
        self.fused_variant = str(kwargs.get(
            "fused_variant", "dma" if self.nsd == 2 else "dmaf"))
        valid_variants = (("dma", "blockspec") if self.nsd == 2
                          else ("dma", "blockspec", "dmaf", "bsf"))
        if self.fused_variant not in valid_variants:
            raise ValueError(f"fused_variant must be one of "
                             f"{valid_variants}, got {self.fused_variant!r}")
        # Single-launch fused loss+grad (ops/poisson_loss_grad.py): the
        # whole value_and_grad of the resmin loss in ONE kernel pass
        # (VERDICT r4 #6). Opt-in; 2D resmin without precond only.
        self.fused_loss_grad = bool(kwargs.get("fused_loss_grad", False))
        if self.fused_loss_grad and not (
                self.fused_kernels and self.nsd == 2
                and self.loss_type == "resmin"
                and kwargs.get("precond", None) is None):
            raise ValueError(
                "fused_loss_grad requires fused_kernels=True, nsd=2, "
                "loss_type='resmin' and no precond")
        if self.fused_kernels:
            supported = (self.basis.deg == 1 and self.basis.ngp_1d == 2
                         and ((self.nsd == 2
                               and self.loss_type in ("energy", "resmin"))
                              or (self.nsd == 3
                                  and self.loss_type == "resmin")))
            if not supported:
                raise ValueError(
                    "fused_kernels supports deg-1 2-GP 2D energy/resmin and "
                    "3D resmin only")
            if (self.loss_type == "energy"
                    and kwargs.get("energy_weighting", "jxw") != "jxw"):
                raise ValueError(
                    "fused_kernels energy path is jxw-weighted only")
            if (self.loss_type == "energy"
                    and self.fused_variant != "dma"):
                raise ValueError("the fused energy kernel only has the "
                                 "'dma' variant")
        self.bc1_value = kwargs.get("bc1_value", 1.0)
        self.bc2_value = kwargs.get("bc2_value", 0.0)
        # Optional Dirichlet field for MMS resmin: u on bc2 nodes taken from
        # this array instead of bc2_value (reference e8: u_bc = u_exact)
        self.u_bc = kwargs.get("u_bc", None)
        # Optional dense left preconditioner [N, N] applied to vec(R)
        # (reference ILU factor, e8_2d_poisson_mms.py:67-68,143-149)
        self.precond = kwargs.get("precond", None)
        # reference energy losses use gpw-only weighting (no Jacobian) in the
        # parametric IBN examples, and (0.5 h)^2*gpw in 0_base. Controlled by:
        self.energy_weighting = kwargs.get("energy_weighting", "jxw")  # or "gpw"

    def _weights(self, dtype):
        if self.energy_weighting == "gpw":
            return jnp.asarray(self.gpw, dtype)
        return jnp.asarray(self.jxw, dtype)

    def apply_bcs(self, u, inputs_tensor):
        u = _squeeze_field(u)
        bc1 = inputs_tensor[..., 1]
        bc2 = inputs_tensor[..., 2]
        if self.u_bc is not None:
            u_bc = jnp.asarray(self.u_bc, u.dtype)
            return jnp.where(bc2 > 0.5, jnp.broadcast_to(u_bc, u.shape), u)
        u = self.apply_dirichlet(u, bc1, self.bc1_value)
        return self.apply_dirichlet(u, bc2, self.bc2_value)

    def residual_for_field(self, u, inputs_tensor, forcing_tensor):
        """Assembled Galerkin residual R(u) for a nodal field: Dirichlet
        data substituted into u, then the weak-form assembly, then rows
        zeroed on ALL substituted nodes (bc1 ∪ bc2 — the well-posed
        Dirichlet treatment). Affine in u, so it is the matrix-free
        operator for `train.linear.solve_linear` / `module_linear_solve`;
        shares the element-tensor / GP assembly with the training loss."""
        u = _squeeze_field(u)
        nu = inputs_tensor[..., 0]
        bc1 = inputs_tensor[..., 1]
        bc2 = inputs_tensor[..., 2]
        if self.u_bc is not None:
            u_bc = jnp.asarray(self.u_bc, u.dtype)
            u = jnp.where(bc2 > 0.5, jnp.broadcast_to(u_bc, u.shape), u)
            bc_mask = bc2
        else:
            u = self.apply_dirichlet(u, bc1, self.bc1_value)
            u = self.apply_dirichlet(u, bc2, self.bc2_value)
            bc_mask = jnp.maximum(bc1, bc2)
        if getattr(self, "f_gp", None) is not None:
            f_gp = jnp.asarray(self.f_gp, u.dtype)
        else:
            f_gp = self.gauss_pt_evaluation(_squeeze_field(forcing_tensor))
        if self.fused_kernels and self.loss_type == "resmin":
            # Pallas fused path: Krylov/MG matvecs through
            # module_linear_solve then cost ONE u+nu-in / R-out HBM pass
            # instead of the ~11-field assembled-stencil pass (VERDICT r3
            # item 1c). Same numbers as the et/gp paths (pinned by tests).
            from ..core import fem as _fem
            from ..ops import poisson_residual_fused
            from ..ops.poisson_residual_3d import poisson_residual_fused_3d
            fused = (poisson_residual_fused if self.nsd == 2
                     else poisson_residual_fused_3d)
            Nf = _fem.galerkin_project(f_gp, self.basis, "N",
                                       u.shape[-self.nsd:])
            return fused(u, nu, Nf, bc_mask, self.basis,
                         variant=self.fused_variant)
        if self.residual_formulation == "et":
            return poisson_resmin_residual_et(self, u, nu, f_gp, bc_mask)
        return poisson_resmin_residual(
            self, u, self.gauss_pt_evaluation(nu), f_gp, bc_mask)

    def loss(self, u, inputs_tensor, forcing_tensor):
        u = _squeeze_field(u)
        nu = inputs_tensor[..., 0]
        bc1 = inputs_tensor[..., 1]
        bc2 = inputs_tensor[..., 2]
        f = _squeeze_field(forcing_tensor)

        if self.u_bc is not None:
            u_bc = jnp.asarray(self.u_bc, u.dtype)
            u = jnp.where(bc2 > 0.5, jnp.broadcast_to(u_bc, u.shape), u)
        else:
            u = self.apply_dirichlet(u, bc1, self.bc1_value)
            u = self.apply_dirichlet(u, bc2, self.bc2_value)

        w = self._weights(u.dtype)
        if self.loss_type == "energy":
            if self.fused_kernels and self.energy_weighting == "jxw":
                from ..ops import poisson_energy_fused
                return poisson_energy_fused(u, nu, f, self.basis)
            return poisson_energy_loss(self, u, nu, f, w)

        if getattr(self, "f_gp", None) is not None:
            f_gp = jnp.asarray(self.f_gp, u.dtype)
        else:
            f_gp = self.gauss_pt_evaluation(f)

        if self.loss_type == "resmin":
            if self.fused_kernels:
                from ..core import fem as _fem
                from ..ops import poisson_residual_fused
                from ..ops.poisson_residual_3d import poisson_residual_fused_3d
                Nf = _fem.galerkin_project(f_gp, self.basis, "N",
                                           u.shape[-self.nsd:])
                if self.fused_loss_grad:
                    from ..ops.poisson_loss_grad import (
                        poisson_resmin_loss_fused)
                    return poisson_resmin_loss_fused(u, nu, Nf, bc2,
                                                     self.basis)
                fused = (poisson_residual_fused if self.nsd == 2
                         else poisson_residual_fused_3d)
                R = fused(u, nu, Nf, bc2, self.basis,
                          variant=self.fused_variant)
            elif self.residual_formulation == "et":
                R = poisson_resmin_residual_et(self, u, nu, f_gp, bc2)
            else:
                R = poisson_resmin_residual(
                    self, u, self.gauss_pt_evaluation(nu), f_gp, bc2)
            if self.precond is not None:
                P = jnp.asarray(self.precond, u.dtype)
                Rv = R.reshape(R.shape[0], -1)
                R = Rv @ P.T
            return jnp.sum(R**2)
        if self.loss_type == "strong":
            return poisson_strong_form_loss(
                self, u, self.gauss_pt_evaluation(nu), f_gp, w)
        raise ValueError(f"unknown loss_type {self.loss_type!r}")


class Poisson2D(_PoissonCommon, FEM2DModule):
    """2D Poisson with energy/resmin/strong loss (see module docstring).

    MMS convenience: pass ``exact_solution(x, y)`` and ``forcing(x, y)``
    callables to precompute ``f_gp`` and Dirichlet data at Gauss points
    (reference e8_2d_poisson_mms.py:46-49)."""

    def __init__(self, network=None, dataset=None, **kwargs):
        super().__init__(network, dataset, **kwargs)
        self._setup_poisson(**kwargs)
        self.exact_solution = kwargs.get("exact_solution", None)
        forcing = kwargs.get("forcing", None)
        self.f_gp = None
        if forcing is not None:
            self.f_gp = np.asarray(forcing(self.xgp, self.ygp), np.float32)
        if kwargs.get("mms_dirichlet", False) and self.exact_solution:
            self.u_bc = np.asarray(
                self.exact_solution(self.xx, self.yy), np.float32)


class Poisson3D(_PoissonCommon, FEM3DModule):
    """3D Poisson (reference tests/test3D.py, 9_voxel_3d.py, IBN_3D.py)."""

    def __init__(self, network=None, dataset=None, **kwargs):
        super().__init__(network, dataset, **kwargs)
        self._setup_poisson(**kwargs)
        self.exact_solution = kwargs.get("exact_solution", None)
        forcing = kwargs.get("forcing", None)
        self.f_gp = None
        if forcing is not None:
            self.f_gp = np.asarray(
                forcing(self.xgp, self.ygp, self.zgp), np.float32)
        if kwargs.get("mms_dirichlet", False) and self.exact_solution:
            self.u_bc = np.asarray(
                self.exact_solution(self.xx, self.yy, self.zz), np.float32)


class PoissonTwoDof2D(FEM2DModule):
    """Mixed first-order ('two extra dofs') strong form: unknowns
    (u, mx, my) with the flux variables m = nu grad u carried as their own
    fields so only FIRST derivatives appear — usable at deg 1, unlike the
    second-derivative collocation loss (reference
    examples/poisson/single_instance/
    11_manufactured_strong_form_two_dofs.py:37-71):

        L = mean_e[ sum_gp gpw ((mx - nu u_x)^2 + (my - nu u_y)^2)
                               + gpw ((mx_x + my_y) + f)^2 ]

    i.e. flux matching plus the conservation law div m + f = 0
    (-div(nu grad u) = f). Dirichlet: u = 1 on bc1, u = 0 on bc2
    (the reference's where-substitutions, lines 50-51); the flux fields
    are unconstrained. ``pred`` is a tuple/list (u, mx, my) (e.g.
    ``DirectField(n_fields=3)``) or a stacked [..., 3] channels-last
    tensor; inputs channels (nu, bc1, bc2).
    """

    def __init__(self, network=None, dataset=None, **kwargs):
        super().__init__(network, dataset, **kwargs)

    def _split(self, pred):
        if isinstance(pred, (tuple, list)):
            return tuple(_squeeze_field(f) for f in pred)
        return pred[..., 0], pred[..., 1], pred[..., 2]

    def apply_bcs(self, pred, inputs_tensor):
        u, mx, my = self._split(pred)
        u = self.apply_dirichlet(u, inputs_tensor[..., 1], 1.0)
        u = self.apply_dirichlet(u, inputs_tensor[..., 2], 0.0)
        return u, mx, my

    def loss(self, pred, inputs_tensor, forcing_tensor):
        u, mx, my = self.apply_bcs(pred, inputs_tensor)
        nu = inputs_tensor[..., 0]
        f = _squeeze_field(forcing_tensor)

        # one fused contraction for all three fields x (N, dx, dy)
        quants = ("N", "dx", "dy")
        from ..core import fem
        stacked = jnp.stack([u, mx, my], axis=0)
        allgp = fem.gp_eval_stacked(stacked, self.basis, quants)
        ugp = {q: allgp[0, ..., i, :] for i, q in enumerate(quants)}
        mxgp = {q: allgp[1, ..., i, :] for i, q in enumerate(quants)}
        mygp = {q: allgp[2, ..., i, :] for i, q in enumerate(quants)}
        nu_gp = self.gauss_pt_evaluation(nu)
        f_gp = self.gauss_pt_evaluation(f)

        w = jnp.asarray(self.gpw, u.dtype)  # gpw-only (reference line 66)
        res1 = ((mxgp["N"] - nu_gp * ugp["dx"]) ** 2
                + (mygp["N"] - nu_gp * ugp["dy"]) ** 2)
        res2 = (mxgp["dx"] + mygp["dy"] + f_gp) ** 2
        return jnp.mean(jnp.sum(w * (res1 + res2), axis=-1))


class PoissonFDM2D(FDMModule):
    """FDM strong-form Poisson: res = f + ∇u·∇nu + nu Δu on the interior,
    loss = per-sample 2-norm (reference 12_fdm_mms.py:76-118)."""

    def __init__(self, network=None, dataset=None, **kwargs):
        super().__init__(network, dataset, **kwargs)

    def loss(self, u, inputs_tensor, forcing_tensor):
        u = _squeeze_field(u)
        nu = inputs_tensor[..., 0]
        bc2 = inputs_tensor[..., 2]
        f = _squeeze_field(forcing_tensor)
        u = self.apply_dirichlet(u, bc2, 0.0)

        ux = self.fdm.dx(u)
        uy = self.fdm.dy(u)
        lap = self.fdm.dxx(u) + self.fdm.dyy(u)
        nux = self.fdm.dx(nu)
        nuy = self.fdm.dy(nu)
        # align interiors: first-derivative stencils shrink by k1 rings
        # (k1 = 1 for 3-pt, 2 for 5-pt) while the 3-pt laplacian shrinks 1;
        # crop everything to the common interior
        k1 = (self.fdm.num_pt - 1) // 2
        m = max(k1, 1)

        def crop(a, k):
            d = m - k
            return a[..., d:a.shape[-2] - d, d:a.shape[-1] - d] if d else a

        res = (f[..., m:-m, m:-m] + crop(ux, k1) * crop(nux, k1)
               + crop(uy, k1) * crop(nuy, k1)
               + nu[..., m:-m, m:-m] * crop(lap, 1))
        return jnp.linalg.norm(res.reshape(res.shape[0], -1), axis=1)
