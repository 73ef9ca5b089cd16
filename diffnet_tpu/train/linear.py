"""Matrix-free linear solvers over assembled Galerkin residuals.

For the LINEAR formulations (Poisson/diffusion, Helmholtz, Stokes) the
residual R(u) = A u - b is affine in the nodal field, so the solve is a
Krylov iteration on the matrix-free operator

    A u = R(u) - R(0),      b = -R(0)

with Dirichlet conditions already folded in by the module's masking (the
substituted rows are zeroed in R, so the Krylov iterates simply stay at
zero there and the module's BC substitution supplies the values).

This replaces hundreds of LBFGS epochs with tens of CG iterations for
single-instance solves — cond(A) iterations instead of cond(A)^2-flavored
least-squares descent — while reusing exactly the same fused residual
assembly (element-tensor / GP pipeline) the training path uses. The
reference has no counterpart (its only solver is torch-optimizer descent
on the loss); this is the framework's "conventional solver" escape hatch,
and it is how TopOpt2D.optimize solves its state equation
(pde/topopt.py::optimize).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["solve_linear", "module_linear_solve", "multigrid_preconditioner"]


def solve_linear(residual_fn: Callable, shape, method: str = "cg",
                 tol: float = 1e-8, maxiter: int | None = None,
                 M: Callable | None = None, x0=None):
    """Solve ``residual_fn(u) == 0`` for affine ``residual_fn``.

    residual_fn: nodal field ``[...shape]`` -> residual of the same shape
        (Dirichlet rows masked to zero, as every pde module's residual is).
    method: 'cg' (SPD operators: Poisson/diffusion energy Hessian),
        'bicgstab' (nonsymmetric/indefinite: Helmholtz, advection),
        'gmres'.
    M: optional preconditioner ``v -> M v`` (e.g. from utils.precond).

    Returns ``(u, info)`` like jax.scipy.sparse.linalg. Raises ValueError
    if the residual is detectably non-affine (checked to float tolerance
    with one extra residual evaluation at a random field).
    """
    zero = jnp.zeros(shape, jnp.float32)
    b = -residual_fn(zero)

    def A(u):
        return residual_fn(u) + b

    # affinity check: A(2x) == 2 A(x) for affine R with the SAME b
    probe = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    lin_err = jnp.linalg.norm(A(2.0 * probe) - 2.0 * A(probe))
    scale = jnp.linalg.norm(A(probe)) + 1e-30
    if float(lin_err / scale) > 1e-3:
        raise ValueError(
            "residual_fn is not affine in the field (relative linearity "
            f"defect {float(lin_err / scale):.2e}); use the training path "
            "or continuation for nonlinear formulations")

    if maxiter is None:
        maxiter = 10 * int(jnp.asarray(shape).prod() ** 0.5)
    solver = {"cg": jax.scipy.sparse.linalg.cg,
              "bicgstab": jax.scipy.sparse.linalg.bicgstab,
              "gmres": partial(jax.scipy.sparse.linalg.gmres,
                               solve_method="batched")}[method]
    kwargs = {"tol": tol, "maxiter": maxiter, "x0": x0}
    if M is not None:
        kwargs["M"] = M
    return solver(jax.jit(A), b, **kwargs)


def module_linear_solve(module, inputs_tensor=None, forcing_tensor=None,
                        method: str = "cg", tol: float = 1e-8,
                        maxiter: int | None = None, M=None):
    """Direct linear solve of a pde module's single-instance problem.

    Builds ``residual_fn(u)`` from the module's own loss machinery: the
    module must expose ``residual_for_field(u, inputs, forcing)`` or be a
    Poisson-family module whose resmin residual is reachable via
    ``training_residual``. Returns the solved NODAL field with the
    module's Dirichlet values substituted (the same field its training
    path would produce at convergence).
    """
    import numpy as np

    if inputs_tensor is None:
        if module.dataset is None:
            raise ValueError("no inputs given and module.dataset is None")
        inputs_tensor, forcing_tensor = module.dataset[0]
    inputs = jnp.asarray(inputs_tensor)[None]
    forcing = (jnp.asarray(forcing_tensor)[None]
               if forcing_tensor is not None else None)

    res_hook = getattr(module, "residual_for_field", None)
    if res_hook is None:
        raise ValueError(
            f"{type(module).__name__} does not expose residual_for_field; "
            "linear solves are wired for the Poisson/Helmholtz family")

    def residual_fn(u):
        return res_hook(u[None], inputs, forcing)[0]

    shape = module.node_shape
    u, info = solve_linear(residual_fn, shape, method=method, tol=tol,
                           maxiter=maxiter, M=M)
    # substitute the Dirichlet values the residual masking assumed
    apply_bcs = getattr(module, "apply_bcs", None)
    if apply_bcs is not None:
        u = apply_bcs(u[None], inputs)
        u = u[0] if not isinstance(u, tuple) else u[0][0]
    return np.asarray(u), info


def multigrid_preconditioner(module_factory, n_fine: int, n_coarse: int = 9,
                             n_smooth: int = 3, inputs_per_level=None,
                             nsd: int = 2):
    """Matrix-free geometric-multigrid V-cycle preconditioner M ~ A^-1 for
    :func:`solve_linear` on node-aligned grid hierarchies (n = 2^k + 1).

    TPU-idiomatic: every level's operator is the module's own fused
    residual assembly (element-tensor / GP pipeline), the prolongation is
    `train.continuation.prolong_field`, restriction is its exact adjoint
    (one `jax.vjp`), smoothing is damped Richardson with the step sized by
    a power-iteration estimate of ||A_l||, and the coarsest level is a
    dense pseudo-inverse built once by probing. All components are LINEAR,
    so M is a valid (fixed) preconditioner for CG.

    module_factory(n) -> module exposing residual_for_field (the same
    factory contract as `continuation.coarse_to_fine`). Returns (M, info)
    where M maps a fine-grid field to the V-cycle estimate of A^-1 v.
    """
    import numpy as np

    from .continuation import prolong_field

    # grid hierarchy n_fine -> ... -> n_coarse (node-aligned halvings)
    ns = [n_fine]
    while ns[-1] > n_coarse:
        nxt = (ns[-1] - 1) // 2 + 1
        if (ns[-1] - 1) % 2 or nxt < 3:
            break
        ns.append(nxt)

    ops, omegas = [], []
    for n in ns:
        m = module_factory(n)
        if inputs_per_level is not None:
            inputs, forcing = inputs_per_level(n)
        else:
            inputs, forcing = m.dataset[0]
        inputs = jnp.asarray(inputs)[None]
        forcing = jnp.asarray(forcing)[None] if forcing is not None else None

        def res(u, m=m, inputs=inputs, forcing=forcing):
            return m.residual_for_field(u[None], inputs, forcing)[0]

        zero = jnp.zeros((n,) * nsd, jnp.float32)
        b0 = res(zero)

        def A(u, res=res, b0=b0):
            return res(u) - b0

        A = jax.jit(A)
        # power iteration for ||A||_2 (A is symmetric for the Galerkin
        # stiffness); 20 steps is plenty for a smoothing-step bound
        v = jnp.asarray(np.random.default_rng(0).random((n,) * nsd),
                        jnp.float32)
        for _ in range(20):
            v = A(v)
            v = v / (jnp.linalg.norm(v) + 1e-30)
        lam = float(jnp.vdot(v, A(v)))
        ops.append(A)
        omegas.append(0.8 / max(lam, 1e-30))

    # coarsest: dense pseudo-inverse by probing (Dirichlet rows are zero
    # rows -> pinv leaves them at zero, which is exactly right)
    nc = ns[-1]
    ndof = nc ** nsd
    eye = np.eye(ndof, dtype=np.float32)
    cols = [np.asarray(ops[-1](jnp.asarray(
        eye[i].reshape((nc,) * nsd)))).reshape(-1) for i in range(ndof)]
    A0 = np.stack(cols, axis=1)
    # rcond cuts the near-null modes from the Dirichlet rows: with a
    # nonzero level forcing the A = R(u) - R(0) cancellation leaves f32
    # noise (~1e-7) in the masked rows, and the DEFAULT pinv cutoff kept
    # those as 1e-7-singular-value modes -> 1e14 entries in the inverse
    # (the coarse grid's true cond is ~(n_coarse-1)^2, far above 1e-5)
    A0_pinv = jnp.asarray(np.linalg.pinv(A0, rcond=1e-5), jnp.float32)

    def smooth(A, omega, u, b, k):
        for _ in range(k):
            u = u + omega * (b - A(u))
        return u

    def vcycle(level, b):
        A, omega = ops[level], omegas[level]
        if level == len(ns) - 1:
            return (A0_pinv @ b.reshape(-1)).reshape(b.shape)
        u = smooth(A, omega, jnp.zeros_like(b), b, n_smooth)
        r = b - A(u)
        # restriction = exact adjoint of the node-aligned prolongation
        coarse_shape = (ns[level + 1],) * nsd
        fine_shape = (ns[level],) * nsd
        _, vjp = jax.vjp(
            lambda c: prolong_field(c, fine_shape),
            jnp.zeros(coarse_shape, b.dtype))
        r_c = vjp(r)[0]
        e_c = vcycle(level + 1, r_c)
        u = u + prolong_field(e_c, fine_shape)
        return smooth(A, omega, u, b, n_smooth)

    M = jax.jit(lambda v: vcycle(0, v))
    return M, {"levels": ns, "omegas": omegas}
