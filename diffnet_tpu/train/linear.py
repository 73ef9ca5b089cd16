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

__all__ = ["solve_linear", "module_linear_solve"]


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
