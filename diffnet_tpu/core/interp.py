"""Interpolation of grid fields at arbitrary points (differentiable).

Reference counterpart: the floor-index gather + tensor-product basis
evaluation inlined in the eikonal examples
(examples/eiqonal/single_instance/e01_curve_reconstruction.py:490-528, also
examples/poisson/single_instance/pc_complex_immersed_background.py:126-165 —
a per-batch python loop of fancy-indexing). Here: one vmap'd gather + a
static-coefficient polynomial basis evaluation; value and gradient in one
pass; works for any basis degree.

Convention: fields are [..., y, x]; points are (x, y) in physical
coordinates; the grid spans [0, Lx] x [0, Ly] with element size h = (hx, hy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["grid_interp_2d", "grid_interp_3d"]


def _poly_coeffs(deg):
    """Static numpy coefficient matrices for N and dN (highest power first):
    [nbf_1d, deg+1] each."""
    nodes = np.linspace(-1.0, 1.0, deg + 1)
    N = []
    dN = []
    for i in range(deg + 1):
        p = np.poly1d([1.0])
        for j in range(deg + 1):
            if j != i:
                p *= np.poly1d([1.0, -nodes[j]]) / (nodes[i] - nodes[j])
        N.append(np.pad(p.coeffs, (deg + 1 - len(p.coeffs), 0)))
        d = p.deriv(1)
        dN.append(np.pad(d.coeffs, (deg + 1 - len(d.coeffs), 0)))
    return np.stack(N), np.stack(dN)


def grid_interp_2d(u: jax.Array, points: jax.Array, h: tuple[float, float],
                   deg: int = 1):
    """Bilinear (deg-1) / higher-order FEM interpolation of `u` at `points`.

    u: [B, ny, nx] nodal field; points: [B, Np, 2] (x, y) physical coords;
    h: element sizes (hx, hy). Returns (vals, grads) with vals [B, Np] and
    grads [B, Np, 2] = (du/dx, du/dy). Fully differentiable w.r.t. u and
    points.
    """
    hx, hy = h
    ny, nx = u.shape[-2:]
    nbf = deg + 1
    # same contract as the pde modules (base.py): without it the strided
    # gather silently drops the trailing rows/cols and points near the far
    # boundary extrapolate from the wrong element
    for name, n_ in (("x", nx), ("y", ny)):
        if (n_ - 1) % deg:
            raise ValueError(
                f"grid axis {name} has {n_} nodes, incompatible with "
                f"deg={deg}: need (n-1) % deg == 0")
    nelx = (nx - 1) // deg
    nely = (ny - 1) // deg

    ex = jnp.clip(jnp.floor(points[..., 0] / hx).astype(jnp.int32), 0,
                  nelx - 1)
    ey = jnp.clip(jnp.floor(points[..., 1] / hy).astype(jnp.int32), 0,
                  nely - 1)
    # local reference coords in [-1, 1]
    xi = (points[..., 0] - ex.astype(u.dtype) * hx) * 2.0 / hx - 1.0
    eta = (points[..., 1] - ey.astype(u.dtype) * hy) * 2.0 / hy - 1.0

    Nc, dNc = _poly_coeffs(deg)
    Nc = jnp.asarray(Nc, u.dtype)
    dNc = jnp.asarray(dNc, u.dtype)

    def polyval(coeffs, x):
        # coeffs [nbf, deg+1] highest power first; x [...]
        out = jnp.zeros((nbf,) + x.shape, x.dtype)
        for k in range(coeffs.shape[1]):
            out = out * x[None] + coeffs[:, k][(...,) + (None,) * x.ndim]
        return out  # [nbf, ...]

    Nx_ = polyval(Nc, xi)      # [nbf, B, Np]
    Ny_ = polyval(Nc, eta)
    dNx_ = polyval(dNc, xi) * (2.0 / hx)
    dNy_ = polyval(dNc, eta) * (2.0 / hy)

    # gather the nbf x nbf nodal patch per point
    def gather_patch(ub, exb, eyb):
        # ub [ny, nx]; exb/eyb [Np]
        rows = eyb[:, None] * deg + jnp.arange(nbf)[None, :]  # [Np, nbf]
        cols = exb[:, None] * deg + jnp.arange(nbf)[None, :]
        return ub[rows[:, :, None], cols[:, None, :]]  # [Np, nbf_y, nbf_x]

    patches = jax.vmap(gather_patch)(u, ex, ey)  # [B, Np, nbf_y, nbf_x]

    wN = Ny_.transpose(1, 2, 0)[..., :, None] * Nx_.transpose(1, 2, 0)[..., None, :]
    wDx = Ny_.transpose(1, 2, 0)[..., :, None] * dNx_.transpose(1, 2, 0)[..., None, :]
    wDy = dNy_.transpose(1, 2, 0)[..., :, None] * Nx_.transpose(1, 2, 0)[..., None, :]
    vals = jnp.sum(patches * wN, axis=(-2, -1))
    gx = jnp.sum(patches * wDx, axis=(-2, -1))
    gy = jnp.sum(patches * wDy, axis=(-2, -1))
    return vals, jnp.stack([gx, gy], axis=-1)


def grid_interp_3d(u: jax.Array, points: jax.Array,
                   h: tuple[float, float, float], deg: int = 1):
    """Trilinear (deg-1) / higher-order FEM interpolation of a 3D nodal
    field at arbitrary points — the 3D analogue of :func:`grid_interp_2d`
    (reference inlines this gather per batch in the 3D eikonal loss,
    examples/eiqonal/single_instance/05_3d_sphere_loss4.py:196-228).

    u: [B, nz, ny, nx] nodal field; points: [B, Np, 3] (x, y, z) physical
    coords; h: element sizes (hx, hy, hz). Returns (vals, grads) with vals
    [B, Np] and grads [B, Np, 3] = (du/dx, du/dy, du/dz). Fully
    differentiable w.r.t. u and points.
    """
    hx, hy, hz = h
    nz, ny, nx = u.shape[-3:]
    nbf = deg + 1
    for name, n_ in (("x", nx), ("y", ny), ("z", nz)):
        if (n_ - 1) % deg:
            raise ValueError(
                f"grid axis {name} has {n_} nodes, incompatible with "
                f"deg={deg}: need (n-1) % deg == 0")
    nel = ((nx - 1) // deg, (ny - 1) // deg, (nz - 1) // deg)

    idx = []
    loc = []
    for ax, (h_, ne) in enumerate(zip((hx, hy, hz), nel)):
        e = jnp.clip(jnp.floor(points[..., ax] / h_).astype(jnp.int32),
                     0, ne - 1)
        idx.append(e)
        loc.append((points[..., ax] - e.astype(u.dtype) * h_) * 2.0 / h_
                   - 1.0)
    ex, ey, ez = idx
    xi, eta, chi = loc

    Nc, dNc = _poly_coeffs(deg)
    Nc = jnp.asarray(Nc, u.dtype)
    dNc = jnp.asarray(dNc, u.dtype)

    def polyval(coeffs, x):
        out = jnp.zeros((nbf,) + x.shape, x.dtype)
        for k in range(coeffs.shape[1]):
            out = out * x[None] + coeffs[:, k][(...,) + (None,) * x.ndim]
        return out  # [nbf, B, Np]

    Nx_, Ny_, Nz_ = polyval(Nc, xi), polyval(Nc, eta), polyval(Nc, chi)
    dNx_ = polyval(dNc, xi) * (2.0 / hx)
    dNy_ = polyval(dNc, eta) * (2.0 / hy)
    dNz_ = polyval(dNc, chi) * (2.0 / hz)

    def gather_patch(ub, exb, eyb, ezb):
        # ub [nz, ny, nx]; exb/eyb/ezb [Np] -> [Np, nbf_z, nbf_y, nbf_x]
        r = jnp.arange(nbf)
        zi = ezb[:, None] * deg + r[None, :]
        yi = eyb[:, None] * deg + r[None, :]
        xi_ = exb[:, None] * deg + r[None, :]
        return ub[zi[:, :, None, None], yi[:, None, :, None],
                  xi_[:, None, None, :]]

    patches = jax.vmap(gather_patch)(u, ex, ey, ez)  # [B,Np,nbf,nbf,nbf]

    def w3(fz, fy, fx):
        # [nbf,B,Np] each -> [B, Np, nbf_z, nbf_y, nbf_x]
        t = lambda a: a.transpose(1, 2, 0)
        return (t(fz)[..., :, None, None] * t(fy)[..., None, :, None]
                * t(fx)[..., None, None, :])

    vals = jnp.sum(patches * w3(Nz_, Ny_, Nx_), axis=(-3, -2, -1))
    gx = jnp.sum(patches * w3(Nz_, Ny_, dNx_), axis=(-3, -2, -1))
    gy = jnp.sum(patches * w3(Nz_, dNy_, Nx_), axis=(-3, -2, -1))
    gz = jnp.sum(patches * w3(dNz_, Ny_, Nx_), axis=(-3, -2, -1))
    return vals, jnp.stack([gx, gy, gz], axis=-1)
