"""Immersed-boundary geometry: generalized winding numbers, point-cloud
synthesis, mesh helpers.

Reference counterparts:
  * ``compute_winding_nodes`` — a python loop over query points
    (examples/poisson/parametric/IBN_2D.py:89-104; also
    examples/eiqonal/parametric/09_airfoil.py:238-291). Rewritten as one
    batched einsum over (queries x cloud points), chunked over queries so the
    O(N_q * N_p) pairwise tensor never exceeds `chunk` rows of memory —
    required at 512^2+ grids.
  * ``CuboidMesh.meshgrid_3d`` (DiffNet/cuboid_mesh.py:8-25).

The 2D generalized winding number of query q against an oriented point cloud
{p_i, n_i, a_i} is  w(q) = sum_i a_i (p_i - q)·n_i / (2 pi |p_i - q|^2);
in 3D the kernel is /(4 pi |p - q|^3). w ≈ 1 inside, 0 outside, 1/2 on the
curve. (The reference's formula uses an L1 norm and the 3D constant in 2D —
a scaling quirk compensated by its 0.005 threshold; we implement the correct
kernels and threshold at 0.5.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["winding_number_2d", "winding_number_3d", "occupancy_from_cloud",
           "meshgrid_3d", "sample_ellipse_cloud", "sample_polygon_cloud"]


def winding_number_2d(points: jax.Array, normals: jax.Array, areas: jax.Array,
                      queries: jax.Array, chunk: int = 4096,
                      eps: float = 1e-8) -> jax.Array:
    """Generalized winding number of `queries` w.r.t. an oriented 2D cloud.

    points, normals: [B, Np, 2]; areas: [B, Np] (arc-length weights);
    queries: [Nq, 2] (shared across batch) -> [B, Nq].
    """
    Nq = queries.shape[0]
    nchunks = max(1, -(-Nq // chunk))
    pad = nchunks * chunk - Nq
    q = jnp.pad(queries, ((0, pad), (0, 0)))
    q = q.reshape(nchunks, chunk, 2)

    def one_chunk(qc):
        d = points[:, None, :, :] - qc[None, :, None, :]  # [B, chunk, Np, 2]
        dot = jnp.sum(d * normals[:, None, :, :], axis=-1)
        r2 = jnp.sum(d * d, axis=-1)
        w = jnp.sum(areas[:, None, :] * dot / (2 * jnp.pi * (r2 + eps)),
                    axis=-1)
        return w  # [B, chunk]

    w = jax.lax.map(one_chunk, q)  # [nchunks, B, chunk]
    w = jnp.moveaxis(w, 1, 0).reshape(points.shape[0], nchunks * chunk)
    return w[:, :Nq]


def winding_number_3d(points: jax.Array, normals: jax.Array, areas: jax.Array,
                      queries: jax.Array, chunk: int = 2048,
                      eps: float = 1e-8) -> jax.Array:
    """3D generalized winding number (solid angle / 4 pi).

    points, normals: [B, Np, 3]; areas: [B, Np]; queries: [Nq, 3] -> [B, Nq].
    """
    Nq = queries.shape[0]
    nchunks = max(1, -(-Nq // chunk))
    pad = nchunks * chunk - Nq
    q = jnp.pad(queries, ((0, pad), (0, 0)))
    q = q.reshape(nchunks, chunk, 3)

    def one_chunk(qc):
        d = points[:, None, :, :] - qc[None, :, None, :]
        dot = jnp.sum(d * normals[:, None, :, :], axis=-1)
        r = jnp.sqrt(jnp.sum(d * d, axis=-1) + eps)
        return jnp.sum(areas[:, None, :] * dot / (4 * jnp.pi * r**3), axis=-1)

    w = jax.lax.map(one_chunk, q)
    w = jnp.moveaxis(w, 1, 0).reshape(points.shape[0], nchunks * chunk)
    return w[:, :Nq]


def occupancy_from_cloud(points, normals, areas, grid_shape, lengths=(1.0, 1.0),
                         threshold: float = 0.5, chunk: int = 4096):
    """Characteristic function chi on the node grid from an oriented cloud
    (the IBN source mask, IBN_2D.py:141-145). 2D only here; [B, ny, nx]."""
    ny, nx = grid_shape
    x = jnp.linspace(0, lengths[0], nx)
    y = jnp.linspace(0, lengths[1], ny)
    xx, yy = jnp.meshgrid(x, y)
    q = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)
    w = winding_number_2d(points, normals, areas, q, chunk=chunk)
    chi = (w > threshold).astype(points.dtype)
    return chi.reshape(points.shape[0], ny, nx)


def meshgrid_3d(x_1d, y_1d, z_1d):
    """(M,), (N,), (P,) -> three (P, N, M) arrays, z-major ordering
    (reference CuboidMesh.meshgrid_3d, cuboid_mesh.py:8-25)."""
    zz, yy, xx = np.meshgrid(z_1d, y_1d, x_1d, indexing="ij")
    return xx, yy, zz


def sample_ellipse_cloud(n_points=120, center=(0.5, 0.5), radii=(0.25, 0.15),
                         angle=0.0, rng=None):
    """Synthesize an oriented boundary cloud (points, outward normals,
    arc-length areas) of an ellipse — a data-free stand-in for the external
    point-cloud archives the reference loads (IBN_2D.py:41-67).
    `rng` adds a random phase offset to the otherwise uniform parameter
    sampling (deterministic when None)."""
    t = np.linspace(0, 2 * np.pi, n_points, endpoint=False)
    if rng is not None:
        t = t + rng.uniform(0.0, 2 * np.pi / n_points)
    a, b = radii
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s], [s, c]])
    pts_local = np.stack([a * np.cos(t), b * np.sin(t)], axis=-1)
    pts = pts_local @ R.T + np.asarray(center)
    # outward normal of ellipse: grad((x/a)^2 + (y/b)^2)
    nrm_local = np.stack([np.cos(t) / a, np.sin(t) / b], axis=-1)
    nrm = nrm_local @ R.T
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    # arc-length weights: half distance to each neighbor
    d = np.linalg.norm(np.roll(pts, -1, 0) - pts, axis=-1)
    areas = 0.5 * (d + np.roll(d, 1, 0))
    return pts.astype(np.float32), nrm.astype(np.float32), areas.astype(np.float32)


def sample_polygon_cloud(vertices, points_per_edge=30):
    """Oriented cloud along a CCW polygon boundary."""
    vertices = np.asarray(vertices, np.float64)
    pts, nrms, areas = [], [], []
    nv = len(vertices)
    for i in range(nv):
        p0, p1 = vertices[i], vertices[(i + 1) % nv]
        edge = p1 - p0
        L = np.linalg.norm(edge)
        tang = edge / L
        normal = np.array([tang[1], -tang[0]])  # outward for CCW
        ts = (np.arange(points_per_edge) + 0.5) / points_per_edge
        pts.append(p0 + ts[:, None] * edge)
        nrms.append(np.tile(normal, (points_per_edge, 1)))
        areas.append(np.full(points_per_edge, L / points_per_edge))
    return (np.concatenate(pts).astype(np.float32),
            np.concatenate(nrms).astype(np.float32),
            np.concatenate(areas).astype(np.float32))
