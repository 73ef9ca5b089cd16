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

__all__ = ["winding_number_2d", "winding_number_3d", "winding_grid",
           "occupancy_from_cloud", "occupancy_from_cloud_3d", "meshgrid_3d",
           "sample_ellipse_cloud", "sample_polygon_cloud",
           "sample_sphere_cloud", "cloud_from_voxels"]


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


def winding_grid(points, normals, areas, grid_shape, lengths=(1.0, 1.0),
                 chunk: int = 4096):
    """RAW (unthresholded) generalized winding number on the node grid —
    differentiable in the cloud (the reference exercises exactly this,
    examples/eiqonal/single_instance/02_differentiable_winding_number.py)
    and the supervised mask-regression target of the disjoint-map trainer
    (examples/eiqonal/parametric/08_disjoint_map.py:155-163).
    [B, ny, nx]."""
    ny, nx = grid_shape
    x = jnp.linspace(0, lengths[0], nx)
    y = jnp.linspace(0, lengths[1], ny)
    xx, yy = jnp.meshgrid(x, y)
    q = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)
    w = winding_number_2d(points, normals, areas, q, chunk=chunk)
    return w.reshape(points.shape[0], ny, nx)


def occupancy_from_cloud(points, normals, areas, grid_shape, lengths=(1.0, 1.0),
                         threshold: float = 0.5, chunk: int = 4096):
    """Characteristic function chi on the node grid from an oriented cloud
    (the IBN source mask, IBN_2D.py:141-145). 2D only here; [B, ny, nx]."""
    w = winding_grid(points, normals, areas, grid_shape, lengths, chunk)
    return (w > threshold).astype(points.dtype)


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


def occupancy_from_cloud_3d(points, normals, areas, grid_shape,
                            lengths=(1.0, 1.0, 1.0), threshold: float = 0.5,
                            chunk: int = 2048):
    """3D characteristic function chi on the node grid from an oriented
    cloud via the generalized winding number (3D analogue of
    :func:`occupancy_from_cloud`; reference computes per-node solid angles
    the same way in the airfoil/3D IBN paths). Returns [B, nz, ny, nx]."""
    nz, ny, nx = grid_shape
    x = jnp.linspace(0, lengths[0], nx)
    y = jnp.linspace(0, lengths[1], ny)
    z = jnp.linspace(0, lengths[2], nz)
    zz, yy, xx = jnp.meshgrid(z, y, x, indexing="ij")
    q = jnp.stack([xx.reshape(-1), yy.reshape(-1), zz.reshape(-1)], axis=-1)
    w = winding_number_3d(points, normals, areas, q, chunk=chunk)
    chi = (w > threshold).astype(points.dtype)
    return chi.reshape(points.shape[0], nz, ny, nx)


def sample_sphere_cloud(n_points=2000, center=(0.5, 0.5, 0.5), radius=0.25,
                        rng=None):
    """Oriented surface cloud of a sphere (points, outward unit normals,
    per-point area weights) — the reference's PC3D dataset synthesizes the
    same cloud from random directions
    (05_3d_sphere_loss4.py:82-97: randn / 4|v| + 0.5). Here a Fibonacci
    sphere gives uniform coverage; areas sum to 4 pi r^2."""
    if rng is not None:
        # random directions, like the reference's PC3D
        v = rng.standard_normal((n_points, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
    else:
        i = np.arange(n_points) + 0.5
        phi = np.arccos(1 - 2 * i / n_points)
        golden = np.pi * (1 + 5**0.5)
        theta = golden * i
        v = np.stack([np.cos(theta) * np.sin(phi),
                      np.sin(theta) * np.sin(phi), np.cos(phi)], axis=-1)
    pts = np.asarray(center) + radius * v
    areas = np.full(n_points, 4 * np.pi * radius**2 / n_points)
    return (pts.astype(np.float32), v.astype(np.float32),
            areas.astype(np.float32))


def cloud_from_voxels(vox, lengths=(1.0, 1.0, 1.0), max_points=None,
                      rng=None):
    """Oriented surface cloud from a [nz, ny, nx] binary voxel occupancy
    (e.g. the stanford-bunny bunny_128_voxmodel.npz asset the reference
    solves on, IBN/poisson-3d/non-parametric/solve_in_object_3d.py:193).

    Surface voxels = occupied with at least one empty 6-neighbor. Point =
    voxel center in physical coords; normal = negative smoothed occupancy
    gradient (outward), unit; area = total surface-voxel face area split
    evenly. Host-side numpy (dataset preprocessing)."""
    vox = np.asarray(vox).astype(np.float32)
    nz, ny, nx = vox.shape
    pad = np.pad(vox, 1)
    neigh_min = np.minimum.reduce([
        pad[:-2, 1:-1, 1:-1], pad[2:, 1:-1, 1:-1], pad[1:-1, :-2, 1:-1],
        pad[1:-1, 2:, 1:-1], pad[1:-1, 1:-1, :-2], pad[1:-1, 1:-1, 2:]])
    occ = vox > 0.5
    empty = ~np.pad(occ, 1)
    # exposed-face counts per direction (for the area integral below:
    # x-faces have area hy*hz, y-faces hx*hz, z-faces hx*hy — using one
    # face area for all orientations mis-scales the winding integral by
    # up to hz/hx on anisotropic grids)
    fz = (empty[:-2, 1:-1, 1:-1] & occ).sum() + (empty[2:, 1:-1, 1:-1]
                                                 & occ).sum()
    fy = (empty[1:-1, :-2, 1:-1] & occ).sum() + (empty[1:-1, 2:, 1:-1]
                                                 & occ).sum()
    fx = (empty[1:-1, 1:-1, :-2] & occ).sum() + (empty[1:-1, 1:-1, 2:]
                                                 & occ).sum()
    surf = occ & (neigh_min < 0.5)
    iz, iy, ix = np.nonzero(surf)
    if max_points is not None and iz.size > max_points:
        sel = ((rng or np.random.default_rng(0))
               .choice(iz.size, max_points, replace=False))
        iz, iy, ix = iz[sel], iy[sel], ix[sel]
    h = (lengths[0] / nx, lengths[1] / ny, lengths[2] / nz)
    pts = np.stack([(ix + 0.5) * h[0], (iy + 0.5) * h[1],
                    (iz + 0.5) * h[2]], axis=-1)
    # outward normal: -grad of a box-smoothed occupancy at the surf voxels
    from scipy import ndimage
    sm = ndimage.uniform_filter(vox, size=3, mode="constant")
    gz, gy, gx = np.gradient(sm)
    nrm = -np.stack([gx[iz, iy, ix], gy[iz, iy, ix], gz[iz, iy, ix]],
                    axis=-1)
    mag = np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = np.where(mag > 1e-8, nrm / np.maximum(mag, 1e-8), 0.0)
    keep = np.linalg.norm(nrm, axis=-1) > 0.5
    pts, nrm = pts[keep], nrm[keep]
    # per-point quadrature weight: the TOTAL exposed-face area (counted
    # per orientation with the correct face area) split over the points
    # actually kept — subsampling must NOT shrink the area sum or the
    # winding-number integral (and hence the occupancy) collapses
    # toward zero
    total_area = (fx * h[1] * h[2] + fy * h[0] * h[2] + fz * h[0] * h[1])
    areas = np.full(len(pts), total_area / max(len(pts), 1), np.float32)
    return pts.astype(np.float32), nrm.astype(np.float32), areas


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
