"""Point-cloud .xyzna ASCII IO: x y z nx ny nz [area] per line.

Reference: examples/eiqonal/single_instance/xyzna_writer.py:1-13 /
xyzna_reader.py:1-22.
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_xyzna", "write_xyzna"]


def read_xyzna(path):
    """Returns (points[N,3], normals[N,3], areas[N]); areas zero-filled if
    the file has only 6 columns."""
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None]
    points = data[:, 0:3]
    normals = data[:, 3:6]
    areas = data[:, 6] if data.shape[1] > 6 else np.zeros(len(data))
    return points, normals, areas


def write_xyzna(path, points, normals, areas=None):
    points = np.asarray(points, np.float64)
    normals = np.asarray(normals, np.float64)
    cols = [points, normals]
    if areas is not None:
        cols.append(np.asarray(areas, np.float64).reshape(-1, 1))
    np.savetxt(path, np.concatenate(cols, axis=1), fmt="%.10g")
