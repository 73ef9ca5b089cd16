"""Single-instance dataset factories (channels-last).

Ports of the reference dataset surface (reference:
DiffNet/datasets/single_instances/{rectangles,circles,Lshaped,images,klsum,
cuboids,voxels}.py). Each dataset returns the SAME sample `n_samples` times
(one epoch = n gradient steps on one instance — reference convention), as
``(inputs[H, W, C], forcing[H, W, 1])`` numpy float32 with channels stacked
LAST: ``inputs[..., 0] = domain/nu``, ``inputs[..., 1] = bc1`` (source,
u := 1), ``inputs[..., 2] = bc2`` (sink, u := 0), further channels
formulation-specific.
"""

from __future__ import annotations

import math
import os

import numpy as np

from .gen_input import generate_diffusivity_tensor

__all__ = [
    "SingleInstanceDataset", "Rectangle", "RectangleManufactured",
    "RectangleManufacturedNonZeroBC", "SpaceTimeRectangleManufactured",
    "AdvDiff1dRectangle", "AdvDiff2dRectangle", "AllenCahnIceMeltRectangle",
    "RectangleHelmholtzManufactured", "RectangleHelmholtzDeltaForce",
    "RectangleManufacturedStokes", "RectangleIM", "RectangleIMBack",
    "CircleIMBack", "LShaped", "ImageIMBack", "Disk", "KLSumSingleInstance",
    "Cuboid", "CuboidManufactured", "VoxelIMBackRAW", "load_raw",
]


def _grid(n):
    x = np.linspace(0, 1, n)
    return np.meshgrid(x, x)


class SingleInstanceDataset:
    """Base: subclasses set .domain/.bc1/.bc2 (+extra channels via
    `extra_channels`) and .forcing; emits channels-last float32."""

    n_samples = 100

    def extra_channels(self):
        return []

    def __len__(self):
        return self.n_samples

    def __getitem__(self, index):
        chans = [self.domain, self.bc1, self.bc2] + list(self.extra_channels())
        inputs = np.stack(chans, axis=-1).astype(np.float32)
        forcing = np.asarray(self.forcing, np.float32)[..., None]
        return inputs, forcing


class Rectangle(SingleInstanceDataset):
    """Unit square, source on top row, sink on bottom row
    (rectangles.py:7-31)."""

    n_samples = 6000

    def __init__(self, domain_size=64):
        n = domain_size
        self.domain = np.ones((n, n))
        self.bc1 = np.zeros((n, n)); self.bc1[0, :] = 1
        self.bc2 = np.zeros((n, n)); self.bc2[-1, :] = 1
        self.forcing = np.zeros((n, n))


class RectangleManufactured(SingleInstanceDataset):
    """MMS: f = 2 pi^2 sin(pi x) sin(pi y), Dirichlet-0 on all four walls
    (rectangles.py:35-65)."""

    def __init__(self, domain_size=64):
        n = domain_size
        self.domain = np.ones((n, n))
        self.bc1 = np.zeros((n, n))
        self.bc2 = np.zeros((n, n))
        self.bc2[[0, -1], :] = 1
        self.bc2[:, [0, -1]] = 1
        self.xx, self.yy = _grid(n)
        self.forcing = 2.0 * math.pi**2 * np.sin(math.pi * self.xx) * np.sin(
            math.pi * self.yy)

    @staticmethod
    def exact(x, y):
        return np.sin(math.pi * x) * np.sin(math.pi * y)


class RectangleManufacturedNonZeroBC(SingleInstanceDataset):
    """u_exact = exp(-pi x) sin(pi y); bc1 = left+right (nonzero Dirichlet),
    bc2 = top+bottom (rectangles.py:223-257)."""

    def __init__(self, domain_size=64):
        n = domain_size
        self.domain = np.ones((n, n))
        self.bc1 = np.zeros((n, n)); self.bc1[:, [0, -1]] = 1
        self.bc2 = np.zeros((n, n)); self.bc2[[0, -1], :] = 1
        self.xx, self.yy = _grid(n)
        self.om = np.pi
        self.u_exact = np.exp(-self.om * self.xx) * np.sin(self.om * self.yy)
        self.forcing = np.zeros((n, n))


class SpaceTimeRectangleManufactured(SingleInstanceDataset):
    """Space-time heat: y-axis is time; bc1 = IC row (y=0), bc2 = side walls;
    u0 = sin(pi x) exp(-0.5 y), diffusivity 0.1 (rectangles.py:67-103)."""

    def __init__(self, domain_size=64, seed=0):
        n = domain_size
        rng = np.random.default_rng(seed)
        self.bc1 = np.zeros((n, n)); self.bc1[0, :] = 1
        self.bc2 = np.zeros((n, n)); self.bc2[:, [0, -1]] = 1
        x = np.linspace(0, 1, n)
        xx, yy = _grid(n)
        self.decay_rt = 0.5
        self.u0 = np.sin(math.pi * xx) * np.exp(-self.decay_rt * yy)
        self.diffusivity = 0.1
        self.forcing = np.zeros_like(xx)
        self.domain = rng.normal(0, 1.0, size=(n, n))
        self.initial_guess = np.tile(self.u0[0, :], (n, 1)) + 0.1 * rng.random(
            (n, n))


class AdvDiff1dRectangle(SingleInstanceDataset):
    """1D advection-diffusion embedded in 2D; Dirichlet side walls, f=1
    (rectangles.py:105-137)."""

    def __init__(self, domain_size=64):
        n = domain_size
        self.domain = np.ones((n, n))
        self.bc1 = np.zeros((n, n))
        self.bc2 = np.zeros((n, n)); self.bc2[:, [0, -1]] = 1
        self.xx, self.yy = _grid(n)
        self.forcing = np.ones((n, n))


class AdvDiff2dRectangle(SingleInstanceDataset):
    """2D advection skew-to-mesh: inlet split on left wall at y=0.2
    (rectangles.py:139-174)."""

    def __init__(self, domain_size=64):
        n = domain_size
        self.domain = np.ones((n, n))
        self.bc1 = np.zeros((n, n))
        self.bc2 = np.zeros((n, n))
        cut = int(0.2 * n)
        self.bc1[cut:, 0] = 1
        self.bc2[:cut, 0] = 1
        self.bc2[0, :] = 1
        self.xx, self.yy = _grid(n)
        self.forcing = np.zeros((n, n))


class AllenCahnIceMeltRectangle(SingleInstanceDataset):
    """Allen-Cahn ice melt space-time: tanh interface IC at y=0; constants
    A=16, Cn=0.1, D=1, k=2 (rectangles.py:176-221)."""

    def __init__(self, domain_size=64):
        n = domain_size
        self.ac_A, self.ac_Cn, self.ac_D, self.ac_k = 16.0, 0.1, 1.0, 2.0
        self.domain = np.ones((n, n))
        self.bc1 = np.zeros((n, n)); self.bc1[0, :] = 1
        self.bc2 = np.zeros((n, n))
        x = np.linspace(0, 1, n)
        self.xx, self.yy = _grid(n)
        thick = self.ac_Cn * np.sqrt(2.0 / self.ac_A)
        u_t0 = 0.5 + 0.5 * np.tanh((x - 0.5) / thick)
        self.u0 = np.zeros((n, n)); self.u0[0, :] = u_t0
        self.initial_guess = np.tile(u_t0[None, :], (n, 1))
        self.forcing = np.zeros((n, n))


class RectangleHelmholtzManufactured(SingleInstanceDataset):
    """Helmholtz MMS: k=0.5, f = (2 pi^2 - k^2) sin(pi x) sin(pi y)
    (rectangles.py:259-290)."""

    def __init__(self, domain_size=64, khh=0.5):
        n = domain_size
        self.khh = khh
        self.domain = np.ones((n, n))
        self.bc1 = np.zeros((n, n))
        self.bc2 = np.zeros((n, n))
        self.bc2[[0, -1], :] = 1; self.bc2[:, [0, -1]] = 1
        self.xx, self.yy = _grid(n)
        self.forcing = (2.0 * math.pi**2 - khh**2) * np.sin(
            math.pi * self.xx) * np.sin(math.pi * self.yy)

    @staticmethod
    def exact(x, y):
        return np.sin(math.pi * x) * np.sin(math.pi * y)


class RectangleHelmholtzDeltaForce(SingleInstanceDataset):
    """Helmholtz with near-delta Gaussian forcing at (0.1875, 0.1875),
    k=1/8 (rectangles.py:292-327)."""

    def __init__(self, domain_size=64):
        n = domain_size
        self.khh = 1.0 / 8.0
        self.domain = np.ones((n, n))
        self.bc1 = np.zeros((n, n))
        self.bc2 = np.zeros((n, n))
        self.bc2[[0, -1], :] = 1; self.bc2[:, [0, -1]] = 1
        xx, yy = _grid(n)
        mu, sig = 0.1875, 0.05
        self.forcing = np.exp(-0.5 * ((xx - mu) / sig) ** 2
                              - 0.5 * ((yy - mu) / sig) ** 2) / (
                                  2 * np.pi * sig * sig)


class RectangleManufacturedStokes(SingleInstanceDataset):
    """Stokes MMS BC masks (rectangles.py:329-361)."""

    def __init__(self, domain_size=64):
        n = domain_size
        self.domain = np.ones((n, n))
        self.bc1 = np.zeros((n, n))
        self.bc2 = np.zeros((n, n)); self.bc2[[0, -1], :] = 1
        self.xx, self.yy = _grid(n)
        self.forcing = 2.0 * math.pi**2 * np.sin(math.pi * self.xx) * np.sin(
            math.pi * self.yy)


class RectangleIM(SingleInstanceDataset):
    """Immersed rectangle solved *within* the object (rectangles.py:366-393).

    Reference-parity quirk kept deliberately: the sink row sits at
    y0+h — ONE ROW PAST the object (domain=0 there) while the source is
    on the object's first row (rectangles.py:382)."""

    n_samples = 200

    def __init__(self, domain_size=64):
        n = domain_size
        x0, y0, w, h = 10, 10, 30, 50
        self.domain = np.zeros((n, n)); self.domain[y0:y0 + h, x0:x0 + w] = 1.0
        self.bc1 = np.zeros((n, n)); self.bc1[y0, x0:x0 + w] = 1
        self.bc2 = np.zeros((n, n)); self.bc2[y0 + h, x0:x0 + w] = 1
        self.forcing = np.zeros((n, n))


class RectangleIMBack(SingleInstanceDataset):
    """Immersed rectangle in a background grid: object is bc1=1 region
    (rectangles.py:395-425)."""

    n_samples = 200

    def __init__(self, domain_size=64):
        n = domain_size
        x0, y0, w, h = 10, 10, 30, 20
        self.domain = np.ones((n, n)); self.domain[y0:y0 + h, x0:x0 + w] = 0.0
        self.bc1 = np.zeros((n, n)); self.bc1[y0:y0 + h, x0:x0 + w] = 1.0
        self.bc2 = np.zeros((n, n))
        self.bc2[[0, -1], :] = 1; self.bc2[:, [0, -1]] = 1
        self.forcing = np.zeros((n, n))


class CircleIMBack(SingleInstanceDataset):
    """Immersed circle via analytic SDF sign (circles.py:8-41).

    Reference-parity quirk kept deliberately: pixel coordinates are
    ``linspace(0,1,n)*n`` spanning [0, n] (circles.py:17-18), so the
    circle params are scaled by n/(n-1) relative to true pixel indices."""

    def __init__(self, domain_size=64):
        n = domain_size
        cx, cy, r = 15, 40, 15
        x = np.linspace(0, 1, n) * n
        xx, yy = np.meshgrid(x, x)
        zz = (xx - cx) ** 2 + (yy - cy) ** 2 - r**2
        self.domain = (zz > 0.0).astype(float)
        self.bc1 = (zz < 0.0).astype(float)
        self.bc2 = np.zeros((n, n))
        self.bc2[:, [0, -1]] = 1; self.bc2[[0, -1], :] = 1
        self.forcing = np.zeros((n, n))


class LShaped(SingleInstanceDataset):
    """L-shaped domain immersed within object; forcing = 10*chi
    (Lshaped.py:8-42).

    Reference-parity quirk kept deliberately: the far-edge sink indices
    are one past the object extent (Lshaped.py:22-27), same off-by-one
    family as RectangleIM."""

    n_samples = 200

    def __init__(self, domain_size=64):
        n = domain_size
        p = [5, 5, 50, 20, 50, 20]
        self.domain = np.zeros((n, n))
        self.domain[p[0]:p[0] + p[2], p[1]:p[1] + p[3]] = 1.0
        self.domain[p[0]:p[0] + p[5], p[1]:p[1] + p[4]] = 1.0
        self.bc1 = np.zeros((n, n))
        bc2 = np.zeros((n, n))
        bc2[p[0]:p[0] + p[2], p[1]] = 1
        bc2[p[0] + p[2], p[1]:p[1] + p[3]] = 1
        bc2[p[0] + p[5]:p[0] + p[2], p[1] + p[3]] = 1
        bc2[p[0] + p[5], p[1] + p[3]:p[1] + p[4]] = 1
        bc2[p[0]:p[0] + p[5], p[1] + p[4]] = 1
        bc2[p[0], p[1]:p[1] + p[4]] = 1
        self.bc2 = bc2
        self.forcing = self.domain.copy() * 10


def _load_binary_image(filename):
    import PIL.Image

    ext = os.path.splitext(filename)[1]
    if ext not in (".png", ".jpg", ".bmp", ".tiff"):
        raise ValueError("invalid extension; extension not supported")
    img = PIL.Image.open(filename).convert("L")
    return (np.asarray(img) > 0).astype(float)


class ImageIMBack(SingleInstanceDataset):
    """Binary image -> immersed object chi; solve outside object, u=1 inside
    (images.py:9-48).

    Reference-parity quirk kept deliberately: ``domain_size`` is accepted
    but unused — masks come out at native image resolution (the
    reference's resize is commented out, images.py:18)."""

    def __init__(self, filename, domain_size=64):
        img = _load_binary_image(filename)
        self.domain = 1 - img
        self.bc1 = np.zeros_like(self.domain)
        self.bc1[(1 - self.domain).astype(bool)] = 1
        self.bc2 = np.zeros_like(self.domain)
        self.bc2[:, [0, -1]] = 1; self.bc2[[0, -1], :] = 1
        self.forcing = np.zeros_like(self.domain)


class Disk(ImageIMBack):
    """Same as ImageIMBack with unit forcing (images.py:50-79)."""

    def __init__(self, filename, domain_size=64):
        super().__init__(filename, domain_size)
        self.forcing = np.ones_like(self.domain)


class KLSumSingleInstance(SingleInstanceDataset):
    """Karhunen-Loeve-sum diffusivity from a coefficient txt file
    (klsum.py:7-35); left wall source, right wall sink."""

    n_samples = 1000

    def __init__(self, coeff_file, domain_size=64):
        if not os.path.exists(coeff_file):
            raise FileNotFoundError(
                "Single instance: Wrong path to coefficient file.")
        self.coeff = np.loadtxt(coeff_file, dtype=np.float32)
        n = self.domain_size = domain_size
        self.nu = generate_diffusivity_tensor(
            self.coeff, output_size=n).squeeze()
        self.domain = self.nu
        self.bc1 = np.zeros((n, n)); self.bc1[:, 0] = 1
        self.bc2 = np.zeros((n, n)); self.bc2[:, -1] = 1
        self.forcing = np.zeros((n, n))


class Cuboid(SingleInstanceDataset):
    """3D unit cube, source z=0 face, sink z=1 face (cuboids.py:8-37);
    arrays are [z, y, x]."""

    def __init__(self, domain_size=64):
        n = domain_size
        self.domain = np.ones((n, n, n))
        self.bc1 = np.zeros((n, n, n)); self.bc1[0, :, :] = 1
        self.bc2 = np.zeros((n, n, n)); self.bc2[-1, :, :] = 1
        self.forcing = np.zeros((n, n, n))


class CuboidManufactured(SingleInstanceDataset):
    """3D MMS: f = 19 pi^2 sin(pi x) sin(3 pi y) sin(3 pi z), Dirichlet-0 on
    all faces (cuboids.py:40-80)."""

    def __init__(self, domain_size=64):
        n = domain_size
        self.domain = np.ones((n, n, n))
        self.bc1 = np.zeros((n, n, n))
        bc2 = np.zeros((n, n, n))
        bc2[[0, -1], :, :] = 1; bc2[:, [0, -1], :] = 1; bc2[:, :, [0, -1]] = 1
        self.bc2 = bc2
        x = np.linspace(0, 1, n)
        zz, yy, xx = np.meshgrid(x, x, x, indexing="ij")
        self.xx, self.yy, self.zz = xx, yy, zz
        self.forcing = self.forcing_func(xx, yy, zz)

    @staticmethod
    def forcing_func(x, y, z):
        return 19.0 * math.pi**2 * np.sin(math.pi * x) * np.sin(
            3 * math.pi * y) * np.sin(3 * math.pi * z)

    @staticmethod
    def exact(x, y, z):
        return np.sin(math.pi * x) * np.sin(3 * math.pi * y) * np.sin(
            3 * math.pi * z)


def load_raw(file_prefix):
    """Read `<prefix>inouts.raw` uint8 voxelization + `<prefix>VoxelConfig.txt`
    (voxels.py:8-33). Returns (inout, numDiv, gridSize, bBoxMin)."""
    with open(file_prefix + "VoxelConfig.txt") as cfg:
        cfg.readline()
        bmin = np.array([float(v) for v in cfg.readline().split()])
        bmax = np.array([float(v) for v in cfg.readline().split()])
        num_div = np.array([int(v) for v in cfg.readline().split()])
        grid_size = np.array([float(v) for v in cfg.readline().split()])
    raw = np.fromfile(file_prefix + "inouts.raw", dtype=np.uint8)
    inout = (raw / 254.0 > 0.25).astype(float)
    inout = np.reshape(inout, num_div, order="F")
    return inout, num_div, grid_size, bmin


class VoxelIMBackRAW(SingleInstanceDataset):
    """Voxelized object embedded at offset 32 into a 64^3 background domain
    (voxels.py:35-64)."""

    def __init__(self, file_prefix, domain_size=64, offset=32):
        vox, _, _, _ = load_raw(file_prefix)
        n = domain_size
        domain = np.ones((n, n, n))
        # clip the voxel block to the embedding window (the reference's
        # unclipped slice-assign crashes when a model — e.g. the shipped
        # Hand at 76x48x200 — exceeds domain_size - offset)
        sx, sy, sz = (min(s, n - offset) for s in vox.shape)
        o = offset
        domain[o:o + sx, o:o + sy, o:o + sz] = 1 - vox[:sx, :sy, :sz]
        self.domain = domain
        self.bc1 = np.zeros((n, n, n))
        self.bc1[o:o + sx, o:o + sy, o:o + sz] = vox[:sx, :sy, :sz]
        bc2 = np.zeros((n, n, n))
        bc2[[0, -1], :, :] = 1; bc2[:, [0, -1], :] = 1; bc2[:, :, [0, -1]] = 1
        self.bc2 = bc2
        self.forcing = np.zeros((n, n, n))
