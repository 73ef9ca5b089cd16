"""Parametric (ensemble) datasets — channels-last.

Reference counterparts: DiffNet/datasets/parametric/{images,klsum}.py and the
example-local ``PointClouds`` dataset (examples/poisson/parametric/
IBN_2D.py:35-84). Point-cloud samples return
``(cloud[Np, 5], forcing[H, W, 1], sink[H, W, 1])`` where cloud stacks
(x, y, nx, ny, area).
"""

from __future__ import annotations

import os

import numpy as np

from ..core.geometry import sample_ellipse_cloud

__all__ = ["ImageIMBack", "ImageIMBackObject", "ImageIMBackNeumann",
           "KLSumStochastic", "PointClouds", "SyntheticPointClouds"]


def _load_dir_images(dirname):
    """Decode every image in a directory (sorted order) to binary masks.

    Decoding runs on a thread pool — PIL releases the GIL during file IO
    and codec work, so an ensemble directory loads with all host cores
    (the torch-DataLoader-workers counterpart of the reference's
    sequential constructor loop, datasets/parametric/images.py:19-24)."""
    from concurrent.futures import ThreadPoolExecutor

    import PIL.Image

    paths = []
    for fname in sorted(os.listdir(dirname)):
        path = os.path.join(dirname, fname)
        ext = os.path.splitext(path)[1]
        if ext not in (".png", ".jpg", ".bmp", ".tiff"):
            raise ValueError("invalid extension; extension not supported")
        paths.append(path)

    def decode(path):
        img = PIL.Image.open(path).convert("L")
        return (np.asarray(img) > 0).astype(float)

    if len(paths) < 2:
        return [decode(p) for p in paths]
    with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as ex:
        return list(ex.map(decode, paths))


class _ImageEnsembleBase:
    forcing_value = 0.0

    def __init__(self, dirname, domain_size=64):
        self.samples = []
        for img in _load_dir_images(dirname):
            self.samples.append(self._make_sample(img))
        self.n_samples = len(self.samples)

    def _make_sample(self, img):
        domain = 1 - img
        bc1 = np.zeros_like(domain)
        bc1[(1 - domain).astype(bool)] = 1
        bc2 = np.zeros_like(domain)
        bc2[:, [0, -1]] = 1
        bc2[[0, -1], :] = 1
        return np.stack([domain, bc1, bc2], axis=-1).astype(np.float32)

    def __len__(self):
        return self.n_samples

    def __getitem__(self, idx):
        inputs = self.samples[idx]
        forcing = np.full(inputs.shape[:-1] + (1,), self.forcing_value,
                          np.float32)
        return inputs, forcing


class ImageIMBack(_ImageEnsembleBase):
    """Directory of binary images -> chi ensembles (images.py:9-48)."""


class ImageIMBackObject(_ImageEnsembleBase):
    """Same with unit forcing (images.py:50-91)."""

    forcing_value = 1.0


class ImageIMBackNeumann(_ImageEnsembleBase):
    """Neumann variant: bc2 = left+top Dirichlet, bc3 = right+bottom
    (images.py:93-134); 4 input channels."""

    def _make_sample(self, img):
        domain = 1 - img
        bc1 = np.zeros_like(domain)
        bc1[(1 - domain).astype(bool)] = 1
        bc2 = np.zeros_like(domain)
        bc2[:, 0] = 1
        bc2[0, :] = 1
        bc3 = np.zeros_like(domain)
        bc3[-1, :] = 1
        bc3[:, -1] = 1
        return np.stack([domain, bc1, bc2, bc3], axis=-1).astype(np.float32)


class KLSumStochastic:
    """npy file of Sobol/random KL coefficient samples -> precomputed
    diffusivity-field dataset (klsum.py:11-45)."""

    def __init__(self, filename_or_coeffs, domain_size=64, kl_terms=6):
        if isinstance(filename_or_coeffs, (str, os.PathLike)):
            coeffs = np.load(filename_or_coeffs)
        else:
            coeffs = np.asarray(filename_or_coeffs)
        self.coeffs = coeffs
        self.domain_size = n = domain_size
        self.kl_terms = kl_terms
        # one native OpenMP pass over the whole coefficient table (the
        # reference tqdm-loops generate_diffusivity_tensor per sample at
        # load time, klsum.py:24-31); numpy fallback inside
        from ..utils.native import kl_diffusivity_batch
        fields = kl_diffusivity_batch(coeffs, n, n_sum_nu=kl_terms)
        bc1 = np.zeros((n, n)); bc1[:, 0] = 1
        bc2 = np.zeros((n, n)); bc2[:, -1] = 1
        self.dataset = np.stack(
            [np.stack([f, bc1, bc2], axis=-1) for f in fields]
        ).astype(np.float32)
        self.n_samples = len(self.dataset)

    def __len__(self):
        return self.n_samples

    def __getitem__(self, idx):
        inputs = self.dataset[idx]
        forcing = np.zeros(inputs.shape[:-1] + (1,), np.float32)
        return inputs, forcing


class PointClouds:
    """Point-cloud ensemble from npz archives (IBN_2D.py:35-84): loads
    `point_cloud.npz` / `normals.npz`, normalizes into the domain center,
    computes arc-length areas, splits train/val at index 1250."""

    def __init__(self, data_path, split="train", domain_size=32):
        points = np.load(os.path.join(data_path, "point_cloud.npz"))["arr_0"]
        normals = np.load(os.path.join(data_path, "normals.npz"))["arr_0"]
        if split == "val":
            points, normals = points[:1250], normals[:1250]
        else:
            points, normals = points[1250:], normals[1250:]
        points = points.astype(np.float64) * 0.5
        points[:, :, 0] += 0.25
        points[:, :, 1] += 0.5
        self._finish(points[:, :, :2], normals[:, :, :2], domain_size)

    def _finish(self, points, normals, domain_size):
        self.pc = points.astype(np.float32)
        self.normals = normals.astype(np.float32)
        n = normals  # [N, Np, 2]
        # arc-length weights (IBN_2D.py:64-67, squared-distance quirk fixed:
        # we use true euclidean segment lengths)
        d_next = np.linalg.norm(np.roll(points, -1, 1) - points, axis=-1)
        d_prev = np.roll(d_next, 1, 1)
        self.area = (0.5 * (d_next + d_prev)).astype(np.float32)
        nd = self.domain_size = domain_size
        self.bc2 = np.zeros((nd, nd), np.float32)
        self.bc2[[0, -1], :] = 1
        self.bc2[:, [0, -1]] = 1
        self.n_samples = len(self.pc)

    def __len__(self):
        return self.n_samples

    def __getitem__(self, idx):
        cloud = np.concatenate(
            [self.pc[idx], self.normals[idx], self.area[idx][:, None]],
            axis=-1).astype(np.float32)
        nd = self.domain_size
        forcing = np.zeros((nd, nd, 1), np.float32)
        return cloud, forcing, self.bc2[..., None]


class SyntheticPointClouds(PointClouds):
    """Data-free stand-in: random ellipse boundary clouds (the reference's
    archives are external downloads)."""

    def __init__(self, n_samples=64, n_points=120, domain_size=32, seed=0):
        rng = np.random.default_rng(seed)
        pts, nrms = [], []
        for _ in range(n_samples):
            c = rng.uniform(0.35, 0.65, size=2)
            r = rng.uniform(0.08, 0.22, size=2)
            ang = rng.uniform(0, np.pi)
            p, nr, _ = sample_ellipse_cloud(n_points, center=c, radii=r,
                                            angle=ang)
            pts.append(p)
            nrms.append(nr)
        self._finish(np.stack(pts), np.stack(nrms), domain_size)
