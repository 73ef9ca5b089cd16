"""Geometry dataset tests: PCVox, NURBS, topo3D, Burg2DXT, UNetRes, ILU,
TensorBoard logger."""

import jax
import jax.numpy as jnp
import numpy as np


def test_image_to_point_cloud_circle():
    from diffnet_tpu.data.geometry_datasets import image_to_point_cloud

    n = 64
    x = np.linspace(0, 1, n)
    xx, yy = np.meshgrid(x, x)
    img = (((xx - 0.5) ** 2 + (yy - 0.5) ** 2) < 0.09).astype(float)
    pts, nrm = image_to_point_cloud(img)
    r = np.linalg.norm(pts - 0.5, axis=1)
    assert abs(r.mean() - 0.3) < 0.05
    # outward normals roughly radial
    radial = (pts - 0.5) / np.maximum(r[:, None], 1e-9)
    cosang = np.sum(nrm * radial, -1)
    assert cosang.mean() > 0.8


def test_nurbs_curve_closed_loop():
    from diffnet_tpu.data.geometry_datasets import nurbs_curve

    ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    ctrl = 0.5 + 0.3 * np.stack([np.cos(ang), np.sin(ang)], -1)
    pts, nrm, area = nurbs_curve(ctrl, n_samples=100)
    assert pts.shape == (100, 2)
    # closed smooth curve around center: radius ~ between inradius/outradius
    r = np.linalg.norm(pts - 0.5, axis=1)
    assert 0.2 < r.min() and r.max() < 0.32
    # total arc length ~ perimeter of circle-ish loop
    assert 1.2 < area.sum() < 2.2
    # normals outward
    radial = (pts - 0.5) / r[:, None]
    assert np.sum(nrm * radial, -1).mean() > 0.9


def test_parametric_nurbs_with_winding():
    from diffnet_tpu.core.geometry import occupancy_from_cloud
    from diffnet_tpu.data.geometry_datasets import ParametricNURBS

    ds = ParametricNURBS(n_samples=2, domain_size=24, seed=1)
    cloud, forcing, sink = ds[0]
    assert forcing.shape == (24, 24, 1) and float(forcing.min()) == 1.0
    chi = occupancy_from_cloud(
        jnp.asarray(cloud[None, :, 0:2]), jnp.asarray(cloud[None, :, 2:4]),
        jnp.asarray(cloud[None, :, 4]), (24, 24))
    frac = float(np.asarray(chi).mean())
    assert 0.02 < frac < 0.5


def test_burg2dxt_and_fsdt_datasets():
    from diffnet_tpu.data.geometry_datasets import (Burg2DXT,
                                                    ElasticFSDTDataset)

    b = Burg2DXT(domain_size=17)
    inputs, forcing = b[0]
    assert inputs.shape == (17, 17, 4)
    assert (inputs[0, :, 1] == 1).all()          # IC row marked
    assert (inputs[1:, :, 1] == -10).all()       # sentinel elsewhere
    e = ElasticFSDTDataset(domain_size=9)
    assert e[0][0].shape == (9, 9, 5)


def test_topo3d_synthetic():
    from diffnet_tpu.data.geometry_datasets import (TopoDataset3D,
                                                    synthesize_topology_3d)

    vols = [synthesize_topology_3d(n=16, seed=s) for s in range(2)]
    assert 0.005 < vols[0].mean() < 0.6
    ds = TopoDataset3D(vols, domain_size=16)
    inputs, forcing = ds[1]
    assert inputs.shape == (16, 16, 16, 3)


def test_unetres():
    from diffnet_tpu.models.networks import UNetRes

    x = jnp.ones((1, 32, 32, 2))
    m = UNetRes(out_channels=1, hidden=(8, 16), n_resblocks=1, n_dilated=2)
    p = m.init(jax.random.key(0), x)
    y = m.apply(p, x)
    assert y.shape == (1, 32, 32, 1)
    mg = UNetRes(out_channels=1, hidden=(8, 16), n_resblocks=1, gated=True)
    pg = mg.init(jax.random.key(0), x)
    assert mg.apply(pg, x).shape == (1, 32, 32, 1)


def test_ilu_preconditioner_roundtrip(tmp_path):
    import scipy.io

    from diffnet_tpu.utils.precond import ilu_from_operator, load_ilu_mat

    rng = np.random.default_rng(0)
    A = np.diag(np.full(20, 4.0)) + np.diag(np.full(19, -1.0), 1) \
        + np.diag(np.full(19, -1.0), -1)
    invL = ilu_from_operator(lambda v: A @ v, 20)
    assert invL.shape == (20, 20)
    # preconditioned system better conditioned than raw
    M = invL @ A
    assert np.linalg.cond(M @ M.T) < np.linalg.cond(A @ A.T)

    # .mat round trips (dense + triplet layouts)
    scipy.io.savemat(tmp_path / "d.mat", {"invL": invL})
    np.testing.assert_allclose(load_ilu_mat(tmp_path / "d.mat"), invL,
                               atol=1e-6)
    rows, cols = np.nonzero(invL)
    scipy.io.savemat(tmp_path / "t.mat",
                     {"rows": rows + 1, "cols": cols + 1,
                      "data": invL[rows, cols]})
    np.testing.assert_allclose(load_ilu_mat(tmp_path / "t.mat"), invL,
                               atol=1e-6)


def test_tensorboard_logger(tmp_path):
    from diffnet_tpu.train.trainer import TensorBoardLogger

    tb = TensorBoardLogger(str(tmp_path))
    tb.log({"epoch": 0, "loss": 1.5})
    tb.log({"epoch": 1, "loss": 0.5})
    tb.close()
    import os

    assert any(f.startswith("events") for f in os.listdir(tmp_path))


def test_pcvox_area_weights_are_contour_lengths():
    """PCVox area channel must approximate the true boundary perimeter
    (scan-order adjacency inflated it ~22x; contour ordering + inside-ring
    filtering brings it to the pixel-staircase limit)."""
    from diffnet_tpu.data.geometry_datasets import PCVox

    n = 64
    y, x = np.mgrid[0:n, 0:n]
    img = (((x - 32) ** 2 + (y - 32) ** 2) < 20 ** 2).astype(float)
    ds = PCVox(img, domain_size=n)
    perim = float(ds.cloud[:, 4].sum())
    true = 2 * np.pi * 20 / (n - 1)
    assert 0.9 * true < perim < 1.35 * true, (perim, true)


def test_nurbs_weights_and_open_curves():
    """Closed curves wrap explicit weights (used to broadcast-crash); open
    curves use one-sided endpoint tangents (periodic roll spanned the
    whole curve, inflating endpoint areas ~10x)."""
    from diffnet_tpu.data.geometry_datasets import nurbs_curve

    t = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    ctrl = 0.5 + 0.3 * np.stack([np.cos(t), np.sin(t)], -1)
    pts, nrm, area = nurbs_curve(ctrl, weights=np.ones(8))
    assert np.isfinite(pts).all()
    p2, n2, a2 = nurbs_curve(ctrl[:5], degree=2, closed=False)
    med = float(np.median(a2))
    assert a2[0] < 3 * med and a2[-1] < 3 * med


def test_image_to_point_cloud_nonsquare():
    from diffnet_tpu.data.geometry_datasets import image_to_point_cloud

    img = np.zeros((32, 64))
    img[8:24, 16:48] = 1
    pts, nrm = image_to_point_cloud(img)
    assert (pts >= 0).all() and (pts <= 1).all()
