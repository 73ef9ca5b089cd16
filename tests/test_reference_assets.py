"""Binary-asset loaders exercised against the REAL files shipped with the
reference repo (mounted read-only at /root/reference) — not synthesized
stand-ins. Every test skips cleanly when the asset is absent so the suite
stays hermetic off this image. (VERDICT r1 item 3.)

Asset map (SURVEY.md §2.6):
  * voxel raws + configs      examples/poisson/single_instance/Hand* etc.
  * Sobol KL coefficient npy  examples/poisson/parametric/sobol_6d.npy
  * airfoil obstacle images   examples/navier-stokes/single_instance/af_images/
  * point-cloud npz pair      examples/poisson/single_instance/point_cloud.npz
  * .xyzna ASCII cloud        examples/eiqonal/single_instance/model.xyzna
  * ILU .mat factor           (referenced by e8_2d_poisson_mms.py:67-68 but
                               not shipped in the mount — covered by a
                               conditional test that skips when absent)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
PSI = os.path.join(REF, "examples", "poisson", "single_instance")
PPAR = os.path.join(REF, "examples", "poisson", "parametric")
NSSI = os.path.join(REF, "examples", "navier-stokes", "single_instance")
EIK = os.path.join(REF, "examples", "eiqonal", "single_instance")


def _need(path):
    if not os.path.exists(path):
        pytest.skip(f"reference asset not mounted: {path}")
    return path


@pytest.mark.parametrize("prefix,expect_div", [
    ("Hand", (76, 48, 200)),
    ("Engine", (68, 92, 128)),
    ("humvee", (128, 72, 76)),
])
def test_load_raw_real_voxel_models(prefix, expect_div):
    """Parse the shipped <prefix>inouts.raw + <prefix>VoxelConfig.txt
    (reference loader voxels.py:8-33)."""
    from diffnet_tpu.data.single_instances import load_raw

    _need(os.path.join(PSI, prefix + "inouts.raw"))
    vox, num_div, grid_size, bmin = load_raw(os.path.join(PSI, prefix))
    assert tuple(num_div) == expect_div
    assert vox.shape == expect_div
    assert set(np.unique(vox)) <= {0.0, 1.0}
    frac = vox.mean()
    assert 0.001 < frac < 0.9  # a real object: neither empty nor solid
    assert len(grid_size) == 3 and np.all(grid_size > 0)


def test_voxel_dataset_short_3d_solve():
    """Embed the real Hand voxelization and run a SHORT 3D Poisson
    solve-in-object (reference 9_voxel_3d_hand.py:210-215 workload at reduced
    scale): energy loss finite and decreasing over a few Adam steps."""
    from diffnet_tpu.data.loader import NumpyLoader
    from diffnet_tpu.data.single_instances import VoxelIMBackRAW
    from diffnet_tpu.models.field import DirectField
    from diffnet_tpu.pde.poisson import Poisson3D
    from diffnet_tpu.train.trainer import Trainer

    _need(os.path.join(PSI, "Handinouts.raw"))
    n = 33
    ds = VoxelIMBackRAW(os.path.join(PSI, "Hand"), domain_size=n, offset=4)
    ds.n_samples = 1
    assert ds.bc1.sum() > 0  # part of the hand is inside the window
    m = Poisson3D(DirectField((n, n, n), init=np.zeros((n, n, n))), ds,
                  domain_size=n, batch_size=1, loss_type="energy",
                  bc1_value=1.0, bc2_value=0.0)
    loader = NumpyLoader(ds, batch_size=1)
    tr = Trainer(max_epochs=8, optimizer="adam", learning_rate=1e-2)
    st = tr.fit(m, loader)
    batch = (jnp.asarray(ds[0][0])[None], jnp.asarray(ds[0][1])[None])
    l_tr = float(m.training_loss(st.params, batch))
    l_0 = float(m.training_loss(
        m.network.init(None, None), batch))
    assert np.isfinite(l_tr) and l_tr < l_0


def test_sobol_6d_klsum_uq_query():
    """Load the shipped Sobol 6D coefficient table into the stochastic
    KL-sum dataset and run the statistical query pipeline (reference
    query.py:102-172 over sobol_6d.npy)."""
    from diffnet_tpu.data.parametric import KLSumStochastic
    from diffnet_tpu.models.networks import AE
    from diffnet_tpu.pde.poisson import Poisson2D
    from diffnet_tpu.train.query import calc_mean_stddev, query_batched

    path = _need(os.path.join(PPAR, "sobol_6d.npy"))
    coeffs = np.load(path)
    assert coeffs.shape == (65536, 6)
    ds = KLSumStochastic(coeffs[:8], domain_size=32, kl_terms=6)
    assert len(ds) == 8
    inputs, forcing = ds[0]
    assert inputs.shape == (32, 32, 3) and forcing.shape == (32, 32, 1)
    assert inputs[..., 0].min() > 0  # exp() diffusivity is positive

    net = AE(out_channels=1, dims=4, n_downsample=1)
    m = Poisson2D(net, ds, domain_size=32, batch_size=4, loss_type="energy")
    params = m.init_params(jax.random.key(0),
                           (jnp.asarray(inputs)[None],
                            jnp.asarray(forcing)[None]))
    all_u = query_batched(m, params, ds, batch_size=4)
    mean, sdev = calc_mean_stddev(all_u)
    assert mean.shape == (32, 32) and sdev.shape == (32, 32)
    assert np.all(np.isfinite(mean)) and np.all(sdev >= 0)


def test_airfoil_image_flow_dataset():
    """Load a real flow-past-airfoil obstacle image into the NS channel
    dataset (reference e2_ns_fpc_embedded_airfoil.py:95-158)."""
    from diffnet_tpu.data.flow import FlowPastObjectDataset

    path = _need(os.path.join(NSSI, "af_images", "fpa_bc_128x64.npy"))
    chi = np.load(path)
    assert chi.shape == (64, 128)
    assert 0 < chi.mean() < 0.5  # embedded object occupies part of channel
    ds = FlowPastObjectDataset(chi, domain_lengths=(4.0, 1.0), Re=100)
    inputs, forcing = ds[0]
    ny, nx = chi.shape
    assert inputs.shape == (ny, nx, 6)
    # inlet profile: parabolic, zero at walls, max mid-channel
    assert ds.u_bc[:, 0].max() == pytest.approx(1.0, abs=1e-3)
    assert ds.u_bc[0, 0] == 0 and ds.u_bc[-1, 0] == 0
    # object is inside the velocity no-slip masks
    assert np.all(ds.bc1[chi > 0.5] == 1)


def test_model_xyzna_real_file_roundtrip(tmp_path):
    """Read the shipped model.xyzna (reference block format with count
    header, xyzna_reader.py:1-22) and round-trip through our writer."""
    from diffnet_tpu.utils.xyzna import read_xyzna, write_xyzna

    path = _need(os.path.join(EIK, "model.xyzna"))
    pts, nrm, area = read_xyzna(path)
    assert len(pts) == 10242 and pts.shape == nrm.shape == (10242, 3)
    # normals should be unit-ish for a surface cloud
    norms = np.linalg.norm(nrm, axis=1)
    assert 0.5 < np.median(norms) < 1.5
    assert np.all(area >= 0)

    out = tmp_path / "copy.xyzna"
    write_xyzna(out, pts, nrm, area)
    p2, n2, a2 = read_xyzna(out)
    np.testing.assert_allclose(p2, pts, atol=1e-12)
    np.testing.assert_allclose(n2, nrm, atol=1e-12)
    np.testing.assert_allclose(a2, area, atol=1e-12)


@pytest.mark.parametrize("sub", ["", "pc-generated-from-nurbs"])
def test_point_cloud_npz_real_ensembles(sub):
    """Load the shipped point_cloud.npz/normals.npz ensembles through
    PointClouds (reference IBN_2D.py:35-84): split sizes, per-item layout,
    clouds land inside the unit domain."""
    from diffnet_tpu.data.parametric import PointClouds

    d = os.path.join(PSI, sub) if sub else PSI
    _need(os.path.join(d, "point_cloud.npz"))
    train = PointClouds(d, split="train", domain_size=32)
    val = PointClouds(d, split="val", domain_size=32)
    assert len(train) == 6250 - 1250 and len(val) == 1250
    cloud, forcing, sink = train[0]
    assert cloud.shape == (1000, 5)  # x y nx ny area
    assert forcing.shape == (32, 32, 1) and sink.shape == (32, 32, 1)
    pts = cloud[:, :2]
    assert pts.min() >= -0.05 and pts.max() <= 1.05


def test_ibn_winding_on_real_cloud():
    """Flagship IBN path on a REAL cloud: winding-number chi of a shipped
    point cloud is ~1 inside and ~0 outside (reference IBN_2D.py:89-104)."""
    from diffnet_tpu.core.geometry import winding_number_2d
    from diffnet_tpu.data.parametric import PointClouds

    _need(os.path.join(PSI, "point_cloud.npz"))
    ds = PointClouds(PSI, split="val", domain_size=32)
    cloud, _, _ = ds[0]
    pts = jnp.asarray(cloud[None, :, :2])
    nrm = jnp.asarray(cloud[None, :, 2:4])
    area = jnp.asarray(cloud[None, :, 4])
    n = 32
    x = np.linspace(0, 1, n)
    xx, yy = np.meshgrid(x, x)
    q = jnp.asarray(np.stack([xx.ravel(), yy.ravel()], -1))
    w = np.asarray(winding_number_2d(pts, nrm, area, q)).reshape(n, n)
    chi = (np.abs(w) > 0.5).astype(float)
    assert 0.005 < chi.mean() < 0.9  # a real closed-ish region
    # boundary of the box is outside the object
    assert chi[0].max() == 0 and chi[-1].max() == 0


def test_ilu_mat_factor_if_present():
    """The reference ILU `.mat` (e8_2d_poisson_mms.py:67-68, utils.py:36-70)
    is not shipped in this mount; when a copy exists, parse it."""
    import glob

    from diffnet_tpu.utils.precond import load_ilu_mat

    hits = glob.glob(os.path.join(REF, "**", "*.mat"), recursive=True)
    if not hits:
        pytest.skip("no .mat asset shipped in the reference mount")
    M = load_ilu_mat(hits[0])
    assert M.ndim == 2 and M.shape[0] == M.shape[1]


def test_airfoil_dat_profiles_parse():
    """The shipped e864 airfoil .dat profiles (examples/poisson/
    single_instance/airfoil-e864/) parse into 2D closed-curve coordinates."""
    d = _need(os.path.join(PSI, "airfoil-e864"))
    import glob

    files = sorted(glob.glob(os.path.join(d, "*.dat")))
    assert files
    pts = np.loadtxt(files[0])
    assert pts.ndim == 2 and pts.shape[1] >= 2 and len(pts) > 20
    assert np.all(np.isfinite(pts))
