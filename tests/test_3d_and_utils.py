"""3D Poisson MMS solve (reference tests/test3D.py + CuboidManufactured) and
utils: VTI writer, viz, xyzna, UQ query."""

import math
import os

import jax.numpy as jnp
import numpy as np

from diffnet_tpu.data.single_instances import CuboidManufactured
from diffnet_tpu.models.field import DirectField
from diffnet_tpu.pde.poisson import Poisson3D
from diffnet_tpu.train.trainer import Trainer


def test_poisson3d_mms_resmin():
    """3D resmin with LBFGS reaches O(h^2) L2 error (reference test3D.py
    semantics + cuboids.py MMS forcing 19 pi^2 sin(pi x) sin(3 pi y)
    sin(3 pi z))."""
    n = 17
    ds = CuboidManufactured(domain_size=n)
    ds.n_samples = 1
    net = DirectField((n, n, n), init=np.zeros((n, n, n)))
    m = Poisson3D(net, ds, domain_size=n, batch_size=1, loss_type="resmin",
                  exact_solution=ds.exact, forcing=ds.forcing_func,
                  mms_dirichlet=True)
    tr = Trainer(max_epochs=60, optimizer="lbfgs", lbfgs_max_iter=10)
    st = tr.fit(m)
    u = m.network.apply(st.params)[0]
    eL2, _, uex = m.calc_l2_err(u)
    rel = float(eL2 / uex)
    assert rel < 0.1, rel  # 16 elements/axis and high-frequency MMS


def test_poisson3d_energy_loss_finite():
    n = 9
    ds = CuboidManufactured(domain_size=n)
    net = DirectField((n, n, n), init=np.zeros((n, n, n)))
    m = Poisson3D(net, ds, domain_size=n, batch_size=1, loss_type="energy")
    batch = (jnp.asarray(ds[0][0])[None], jnp.asarray(ds[0][1])[None])
    val = float(m.training_loss(net.init(None), batch))
    assert np.isfinite(val)


def test_vti_writer_roundtrip(tmp_path):
    from diffnet_tpu.utils.vti import write_vti

    u = np.arange(12, dtype=np.float64).reshape(3, 4)
    p = tmp_path / "field.vti"
    write_vti(str(p), u)
    text = p.read_text()
    assert "ImageData" in text and 'Name="u"' in text
    assert 'WholeExtent="0 3 0 2 0 0"' in text
    # all values present in ascii
    assert "1.1000E+01" in text
    # binary mode parses back
    p2 = tmp_path / "f2.vti"
    write_vti(str(p2), u, ascii_mode=False)
    import base64, struct
    body = p2.read_text().split("format=\"binary\">\n")[1].split("\n")[0]
    raw = base64.b64decode(body)
    nbytes = struct.unpack("<I", raw[:4])[0]
    vals = np.frombuffer(raw[4:4 + nbytes], "<f8")
    np.testing.assert_allclose(vals, u.reshape(-1))


def test_vti_3d(tmp_path):
    from diffnet_tpu.utils.vti import write_vti

    u = np.random.default_rng(0).random((4, 5, 6))
    p = tmp_path / "vol.vti"
    write_vti(str(p), u)
    assert 'WholeExtent="0 5 0 4 0 3"' in p.read_text()


def test_plots(tmp_path):
    from diffnet_tpu.utils.viz import plot_contours, plot_line_cuts

    u = np.random.default_rng(0).random((16, 16))
    f1 = plot_contours(str(tmp_path / "c.png"), {"u": u, "v": u * 2})
    f2 = plot_line_cuts(str(tmp_path / "l.png"), u, u_exact=u)
    assert os.path.exists(f1) and os.path.exists(f2)


def test_xyzna_roundtrip(tmp_path):
    from diffnet_tpu.utils.xyzna import read_xyzna, write_xyzna

    rng = np.random.default_rng(1)
    pts = rng.random((10, 3))
    nrm = rng.random((10, 3))
    area = rng.random(10)
    p = str(tmp_path / "m.xyzna")
    write_xyzna(p, pts, nrm, area)
    p2, n2, a2 = read_xyzna(p)
    np.testing.assert_allclose(p2, pts, atol=1e-9)
    np.testing.assert_allclose(n2, nrm, atol=1e-9)
    np.testing.assert_allclose(a2, area, atol=1e-9)


def test_uq_query(tmp_path):
    """Statistical query over a KL ensemble (reference query.py workflow)."""
    from diffnet_tpu.data.parametric import KLSumStochastic
    from diffnet_tpu.pde.poisson import Poisson2D
    from diffnet_tpu.train.query import query_statistical

    n = 16
    rng = np.random.default_rng(0)
    coeffs = rng.normal(0, 0.3, (6, 6))
    ds = KLSumStochastic(coeffs, domain_size=n)

    class MeanNet:
        def init(self, rng, x):
            return {}

        def apply(self, params, x):
            return x[..., 0:1] * 0.5  # deterministic fn of nu

    m = Poisson2D(MeanNet(), ds, domain_size=n, batch_size=4)
    mean, sdev, all_u = query_statistical(m, {}, ds, batch_size=4,
                                          out_dir=str(tmp_path))
    assert all_u.shape == (6, n, n)
    assert mean.shape == (n, n) and sdev.shape == (n, n)
    assert (sdev >= 0).all() and sdev.max() > 0
    assert os.path.exists(tmp_path / "q_mean.npy")


def test_fdm_module_3d():
    """FDMModule with nsd=3 wires 3D stencils (reference DiffNetFDM nsd=3
    branch)."""
    from diffnet_tpu.pde.base import FDMModule

    n = 17
    m = FDMModule(None, None, nsd=3, domain_size=n)
    x = np.linspace(0, 1, n)
    zz, yy, xx = np.meshgrid(x, x, x, indexing="ij")
    u = jnp.asarray(2 * xx - yy + 3 * zz, jnp.float32)
    np.testing.assert_allclose(np.asarray(m.derivative_x(u))[2:-2, 2:-2, 2:-2],
                               2.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m.derivative_z(u))[2:-2, 2:-2, 2:-2],
                               3.0, atol=1e-3)
    lap = m.calc_laplacian(u)
    np.testing.assert_allclose(np.asarray(lap)[2:-2, 2:-2, 2:-2], 0.0,
                               atol=1e-2)


def test_poisson3d_deg2():
    """Quadratic basis in 3D: eval of a triquadratic is exact."""
    from diffnet_tpu.core import fem
    from diffnet_tpu.core.quadrature import make_basis

    n = 9
    h = 2.0 / ((n - 1) // 2)  # element size: deg-2 elements span 2 node gaps
    b = make_basis(3, 2, h=(h, h, h))
    x = np.linspace(0, 2, n)
    zz, yy, xx = np.meshgrid(x, x, x, indexing="ij")
    u = jnp.asarray(xx**2 + yy * zz, jnp.float32)
    out = fem.gp_eval(u, b, ("N", "dx", "d2x"))
    xg, yg, zg = fem.gp_coords(b, (n, n, n))
    np.testing.assert_allclose(np.asarray(out["N"]), xg**2 + yg * zg,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["dx"]), 2 * xg, rtol=1e-3,
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["d2x"]), 2.0, atol=5e-3)


def test_eikonal_fdm_variant():
    from diffnet_tpu.core.geometry import sample_ellipse_cloud
    from diffnet_tpu.pde.eikonal import EikonalFDM2D

    n = 24
    pts, nrm, area = sample_ellipse_cloud(48)
    cloud = jnp.asarray(np.concatenate([pts, nrm, area[:, None]], -1))[None]
    m = EikonalFDM2D(None, None, domain_size=n, batch_size=1)
    u = jnp.asarray(np.random.default_rng(0).random((1, n, n)), jnp.float32)
    val = float(m.loss(u, cloud, None))
    assert np.isfinite(val)
    import jax as _jax
    g = _jax.grad(lambda u: m.loss(u, cloud, None))(u)
    assert np.isfinite(np.asarray(g)).all()


def test_sobol_coefficients():
    from diffnet_tpu.data.gen_input import sobol_coefficients

    c = sobol_coefficients(64, dim=6, scale=0.5, seed=0)
    assert c.shape == (64, 6)
    assert (np.abs(c) <= 0.5).all()
    # low-discrepancy: per-dimension mean near zero faster than random
    assert np.abs(c.mean(0)).max() < 0.05


def test_stablehlo_export_roundtrip(tmp_path):
    """Serving export: serialize the trained forward to StableHLO, reload
    WITHOUT model code, and get identical outputs."""
    import jax
    from diffnet_tpu.models.networks import ImplicitConv
    from diffnet_tpu.utils.export import (export_forward, load_exported,
                                          save_exported)

    net = ImplicitConv(width=8, depth=3)
    x = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 2)),
                    jnp.float32)
    params = net.init(jax.random.key(0), x)
    y_ref = net.apply(params, x)
    exp = export_forward(net, params, x)
    p = save_exported(exp, str(tmp_path / "model.stablehlo"))
    loaded = load_exported(p)
    y = loaded.call(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)
