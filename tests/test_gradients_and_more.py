"""Deeper validation: autodiff gradients vs finite differences for the main
losses, deg-3 basis convergence, 3D IBN end-to-end, bf16 policy."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnet_tpu.data.single_instances import RectangleManufactured
from diffnet_tpu.models.field import DirectField
from diffnet_tpu.pde.poisson import Poisson2D


def _fd_grad(f, x, eps=1e-3):
    """Central finite-difference gradient at a few random coordinates."""
    rng = np.random.default_rng(0)
    idx = [tuple(rng.integers(0, s) for s in x.shape) for _ in range(5)]
    out = {}
    for i in idx:
        xp = x.copy()
        xp[i] += eps
        xm = x.copy()
        xm[i] -= eps
        out[i] = (f(jnp.asarray(xp)) - f(jnp.asarray(xm))) / (2 * eps)
    return out


@pytest.mark.parametrize("loss_type", ["energy", "resmin"])
def test_poisson_gradients_match_fd(loss_type):
    n = 12
    exact = lambda x, y: np.sin(math.pi * x) * np.sin(math.pi * y)
    forcing = lambda x, y: 2 * math.pi**2 * np.sin(math.pi * x) * np.sin(
        math.pi * y)
    ds = RectangleManufactured(domain_size=n)
    net = DirectField((n, n))
    m = Poisson2D(net, ds, domain_size=n, batch_size=1, loss_type=loss_type,
                  exact_solution=exact, forcing=forcing, mms_dirichlet=True)
    batch = (jnp.asarray(ds[0][0])[None], jnp.asarray(ds[0][1])[None])
    rng = np.random.default_rng(1)
    u0 = rng.random((n, n)).astype(np.float32)

    def f(u):
        return float(m.training_loss({"field": u}, batch))

    g = jax.grad(lambda p: m.training_loss(p, batch))({"field": jnp.asarray(u0)})
    g = np.asarray(g["field"])
    for i, fd in _fd_grad(f, u0).items():
        assert abs(g[i] - fd) < 5e-2 * max(1.0, abs(fd)), (i, g[i], fd)


def test_eikonal_gradient_finite():
    from diffnet_tpu.core.geometry import sample_ellipse_cloud
    from diffnet_tpu.pde.eikonal import Eikonal2D

    n = 16
    pts, nrm, area = sample_ellipse_cloud(64)
    cloud = jnp.asarray(
        np.concatenate([pts, nrm, area[:, None]], -1))[None]
    m = Eikonal2D(None, None, domain_size=n, batch_size=1)
    u = jnp.asarray(np.random.default_rng(0).random((1, n, n)), jnp.float32)
    g = jax.grad(lambda u: m.loss(u, cloud, None))(u)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_deg3_basis_mms_convergence():
    """Cubic basis: direct resmin solve converges to small L2 error at a
    coarse grid (O(h^4) superiority over deg-1 at equal nodes)."""
    from diffnet_tpu.train.trainer import Trainer

    n = 16  # (n-1) % 3 == 0
    exact = lambda x, y: np.sin(math.pi * x) * np.sin(math.pi * y)
    forcing = lambda x, y: 2 * math.pi**2 * np.sin(math.pi * x) * np.sin(
        math.pi * y)
    ds = RectangleManufactured(domain_size=n)
    ds.n_samples = 1
    net = DirectField((n, n), init=np.zeros((n, n)))
    m = Poisson2D(net, ds, domain_size=n, batch_size=1, fem_basis_deg=3,
                  loss_type="resmin", exact_solution=exact, forcing=forcing,
                  mms_dirichlet=True)
    st = Trainer(max_epochs=80, optimizer="lbfgs", lbfgs_max_iter=10).fit(m)
    eL2, _, uex = m.calc_l2_err(m.network.apply(st.params)[0])
    rel = float(eL2 / uex)
    assert rel < 2e-3, rel  # deg-1 at n=16 would be ~1.5e-2


def test_ibn3d_end_to_end():
    """3D parametric IBN: synthetic topology chi -> UNet3D -> energy loss
    trains (reference IBN_3D.py workflow)."""
    from diffnet_tpu.data.geometry_datasets import (TopoDataset3D,
                                                    synthesize_topology_3d)
    from diffnet_tpu.data.loader import NumpyLoader
    from diffnet_tpu.models.networks import UNet3D
    from diffnet_tpu.pde.ibn import IBNPoisson3D
    from diffnet_tpu.train.trainer import Trainer

    n = 32
    vols = [synthesize_topology_3d(n=n, seed=s) for s in range(2)]
    ds = TopoDataset3D(vols, domain_size=n)
    net = UNet3D(out_channels=1, base_filters=2)
    m = IBNPoisson3D(net, domain_size=n, batch_size=2, learning_rate=1e-3)
    loader = NumpyLoader(ds, batch_size=2)
    batch = tuple(jnp.asarray(a) for a in next(iter(loader)))
    p0 = m.init_params(jax.random.key(0), batch)
    loss0 = float(m.training_loss(p0, batch))
    st = Trainer(max_epochs=3, optimizer="adam", learning_rate=1e-3).fit(
        m, loader)
    loss1 = float(m.training_loss(st.params, batch))
    assert np.isfinite(loss1) and loss1 < loss0


def test_bf16_compute_policy():
    """Networks and FEM ops run in bfloat16 (the TPU fast path): finite
    outputs, ~1e-2 agreement with f32."""
    from diffnet_tpu.core import fem
    from diffnet_tpu.core.quadrature import make_basis
    from diffnet_tpu.models.networks import UNet

    n = 33
    basis = make_basis(2, 1, h=(1 / (n - 1),) * 2)
    rng = np.random.default_rng(0)
    u32 = jnp.asarray(rng.random((1, n, n)), jnp.float32)
    gp32 = fem.gp_eval(u32, basis, ("dx",))["dx"]
    gp16 = fem.gp_eval(u32.astype(jnp.bfloat16), basis, ("dx",))["dx"]
    assert gp16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(gp16, np.float32),
                               np.asarray(gp32), atol=0.5)

    x = jnp.ones((1, 64, 64, 3), jnp.bfloat16)
    net = UNet(out_channels=1, base_filters=4)
    params = net.init(jax.random.key(0), x)
    y = net.apply(params, x)
    assert np.isfinite(np.asarray(y, np.float32)).all()


def test_deg2_convergence_rate():
    """Quadratic basis: L2 error decays ~O(h^3) between two grids
    (the reference's MMS convergence acceptance criterion, SURVEY §4)."""
    from diffnet_tpu.train.trainer import Trainer

    errs = {}
    for n in (9, 17):
        exact = lambda x, y: np.sin(math.pi * x) * np.sin(math.pi * y)
        forcing = lambda x, y: 2 * math.pi**2 * np.sin(math.pi * x) * np.sin(
            math.pi * y)
        ds = RectangleManufactured(domain_size=n)
        ds.n_samples = 1
        net = DirectField((n, n), init=np.zeros((n, n)))
        m = Poisson2D(net, ds, domain_size=n, batch_size=1, fem_basis_deg=2,
                      loss_type="resmin", exact_solution=exact,
                      forcing=forcing, mms_dirichlet=True)
        st = Trainer(max_epochs=60, optimizer="lbfgs",
                     lbfgs_max_iter=10).fit(m)
        eL2, _, uex = m.calc_l2_err(m.network.apply(st.params)[0])
        errs[n] = float(eL2 / uex)
    rate = math.log2(errs[9] / errs[17])
    assert rate > 2.5, (errs, rate)  # O(h^3) expected for P2


def test_query_point_histograms():
    from diffnet_tpu.train.query import point_histograms

    all_u = np.arange(24, dtype=float).reshape(4, 2, 3)
    h = point_histograms(all_u, [(0, 0), (1, 2)])
    assert set(h) == {(0, 0), (1, 2)}
    np.testing.assert_array_equal(h[(0, 0)], [0, 6, 12, 18])
    np.testing.assert_array_equal(h[(1, 2)], [5, 11, 17, 23])


def test_training_determinism():
    """Same seed -> bitwise-identical training result (reference
    seed_everything(42) + deterministic=True parity)."""
    from diffnet_tpu.data.parametric import SyntheticPointClouds
    from diffnet_tpu.data.loader import NumpyLoader
    from diffnet_tpu.models.networks import AE
    from diffnet_tpu.pde.ibn import IBNPoisson2D
    from diffnet_tpu.train.trainer import Trainer

    def run():
        ds = SyntheticPointClouds(n_samples=8, n_points=32, domain_size=32,
                                  seed=3)
        net = AE(out_channels=1, dims=2, n_downsample=2)
        m = IBNPoisson2D(net, domain_size=32, batch_size=4)
        tr = Trainer(max_epochs=2, optimizer="adam", learning_rate=1e-3,
                     seed=7)
        st = tr.fit(m, NumpyLoader(ds, 4, shuffle=True, seed=7))
        return jax.tree_util.tree_leaves(st.params)

    a = run()
    b = run()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
