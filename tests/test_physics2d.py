"""Formulation tests: Helmholtz, SUPG advection-diffusion, space-time heat,
Allen-Cahn, Burgers — element-matrix pins vs reference constants + MMS
solves."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnet_tpu.data.single_instances import (
    AllenCahnIceMeltRectangle,
    RectangleHelmholtzManufactured,
    SpaceTimeRectangleManufactured,
)
from diffnet_tpu.models.field import DirectField
from diffnet_tpu.pde.advection import AdvDiff2D
from diffnet_tpu.pde.helmholtz import Helmholtz2D
from diffnet_tpu.pde.spacetime import (
    AllenCahnIceMelt,
    BurgersSpaceTime,
    SpaceTimeHeat,
)
from diffnet_tpu.train.trainer import Trainer


def _element_matrix(module, residual_fn):
    """Columns of the single-element residual operator."""
    n = 2
    cols = []
    for j in range(4):
        u = np.zeros((1, n, n), np.float32)
        u[0, j // 2, j % 2] = 1.0
        cols.append(np.asarray(residual_fn(jnp.asarray(u))).reshape(4))
    return np.stack(cols, axis=1)  # M[i, j]


def test_supg_element_matrix_matches_reference_constants():
    """The general-table SUPG residual must reproduce the reference's
    hardcoded 4x4 element matrices (e17_adv_diff_2d_resmin.py:60-76)."""
    h = 0.37
    adv = (math.cos(math.pi / 6), math.sin(math.pi / 6))
    nu = 1e-4
    m = AdvDiff2D(None, None, adv=adv, diffusivity=nu, domain_size=2,
                  domain_length=h, batch_size=1)
    zeros = jnp.zeros((1, 1, 1, 4))

    def res(u):
        return m.residual(u, zeros, jnp.zeros((2, 2)), jnp.zeros((2, 2)))

    M = _element_matrix(m, res)
    AconvX = np.array([[-1, 1, -0.5, 0.5], [-1, 1, -0.5, 0.5],
                       [-0.5, 0.5, -1, 1], [-0.5, 0.5, -1, 1]]) / 6 * h
    AconvY = np.array([[-1, -0.5, 1, 0.5], [-0.5, -1, 0.5, 1],
                       [-1, -0.5, 1, 0.5], [-0.5, -1, 0.5, 1]]) / 6 * h
    Aed = np.array([[4, -1, -1, -2], [-1, 4, -2, -1],
                    [-1, -2, 4, -1], [-2, -1, -1, 4]]) / 6
    supgXX = np.array([[1, -1, 0.5, -0.5], [-1, 1, -0.5, 0.5],
                       [0.5, -0.5, 1, -1], [-0.5, 0.5, -1, 1]]) / 3
    supgXY = np.array([[0.75, 0.75, -0.75, -0.75], [-0.75, -0.75, 0.75, 0.75],
                       [0.75, 0.75, -0.75, -0.75],
                       [-0.75, -0.75, 0.75, 0.75]]) / 3
    supgYX = np.array([[0.75, -0.75, 0.75, -0.75], [0.75, -0.75, 0.75, -0.75],
                       [-0.75, 0.75, -0.75, 0.75],
                       [-0.75, 0.75, -0.75, 0.75]]) / 3
    supgYY = np.array([[1, 0.5, -1, -0.5], [0.5, 1, -0.5, -1],
                       [-1, -0.5, 1, 0.5], [-0.5, -1, 0.5, 1]]) / 3
    ax, ay = adv
    tau = m.tau
    Kref = (ax * AconvX + ay * AconvY + nu * Aed
            + tau * ax * ax * supgXX + tau * ax * ay * supgXY
            + tau * ay * ax * supgYX + tau * ay * ay * supgYY)
    np.testing.assert_allclose(M, Kref, rtol=1e-4, atol=1e-6)


def test_spacetime_heat_element_matrix():
    """Aet + nu*Aed of the reference space-time heat kernel
    (e3_st_mms_resmin.py:56-62)."""
    h = 0.21
    nu = 0.1
    m = SpaceTimeHeat(None, None, diffusivity=nu, domain_size=2,
                      domain_length=h, batch_size=1, u0=np.zeros((2, 2)))
    m.tau = 0.0  # reference comments out the SUPG term in Kmx (e3:59-61)
    zeros = jnp.zeros((1, 1, 1, 4))

    def res(u):
        return m.residual(u, zeros, jnp.zeros((2, 2)), jnp.zeros((2, 2)))

    M = _element_matrix(m, res)
    Aet = np.array([[-1, -0.5, 1, 0.5], [-0.5, -1, 0.5, 1],
                    [-1, -0.5, 1, 0.5], [-0.5, -1, 0.5, 1]]) / 6 * h
    Aed = np.array([[2, -2, 1, -1], [-2, 2, -1, 1],
                    [1, -1, 2, -2], [-1, 1, -2, 2]]) / 6
    np.testing.assert_allclose(M, Aet + nu * Aed, rtol=1e-4, atol=1e-6)


def test_helmholtz_mms_solve():
    n = 32
    ds = RectangleHelmholtzManufactured(domain_size=n)
    ds.n_samples = 1
    exact = ds.exact
    net = DirectField((n, n), init=np.zeros((n, n)))
    m = Helmholtz2D(net, ds, domain_size=n, batch_size=1,
                    exact_solution=exact)
    tr = Trainer(max_epochs=60, optimizer="lbfgs", lbfgs_max_iter=10)
    st = tr.fit(m)
    u = m.network.apply(st.params)[0]
    eL2, _, uex = m.calc_l2_err(u)
    assert float(eL2 / uex) < 1e-2, float(eL2 / uex)


def test_spacetime_heat_mms_solve():
    n = 32
    ds = SpaceTimeRectangleManufactured(domain_size=n)
    ds.n_samples = 1
    decay = ds.decay_rt
    nu = ds.diffusivity
    exact = lambda x, y: np.sin(math.pi * x) * np.exp(-decay * y)
    forcing = lambda x, y: (np.sin(math.pi * x) * np.exp(-decay * y)
                            * (nu * math.pi**2 - decay))
    net = DirectField((n, n), init=np.zeros((n, n)))
    m = SpaceTimeHeat(net, ds, domain_size=n, batch_size=1,
                      exact_solution=exact, forcing=forcing, u0=ds.u0)
    tr = Trainer(max_epochs=80, optimizer="lbfgs", lbfgs_max_iter=10)
    st = tr.fit(m)
    u = m.network.apply(st.params)
    inputs = jnp.asarray(ds[0][0])[None]
    u = m.apply_bcs(u, inputs)[0]
    eL2, _, uex = m.calc_l2_err(u)
    assert float(eL2 / uex) < 2e-2, float(eL2 / uex)


def test_advdiff_boundary_layer_solve():
    """1D advection-diffusion embedded in 2D with dominant advection: SUPG
    keeps the solution bounded (no oscillation blowup)."""
    n = 32
    from diffnet_tpu.data.single_instances import AdvDiff1dRectangle

    ds = AdvDiff1dRectangle(domain_size=n)
    ds.n_samples = 1
    net = DirectField((n, n), init=np.zeros((n, n)))
    m = AdvDiff2D(net, ds, adv=(1.0, 0.0), diffusivity=1e-3, domain_size=n,
                  batch_size=1, bc1_value=0.0,
                  forcing=lambda x, y: np.ones_like(x))
    tr = Trainer(max_epochs=60, optimizer="lbfgs", lbfgs_max_iter=10)
    st = tr.fit(m)
    u = np.asarray(m.network.apply(st.params)[0])
    assert np.isfinite(u).all()
    assert u.max() < 1.5 and u.min() > -0.2  # no Galerkin oscillations


def test_allen_cahn_trains():
    n = 32
    ds = AllenCahnIceMeltRectangle(domain_size=n)
    ds.n_samples = 1
    net = DirectField((n, n), init=ds.initial_guess)
    m = AllenCahnIceMelt(net, ds, domain_size=n, batch_size=1)
    batch = (jnp.asarray(ds[0][0])[None], jnp.asarray(ds[0][1])[None])
    loss0 = float(m.training_loss(net.init(None), batch))
    tr = Trainer(max_epochs=40, optimizer="lbfgs", lbfgs_max_iter=10)
    st = tr.fit(m)
    loss1 = float(m.training_loss(st.params, batch))
    assert loss1 < loss0 * 1e-3, (loss0, loss1)
    u = np.asarray(m.network.apply(st.params)[0])
    assert -0.3 < u.min() and u.max() < 1.3  # phase field stays bounded


def test_burgers_spacetime_trains():
    n = 33  # deg-2 needs (n-1) % 2 == 0
    x = np.linspace(-1, 1, n)
    xx, tt = np.meshgrid(x, np.linspace(0, 1, n))
    bc1 = np.full((n, n), -10.0); bc1[0, :] = 1.0     # IC at t=0 row
    bc1_val = np.zeros((n, n)); bc1_val[0, :] = np.cos(4 * math.pi * x)
    bc2 = np.full((n, n), -10.0); bc2[:, 0] = 1; bc2[:, -1] = 1
    inputs = np.stack([xx, bc1, bc2, bc1_val], -1).astype(np.float32)
    forcing = np.full((n, n, 1), 0.01 / math.pi, np.float32)

    from diffnet_tpu.data.loader import InMemoryDataset

    ds = InMemoryDataset(inputs[None], forcing[None])
    net = DirectField((n, n), init=np.tile(bc1_val[0], (n, 1)))
    m = BurgersSpaceTime(net, ds, domain_size=n, batch_size=1)
    batch = (jnp.asarray(inputs)[None], jnp.asarray(forcing)[None])
    loss0 = float(m.training_loss(net.init(None), batch))
    tr = Trainer(max_epochs=50, optimizer="lbfgs", lbfgs_max_iter=10)
    st = tr.fit(m)
    loss1 = float(m.training_loss(st.params, batch))
    assert loss1 < loss0 * 0.05, (loss0, loss1)


def test_helmholtz_delta_force():
    """Gaussian near-delta forcing (RectangleHelmholtzDeltaForce): response
    peaks near the source location (reference rectangles.py:292-327)."""
    from diffnet_tpu.data.single_instances import RectangleHelmholtzDeltaForce

    n = 32
    ds = RectangleHelmholtzDeltaForce(domain_size=n)
    ds.n_samples = 1
    net = DirectField((n, n), init=np.zeros((n, n)))
    m = Helmholtz2D(net, ds, domain_size=n, batch_size=1)
    tr = Trainer(max_epochs=80, optimizer="lbfgs", lbfgs_max_iter=10)
    st = tr.fit(m)
    u = np.asarray(m.network.apply(st.params)[0])
    assert np.isfinite(u).all()
    peak = np.unravel_index(np.argmax(np.abs(u)), u.shape)
    # source at (0.1875, 0.1875) -> index ~ 6 of 32 on each axis
    assert 2 <= peak[0] <= 12 and 2 <= peak[1] <= 12, peak


def test_advdiff_2d_skew_to_mesh():
    """Skew advection (AdvDiff2dRectangle BC split): the inlet value is
    transported along the advection direction, bounded by SUPG."""
    from diffnet_tpu.data.single_instances import AdvDiff2dRectangle

    n = 32
    ds = AdvDiff2dRectangle(domain_size=n)
    ds.n_samples = 1
    net = DirectField((n, n), init=np.zeros((n, n)))
    m = AdvDiff2D(net, ds, adv=(math.cos(math.pi / 6), math.sin(math.pi / 6)),
                  diffusivity=1e-4, domain_size=n, batch_size=1,
                  bc1_value=1.0)
    tr = Trainer(max_epochs=80, optimizer="lbfgs", lbfgs_max_iter=10)
    st = tr.fit(m)
    u = np.asarray(m.apply_bcs(m.network.apply(st.params),
                               jnp.asarray(ds[0][0])[None]))[0]
    assert np.isfinite(u).all()
    assert -0.3 < u.min() and u.max() < 1.3      # bounded (SUPG)
    # downstream of the hot inlet (left wall, upper part) stays hot
    assert u[n // 2, n // 2] > 0.5


def test_spacetime_heat_energy_variant():
    n = 24
    ds = SpaceTimeRectangleManufactured(domain_size=n)
    ds.n_samples = 1
    decay, nu = ds.decay_rt, ds.diffusivity
    exact = lambda x, y: np.sin(math.pi * x) * np.exp(-decay * y)
    forcing = lambda x, y: (np.sin(math.pi * x) * np.exp(-decay * y)
                            * (nu * math.pi**2 - decay))
    net = DirectField((n, n), init=np.zeros((n, n)))
    m = SpaceTimeHeat(net, ds, domain_size=n, batch_size=1,
                      exact_solution=exact, forcing=forcing, u0=ds.u0,
                      loss_type="energy")
    batch = (jnp.asarray(ds[0][0])[None], jnp.asarray(ds[0][1])[None])
    val = float(m.training_loss(net.init(None), batch))
    assert np.isfinite(val)
    g = jax.grad(m.training_loss)(net.init(None), batch)
    assert float(jnp.abs(g["field"]).max()) > 0


def test_parametric_image_training_with_unetres():
    """Image-ensemble IBN with the residual U-Net."""
    import PIL.Image

    from diffnet_tpu.data.loader import NumpyLoader
    from diffnet_tpu.data.parametric import ImageIMBack
    from diffnet_tpu.models.networks import UNetRes
    from diffnet_tpu.pde.ibn import IBNPoisson2D

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        for i in range(4):
            img = np.zeros((32, 32), np.uint8)
            img[8 + i:20 + i, 10:22] = 255
            PIL.Image.fromarray(img).save(os.path.join(d, f"s{i}.png"))
        ds = ImageIMBack(d)
        net = UNetRes(out_channels=1, hidden=(4, 8), n_resblocks=1,
                      n_dilated=1)
        m = IBNPoisson2D(net, source_from="inputs", domain_size=32,
                         batch_size=2, learning_rate=1e-3)
        st = Trainer(max_epochs=2, optimizer="adam",
                     learning_rate=1e-3).fit(m, NumpyLoader(ds, 2))
        batch = tuple(jnp.asarray(a) for a in
                      next(iter(NumpyLoader(ds, 2))))
        u, inputs, forcing = m.forward(st.params, batch)
        assert np.isfinite(float(m.loss(u, inputs, forcing)))
