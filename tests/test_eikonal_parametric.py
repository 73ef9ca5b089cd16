"""Parametric eikonal/IBN ensemble end-to-end (VERDICT r3 Missing #1):
train a point-cloud -> grid network over an ensemble of NURBS boundary
clouds on the winding-number-masked Poisson fill, then score HELD-OUT
geometries against the direct single-geometry Krylov solution.

Reference: examples/eiqonal/parametric/02_sum.py (ImmDiff),
05_largenet.py (ImmDiff_Large), 06_normals.py (points+normals input),
03_sum_vae.py (VAE head + KL).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _err(m, params, cloud, n):
    from diffnet_tpu.train.linear import module_linear_solve

    b = (jnp.asarray(cloud)[None], jnp.ones((1, n, n, 1), jnp.float32),
         jnp.zeros((1, n, n, 1), jnp.float32))
    u_net, inputs, _ = m.forward(params, b)
    u_net = np.asarray(m.apply_bcs(u_net, inputs))[0]
    u_ref, _ = module_linear_solve(
        m, inputs_tensor=np.asarray(inputs)[0],
        forcing_tensor=np.ones((n, n, 1), np.float32), tol=1e-8)
    out = np.asarray(inputs)[0, ..., 1] < 0.5
    return float(np.linalg.norm((u_net - np.asarray(u_ref))[out])
                 / np.linalg.norm(np.asarray(u_ref)[out]))


def _module(net, ds, n, net_input="cloud", loss="energy", bs=4):
    from diffnet_tpu.pde.ibn import IBNPoisson2D

    return IBNPoisson2D(net, ds, source_from="winding",
                        network_input=net_input, ibn_loss_type=loss,
                        winding_threshold=0.1, bc1_value=0.0,
                        domain_size=n, batch_size=bs, learning_rate=1e-3)


def test_ensemble_immdiff_heldout_generalizes():
    """ImmDiff over 4 training clouds generalizes to a held-out geometry:
    measured train 0.01-0.04 / held-out 0.10-0.14 rel-L2 after 300 Adam
    epochs on the energy loss (the resmin loss needs ~100x more epochs —
    see examples/eikonal_parametric.py)."""
    from diffnet_tpu.data.geometry_datasets import ParametricNURBS
    from diffnet_tpu.data.loader import NumpyLoader
    from diffnet_tpu.models.pointnets import ImmDiff
    from diffnet_tpu.train import Trainer

    n = 32
    ds = ParametricNURBS(n_samples=5, n_points=64, domain_size=n)
    heldout = ds.clouds[4]
    ds.clouds = ds.clouds[:4]
    ds.n_samples = 4
    net = ImmDiff(out_size=n, hidden=256, n_hidden=3)
    m = _module(net, ds, n)
    loader = NumpyLoader(ds, batch_size=4)
    st = Trainer(max_epochs=300, optimizer="adam",
                 learning_rate=1e-3).fit(m, loader)
    e_train = _err(m, st.params, ds.clouds[0], n)
    e_held = _err(m, st.params, heldout, n)
    assert e_train < 0.20, e_train
    assert e_held < 0.40, e_held


def test_vae_and_normals_variants_train():
    """The 03_sum_vae VAE head (KL-regularized training_loss) and the
    06_normals two-input network both train end-to-end over the
    ensemble."""
    from diffnet_tpu.data.geometry_datasets import ParametricNURBS
    from diffnet_tpu.data.loader import NumpyLoader
    from diffnet_tpu.models.pointnets import ImmDiffLargeNormals, ImmDiffVAE
    from diffnet_tpu.train import Trainer

    # n must be a doubling target of the ConvTranspose decoders (8 -> 16
    # -> 32): ImmDiffVAE/ImmDiffLarge produce power-of-two grids only
    n = 32
    ds = ParametricNURBS(n_samples=3, n_points=48, domain_size=n)
    loader = NumpyLoader(ds, batch_size=3)
    batch = tuple(jnp.asarray(np.asarray(a))[None].repeat(3, 0)
                  for a in ds[0])

    for net, net_input in ((ImmDiffVAE(out_size=n, hidden=128), "cloud"),
                           (ImmDiffLargeNormals(out_size=n),
                            "cloud_normals")):
        m = _module(net, ds, n, net_input=net_input, bs=3)
        p0 = m.init_params(jax.random.PRNGKey(0), batch)
        l0 = float(m.training_loss(p0, batch))
        st = Trainer(max_epochs=25, optimizer="adam",
                     learning_rate=1e-3).fit(m, loader)
        l1 = float(m.training_loss(st.params, batch))
        assert np.isfinite(l1) and l1 < l0, (type(net).__name__, l0, l1)
        u, inputs, _ = m.forward(st.params, batch)
        assert u.shape[1:3] == (n, n)


def test_winding_grid_differentiable_in_cloud():
    """The raw winding field is differentiable w.r.t. the cloud points —
    the reference exercises a differentiable winding number explicitly
    (examples/eiqonal/single_instance/02_differentiable_winding_number.py)."""
    from diffnet_tpu.core.geometry import sample_ellipse_cloud, winding_grid

    pts, nrm, area = sample_ellipse_cloud(48)

    def f(p):
        w = winding_grid(p[None], jnp.asarray(nrm)[None],
                         jnp.asarray(area)[None], (12, 12))
        return jnp.sum(w**2)

    g = jax.grad(f)(jnp.asarray(pts))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 1e-6


def test_mask_regression_loss_trains():
    """ibn_loss_type='mask': supervised regression of the raw winding
    field (the disjoint-map trainer, 08_disjoint_map.py:155-186)."""
    from diffnet_tpu.data.geometry_datasets import ParametricNURBS
    from diffnet_tpu.data.loader import NumpyLoader
    from diffnet_tpu.models.pointnets import ImmDiff
    from diffnet_tpu.train import Trainer

    n = 16
    ds = ParametricNURBS(n_samples=2, n_points=48, domain_size=n)
    net = ImmDiff(out_size=n, hidden=64, n_hidden=2)
    m = _module(net, ds, n, loss="mask", bs=2)
    batch = tuple(jnp.asarray(np.asarray(a))[None].repeat(2, 0)
                  for a in ds[0])
    p0 = m.init_params(jax.random.PRNGKey(0), batch)
    l0 = float(m.training_loss(p0, batch))
    st = Trainer(max_epochs=60, optimizer="adam",
                 learning_rate=1e-3).fit(m, NumpyLoader(ds, batch_size=2))
    l1 = float(m.training_loss(st.params, batch))
    assert np.isfinite(l1) and l1 < 0.5 * l0, (l0, l1)
