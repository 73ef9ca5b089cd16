"""IBN parametric path tests: winding numbers, occupancy, end-to-end
training of the flagship pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from diffnet_tpu.core.geometry import (
    occupancy_from_cloud,
    sample_ellipse_cloud,
    sample_polygon_cloud,
    winding_number_2d,
)
from diffnet_tpu.data.loader import NumpyLoader
from diffnet_tpu.data.parametric import SyntheticPointClouds
from diffnet_tpu.models.networks import AE
from diffnet_tpu.pde.ibn import IBNPoisson2D
from diffnet_tpu.train.trainer import Trainer


def test_winding_number_circle_inside_outside():
    pts, nrm, area = sample_ellipse_cloud(n_points=200, center=(0.5, 0.5),
                                          radii=(0.25, 0.25))
    q = jnp.asarray([[0.5, 0.5], [0.6, 0.5], [0.9, 0.9], [0.05, 0.05],
                     [0.5, 0.75]])
    w = winding_number_2d(jnp.asarray(pts)[None], jnp.asarray(nrm)[None],
                          jnp.asarray(area)[None], q, chunk=8)
    w = np.asarray(w)[0]
    assert w[0] > 0.95 and w[1] > 0.95      # deep inside -> ~1
    assert abs(w[2]) < 0.05 and abs(w[3]) < 0.05  # outside -> ~0
    assert 0.2 < w[4] < 0.8                 # exactly on the curve -> ~0.5


def test_winding_number_polygon():
    pts, nrm, area = sample_polygon_cloud(
        [(0.3, 0.3), (0.7, 0.3), (0.7, 0.7), (0.3, 0.7)], points_per_edge=50)
    q = jnp.asarray([[0.5, 0.5], [0.1, 0.1], [0.8, 0.5]])
    w = np.asarray(winding_number_2d(jnp.asarray(pts)[None],
                                     jnp.asarray(nrm)[None],
                                     jnp.asarray(area)[None], q))[0]
    assert w[0] > 0.9 and abs(w[1]) < 0.1 and abs(w[2]) < 0.1


def test_occupancy_grid_matches_analytic():
    pts, nrm, area = sample_ellipse_cloud(n_points=256, center=(0.5, 0.5),
                                          radii=(0.3, 0.2))
    chi = occupancy_from_cloud(jnp.asarray(pts)[None], jnp.asarray(nrm)[None],
                               jnp.asarray(area)[None], (32, 32))
    chi = np.asarray(chi)[0]
    x = np.linspace(0, 1, 32)
    xx, yy = np.meshgrid(x, x)
    inside = ((xx - 0.5) / 0.3) ** 2 + ((yy - 0.5) / 0.2) ** 2 < 1
    # allow a one-cell band of disagreement at the interface
    disagree = np.sum(chi != inside)
    assert disagree < 40, f"{disagree} mismatched nodes"


def test_winding_chunking_consistent():
    pts, nrm, area = sample_ellipse_cloud(n_points=64)
    q = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (500, 2)),
                    jnp.float32)
    args = (jnp.asarray(pts)[None], jnp.asarray(nrm)[None],
            jnp.asarray(area)[None])
    w1 = winding_number_2d(*args, q, chunk=500)
    w2 = winding_number_2d(*args, q, chunk=64)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


def test_ibn_end_to_end_training():
    """Flagship path: clouds -> winding chi -> AE -> energy loss; loss
    decreases and u respects immersed Dirichlet values after masking."""
    n = 32
    ds = SyntheticPointClouds(n_samples=8, n_points=64, domain_size=n)
    loader = NumpyLoader(ds, batch_size=4, shuffle=False)
    net = AE(out_channels=1, dims=4, n_downsample=2)
    module = IBNPoisson2D(net, domain_size=n, batch_size=4,
                          learning_rate=3e-3)
    trainer = Trainer(max_epochs=5, optimizer="adam", learning_rate=3e-3)
    state = trainer.fit(module, loader)
    # evaluate one batch through forward
    batch = jax.tree.map(jnp.asarray, next(iter(loader)))
    u, inputs, forcing = module.forward(state.params, batch)
    assert u.shape == (4, n, n, 1)
    chi = np.asarray(inputs[..., 1])
    assert chi.min() == 0.0 and chi.max() == 1.0
    assert 0.02 < chi.mean() < 0.5  # ellipses cover a plausible area fraction
    loss = float(module.loss(u, inputs, forcing))
    assert np.isfinite(loss)


def test_ibn_resmin_variant():
    """Winding-number Galerkin-resmin IBN variant (09_airfoil.py
    loss_poisson_windingnumber)."""
    n = 16
    m = IBNPoisson2D(None, source_from="inputs", ibn_loss_type="resmin",
                     domain_size=n, batch_size=1)
    chi = np.zeros((n, n)); chi[5:10, 5:10] = 1
    bc2 = np.zeros((n, n)); bc2[[0, -1], :] = 1; bc2[:, [0, -1]] = 1
    inputs = jnp.asarray(
        np.stack([np.ones((n, n)), chi, bc2], -1), jnp.float32)[None]
    u = jnp.asarray(np.random.default_rng(0).random((1, n, n, 1)),
                    jnp.float32)
    f = jnp.zeros((1, n, n, 1))
    val = float(m.loss(u, inputs, f))
    assert np.isfinite(val) and val > 0
    g = jax.grad(lambda u: m.loss(u, inputs, f))(u)
    assert np.isfinite(np.asarray(g)).all()


def test_ibn_dgcnn_cloud_input():
    """IBN with a point-cloud-consuming network (DGCNN): cloud -> grid
    solution, winding chi used only for the immersed masks (reference
    IBN_DGCNN2d wrapper)."""
    from diffnet_tpu.models.pointnets import DGCNN2D
    from diffnet_tpu.train.trainer import Trainer

    n = 32
    ds = SyntheticPointClouds(n_samples=4, n_points=48, domain_size=n)
    loader = NumpyLoader(ds, batch_size=2)
    net = DGCNN2D(domain_size=n, k=8, lowest_size=8)
    m = IBNPoisson2D(net, domain_size=n, batch_size=2,
                     network_input="cloud", learning_rate=1e-3)
    st = Trainer(max_epochs=2, optimizer="adam", learning_rate=1e-3).fit(
        m, loader)
    batch = jax.tree.map(jnp.asarray, next(iter(loader)))
    u, inputs, forcing = m.forward(st.params, batch)
    assert u.shape == (2, n, n, 1)
    assert np.isfinite(float(m.loss(u, inputs, forcing)))


def test_viz_loss_and_histograms(tmp_path):
    from diffnet_tpu.train.query import point_histograms
    from diffnet_tpu.utils import plot_losses, plot_point_histograms
    import csv, os

    run = tmp_path / "r"
    run.mkdir()
    with open(run / "metrics.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["epoch", "loss", "val_loss"])
        w.writeheader()
        for e in range(5):
            w.writerow({"epoch": e, "loss": 1.0 / (e + 1),
                        "val_loss": 2.0 / (e + 1)})
    p1 = plot_losses(str(run))
    all_u = np.random.default_rng(0).random((20, 4, 4))
    h = point_histograms(all_u, [(1, 1), (2, 3)])
    p2 = plot_point_histograms(str(run / "hist.png"), h)
    assert os.path.exists(p1) and os.path.exists(p2)


def test_ibn2d_apply_bcs_substitutes_dirichlet():
    """apply_bcs (used by query/viz tooling) applies the same immersed
    masking loss() enforces — both Dirichlet and Neumann variants."""
    n = 8
    m = IBNPoisson2D(None, source_from="inputs", domain_size=n, batch_size=1)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((1, n, n)), jnp.float32)
    inputs = np.zeros((1, n, n, 3), np.float32)
    inputs[..., 0] = 1.0
    inputs[0, 2:4, 2:4, 1] = 1.0     # source chi
    inputs[0, 0, :, 2] = 1.0         # sink
    ub = m.apply_bcs(u, jnp.asarray(inputs))
    assert np.allclose(np.asarray(ub)[0, 2:4, 2:4], 1.0)
    assert np.allclose(np.asarray(ub)[0, 0, :], 0.0)

    mn = IBNPoisson2D(None, source_from="inputs", neumann=True,
                      domain_size=n, batch_size=1)
    inp4 = np.zeros((1, n, n, 4), np.float32)
    inp4[..., 0] = 1.0
    inp4[0, 3:5, 3:5, 1] = 1.0       # object interior (NOT constrained)
    inp4[0, :, 0, 2] = 1.0           # bc2 -> 1.0
    inp4[0, :, -1, 3] = 1.0          # bc3 -> 0.0
    ub = np.asarray(mn.apply_bcs(u, jnp.asarray(inp4)))
    assert np.allclose(ub[0, :, 0], 1.0)
    assert np.allclose(ub[0, :, -1], 0.0)
    # interior of the object keeps the raw field (Neumann: not Dirichlet)
    assert np.allclose(ub[0, 3:5, 3:5], np.asarray(u)[0, 3:5, 3:5])


def test_ibn2d_neumann_resmin_interior_rows_live():
    """neumann=True + resmin: the object-interior (bc1) equations must stay
    in the residual — they determine u inside under nu=0 — while the
    Dirichlet rows (bc2/bc3) are zeroed."""
    n = 9
    m = IBNPoisson2D(None, source_from="inputs", neumann=True,
                     ibn_loss_type="resmin", domain_size=n, batch_size=1)
    inp = np.zeros((1, n, n, 4), np.float32)
    inp[..., 0] = 1.0
    inp[0, 3:6, 3:6, 1] = 1.0
    inp[0, :, 0, 2] = 1.0
    inp[0, :, -1, 3] = 1.0
    forcing = np.ones((1, n, n, 1), np.float32)
    inputs = jnp.asarray(inp)
    f = jnp.asarray(forcing)

    g = jax.grad(lambda u: m.loss(u, inputs, f))(
        jnp.asarray(np.random.default_rng(1).random((1, n, n)), jnp.float32))
    g = np.asarray(g)
    # the natural-BC equation at an object-BOUNDARY node (chi=1 but its
    # support has nu!=0 elements) must be live — the old code zeroed every
    # bc1 row, deleting exactly these equations. (A fully-interior node's
    # row is u-independent — nu=0 on its whole support — so its gradient
    # is legitimately zero.)
    assert np.abs(g[0, 3, 4]) > 0
    assert np.allclose(g[0, :, 0], 0.0)    # bc2 Dirichlet row dead
    assert np.allclose(g[0, :, -1], 0.0)   # bc3 Dirichlet row dead


def test_h_follows_plural_domain_kwargs():
    """h-derived stabilization parameters must use the ACTUAL X spacing
    when the grid is configured via domain_sizes/domain_lengths (the
    singular kwargs keep their defaults and used to win silently)."""
    from diffnet_tpu.pde.flow import NavierStokes

    m = NavierStokes(None, None, domain_lengths=(4.0, 1.0),
                     domain_sizes=(129, 33), batch_size=1, Re=100)
    hx = 4.0 / 128
    assert np.isclose(m.h, hx)
    assert np.isclose(m.pspg_param, hx**2 * 100 / 12.0)
