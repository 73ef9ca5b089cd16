"""Isosurface extraction, surface bases, parametric datasets, pretraining."""

import jax
import jax.numpy as jnp
import numpy as np

from diffnet_tpu.utils.mesh3d import field_to_obj, surface_nets


def test_surface_nets_sphere(tmp_path):
    n = 24
    x = np.linspace(0, 1, n)
    zz, yy, xx = np.meshgrid(x, x, x, indexing="ij")
    sdf = np.sqrt((xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2) - 0.3
    verts, quads = surface_nets(sdf, level=0.0,
                                spacing=(1 / (n - 1),) * 3)
    assert len(verts) > 100 and len(quads) > 100
    r = np.linalg.norm(verts - 0.5, axis=1)
    # vertices lie on the sphere within a cell size
    assert abs(r.mean() - 0.3) < 0.02
    assert r.std() < 0.02
    # quad indices valid
    assert quads.min() >= 0 and quads.max() < len(verts)
    p = field_to_obj(str(tmp_path / "sphere.obj"), sdf, level=0.0)
    text = open(p).read()
    assert text.count("\nf ") + text.startswith("f ") >= len(quads) - 1


def test_surface_basis_tables():
    """Surface (facet) traces: integrate a 1D linear function along an edge
    using the surf tables (reference N_gp_surf, DiffNetFEM.py:244-269)."""
    from diffnet_tpu.core.quadrature import make_basis

    b = make_basis(2, 1, h=(0.25, 0.5))
    N = b.surf_tables["N"]          # [ngp_1d, nbf_1d]
    gx, gw = np.polynomial.legendre.leggauss(b.ngp_1d)
    # integral of the linear interpolant of (u0, u1) over the reference edge
    u = np.array([1.0, 3.0])
    val = np.sum(gw * (N @ u))
    assert np.isclose(val, 4.0)     # avg 2 * length 2 (reference element)
    # derivative trace has the 2/h scale baked in
    dN = b.surf_tables["dx"]
    assert np.allclose(dN @ u, (u[1] - u[0]) / 2 * (2 / 0.25))


def test_image_ensemble_neumann(tmp_path):
    import PIL.Image

    from diffnet_tpu.data.parametric import ImageIMBack, ImageIMBackNeumann

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        img = np.zeros((16, 16), np.uint8)
        img[4 + i:10 + i, 5:11] = 255
        PIL.Image.fromarray(img).save(d / f"s{i}.png")
    ds = ImageIMBack(str(d))
    assert len(ds) == 3
    inputs, forcing = ds[0]
    assert inputs.shape == (16, 16, 3)
    assert inputs[..., 1].sum() == 36  # object interior
    dsn = ImageIMBackNeumann(str(d))
    assert dsn[0][0].shape == (16, 16, 4)


def test_pretrain_autoencoder():
    from diffnet_tpu.models.networks import AE
    from diffnet_tpu.train.pretrain import (ArrayImageDataset,
                                            pretrain_autoencoder)

    rng = np.random.default_rng(0)
    images = rng.random((12, 32, 32)).astype(np.float32)
    ds = ArrayImageDataset(images)
    model = AE(out_channels=1, dims=2, n_downsample=2)
    params = pretrain_autoencoder(model, ds, epochs=2, batch_size=4)
    out = model.apply(params, jnp.asarray(images[:2][..., None]))
    assert out.shape == (2, 32, 32, 1)


def test_ibn_neumann_loss():
    """Neumann IBN: diffusivity zeroed inside the object
    (e2_cib_neumann.py:33-61 semantics)."""
    from diffnet_tpu.pde.ibn import IBNPoisson2D

    n = 16
    m = IBNPoisson2D(None, source_from="inputs", neumann=True, domain_size=n,
                     batch_size=1)
    chi = np.zeros((n, n)); chi[5:10, 5:10] = 1
    bc2 = np.zeros((n, n)); bc2[:, 0] = 1; bc2[0, :] = 1
    bc3 = np.zeros((n, n)); bc3[:, -1] = 1; bc3[-1, :] = 1
    inputs = jnp.asarray(
        np.stack([np.ones((n, n)), chi, bc2, bc3], -1), jnp.float32)[None]
    u = jnp.ones((1, n, n, 1)) * 0.5
    f = jnp.zeros((1, n, n, 1))
    val = float(m.loss(u, inputs, f))
    assert np.isfinite(val)
    # gradient wrt u must vanish inside the object interior (nu=0 there)
    g = jax.grad(lambda u: m.loss(u, inputs, f))(u)
    assert float(jnp.abs(g[0, 7, 7, 0])) < 1e-7


def test_klsum_stochastic_ensemble():
    from diffnet_tpu.data.parametric import KLSumStochastic

    coeffs = np.random.default_rng(0).normal(0, 0.4, (4, 6))
    ds = KLSumStochastic(coeffs, domain_size=16)
    assert len(ds) == 4
    inputs, forcing = ds[2]
    assert inputs.shape == (16, 16, 3)
    assert (inputs[..., 0] > 0).all()  # exp(KL) positive


def test_surface_nets_consistent_winding_and_closure():
    """All quad families wound consistently (the y-edge family used to be
    flipped — middle-axis parity), and boundary-clipped surfaces are
    watertight (Euler characteristic 2)."""
    from diffnet_tpu.utils.mesh3d import surface_nets

    n = 20
    z, y, x = np.mgrid[0:n, 0:n, 0:n] / (n - 1.0)
    sdf = np.sqrt((x - 0.5)**2 + (y - 0.5)**2 + (z - 0.5)**2) - 0.3
    v, q = surface_nets(sdf, level=0.0, spacing=(1 / (n - 1.0),) * 3)
    ctr = np.array([0.5, 0.5, 0.5])
    flipped = 0
    for quad in q:
        p = v[list(quad)]
        nrm = np.cross(p[1] - p[0], p[2] - p[0])
        if np.dot(nrm, p.mean(0) - ctr) <= 0:
            flipped += 1
    assert flipped == 0, f"{flipped}/{len(q)} quads wound inward"

    # clipped at the x=0 face -> cap must close the surface
    sdf2 = np.sqrt(x**2 + (y - 0.5)**2 + (z - 0.5)**2) - 0.3
    v2, q2 = surface_nets(sdf2, level=0.0)
    edges = set()
    for quad in q2:
        for i in range(4):
            a, b = int(quad[i]), int(quad[(i + 1) % 4])
            edges.add((min(a, b), max(a, b)))
    assert len(v2) - len(edges) + len(q2) == 2  # sphere topology
