"""Shape/behavior tests for point-cloud networks and the GAN zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnet_tpu.models import gan, pointnets as P


def test_knn_and_graph_feature():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 30, 2)), jnp.float32)
    idx = P.knn_indices(x, 5)
    assert idx.shape == (2, 30, 5)
    # nearest neighbor of each point is itself
    np.testing.assert_array_equal(np.asarray(idx)[..., 0],
                                  np.tile(np.arange(30), (2, 1)))
    g = P.graph_feature(x, 5)
    assert g.shape == (2, 30, 5, 4)
    # the self-edge difference is zero
    np.testing.assert_allclose(np.asarray(g)[..., 0, :2], 0.0, atol=1e-6)


def test_mlp_sin_nonlin():
    m = P.MLP([8, 8, 1], nonlin=jnp.sin)
    p = m.init(jax.random.key(0), jnp.ones((4, 3)))
    y = m.apply(p, jnp.ones((4, 3)))
    assert y.shape == (4, 1)


def test_immdiff_family_shapes():
    x = jnp.ones((2, 1000, 2))
    m = P.ImmDiff(out_size=64, hidden=64, n_hidden=2)
    p = m.init(jax.random.key(0), x)
    assert m.apply(p, x).shape == (2, 64, 64, 1)

    v = P.ImmDiffVAE(out_size=32, hidden=32, latent_dim=16)
    pv = v.init(jax.random.key(0), x)
    y, mu, logvar = v.apply(pv, x)
    assert y.shape == (2, 32, 32, 1) and mu.shape == (2, 16)

    lg = P.ImmDiffLarge(out_size=32)
    pl = lg.init(jax.random.key(0), x)
    assert lg.apply(pl, x).shape == (2, 32, 32, 1)

    n = jnp.ones((2, 1000, 2))
    ln = P.ImmDiffLargeNormals(out_size=32)
    pn = ln.init(jax.random.key(0), x, n)
    assert ln.apply(pn, x, n).shape == (2, 32, 32, 1)


def test_eikonal_linear():
    m = P.EikonalLinear(out_features=1, width=16, depth=2)
    p = m.init(jax.random.key(0), jnp.ones((7, 2)))
    assert m.apply(p, jnp.ones((7, 2))).shape == (7, 1)


def test_dgcnn_2d():
    x = jnp.ones((2, 64, 2))
    m = P.DGCNN2D(domain_size=32, k=8, lowest_size=8)
    p = m.init(jax.random.key(0), x)
    y = m.apply(p, x)
    assert y.shape == (2, 32, 32, 1)


def test_gan_zoo():
    z = jnp.ones((2, 128))
    g = gan.FCGenerator(output_dim=256)
    pg = g.init(jax.random.key(0), z)
    y = g.apply(pg, z)
    assert y.shape == (2, 256) and float(y.min()) >= 0

    rg = gan.ResidualFCGenerator(output_dim=256)
    prg = rg.init(jax.random.key(0), z)
    assert rg.apply(prg, z).shape == (2, 256)

    lg = gan.LatentGenerator(out_size=32, dim=8)
    plg = lg.init(jax.random.key(0), z)
    img = lg.apply(plg, z)
    assert img.shape == (2, 32, 32, 1)

    disc = gan.Discriminator(dim=8)
    pd = disc.init(jax.random.key(0), img)
    score = disc.apply(pd, img)
    assert score.shape == (2,)


def test_convnet1d_transpose_decoder():
    """ConvNet1D (reference immdiff_networks.py:7-24 ConvNet): each stride-2
    kernel-2 transpose conv exactly doubles the length; per-layer and final
    nonlinearities applied."""
    from diffnet_tpu.models.pointnets import ConvNet1D

    net = ConvNet1D(hidden_channels=[8, 4], out_channels=2,
                    final_nonlin=jnp.tanh)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 10, 5)),
                    jnp.float32)
    params = net.init(jax.random.key(0), x)
    y = net.apply(params, x)
    assert y.shape == (3, 80, 2)          # 10 -> 20 -> 40 -> 80
    assert float(jnp.abs(y).max()) <= 1.0  # tanh head
    g = jax.grad(lambda p: jnp.sum(net.apply(p, x) ** 2))(params)
    assert all(float(jnp.abs(l).max()) > 0
               for l in jax.tree_util.tree_leaves(g))
