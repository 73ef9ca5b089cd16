"""Shape/behavior tests for the network zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnet_tpu.models import networks as N
from diffnet_tpu.models.field import DirectField


def _init_apply(model, x, **kw):
    params = model.init(jax.random.key(0), x, **kw)
    return params, model.apply(params, x, **kw)


def test_unet_shapes():
    x = jnp.ones((2, 64, 64, 3))
    m = N.UNet(out_channels=1)
    _, y = _init_apply(m, x)
    assert y.shape == (2, 64, 64, 1)
    assert float(y.min()) >= 0 and float(y.max()) <= 1  # sigmoid head


def test_unet_nonsquare():
    x = jnp.ones((1, 128, 64, 2))
    _, y = _init_apply(N.UNet(out_channels=1), x)
    assert y.shape == (1, 128, 64, 1)


def test_unet3d_shapes():
    x = jnp.ones((1, 32, 32, 32, 2))
    _, y = _init_apply(N.UNet3D(out_channels=1, base_filters=4), x)
    assert y.shape == (1, 32, 32, 32, 1)


def test_multiout_unet():
    x = jnp.ones((1, 64, 64, 4))
    _, ys = _init_apply(N.MultiOutUNet(num_outputs=3, base_filters=8), x)
    assert len(ys) == 3
    for y in ys:
        assert y.shape == (1, 64, 64, 1)


def test_ae_roundtrip_shape():
    x = jnp.ones((2, 64, 64, 1))
    _, y = _init_apply(N.AE(out_channels=1, dims=8, n_downsample=4), x)
    assert y.shape == (2, 64, 64, 1)


def test_vae_outputs():
    x = jnp.ones((1, 64, 64, 1))
    m = N.VAE(out_channels=1, dims=8, n_downsample=3, latent_channels=8)
    params = m.init(jax.random.key(0), x)
    y, mu, logvar = m.apply(params, x)
    assert y.shape == (1, 64, 64, 1)
    assert mu.shape == logvar.shape
    # sampled path needs a 'latent' rng
    y2, _, _ = m.apply(params, x, sample=True,
                       rngs={"latent": jax.random.key(1)})
    assert y2.shape == y.shape


@pytest.mark.parametrize("in_dim,out_dim", [(64, 64), (100, 100), (65, 65)])
def test_goodnetwork_arbitrary_dims(in_dim, out_dim):
    """Size-adaptive net handles non-power-of-2 dims (reference
    wgan.py GoodNetwork capability)."""
    x = jnp.ones((1, in_dim, in_dim, 3))
    m = N.GoodNetwork(in_dim=in_dim, out_dim=out_dim, filters=4)
    _, y = _init_apply(m, x)
    assert y.shape == (1, out_dim, out_dim, 1)


def test_implicit_conv():
    x = jnp.ones((2, 32, 32, 2))
    _, y = _init_apply(N.ImplicitConv(width=16, depth=4), x)
    assert y.shape == (2, 32, 32, 1)
    assert float(jnp.abs(y).max()) <= 1.0  # tanh head


def test_resnet_ed():
    x = jnp.ones((1, 64, 64, 2))
    _, y = _init_apply(N.ResNetED(base_filters=8, n_down=2, n_blocks=1), x)
    assert y.shape == (1, 64, 64, 1)


def test_local_conv_unshared_weights():
    x = jnp.ones((1, 16, 16, 1))
    m = N.LocalConv2d(features=2, kernel=(3, 3), in_size=(16, 16))
    params, y = _init_apply(m, x)
    assert y.shape == (1, 14, 14, 2)
    # unshared: kernel has a distinct weight per output pixel
    assert params["params"]["kernel"].shape == (14, 14, 9, 2)


def test_networks_trainable_grad():
    """Gradients flow through the UNet via a PDE-style scalar loss."""
    x = jnp.ones((1, 64, 64, 3))
    m = N.UNet(out_channels=1, base_filters=4)
    params = m.init(jax.random.key(0), x)

    def loss(p):
        return jnp.sum(m.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in flat)


def test_direct_field_multi():
    f = DirectField((8, 8), n_fields=3)
    p = f.init(None)
    outs = f.apply(p, jnp.ones((4, 8, 8, 1)))
    assert len(outs) == 3 and outs[0].shape == (4, 8, 8)


def test_localconv_init_scale_and_shape_guard():
    """Per-location kernels: init std must reflect fan_in = kh*kw*C (a
    plain lecun_normal over the 4D shape measured std ~0.005 instead of
    ~0.33), and a mismatched input size must raise, not silently compute
    on the top-left window."""
    import jax
    import pytest

    from diffnet_tpu.models import LocalConv2d

    m = LocalConv2d(features=4, in_size=(16, 16))
    x = jnp.ones((1, 16, 16, 1))
    params = m.init(jax.random.key(0), x)
    w = params["params"]["kernel"]
    std = float(jnp.std(w))
    assert 0.2 < std < 0.45, std     # ~1/sqrt(9) = 0.33
    assert m.apply(params, x).shape == (1, 14, 14, 4)
    with pytest.raises(ValueError, match="in_size"):
        m.apply(params, jnp.ones((1, 32, 32, 1)))


def test_unetres_export_and_odd_widths():
    """UNetRes is importable from diffnet_tpu.models and GroupNorm groups
    divide any channel width (12 % 8 != 0 used to crash)."""
    import jax

    from diffnet_tpu.models import UNetRes

    net = UNetRes(out_channels=1, hidden=(4, 12))
    x = jnp.ones((1, 16, 16, 1))
    params = net.init(jax.random.key(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 16, 16, 1)
