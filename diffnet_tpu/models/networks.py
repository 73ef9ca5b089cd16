"""Solution-network zoo (flax.linen, NHWC / NDHWC channels-last).

TPU-native re-implementations of the reference network library
(reference: DiffNet/networks/{unets,autoencoders,wgan,wgan3d,
wgan_multi_output,conv11,resnets,localconv}.py). Architecture capability is
matched (depths, filter schedules, norm/activation choices, skip topology,
arbitrary in/out spatial dims); implementation is idiomatic JAX:

  * channels-last layout (XLA's efficient TPU conv layout),
  * InstanceNorm via ``flax.linen.InstanceNorm``,
  * dropout is deterministic(off) by default; pass ``train=True`` and a
    ``'dropout'`` rng to enable (replaces torch's implicit training mode),
  * the size-adaptive "GoodNetwork" (wgan.py:146-158) computes first/last
    kernel sizes from arbitrary ``in_dim``/``out_dim`` with standard conv
    arithmetic instead of the reference's ad-hoc cascade (wgan.py:113-129,
    which degenerates for large dim gaps).

All modules conform to the framework network protocol:
``init(rng, x) -> params`` / ``apply(params, x) -> u`` (native flax API).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["UNet", "UNetRes", "UNet3D", "MultiOutUNet", "AE", "VAE",
           "GoodNetwork", "ImplicitConv", "ResNetED", "LocalConv2d"]


def _norm():
    return nn.InstanceNorm(use_bias=False, use_scale=False)


class Down(nn.Module):
    """stride-2 conv + (InstanceNorm) + LeakyReLU(0.2) + (dropout)
    (reference unets.py:13-25)."""

    features: int
    normalize: bool = True
    dropout: float = 0.0
    kernel: int = 4
    ndim: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.kernel,) * self.ndim
        s = (2,) * self.ndim
        p = ((1, 1),) * self.ndim
        x = nn.Conv(self.features, k, strides=s, padding=p, use_bias=False)(x)
        if self.normalize:
            x = _norm()(x)
        x = nn.leaky_relu(x, 0.2)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class Up(nn.Module):
    """transpose-conv x2 + InstanceNorm + ReLU + (dropout) + skip-concat
    (reference unets.py:28-45)."""

    features: int
    dropout: float = 0.0
    ndim: int = 2

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        k = (4,) * self.ndim
        s = (2,) * self.ndim
        x = nn.ConvTranspose(self.features, k, strides=s, padding="SAME",
                             use_bias=False)(x)
        x = _norm()(x)
        x = nn.relu(x)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return jnp.concatenate([x, skip], axis=-1)


class UNet(nn.Module):
    """Pix2pix-style 5-down/4-up U-Net with sigmoid head
    (reference unets.py:48-81). Input [B, H, W, C_in] -> [B, H, W, out_channels];
    H, W must be divisible by 32."""

    out_channels: int = 1
    base_filters: int = 32
    final_sigmoid: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_filters
        d1 = Down(f, normalize=False)(x, train)
        d2 = Down(2 * f)(d1, train)
        d3 = Down(4 * f)(d2, train)
        d4 = Down(8 * f, dropout=0.5)(d3, train)
        d5 = Down(8 * f, dropout=0.5)(d4, train)
        u1 = Up(8 * f, dropout=0.5)(d5, d4, train)
        u2 = Up(4 * f, dropout=0.5)(u1, d3, train)
        u3 = Up(2 * f)(u2, d2, train)
        u4 = Up(f)(u3, d1, train)
        out = jax.image.resize(u4, (u4.shape[0], 2 * u4.shape[1],
                                    2 * u4.shape[2], u4.shape[3]), "nearest")
        out = nn.Conv(self.out_channels, (4, 4), padding=((2, 1), (2, 1)))(out)
        if self.final_sigmoid:
            out = nn.sigmoid(out)
        return out


class UNet3D(nn.Module):
    """3D U-Net generator (reference wgan3d.py:23-98). Spatial dims must be
    divisible by 32."""

    out_channels: int = 1
    base_filters: int = 16
    final_sigmoid: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_filters
        d1 = Down(f, normalize=False, ndim=3)(x, train)
        d2 = Down(2 * f, ndim=3)(d1, train)
        d3 = Down(4 * f, ndim=3)(d2, train)
        d4 = Down(8 * f, dropout=0.5, ndim=3)(d3, train)
        d5 = Down(8 * f, dropout=0.5, ndim=3)(d4, train)
        u1 = Up(8 * f, dropout=0.5, ndim=3)(d5, d4, train)
        u2 = Up(4 * f, dropout=0.5, ndim=3)(u1, d3, train)
        u3 = Up(2 * f, ndim=3)(u2, d2, train)
        u4 = Up(f, ndim=3)(u3, d1, train)
        shp = u4.shape
        out = jax.image.resize(
            u4, (shp[0], 2 * shp[1], 2 * shp[2], 2 * shp[3], shp[4]), "nearest")
        out = nn.Conv(self.out_channels, (4, 4, 4),
                      padding=((2, 1), (2, 1), (2, 1)))(out)
        if self.final_sigmoid:
            out = nn.sigmoid(out)
        return out


class MultiOutUNet(nn.Module):
    """Shared encoder, `num_outputs` independent decoder heads — e.g. (u,v,p)
    for Navier-Stokes (reference wgan_multi_output.py:24-113). Returns a tuple
    of [B, H, W, out_channels] arrays."""

    num_outputs: int = 3
    out_channels: int = 1
    base_filters: int = 32
    final_sigmoid: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_filters
        d1 = Down(f, normalize=False)(x, train)
        d2 = Down(2 * f)(d1, train)
        d3 = Down(4 * f)(d2, train)
        d4 = Down(8 * f, dropout=0.5)(d3, train)
        d5 = Down(8 * f, dropout=0.5)(d4, train)
        outs = []
        for _ in range(self.num_outputs):
            u1 = Up(8 * f, dropout=0.5)(d5, d4, train)
            u2 = Up(4 * f, dropout=0.5)(u1, d3, train)
            u3 = Up(2 * f)(u2, d2, train)
            u4 = Up(f)(u3, d1, train)
            out = jax.image.resize(u4, (u4.shape[0], 2 * u4.shape[1],
                                        2 * u4.shape[2], u4.shape[3]),
                                   "nearest")
            out = nn.Conv(self.out_channels, (4, 4),
                          padding=((2, 1), (2, 1)))(out)
            if self.final_sigmoid:
                out = nn.sigmoid(out)
            outs.append(out)
        return tuple(outs)


class AE(nn.Module):
    """Conv autoencoder: reflection-pad 7x7 stem, n_downsample stride-2 convs
    with growing widths, mirrored transpose-conv decoder, 3x3+7x7 head
    (reference autoencoders.py:7-96)."""

    out_channels: int = 1
    dims: int = 64
    n_downsample: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dims
        # encoder (autoencoders.py:10-36)
        h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(d * 2, (7, 7), padding="VALID")(h)
        h = _norm()(h)
        h = nn.leaky_relu(h, 0.2)
        for i in range(self.n_downsample):
            w = d * (min(i, 3) + 2) * 2
            h = nn.Conv(w, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)))(h)
            h = _norm()(h)
            h = nn.relu(h)
        h = jnp.tanh(h)
        # decoder (autoencoders.py:42-83)
        for i in reversed(range(self.n_downsample)):
            w = d * (min(i, 3) + 1) * 2
            h = nn.ConvTranspose(w, (4, 4), strides=(2, 2), padding="SAME")(h)
            h = _norm()(h)
            h = nn.leaky_relu(h, 0.2)
        h = jnp.pad(h, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
        h = nn.Conv(self.out_channels, (3, 3), padding="VALID")(h)
        h = nn.Conv(self.out_channels, (7, 7), padding="VALID")(h)
        return h


class VAE(nn.Module):
    """Variational AE: the AE encoder emits (mu, logvar); reparameterized
    sample feeds the decoder (reference autoencoders.py:97-107, with the
    encoder actually producing the latent stats it was meant to)."""

    out_channels: int = 1
    dims: int = 64
    n_downsample: int = 3
    latent_channels: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False, sample: bool = False):
        d = self.dims
        h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(d * 2, (7, 7), padding="VALID")(h)
        h = _norm()(h)
        h = nn.leaky_relu(h, 0.2)
        for i in range(self.n_downsample):
            w = d * (min(i, 3) + 2) * 2
            h = nn.Conv(w, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)))(h)
            h = _norm()(h)
            h = nn.relu(h)
        mu = nn.Conv(self.latent_channels, (3, 3), padding="SAME")(h)
        logvar = nn.Conv(self.latent_channels, (3, 3), padding="SAME")(h)
        if sample:
            eps = jax.random.normal(self.make_rng("latent"), mu.shape)
            z = mu + jnp.exp(0.5 * logvar) * eps
        else:
            z = mu
        h = z
        for i in reversed(range(self.n_downsample)):
            w = d * (min(i, 3) + 1) * 2
            h = nn.ConvTranspose(w, (4, 4), strides=(2, 2), padding="SAME")(h)
            h = _norm()(h)
            h = nn.leaky_relu(h, 0.2)
        h = jnp.pad(h, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
        h = nn.Conv(self.out_channels, (3, 3), padding="VALID")(h)
        h = nn.Conv(self.out_channels, (7, 7), padding="VALID")(h)
        return h, mu, logvar


class GoodNetwork(nn.Module):
    """Size-adaptive U-Net: arbitrary (non-power-of-2) in_dim/out_dim
    (reference wgan.py:55-158).

    Strategy: one resize-conv maps in_dim -> nearest power-of-2 below it,
    standard stride-2 U-Net down to `lowest_dim` and back with skips, and a
    final bilinear-resize + conv maps to exactly out_dim.
    """

    in_dim: int = 64
    out_dim: int = 64
    out_channels: int = 1
    lowest_dim: int = 4
    filters: int = 16
    final_sigmoid: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.in_dim > 8
        p2 = 2 ** int(math.floor(math.log2(self.in_dim)))
        depth = int(math.log2(p2 // self.lowest_dim))
        f = self.filters
        # stem: land exactly on p2 (resize if in_dim is not a power of 2)
        h = x
        if self.in_dim != p2:
            h = jax.image.resize(h, (h.shape[0], p2, p2, h.shape[3]),
                                 "bilinear")
        h = nn.Conv(f, (3, 3), padding="SAME")(h)
        h = nn.leaky_relu(h, 0.2)
        skips = []
        for i in range(depth):
            skips.append(h)
            h = Down(min(f * 2 ** (i + 1), 8 * f),
                     normalize=(i > 0), dropout=0.0)(h, train)
        for i in reversed(range(depth)):
            h = Up(min(f * 2 ** i, 8 * f),
                   dropout=0.5 if i >= depth - 1 else 0.0)(h, skips[i], train)
        h = nn.Conv(f, (3, 3), padding="SAME")(h)
        h = nn.leaky_relu(h, 0.2)
        if h.shape[1] != self.out_dim:
            h = jax.image.resize(h, (h.shape[0], self.out_dim, self.out_dim,
                                     h.shape[3]), "bilinear")
        out = nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)
        if self.final_sigmoid:
            out = nn.sigmoid(out)
        return out


class _GatedResBlock(nn.Module):
    """Gated/plain residual block with optional dilation (reference
    unets.py:89-143; the reference's ``gated_resnet`` has a NameError on
    ``gated`` at unets.py:96 — fixed here)."""

    features: int
    gated: bool = True
    dilation: int = 1
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = 2 * self.features if self.gated else self.features
        h = nn.Conv(hidden, (3, 3), padding="SAME",
                    kernel_dilation=(self.dilation,) * 2)(x)
        h = nn.GroupNorm(num_groups=math.gcd(8, hidden))(h)
        h = nn.relu(h)
        if self.dropout:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(hidden, (3, 3), padding="SAME",
                    kernel_dilation=(self.dilation,) * 2)(h)
        if self.gated:
            a, b = jnp.split(h, 2, axis=-1)
            h = a * nn.sigmoid(b)
        out = x + h
        return nn.relu(nn.GroupNorm(num_groups=math.gcd(8, self.features))(out))


class UNetRes(nn.Module):
    """Residual U-Net: res-block encoder stages (stride-2 transitions),
    dilated-conv bottleneck, decoder with skip mergers
    (reference UNetRes + ConvolutionalEncoder/Decoder + DilatedConvolutions,
    unets.py:145-333). GroupNorm in place of Batch/GroupNorm switch."""

    out_channels: int = 1
    hidden: tuple[int, ...] = (32, 64, 128)
    n_resblocks: int = 2
    n_dilated: int = 3
    gated: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.hidden[0], (3, 3), padding="SAME")(x)
        skips = []
        for i, f in enumerate(self.hidden):
            for _ in range(self.n_resblocks):
                h = _GatedResBlock(f, gated=self.gated)(h, train)
            skips.append(h)
            if i < len(self.hidden) - 1:
                h = nn.Conv(self.hidden[i + 1], (4, 4), strides=(2, 2),
                            padding=((1, 1), (1, 1)))(h)
        # dilated bottleneck with skip sum (DilatedConvolutions, unets.py:282+)
        d_sum = h
        for k in range(self.n_dilated):
            h = nn.Conv(self.hidden[-1], (3, 3), padding="SAME",
                        kernel_dilation=(2**(k + 1),) * 2)(h)
            h = nn.relu(nn.GroupNorm(
                num_groups=math.gcd(8, self.hidden[-1]))(h))
            d_sum = d_sum + h
        h = d_sum
        for i in reversed(range(len(self.hidden) - 1)):
            h = nn.ConvTranspose(self.hidden[i], (4, 4), strides=(2, 2),
                                 padding="SAME")(h)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = nn.Conv(self.hidden[i], (3, 3), padding="SAME")(h)
            for _ in range(self.n_resblocks):
                h = _GatedResBlock(self.hidden[i], gated=self.gated)(h, train)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)


class ImplicitConv(nn.Module):
    """10-layer 1x1-conv coordinate-style MLP over pixels with InstanceNorm +
    LeakyReLU, tanh head (reference conv11.py:8-27)."""

    out_channels: int = 1
    width: int = 64
    depth: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for _ in range(self.depth - 1):
            h = nn.Conv(self.width, (1, 1))(h)
            h = _norm()(h)
            h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.out_channels, (1, 1))(h)
        return jnp.tanh(h)


class _ResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = nn.Conv(self.features, (3, 3), padding="VALID")(h)
        h = _norm()(h)
        h = nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = nn.Conv(self.features, (3, 3), padding="VALID")(h)
        h = _norm()(h)
        return nn.relu(x + h)


class ResNetED(nn.Module):
    """Residual encoder-decoder without skips: reflection-pad res blocks,
    max-pool downsample, transpose-conv upsample
    (reference resnets.py:8-200)."""

    out_channels: int = 1
    base_filters: int = 32
    n_down: int = 3
    n_blocks: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_filters
        h = nn.Conv(f, (3, 3), padding="SAME")(x)
        for i in range(self.n_down):
            for _ in range(self.n_blocks):
                h = _ResBlock(f * 2**i)(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = nn.Conv(f * 2 ** (i + 1), (3, 3), padding="SAME")(h)
        for _ in range(self.n_blocks):
            h = _ResBlock(f * 2**self.n_down)(h)
        for i in reversed(range(self.n_down)):
            h = nn.ConvTranspose(f * 2**i, (4, 4), strides=(2, 2),
                                 padding="SAME")(h)
            h = nn.relu(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)


class LocalConv2d(nn.Module):
    """Locally-connected (unshared-weight) conv: patch-extract + einsum
    (reference localconv.py:35-179 implements this as unfold+matmul; here
    the patch contraction is one einsum on the MXU).

    Input [B, H, W, C] -> [B, H_out, W_out, features] with
    H_out = H - kh + 1 (valid, stride 1)."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    in_size: tuple[int, int] = (64, 64)
    in_channels: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = self.kernel
        H, W = self.in_size
        Ho, Wo = H - kh + 1, W - kw + 1
        if x.shape[1:3] != (H, W):
            raise ValueError(
                f"LocalConv2d(in_size={(H, W)}) got input {x.shape[1:3]} — "
                "per-location kernels are sized to in_size")
        # per-location fan-in is kh*kw*C only: the (Ho, Wo) axes are batch
        # axes of independent kernels, not fan-in (plain lecun_normal over
        # the 4D shape shrank init std ~60x at 64^2)
        w = self.param(
            "kernel", nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal", in_axis=2, out_axis=3,
                batch_axis=(0, 1)),
            (Ho, Wo, kh * kw * self.in_channels, self.features))
        b = self.param("bias", nn.initializers.zeros, (Ho, Wo, self.features))
        patches = []
        for i in range(kh):
            for j in range(kw):
                patches.append(x[:, i:i + Ho, j:j + Wo, :])
        p = jnp.concatenate(patches, axis=-1)  # [B, Ho, Wo, kh*kw*C]
        out = jnp.einsum("bhwk,hwkf->bhwf", p, w,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return out + b
