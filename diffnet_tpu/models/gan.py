"""Legacy generator/discriminator zoo (the "wgan_old" family).

Reference: DiffNet/networks/wgan_old.py:248-390 — FCGenerator,
ResidualFCGenerator, latent-vector GoodGenerator (Linear -> 4x4 -> residual
upsample blocks -> sigmoid image), GoodDiscriminator (residual mean-pool
downsampling -> scalar). Channels-last flax; BatchNorm replaced with
GroupNorm (stateless init/apply protocol).
"""

from __future__ import annotations

import math

import jax
from flax import linen as nn

__all__ = ["FCGenerator", "ResidualFCGenerator", "LatentGenerator",
           "Discriminator"]


class FCGenerator(nn.Module):
    """4 ReLU FC layers -> sigmoid image vector (wgan_old.py:248-268)."""

    output_dim: int = 64 * 64
    fc_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.reshape(x.shape[0], -1)
        for _ in range(4):
            h = nn.relu(nn.Dense(self.fc_dim)(h))
        return nn.sigmoid(nn.Dense(self.output_dim)(h))


class _ResFC(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        short = x if x.shape[-1] == self.features else nn.Dense(
            self.features)(x)
        h = nn.relu(nn.GroupNorm(num_groups=1)(x))
        h = nn.Dense(self.features)(h)
        h = nn.relu(nn.GroupNorm(num_groups=1)(h))
        h = nn.Dense(self.features)(h)
        return h + short


class ResidualFCGenerator(nn.Module):
    """Residual FC stack -> sigmoid image vector (wgan_old.py:270-312)."""

    output_dim: int = 64 * 64
    fc_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.reshape(x.shape[0], -1)
        for _ in range(4):
            h = _ResFC(self.fc_dim)(h)
        return nn.sigmoid(nn.Dense(self.output_dim)(h))


class _ResUp(nn.Module):
    features: int
    kernel: int = 5

    @nn.compact
    def __call__(self, x):
        b, hgt, wid, c = x.shape
        up = jax.image.resize(x, (b, 2 * hgt, 2 * wid, c), "nearest")
        short = nn.Conv(self.features, (1, 1))(up)
        h = nn.relu(nn.GroupNorm(num_groups=math.gcd(8, c))(x))
        h = jax.image.resize(h, (b, 2 * hgt, 2 * wid, c), "nearest")
        h = nn.Conv(self.features, (self.kernel,) * 2, padding="SAME")(h)
        h = nn.relu(nn.GroupNorm(num_groups=math.gcd(8, self.features))(h))
        h = nn.Conv(self.features, (self.kernel,) * 2, padding="SAME")(h)
        return h + short


class _ResDown(nn.Module):
    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        short = nn.avg_pool(nn.Conv(self.features, (1, 1))(x), (2, 2),
                            strides=(2, 2))
        h = nn.relu(x)
        h = nn.Conv(self.features, (self.kernel,) * 2, padding="SAME")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (self.kernel,) * 2, padding="SAME")(h)
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        return h + short


class LatentGenerator(nn.Module):
    """Latent/flat input -> Dense -> 4x4 seed -> residual upsampling to
    out_size -> sigmoid (reference GoodGenerator, wgan_old.py:313-365)."""

    out_size: int = 64
    dim: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        d = self.dim
        h = nn.Dense(8 * d * 4 * 4)(x.reshape(b, -1)).reshape(b, 4, 4, 8 * d)
        if self.out_size < 4 or self.out_size & (self.out_size - 1):
            raise ValueError(
                f"out_size must be a power of two >= 4, got {self.out_size} "
                "(the generator doubles resolution from a 4x4 seed)")
        n_up = int(math.log2(self.out_size // 4))
        # NB [-0:] would be the WHOLE list — guard the n_up=0 case
        tail = [4 * d, 2 * d, d][-min(3, n_up):] if n_up else []
        feats = [8 * d] * max(0, n_up - 3) + tail
        for f in feats:
            h = _ResUp(f)(h)
        h = nn.relu(nn.GroupNorm(num_groups=math.gcd(8, h.shape[-1]))(h))
        return nn.sigmoid(nn.Conv(1, (3, 3), padding="SAME")(h))


class Discriminator(nn.Module):
    """Residual mean-pool downsampling -> scalar critic
    (reference GoodDiscriminator, wgan_old.py:367-390)."""

    dim: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 3:
            x = x[..., None]
        d = self.dim
        h = nn.Conv(d, (3, 3), padding="SAME")(x)
        for f in (2 * d, 4 * d, 8 * d, 8 * d):
            h = _ResDown(f)(h)
        return nn.Dense(1)(h.reshape(x.shape[0], -1))[:, 0]
