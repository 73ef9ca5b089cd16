"""Point-cloud -> grid networks: the ImmDiff family and DGCNN.

TPU-native counterparts of reference DiffNet/networks/immdiff_networks.py
(ImmDiff, ImmDiff_VAE, ImmDiff_Large, ImmDiff_Large_normals, LinearNet,
ConvNet, eikonal_linear) and DiffNet/networks/dgcnn.py (knn,
get_graph_feature, DGCNN2D). Capability-equivalent, channels-last
([B, Np, C] clouds), with two deliberate changes:

  * the reference's per-batch python-loop knn and its hardcoded ``.cuda()``
    (dgcnn.py:9-35) become a single batched top_k;
  * BatchNorm (training-mode state) is replaced by GroupNorm so every module
    keeps the stateless ``init/apply`` protocol.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MLP", "ConvNet1D", "ImmDiff", "ImmDiffVAE", "ImmDiffLarge",
           "ImmDiffLargeNormals", "EikonalLinear", "DGCNN2D",
           "knn_indices", "graph_feature"]


class MLP(nn.Module):
    """LinearNet equivalent (immdiff_networks.py:27-46): hidden sizes +
    per-layer nonlinearity (supports sin)."""

    features: Sequence[int]
    nonlin: Callable = nn.leaky_relu
    final_nonlin: Callable | None = None

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            last = i == len(self.features) - 1
            if not last:
                x = self.nonlin(x)
            elif self.final_nonlin is not None:
                x = self.final_nonlin(x)
        return x


class ConvNet1D(nn.Module):
    """The reference's ``ConvNet`` point-cloud decoder
    (immdiff_networks.py:7-24): a stack of stride-2 1D transpose
    convolutions, one per hidden channel width, each followed by the
    nonlinearity (the final layer by ``final_nonlin``). Channels-last:
    ``[B, L, C_in] -> [B, ~L*2^(n_layers), C_out]`` (each stride-2
    ConvTranspose with kernel 2 exactly doubles the length)."""

    hidden_channels: Sequence[int]
    out_channels: int = 1
    kernel: int = 2
    nonlin: Callable = nn.relu
    final_nonlin: Callable | None = None

    @nn.compact
    def __call__(self, x):
        widths = list(self.hidden_channels) + [self.out_channels]
        for i, c in enumerate(widths):
            x = nn.ConvTranspose(c, (self.kernel,), strides=(2,))(x)
            if i < len(widths) - 1:
                x = self.nonlin(x)
            elif self.final_nonlin is not None:
                x = self.final_nonlin(x)
        return x


class ImmDiff(nn.Module):
    """Flattened cloud -> MLP -> 32x32 latent image -> conv/up decoder ->
    [B, out_size, out_size, out_channels] (immdiff_networks.py:82-117)."""

    out_channels: int = 1
    out_size: int = 64
    latent_hw: int = 32
    hidden: int = 1500
    n_hidden: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        h = x.reshape(b, -1)
        h = MLP([self.hidden] * self.n_hidden + [self.latent_hw**2],
                final_nonlin=lambda v: nn.leaky_relu(v))(h)
        h = h.reshape(b, self.latent_hw, self.latent_hw, 1)
        for f in (16, 32, 64, 32):
            h = nn.Conv(f, (4, 4), padding="SAME")(h)
            h = nn.leaky_relu(h, 0.2)
        h = jax.image.resize(h, (b, self.out_size, self.out_size, h.shape[-1]),
                             "bilinear")
        return nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)


class ImmDiffVAE(nn.Module):
    """mu/logvar reparameterized latent variant
    (immdiff_networks.py:137-186)."""

    out_channels: int = 1
    out_size: int = 64
    latent_dim: int = 256
    hidden: int = 1024

    @nn.compact
    def __call__(self, x, train: bool = False, sample: bool = False):
        b = x.shape[0]
        h = MLP([self.hidden, self.hidden])(x.reshape(b, -1))
        mu = nn.Dense(self.latent_dim)(h)
        logvar = nn.Dense(self.latent_dim)(h)
        if sample:
            eps = jax.random.normal(self.make_rng("latent"), mu.shape)
            z = mu + jnp.exp(0.5 * logvar) * eps
        else:
            z = mu
        hw = 8
        h = nn.Dense(hw * hw * 8)(z).reshape(b, hw, hw, 8)
        while h.shape[1] < self.out_size:
            h = nn.ConvTranspose(16, (4, 4), strides=(2, 2), padding="SAME")(h)
            h = nn.leaky_relu(h, 0.2)
        out = nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)
        return out, mu, logvar


class _ParallelEncoders(nn.Module):
    """Four parallel encodings of the cloud — plain/tanh/sin MLPs + a conv
    path (immdiff_networks.py:188-214)."""

    width: int = 512

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        flat = x.reshape(b, -1)
        e1 = MLP([self.width, self.width])(flat)
        e2 = MLP([self.width, self.width], nonlin=jnp.tanh)(flat)
        e3 = MLP([self.width, self.width], nonlin=jnp.sin)(flat)
        h = nn.Conv(16, (5,), padding="SAME")(x)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(4, (5,), padding="SAME")(h)
        e4 = nn.Dense(self.width)(h.reshape(b, -1))
        return jnp.concatenate([e1, e2, e3, e4], axis=-1)


class ImmDiffLarge(nn.Module):
    """Multi-encoding cloud -> multi-scale decoder with skips
    (immdiff_networks.py:188-249)."""

    out_channels: int = 1
    out_size: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        code = _ParallelEncoders()(x)
        hw = 8
        h = nn.Dense(hw * hw * 16)(code).reshape(b, hw, hw, 16)
        skips = []
        while h.shape[1] < self.out_size:
            skips.append(h)
            h = nn.ConvTranspose(32, (4, 4), strides=(2, 2), padding="SAME")(h)
            h = nn.leaky_relu(h, 0.2)
            s = jax.image.resize(skips[-1], h.shape[:3] + (skips[-1].shape[-1],),
                                 "nearest")
            h = jnp.concatenate([h, s], axis=-1)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)


class ImmDiffLargeNormals(nn.Module):
    """Two-input (points, normals) variant (immdiff_networks.py:251-302)."""

    out_channels: int = 1
    out_size: int = 64

    @nn.compact
    def __call__(self, points, normals, train: bool = False):
        cp = _ParallelEncoders()(points)
        cn = _ParallelEncoders()(normals)
        code = jnp.concatenate([cp, cn], axis=-1)
        b = points.shape[0]
        hw = 8
        h = nn.Dense(hw * hw * 16)(code).reshape(b, hw, hw, 16)
        while h.shape[1] < self.out_size:
            h = nn.ConvTranspose(32, (4, 4), strides=(2, 2), padding="SAME")(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)


class EikonalLinear(nn.Module):
    """sin-MLP coordinate network for eikonal fields
    (immdiff_networks.py:304-315)."""

    out_features: int = 1
    width: int = 256
    depth: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        return MLP([self.width] * self.depth + [self.out_features],
                   nonlin=jnp.sin)(x)


def knn_indices(x: jax.Array, k: int) -> jax.Array:
    """k nearest neighbors by euclidean distance; x [B, Np, C] -> idx
    [B, Np, k] (reference dgcnn.py:9-22, batched via one top_k)."""
    d2 = (jnp.sum(x**2, -1)[:, :, None] + jnp.sum(x**2, -1)[:, None, :]
          - 2.0 * jnp.einsum("bnc,bmc->bnm", x, x))
    _, idx = jax.lax.top_k(-d2, k)
    return idx


def graph_feature(x: jax.Array, k: int, idx=None) -> jax.Array:
    """Edge features [x_j - x_i, x_i] for each of the k neighbors:
    [B, Np, C] -> [B, Np, k, 2C] (reference get_graph_feature,
    dgcnn.py:25-53, without the .cuda() hardcode)."""
    if idx is None:
        idx = knn_indices(x, k)
    gathered = jnp.take_along_axis(x[:, None, :, :],
                                   idx[..., None], axis=2)  # [B, Np, k, C]
    center = jnp.broadcast_to(x[:, :, None, :], gathered.shape)
    return jnp.concatenate([gathered - center, center], axis=-1)


class DGCNN2D(nn.Module):
    """Dynamic-graph CNN: 3 edge-conv stages -> global pool -> control grid
    -> transpose-conv decode to [B, domain_size, domain_size, 1]
    (reference dgcnn.py:56-151)."""

    domain_size: int = 32
    k: int = 20
    lowest_size: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]

        def edge_conv(h, feats):
            g = graph_feature(h, min(self.k, h.shape[1] - 1))
            g = nn.Conv(feats, (1, 1), use_bias=False)(g)
            g = nn.GroupNorm(num_groups=min(4, feats))(g)
            g = nn.leaky_relu(g, 0.2)
            return jnp.max(g, axis=2)  # max over neighbors

        x1 = edge_conv(x, 16)
        x2 = edge_conv(x1, 32)
        x3 = edge_conv(x2, 64)
        h = jnp.concatenate([x1, x2, x3], axis=-1)  # [B, Np, 112]
        h = nn.Dense(128)(h)
        h = nn.leaky_relu(nn.GroupNorm(num_groups=4)(h), 0.2)
        # adaptive max pool to 2 "super points"
        half = h.shape[1] // 2
        pooled = jnp.stack([jnp.max(h[:, :half], 1), jnp.max(h[:, half:], 1)],
                           axis=1)  # [B, 2, 128]
        h = nn.relu(nn.Dense(256)(pooled))
        h = nn.relu(nn.Dense(self.lowest_size**2)(h))
        h = h.transpose(0, 2, 1).reshape(b, self.lowest_size,
                                         self.lowest_size, 2)
        while h.shape[1] < self.domain_size // 2:
            h = nn.ConvTranspose(2, (4, 4), strides=(2, 2), padding="SAME")(h)
            h = nn.leaky_relu(h, 0.2)
        h = nn.ConvTranspose(1, (4, 4), strides=(2, 2), padding="SAME")(h)
        return h
