"""Autoencoder pretraining (microstructure AE).

Reference: DiffNet/pretrained_AE.py:14-107 — standalone MSE-reconstruction
pretraining of the AE over a microstructure image set, saved for later use
as a solution-network initializer (DiffNet/pretrained_AE/microstructure_AE.pt).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.loader import NumpyLoader
from .trainer import save_params

__all__ = ["ArrayImageDataset", "pretrain_autoencoder"]


class ArrayImageDataset:
    """Images [N, H, W] or [N, H, W, C] -> (x, x) reconstruction pairs
    (reference MicrostructureDataset, pretrained_AE.py:14-38)."""

    def __init__(self, images):
        images = np.asarray(images, np.float32)
        if images.ndim == 3:
            images = images[..., None]
        self.images = images

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        x = self.images[idx]
        return x, x


def pretrain_autoencoder(model, dataset, epochs=10, batch_size=16,
                         learning_rate=1e-3, seed=42, save_path=None,
                         verbose=False):
    """MSE-reconstruction pretraining loop (reference training_epoch + main,
    pretrained_AE.py:41-107). Returns trained params."""
    # cap the batch at the dataset size: the default drop_last loader
    # yields ZERO batches for a small dataset, which surfaced as a bare
    # StopIteration here (and silently skipped the remainder otherwise)
    batch_size = min(batch_size, len(dataset))
    loader = NumpyLoader(dataset, batch_size=batch_size, shuffle=True,
                         seed=seed, drop_last=False)
    sample = next(iter(loader))
    params = model.init(jax.random.key(seed), jnp.asarray(sample[0]))
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x):
        def loss_fn(p):
            out = model.apply(p, x)
            if isinstance(out, tuple):  # VAE returns (recon, mu, logvar)
                recon, mu, logvar = out
                kl = -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))
                return jnp.mean((recon - x) ** 2) + 1e-3 * kl
            return jnp.mean((out - x) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(epochs):
        losses = []
        for x, _ in loader:
            params, opt_state, loss = step(params, opt_state, jnp.asarray(x))
            losses.append(float(loss))
        if verbose:
            print(f"epoch {epoch}: recon_mse {np.mean(losses):.3e}")

    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        save_params(params, save_path)
    return params
