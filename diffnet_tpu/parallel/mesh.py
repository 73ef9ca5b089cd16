"""Device-mesh utilities: data-parallel and spatially-sharded training.

The reference's only multi-device capability is Lightning DDP gradient
all-reduce over NCCL (reference: IBN/poisson-3d/parametric/IBN_3D.py:193-199).
The TPU-native counterpart is jit-over-a-Mesh: shard the batch along a
``'data'`` axis (gradient all-reduce emitted by XLA over ICI), and — beyond
reference parity — shard the *spatial grid* along a ``'space'`` axis for
grids too large for one chip. The FEM gather/scatter ops are static strided
slices, so GSPMD inserts the 1-element halo exchanges (collective-permutes)
automatically; no hand-written halo code is needed on the XLA path.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "spatial_sharding", "halo_exchange_y"]


def make_mesh(data: int | None = None, space: int = 1,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Mesh with axes ('data', 'space'). `data=None` uses all devices/space."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // space
    dev_arr = np.array(devices[: data * space]).reshape(data, space)
    return Mesh(dev_arr, ("data", "space"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-axis sharding for an ndim array (axis 0 = batch)."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, batch_size: int | None = None) -> Any:
    """device_put the batch with batch-axis sharding on 'data'.

    Only leaves whose axis 0 matches the batch size (taken from the first
    array leaf unless `batch_size` is passed explicitly) are split; scalars
    and shared per-sample arrays (masks, coordinates) are replicated —
    splitting them row-wise would hand each device the wrong rows, and a
    0-d leaf would crash device_put.

    Heuristic caveat (ADVICE r2): a shared per-sample array whose leading
    axis COINCIDENTALLY equals the batch size (e.g. coords shaped [bs, 2])
    would be row-split. Pass `batch_size` explicitly (or shape shared
    leaves so axis 0 differs from the batch) when a batch can contain such
    leaves."""
    leaves = [x for x in jax.tree.leaves(batch) if np.ndim(x) >= 1]
    bs = (batch_size if batch_size is not None
          else np.shape(leaves[0])[0] if leaves else None)

    def put(x):
        if np.ndim(x) >= 1 and np.shape(x)[0] == bs:
            return jax.device_put(x, data_sharding(mesh, np.ndim(x)))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(put, batch)


def spatial_sharding(mesh: Mesh, ndim: int, y_axis: int) -> NamedSharding:
    """Shard the y (rows) spatial axis across the 'space' mesh axis, batch
    across 'data'. `y_axis` is the absolute axis index of y."""
    spec: list = [None] * ndim
    spec[0] = "data"
    spec[y_axis] = "space"
    return NamedSharding(mesh, P(*spec))


def _halo_exchange(x: jax.Array, axis_name: str, halo: int,
                   axis: int) -> jax.Array:
    """Explicit halo exchange along one sharded spatial axis for use inside
    shard_map-based kernels (the Pallas path): pad each local block with
    `halo` slices from its +/- neighbors via ppermute.

    Returns x grown by 2*halo along `axis` (edge shards zero-pad the outer
    side, matching 'no element spans the global boundary' semantics)."""
    import jax.numpy as jnp

    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    lo = jax.lax.slice_in_dim(x, 0, halo, axis=axis)    # to -axis neighbor
    hi = jax.lax.slice_in_dim(x, x.shape[axis] - halo, x.shape[axis],
                              axis=axis)                # to +axis neighbor
    from_prev = jax.lax.ppermute(hi, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    from_next = jax.lax.ppermute(lo, axis_name,
                                 [(i, (i - 1) % n) for i in range(n)])
    zero = jnp.zeros_like(lo)
    from_prev = jnp.where(idx == 0, zero, from_prev)
    from_next = jnp.where(idx == n - 1, zero, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=axis)


def halo_exchange_y(x: jax.Array, axis_name: str = "space",
                    halo: int = 1) -> jax.Array:
    """Halo exchange along the sharded y (rows, axis -2) axis:
    [..., y_local, x] -> [..., y_local + 2*halo, x]."""
    return _halo_exchange(x, axis_name, halo, x.ndim - 2)


def halo_exchange_z(x: jax.Array, axis_name: str = "space",
                    halo: int = 1) -> jax.Array:
    """Halo exchange along the sharded z (depth, axis -3) axis:
    [..., z_local, y, x] -> [..., z_local + 2*halo, y, x]."""
    return _halo_exchange(x, axis_name, halo, x.ndim - 3)
