"""Serving export: serialize a trained forward pass to StableHLO.

The reference's "deployment" story is ``torch.save(network, 'network.pt')``
(0_base.py:124) — a pickle that needs the full python class tree to load.
The TPU-native story is `jax.export`: lower the jitted forward (with params
baked in) to a versioned StableHLO artifact that any JAX/PJRT runtime —
including a serving binary with no model code — can deserialize and call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jexport

__all__ = ["export_forward", "load_exported", "save_exported"]


def export_forward(network, params, sample_input, platforms=None):
    """Export ``x -> network.apply(params, x)`` with params baked in.

    Returns a `jax.export.Exported`; use :func:`save_exported` to write the
    serialized bytes. `platforms` e.g. ("tpu",) or ("cpu", "tpu") for a
    multi-platform artifact (default: current backend).
    """

    def fwd(x):
        return network.apply(params, x)

    fn = jax.jit(fwd)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    return jexport.export(fn, **kwargs)(
        jax.ShapeDtypeStruct(sample_input.shape, sample_input.dtype))


def save_exported(exported, path: str):
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_exported(path: str):
    """Deserialize an exported artifact; returns an object whose ``.call``
    runs the model."""
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())
