"""Direct nodal-field "network" — optimize the solution field itself.

Counterpart of the reference pattern ``nn.ParameterList([nn.Parameter(u)])``
with ``forward`` returning ``network[0]`` (reference:
examples/poisson/single_instance/e2_manufactured_resmin.py:94-96,543), used by
all single-instance direct solves (Poisson resmin, Burgers space-time, NS LDC
field mode). Conforms to the framework's network protocol
(``init(rng, sample) -> params``, ``apply(params, x) -> u``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class DirectField:
    """params = the nodal field(s) themselves.

    shape: field shape WITHOUT batch dim, e.g. ``(ny, nx)`` or ``(ny, nx, 2)``.
    The apply broadcasts over the leading batch dim of `inputs`.
    """

    def __init__(self, shape, init=None, n_fields: int = 1):
        self.shape = tuple(shape)
        self.n_fields = n_fields
        if init is None:
            init = np.ones(self.shape, np.float32)
        self._init_value = np.broadcast_to(np.asarray(init, np.float32), self.shape)

    def init(self, rng, sample_input=None):
        del rng
        if self.n_fields == 1:
            return {"field": jnp.asarray(self._init_value)}
        return {f"field_{i}": jnp.asarray(self._init_value)
                for i in range(self.n_fields)}

    def apply(self, params, inputs=None):
        """Returns the field with a leading batch axis of size 1 (or matching
        `inputs`' batch if given)."""
        b = 1 if inputs is None else inputs.shape[0]
        if self.n_fields == 1:
            return jnp.broadcast_to(params["field"][None], (b,) + self.shape)
        return tuple(
            jnp.broadcast_to(params[f"field_{i}"][None], (b,) + self.shape)
            for i in range(self.n_fields)
        )
