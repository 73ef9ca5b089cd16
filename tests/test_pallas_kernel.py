"""Pallas fused Poisson residual kernel — numerics vs the XLA path.

Runs in Pallas interpreter mode (hardware-independent); on-device execution
is gated pending a TPU-runtime issue (see ops/poisson_residual.py docstring).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import diffnet_tpu.ops.poisson_residual as pr
from diffnet_tpu.core import fem
from diffnet_tpu.core.quadrature import make_basis


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        partial(pl.pallas_call, interpret=True))


def _K_xla(u, nu, basis, n):
    gp = fem.gp_eval(u, basis, ("dx", "dy"))
    nug = fem.gp_eval(nu, basis, ("N",))["N"]
    return (fem.galerkin_project(nug * gp["dx"], basis, "dx", (n, n))
            + fem.galerkin_project(nug * gp["dy"], basis, "dy", (n, n)))


@pytest.mark.parametrize("n,tile", [(33, 16), (40, 16), (65, 64)])
def test_stiffness_action_matches_xla(n, tile):
    basis = make_basis(2, 1, h=(1 / (n - 1),) * 2)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((2, n, n)), jnp.float32)
    nu = jnp.asarray(rng.random((2, n, n)), jnp.float32)
    Kx = _K_xla(u, nu, basis, n)
    Kp = pr._stiffness_fwd_impl(u, nu, basis, tile)
    np.testing.assert_allclose(np.asarray(Kp), np.asarray(Kx), atol=2e-6)


def test_custom_vjp_matches_xla():
    n, tile = 33, 16
    basis = make_basis(2, 1, h=(1 / (n - 1),) * 2)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.random((1, n, n)), jnp.float32)
    nu = jnp.asarray(rng.random((1, n, n)), jnp.float32)
    g = jnp.asarray(rng.random((1, n, n)), jnp.float32)
    g1 = jax.grad(lambda u, nu: jnp.sum(_K_xla(u, nu, basis, n) * g),
                  argnums=(0, 1))(u, nu)
    g2 = jax.grad(
        lambda u, nu: jnp.sum(
            pr.poisson_stiffness_action(u, nu, basis, tile) * g),
        argnums=(0, 1))(u, nu)
    np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(g1[0]),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                               atol=2e-6)


def test_residual_fused_full():
    n, tile = 33, 16
    basis = make_basis(2, 1, h=(1 / (n - 1),) * 2)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.random((1, n, n)), jnp.float32)
    nu = jnp.ones((1, n, n), jnp.float32)
    f_gp = jnp.asarray(rng.random((1, n - 1, n - 1, 4)), jnp.float32)
    bc = jnp.zeros((n, n)).at[0].set(1.0)
    Nf = fem.galerkin_project(f_gp, basis, "N", (n, n))
    R = pr.poisson_residual_fused(u, nu, Nf, bc, basis, tile)
    R_ref = jnp.where(bc > 0.5, 0.0, _K_xla(u, nu, basis, n) - Nf)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_ref), atol=2e-6)
