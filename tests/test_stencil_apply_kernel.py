"""Pallas assembled-stencil apply kernel — numerics vs train.stencil.

Runs in Pallas interpreter mode (hardware-independent), like
tests/test_pallas_kernel.py. Pins values AND both custom-VJP cotangents
against the XLA ``stencil_matvec`` reference, 2D/3D, batched and
rectangular, plus an end-to-end extract->apply round trip on a real
variable-nu Galerkin operator.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from diffnet_tpu.ops.stencil_apply import (
    stencil_apply, stencil_transpose_planes)
from diffnet_tpu.train.stencil import (
    extract_stencil, stencil_matvec, _offsets)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        partial(pl.pallas_call, interpret=True))


def _rand(rng, shape):
    return jnp.asarray(rng.random(shape) - 0.5, jnp.float32)


@pytest.mark.parametrize("variant", ["dma", "blockspec"])
@pytest.mark.parametrize("B,ny,nx,tile", [
    (2, 33, 33, 16), (1, 40, 56, 16), (3, 17, 129, 8)])
def test_apply_2d_matches_matvec(B, ny, nx, tile, variant):
    rng = np.random.default_rng(0)
    C = _rand(rng, (9, B, ny, nx))
    u = _rand(rng, (B, ny, nx))
    want = stencil_matvec(C, u, nsd=2)
    got = stencil_apply(C, u, 2, tile, variant)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6)


@pytest.mark.parametrize("variant", ["dma", "dmaf"])
@pytest.mark.parametrize("B,nz,ny,nx,tile", [
    (2, 9, 9, 9, 4), (1, 8, 12, 20, None)])
def test_apply_3d_matches_matvec(B, nz, ny, nx, tile, variant):
    rng = np.random.default_rng(1)
    C = _rand(rng, (27, B, nz, ny, nx))
    u = _rand(rng, (B, nz, ny, nx))
    want = stencil_matvec(C, u, nsd=3)
    got = stencil_apply(C, u, 3, tile, variant)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6)


@pytest.mark.parametrize("nsd,shape", [(2, (2, 17, 17)), (3, (1, 7, 9, 11))])
def test_transpose_planes_is_adjoint(nsd, shape):
    rng = np.random.default_rng(2)
    C = _rand(rng, (3 ** nsd,) + shape)
    u = _rand(rng, shape)
    g = _rand(rng, shape)
    # <g, A u> == <A^T g, u>
    Au = stencil_matvec(C, u, nsd=nsd)
    Ct = stencil_transpose_planes(C, nsd)
    Atg = stencil_matvec(Ct, g, nsd=nsd)
    np.testing.assert_allclose(float(jnp.vdot(g, Au)),
                               float(jnp.vdot(Atg, u)), rtol=1e-5)


@pytest.mark.parametrize("nsd,shape,tile", [
    (2, (2, 33, 33), 16), (3, (1, 8, 9, 10), 4)])
def test_custom_vjp_matches_xla(nsd, shape, tile):
    rng = np.random.default_rng(3)
    C = _rand(rng, (3 ** nsd,) + shape)
    u = _rand(rng, shape)
    g = _rand(rng, shape)
    gC1, gu1 = jax.grad(
        lambda C, u: jnp.sum(stencil_matvec(C, u, nsd=nsd) * g),
        argnums=(0, 1))(C, u)
    gC2, gu2 = jax.grad(
        lambda C, u: jnp.sum(stencil_apply(C, u, nsd, tile, "dma") * g),
        argnums=(0, 1))(C, u)
    np.testing.assert_allclose(np.asarray(gu2), np.asarray(gu1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(gC2), np.asarray(gC1), atol=2e-6)


def test_extracted_galerkin_round_trip():
    """extract_stencil of a real variable-nu Galerkin operator, applied
    with the kernel, matches the matrix-free operator (and the operator
    is symmetric, so the transpose planes equal C)."""
    from diffnet_tpu.core import fem
    from diffnet_tpu.core.quadrature import make_basis

    n = 17
    basis = make_basis(2, 1, h=(1 / (n - 1),) * 2)
    rng = np.random.default_rng(4)
    nu = _rand(rng, (n, n)) + 1.5

    def A(u):
        gp = fem.gp_eval(u[None], basis, ("dx", "dy"))
        nug = fem.gp_eval(nu[None], basis, ("N",))["N"]
        return (fem.galerkin_project(nug * gp["dx"], basis, "dx", (n, n))
                + fem.galerkin_project(nug * gp["dy"], basis, "dy",
                                       (n, n)))[0]

    C = extract_stencil(A, (n, n))
    u = _rand(rng, (n, n))
    want = A(u)
    got = stencil_apply(C[:, None], u[None], 2, 8, "dma")[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)
    Ct = stencil_transpose_planes(C[:, None], 2)
    np.testing.assert_allclose(np.asarray(Ct), np.asarray(C[:, None]),
                               atol=2e-6)


def test_blockspec_guard_and_3d_variant_guard():
    rng = np.random.default_rng(5)
    C = _rand(rng, (9, 1, 2048, 2048))
    u = _rand(rng, (1, 2048, 2048))
    with pytest.raises(ValueError, match="dma"):
        stencil_apply(C, u, 2, None, "blockspec")
    C3 = _rand(rng, (27, 1, 8, 8, 8))
    u3 = _rand(rng, (1, 8, 8, 8))
    with pytest.raises(ValueError, match="variants only"):
        stencil_apply(C3, u3, 3, None, "blockspec")


class _VarNuDS:
    """Single-sample variable-nu dataset (left source / right sink)."""

    def __init__(self, nu):
        n = nu.shape[0]
        bc1 = np.zeros((n, n)); bc1[:, 0] = 1
        bc2 = np.zeros((n, n)); bc2[:, -1] = 1
        self.inputs = np.stack([nu, bc1, bc2], -1).astype(np.float32)
        self.forcing = np.zeros((n, n, 1), np.float32)

    def __len__(self):
        return 1

    def __getitem__(self, idx):
        return self.inputs, self.forcing


def test_module_linear_solve_stencil_kernel():
    """Solver wiring: module_linear_solve(assemble='stencil',
    stencil_kernel='dma') iterates through the Pallas gather apply and
    matches the XLA stencil path on a variable-nu problem."""
    from diffnet_tpu.models.field import DirectField
    from diffnet_tpu.pde.poisson import Poisson2D
    from diffnet_tpu.train.linear import module_linear_solve

    n = 17
    rng = np.random.default_rng(6)
    nu = np.exp(0.5 * rng.standard_normal((n, n))).astype(np.float32)
    ds = _VarNuDS(nu)
    m = Poisson2D(DirectField((n, n)), ds, domain_size=n, batch_size=1,
                  loss_type="resmin")
    u_ref, _ = module_linear_solve(m, tol=1e-10, assemble="stencil")
    u_k, _ = module_linear_solve(m, tol=1e-10, assemble="stencil",
                                 stencil_kernel="dma")
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                               atol=5e-6)


def test_mgcg_stencil_kernel_levels():
    """multigrid_preconditioner(stencil_kernel=...): every assembled
    level's matvec routes through the Pallas apply; the MG-CG solve
    matches the XLA-path solve."""
    from diffnet_tpu.models.field import DirectField
    from diffnet_tpu.pde.poisson import Poisson2D
    from diffnet_tpu.train import multigrid_preconditioner
    from diffnet_tpu.train.linear import module_linear_solve

    n = 17
    rng = np.random.default_rng(7)
    nu = np.exp(0.5 * rng.standard_normal((n, n))).astype(np.float32)
    ds = _VarNuDS(nu)

    def factory(m_n, _cache={}):
        if m_n not in _cache:
            d = ds if m_n == n else _VarNuDS(np.ones((m_n, m_n),
                                                     np.float32))
            _cache[m_n] = Poisson2D(
                DirectField((m_n, m_n)), d, domain_size=m_n, batch_size=1,
                loss_type="resmin")
        return _cache[m_n]

    m = factory(n)
    M, _ = multigrid_preconditioner(
        factory, n, n_coarse=9, inputs_per_level="restrict",
        assemble="stencil", stencil_kernel="dma")
    u, _ = module_linear_solve(m, tol=1e-8, maxiter=25, M=M)
    u_ref, _ = module_linear_solve(m, tol=1e-10, assemble="stencil")
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               atol=5e-5)


def test_stencil_kernel_requires_assemble():
    from diffnet_tpu.train.linear import solve_linear
    with pytest.raises(ValueError, match="assemble='stencil'"):
        solve_linear(lambda u: u, (8, 8), stencil_kernel="dma")
