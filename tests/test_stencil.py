"""Assembled-stencil fast path (train/stencil.py): coloring-probe
extraction of the full operator stencil + fused matvec, and its
integration into solve_linear / multigrid_preconditioner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnet_tpu.data.single_instances import RectangleManufactured
from diffnet_tpu.models import DirectField
from diffnet_tpu.pde import Poisson2D
from diffnet_tpu.train import (extract_stencil, module_linear_solve,
                               solve_linear, stencil_diag, stencil_matvec)

EXACT = lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)
FORCING = lambda x, y: 2 * np.pi**2 * np.sin(np.pi * x) * np.sin(np.pi * y)


def _varnu_module(n, deg=1):
    ds = RectangleManufactured(domain_size=n)
    ds.n_samples = 1
    m = Poisson2D(DirectField((n, n)), ds, domain_size=n, batch_size=1,
                  loss_type="resmin", fem_basis_deg=deg,
                  exact_solution=EXACT, forcing=FORCING, mms_dirichlet=True)
    inputs, forcing = ds[0]
    inputs = inputs.copy()
    rng = np.random.default_rng(0)
    inputs[..., 0] = 1.0 + 0.5 * rng.random((n, n)).astype(np.float32)
    return m, jnp.asarray(inputs)[None], jnp.asarray(forcing)[None]


def test_extraction_matches_matrix_free():
    """The 3^2 coloring probes recover the variable-nu Poisson operator
    exactly: stencil matvec == matrix-free residual operator on random
    fields, including the masked Dirichlet rows and grid edges (zero-pad
    taps extract as exactly 0)."""
    n = 33
    m, jin, jf = _varnu_module(n)
    zero = jnp.zeros((n, n), jnp.float32)

    def A(u):
        return (m.residual_for_field(u[None], jin, jf)[0]
                - m.residual_for_field(zero[None], jin, jf)[0])

    C = extract_stencil(A, (n, n))
    assert C.shape == (9, n, n)
    rng = np.random.default_rng(1)
    for _ in range(3):
        u = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
        want = A(u)
        got = stencil_matvec(C, u)
        err = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        assert err < 1e-5, err
    # diagonal agrees with the coloring-probed diagonal helper (to f32
    # compilation noise — jit vs vmap schedules differ at ~1e-7)
    from diffnet_tpu.train.linear import _colored_diag
    np.testing.assert_allclose(np.asarray(stencil_diag(C)),
                               _colored_diag(jax.jit(A), n, 2),
                               rtol=1e-5, atol=1e-6)


def test_extraction_batched_per_sample_operators():
    """Leading batch axes carry through: a batch of per-sample nu fields
    extracts a per-sample stencil ([9, B, n, n]) whose matvec matches the
    batched residual operator."""
    n = 17
    B = 3
    m, jin, jf = _varnu_module(n)
    rng = np.random.default_rng(2)
    inputs = np.repeat(np.asarray(jin), B, axis=0)
    inputs[..., 0] = 1.0 + rng.random((B, n, n)).astype(np.float32)
    jin_b = jnp.asarray(inputs)
    jf_b = jnp.repeat(jnp.asarray(jf), B, axis=0)
    zero = jnp.zeros((B, n, n), jnp.float32)

    def A(u):
        return (m.residual_for_field(u, jin_b, jf_b)
                - m.residual_for_field(zero, jin_b, jf_b))

    C = extract_stencil(A, (B, n, n), nsd=2)
    assert C.shape == (9, B, n, n)
    u = jnp.asarray(rng.standard_normal((B, n, n)), jnp.float32)
    want = A(u)
    got = stencil_matvec(C, u, nsd=2)
    err = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert err < 1e-5, err


def test_solve_linear_stencil_assembly_mms():
    """CG over the assembled stencil reaches the same discretization-
    limited MMS error as the matrix-free path."""
    n = 65
    ds = RectangleManufactured(domain_size=n)
    ds.n_samples = 1
    m = Poisson2D(DirectField((n, n)), ds, domain_size=n, batch_size=1,
                  loss_type="resmin", exact_solution=EXACT, forcing=FORCING,
                  mms_dirichlet=True)
    u, _ = module_linear_solve(m, tol=1e-10, assemble="stencil")
    eL2, _, uex = m.calc_l2_err(u)
    assert float(eL2 / uex) < 3e-4, float(eL2 / uex)


def test_deg2_needs_width5():
    """A deg-2 operator is a width-5 stencil: width-3 assembly is
    rejected by the verification probe, width-5 (the module_linear_solve
    default, 2*deg+1) solves to MMS accuracy."""
    n = 17
    ds = RectangleManufactured(domain_size=n)
    ds.n_samples = 1
    m = Poisson2D(DirectField((n, n)), ds, domain_size=n, batch_size=1,
                  loss_type="resmin", fem_basis_deg=2, exact_solution=EXACT,
                  forcing=FORCING, mms_dirichlet=True)
    with pytest.raises(ValueError, match="not a width-3 stencil"):
        module_linear_solve(m, assemble="stencil", stencil_width=3)
    u, _ = module_linear_solve(m, tol=1e-12, assemble="stencil")
    eL2, _, uex = m.calc_l2_err(u)
    assert float(eL2 / uex) < 1e-3, float(eL2 / uex)


def test_multigrid_stencil_levels_match_matrix_free():
    """MG with assembled-stencil levels (the default) produces the same
    V-cycle output as matrix-free levels — the stencil is the SAME
    operator, just iterated cheaply."""
    from diffnet_tpu.train import multigrid_preconditioner

    def factory(n):
        ds = RectangleManufactured(domain_size=n)
        ds.n_samples = 1
        return Poisson2D(DirectField((n, n)), ds, domain_size=n,
                         batch_size=1, loss_type="resmin")

    n = 33
    M_st, info_st = multigrid_preconditioner(factory, n, assemble="stencil")
    M_mf, info_mf = multigrid_preconditioner(factory, n, assemble=None)
    assert info_st["levels"] == info_mf["levels"]
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    a, b = M_st(v), M_mf(v)
    err = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))
    assert err < 1e-4, err


def test_multigrid_galerkin_stencil_levels():
    """Galerkin coarse operators extract to flat stencils (RAP of a
    width-3 stencil under linear transfers is width-3): MG-CG with
    stencil-assembled Galerkin levels reaches the f32 floor."""
    from diffnet_tpu.train import multigrid_preconditioner

    def factory(n):
        ds = RectangleManufactured(domain_size=n)
        ds.n_samples = 1
        return Poisson2D(DirectField((n, n)), ds, domain_size=n,
                         batch_size=1, loss_type="resmin")

    n = 65
    m = factory(n)
    inputs = jnp.asarray(m.dataset[0][0])[None]
    forcing = jnp.zeros((1, n, n, 1), jnp.float32)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    bc = np.zeros((n, n))
    bc[[0, -1], :] = 1
    bc[:, [0, -1]] = 1
    b = jnp.where(jnp.asarray(bc) > 0.5, 0.0, b)

    def resfn(u):
        return m.residual_for_field(u[None], inputs, forcing)[0] - b

    M, _ = multigrid_preconditioner(factory, n, coarse_op="galerkin",
                                    assemble="stencil")
    u, _ = solve_linear(resfn, (n, n), tol=1e-12, maxiter=10, M=M)
    r = float(jnp.linalg.norm(resfn(u)) / jnp.linalg.norm(b))
    assert r < 1e-4, r


def test_extraction_3d_27_point():
    """3D deg-1 operators are 27-point stencils: extraction + fused
    matvec match the matrix-free 3D residual operator, and CG over the
    assembled stencil solves the 3D MMS problem."""
    from diffnet_tpu.data.single_instances import CuboidManufactured
    from diffnet_tpu.pde import Poisson3D

    n = 17
    ds = CuboidManufactured(domain_size=n)
    ds.n_samples = 1
    exact = lambda x, y, z: (np.sin(np.pi * x) * np.sin(np.pi * y)
                             * np.sin(np.pi * z))
    forcing = lambda x, y, z: 3 * np.pi**2 * exact(x, y, z)
    m = Poisson3D(DirectField((n, n, n)), ds, domain_size=n, batch_size=1,
                  loss_type="resmin", exact_solution=exact, forcing=forcing,
                  mms_dirichlet=True)
    inputs, fz = ds[0]
    jin = jnp.asarray(inputs)[None]
    jf = jnp.asarray(fz)[None]
    zero = jnp.zeros((n, n, n), jnp.float32)

    def A(u):
        return (m.residual_for_field(u[None], jin, jf)[0]
                - m.residual_for_field(zero[None], jin, jf)[0])

    C = extract_stencil(A, (n, n, n))
    assert C.shape == (27, n, n, n)
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    want = A(u)
    got = stencil_matvec(C, u)
    err = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert err < 1e-5, err

    u_sol, _ = module_linear_solve(m, tol=1e-10, assemble="stencil")
    eL2, _, uex = m.calc_l2_err(u_sol)
    assert float(eL2 / uex) < 2e-2, float(eL2 / uex)
