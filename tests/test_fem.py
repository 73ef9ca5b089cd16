"""Tests for the fused gather/eval/project/scatter engine against
independent dense-FEM numpy implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnet_tpu.core import fem
from diffnet_tpu.core.quadrature import lagrange_basis_1d, make_basis


def _grid2d(n, L=1.0):
    x = np.linspace(0, L, n)
    xx, yy = np.meshgrid(x, x)  # [y, x] layout
    return xx, yy


@pytest.mark.parametrize("deg", [1, 2, 3])
def test_gp_eval_exact_for_polynomials_2d(deg):
    """A degree-`deg` tensor-product polynomial is represented exactly; its
    Gauss-point values and derivatives must match analytics to round-off."""
    n = deg * 8 + 1
    b = make_basis(2, deg, h=(deg / (n - 1), deg / (n - 1)))
    xx, yy = _grid2d(n)
    u = (xx**deg) * (yy**deg)
    out = fem.gp_eval(jnp.asarray(u, jnp.float32), b, ("N", "dx", "dy"))
    xgp, ygp = fem.gp_coords(b, (n, n))
    np.testing.assert_allclose(out["N"], (xgp**deg) * (ygp**deg), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        out["dx"], deg * xgp ** (deg - 1) * ygp**deg, rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        out["dy"], deg * ygp ** (deg - 1) * xgp**deg, rtol=2e-3, atol=2e-3
    )


def test_gp_eval_second_derivatives_deg2():
    n = 17
    b = make_basis(2, 2, h=(2 / (n - 1), 2 / (n - 1)))
    xx, yy = _grid2d(n)
    u = xx**2 * yy**2
    out = fem.gp_eval(jnp.asarray(u, jnp.float64) if False else jnp.asarray(u, jnp.float32),
                      b, ("d2x", "d2y", "d2xy"))
    xgp, ygp = fem.gp_coords(b, (n, n))
    np.testing.assert_allclose(out["d2x"], 2 * ygp**2, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(out["d2y"], 2 * xgp**2, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(out["d2xy"], 4 * xgp * ygp, rtol=1e-3, atol=4e-3)


@pytest.mark.parametrize("nsd,deg", [(1, 1), (2, 1), (2, 2), (2, 3),
                                     (3, 1), (3, 2), (3, 3)])
def test_gather_scatter_adjoint(nsd, deg):
    """<gather(u), r> == <u, scatter(r)> — scatter is the exact transpose."""
    rng = np.random.default_rng(0)
    n = deg * 4 + 1
    shape = (n,) * nsd
    u = rng.standard_normal(shape).astype(np.float32)
    nel = fem.num_elements(shape, deg)
    r = rng.standard_normal(nel + ((deg + 1) ** nsd,)).astype(np.float32)
    lhs = np.sum(np.asarray(fem.gather_elements(jnp.asarray(u), deg, nsd)) * r)
    rhs = np.sum(u * np.asarray(fem.scatter_elements(jnp.asarray(r), deg, nsd, shape)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def _dense_stiffness_2d(n, deg, h):
    """Independent dense FEM stiffness assembly (quadrature loop)."""
    b = make_basis(2, deg, h=(h, h))
    nbf1 = deg + 1
    nbf = nbf1**2
    K = np.zeros((n * n, n * n))
    Ke = np.zeros((nbf, nbf))
    for g in range(b.ngp_total):
        dNx = b.tables["dx"][g]
        dNy = b.tables["dy"][g]
        Ke += (np.outer(dNx, dNx) + np.outer(dNy, dNy)) * b.jxw[g]
    nel = (n - 1) // deg
    for ey in range(nel):
        for ex in range(nel):
            nodes = []
            for jb in range(nbf1):
                for ib in range(nbf1):
                    nodes.append((ey * deg + jb) * n + ex * deg + ib)
            for a in range(nbf):
                for c in range(nbf):
                    K[nodes[a], nodes[c]] += Ke[a, c]
    return K


@pytest.mark.parametrize("deg", [1, 2])
def test_galerkin_project_matches_dense_stiffness(deg):
    """eval(dx,dy) -> galerkin_project must equal the dense K @ u matvec
    (the reference resmin path, tests/test.py:43-79)."""
    n = deg * 5 + 1
    h = deg / (n - 1)
    b = make_basis(2, deg, h=(h, h))
    rng = np.random.default_rng(1)
    u = rng.standard_normal((n, n)).astype(np.float32)
    gp = fem.gp_eval(jnp.asarray(u), b, ("dx", "dy"))
    R = fem.galerkin_project(gp["dx"], b, "dx", (n, n)) + fem.galerkin_project(
        gp["dy"], b, "dy", (n, n)
    )
    K = _dense_stiffness_2d(n, deg, h)
    np.testing.assert_allclose(
        np.asarray(R).reshape(-1), K @ u.reshape(-1), rtol=2e-4, atol=1e-4
    )


def test_galerkin_residual_smoke_matches_reference_semantics():
    """Replicates the reference smoke test (tests/test.py:82-100) numerics on
    a small grid via an independent dense computation: residual of the
    Poisson weak form for u = sin(pi x) sin(pi y), nu = 1."""
    n = 33
    h = 1.0 / (n - 1)
    b = make_basis(2, 1, h=(h, h))
    xx, yy = _grid2d(n)
    u = np.sin(np.pi * xx) * np.sin(np.pi * yy)
    gp = fem.gp_eval(jnp.asarray(u, jnp.float32), b, ("dx", "dy"))
    R = fem.galerkin_project(gp["dx"], b, "dx", (n, n)) + fem.galerkin_project(
        gp["dy"], b, "dy", (n, n)
    )
    K = _dense_stiffness_2d(n, 1, h)
    np.testing.assert_allclose(
        np.asarray(R).reshape(-1), K @ u.reshape(-1), rtol=2e-4, atol=1e-5
    )
    # interior residual ~ pi^2 h^2 * u scale; loss finite and positive
    loss = float(jnp.sum(jnp.asarray(R) ** 2))
    assert 0 < loss < 1e3


def test_3d_eval_linear_field_exact():
    n = 9
    h = 1.0 / (n - 1)
    b = make_basis(3, 1, h=(h, h, h))
    z, y, x = np.meshgrid(
        np.linspace(0, 1, n), np.linspace(0, 1, n), np.linspace(0, 1, n),
        indexing="ij",
    )  # [z, y, x]
    u = 2 * x + 3 * y - z
    out = fem.gp_eval(jnp.asarray(u, jnp.float32), b, ("N", "dx", "dy", "dz"))
    xgp, ygp, zgp = fem.gp_coords(b, (n, n, n))
    np.testing.assert_allclose(out["N"], 2 * xgp + 3 * ygp - zgp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["dx"], np.full_like(xgp, 2.0), rtol=1e-4)
    np.testing.assert_allclose(out["dy"], np.full_like(xgp, 3.0), rtol=1e-4)
    np.testing.assert_allclose(out["dz"], np.full_like(xgp, -1.0), rtol=1e-4)


def test_gp_eval_batched_and_jittable():
    n = 17
    b = make_basis(2, 1, h=(1 / (n - 1), 1 / (n - 1)))
    u = jnp.ones((4, n, n))

    @jax.jit
    def f(u):
        return fem.gp_eval_stacked(u, b, ("N", "dx"))

    out = f(u)
    assert out.shape == (4, n - 1, n - 1, 2, 4)
    np.testing.assert_allclose(out[..., 0, :], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[..., 1, :], 0.0, atol=1e-5)


@pytest.mark.parametrize("nsd,deg", [(2, 1), (3, 1), (2, 2)])
def test_element_action_matches_gp_pipeline(nsd, deg):
    """element_action (static element tensor, two chained contractions) must
    equal the Gauss-point pipeline galerkin_project(sum_q nu_gp * d^q u_gp)
    to round-off — the VERDICT r1 item-1 production fast path."""
    rng = np.random.default_rng(3)
    n = deg * 6 + 1
    shape = (n,) * nsd
    b = make_basis(nsd, deg, h=tuple(1.0 / ((n - 1) // deg) for _ in range(nsd)))
    u = jnp.asarray(rng.standard_normal((2,) + shape), jnp.float32)
    nu = jnp.asarray(rng.random((2,) + shape) + 0.5, jnp.float32)
    grads = ("dx", "dy") + (("dz",) if nsd == 3 else ())

    A = fem.element_tensor(b, grads)
    R_et = fem.element_action(u, nu, A, b, shape)

    gp = fem.gp_eval(u, b, grads)
    nu_gp = fem.gp_eval(nu, b, ("N",))["N"]
    R_gp = fem.galerkin_project_multi(
        [(nu_gp * gp[q], q) for q in grads], b, shape)
    np.testing.assert_allclose(R_et, R_gp, rtol=2e-4, atol=2e-5)


def test_element_action_gradients_match_gp_pipeline():
    """d/du and d/dnu of sum(R^2) agree between the two formulations (the
    residual sits inside a jitted loss under jax.grad in training)."""
    rng = np.random.default_rng(4)
    n = 9
    b = make_basis(2, 1, h=(1.0 / (n - 1),) * 2)
    u = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    nu = jnp.asarray(rng.random((n, n)) + 0.5, jnp.float32)
    A = fem.element_tensor(b, ("dx", "dy"))

    def loss_et(u, nu):
        return jnp.sum(fem.element_action(u, nu, A, b, (n, n)) ** 2)

    def loss_gp(u, nu):
        gp = fem.gp_eval(u, b, ("dx", "dy"))
        nu_gp = fem.gp_eval(nu, b, ("N",))["N"]
        R = fem.galerkin_project_multi(
            [(nu_gp * gp["dx"], "dx"), (nu_gp * gp["dy"], "dy")], b, (n, n))
        return jnp.sum(R**2)

    g_et = jax.grad(loss_et, argnums=(0, 1))(u, nu)
    g_gp = jax.grad(loss_gp, argnums=(0, 1))(u, nu)
    for a, c in zip(g_et, g_gp):
        np.testing.assert_allclose(a, c, rtol=5e-4, atol=5e-5)


def test_poisson_module_et_equals_gp_formulation():
    """Poisson2D(loss_type=resmin) default 'et' formulation equals the 'gp'
    formulation at the module level (loss values and parameter gradients)."""
    from diffnet_tpu.pde.poisson import Poisson2D
    from diffnet_tpu.models.field import DirectField

    n = 17
    rng = np.random.default_rng(5)
    inputs = np.zeros((1, n, n, 3), np.float32)
    inputs[..., 0] = rng.random((n, n)) + 0.5
    inputs[0, 0, :, 2] = 1.0
    inputs[0, -1, :, 2] = 1.0
    forcing = rng.standard_normal((1, n, n, 1)).astype(np.float32)
    u0 = rng.standard_normal((n, n)).astype(np.float32)
    batch = (jnp.asarray(inputs), jnp.asarray(forcing))

    losses, grads = [], []
    for form in ("et", "gp"):
        m = Poisson2D(DirectField((n, n), init=u0), domain_size=n,
                      batch_size=1, loss_type="resmin",
                      residual_formulation=form)
        assert m.residual_formulation == form
        params = m.network.init(jax.random.PRNGKey(0), inputs)
        losses.append(float(m.training_loss(params, batch)))
        g = jax.grad(m.training_loss)(params, batch)
        grads.append(jax.tree_util.tree_leaves(g)[0])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-4)
    np.testing.assert_allclose(grads[0], grads[1], rtol=2e-3, atol=1e-5)
