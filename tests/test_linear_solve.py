"""Matrix-free Krylov solves over the module residual operators
(train/linear.py): the framework's conventional-solver path."""

import numpy as np
import pytest

from diffnet_tpu.data.single_instances import (Rectangle,
                                               RectangleManufactured)
from diffnet_tpu.models import DirectField
from diffnet_tpu.pde import Poisson2D
from diffnet_tpu.train import module_linear_solve, solve_linear


def _mms_module(n):
    exact = lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)
    forcing = lambda x, y: 2 * np.pi**2 * np.sin(np.pi * x) * np.sin(
        np.pi * y)
    ds = RectangleManufactured(domain_size=n)
    ds.n_samples = 1
    return Poisson2D(DirectField((n, n)), ds, domain_size=n, batch_size=1,
                     loss_type="resmin", exact_solution=exact,
                     forcing=forcing, mms_dirichlet=True), ds


def test_cg_poisson_mms_matches_exact():
    """CG on the assembled residual reaches the discretization-limited L2
    error directly (the LBFGS path needs ~100s of epochs for the same)."""
    n = 65
    m, ds = _mms_module(n)
    u, info = module_linear_solve(m, tol=1e-10)
    eL2, _, uex = m.calc_l2_err(u)
    assert float(eL2 / uex) < 3e-4, float(eL2 / uex)


def test_cg_source_sink_problem():
    """Non-MMS Dirichlet problem (source row u=1, sink row u=0): the CG
    solution honors both boundary values and stays bounded between them."""
    n = 33
    ds = Rectangle(domain_size=n)
    ds.n_samples = 1
    m = Poisson2D(DirectField((n, n)), ds, domain_size=n, batch_size=1,
                  loss_type="resmin")
    u, info = module_linear_solve(m, tol=1e-10)
    np.testing.assert_allclose(u[0, :], 1.0, atol=1e-5)   # bc1 row
    np.testing.assert_allclose(u[-1, :], 0.0, atol=1e-5)  # bc2 row
    assert u.min() > -1e-3 and u.max() < 1.0 + 1e-3
    # harmonic in y: interior midline close to linear profile
    mid = u[:, n // 2]
    lin = np.linspace(1.0, 0.0, n)
    assert np.abs(mid - lin).max() < 0.05


def test_solve_linear_rejects_nonlinear_residual():
    import jax.numpy as jnp

    def nonlinear(u):
        return u**2 - 1.0

    with pytest.raises(ValueError, match="not affine"):
        solve_linear(nonlinear, (8, 8))


def test_bicgstab_variable_diffusivity():
    """Variable-nu diffusion: cg and bicgstab both drive the assembled
    residual to the float32 floor (solution agreement is only bounded by
    cond(A)*eps, so the residual is the right acceptance criterion)."""
    import jax.numpy as jnp

    n = 33
    m, ds = _mms_module(n)
    inputs, forcing = ds[0]
    inputs = inputs.copy()
    rng = np.random.default_rng(0)
    inputs[..., 0] = 1.0 + 0.5 * rng.random((n, n)).astype(np.float32)
    jin = jnp.asarray(inputs)[None]
    for method in ("cg", "bicgstab"):
        u, _ = module_linear_solve(m, inputs, forcing, method=method,
                                   tol=1e-10)
        R = m.residual_for_field(jnp.asarray(u)[None], jin, None)
        assert float(jnp.linalg.norm(R)) < 5e-4, method  # f32 Krylov floor


def test_helmholtz_gmres_high_wavenumber():
    """Indefinite Helmholtz (k=12: several interior wavelengths) solved
    with gmres matches the exact MMS solution — the regime where descent
    methods crawl (bicgstab breaks down to NaN on this system at f32;
    measured, which is why gmres is the documented indefinite choice)."""
    import jax.numpy as jnp

    from diffnet_tpu.data.single_instances import \
        RectangleHelmholtzManufactured
    from diffnet_tpu.pde import Helmholtz2D

    n = 65
    k = 12.0
    ds = RectangleHelmholtzManufactured(domain_size=n, khh=k)
    ds.n_samples = 1
    exact = lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)
    forcing = lambda x, y: (2 * np.pi**2 - k**2) * np.sin(np.pi * x) * \
        np.sin(np.pi * y)
    m = Helmholtz2D(DirectField((n, n)), ds, domain_size=n, batch_size=1,
                    khh=k, exact_solution=exact, forcing=forcing)
    u, _ = module_linear_solve(m, method="gmres", tol=1e-10,
                               maxiter=2000)
    eL2, _, uex = m.calc_l2_err(u)
    assert float(eL2 / uex) < 1e-3, float(eL2 / uex)


def test_multigrid_preconditioned_cg():
    """Geometric-MG V-cycle preconditioner: on a rough (broad-spectrum)
    RHS at 129^2, MG-CG reaches the f32 floor in 10 iterations while
    plain CG is ~4 orders of magnitude behind at 30 (measured 1.8e-6 vs
    4.9e-2 rel residual)."""
    import jax.numpy as jnp

    from diffnet_tpu.train import multigrid_preconditioner
    from diffnet_tpu.train.linear import solve_linear

    def factory(n):
        ds = RectangleManufactured(domain_size=n)
        ds.n_samples = 1
        return Poisson2D(DirectField((n, n)), ds, domain_size=n,
                         batch_size=1, loss_type="resmin")

    n = 65
    m = factory(n)
    inputs = jnp.asarray(m.dataset[0][0])[None]
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    bc = np.zeros((n, n))
    bc[[0, -1], :] = 1
    bc[:, [0, -1]] = 1
    b = jnp.where(jnp.asarray(bc) > 0.5, 0.0, b)
    forcing = jnp.zeros((1, n, n, 1), jnp.float32)

    def resfn(u):
        return m.residual_for_field(u[None], inputs, forcing)[0] - b

    M, info = multigrid_preconditioner(factory, n)
    assert info["levels"][0] == n and info["levels"][-1] <= 9

    u_mg, _ = solve_linear(resfn, (n, n), tol=1e-12, maxiter=10, M=M)
    r_mg = float(jnp.linalg.norm(resfn(u_mg)) / jnp.linalg.norm(b))
    u_cg, _ = solve_linear(resfn, (n, n), tol=1e-12, maxiter=10)
    r_cg = float(jnp.linalg.norm(resfn(u_cg)) / jnp.linalg.norm(b))
    assert r_mg < 1e-4, r_mg
    assert r_mg < r_cg / 50, (r_mg, r_cg)


def test_multigrid_3d():
    """3D MG-CG (nsd=3): trilinear transfers + probed coarse inverse reach
    the f32 floor in 10 iterations at 33^3 on a rough RHS (plain CG:
    5e-3 at 20). Also pins the coarse-pinv rcond fix — noise singular
    values from the masked rows used to blow the inverse up to 1e14."""
    import jax.numpy as jnp

    from diffnet_tpu.data.single_instances import CuboidManufactured
    from diffnet_tpu.pde import Poisson3D
    from diffnet_tpu.train import multigrid_preconditioner
    from diffnet_tpu.train.linear import solve_linear

    def factory(n):
        ds = CuboidManufactured(domain_size=n)
        ds.n_samples = 1
        return Poisson3D(DirectField((n, n, n)), ds, domain_size=n,
                         batch_size=1, loss_type="resmin")

    n = 17
    m = factory(n)
    inputs = jnp.asarray(m.dataset[0][0])[None]
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    bc = np.zeros((n, n, n))
    bc[[0, -1]] = 1
    bc[:, [0, -1]] = 1
    bc[:, :, [0, -1]] = 1
    b = jnp.where(jnp.asarray(bc) > 0.5, 0.0, b)
    forcing = jnp.zeros((1, n, n, n, 1), jnp.float32)

    def resfn(u):
        return m.residual_for_field(u[None], inputs, forcing)[0] - b

    M, info = multigrid_preconditioner(factory, n, nsd=3)
    u, _ = solve_linear(resfn, (n, n, n), tol=1e-12, maxiter=10, M=M)
    r = float(jnp.linalg.norm(resfn(u)) / jnp.linalg.norm(b))
    assert r < 1e-4, r


class _VarNuDataset:
    """Single-sample dataset with a prescribed nu field (left source /
    right sink Dirichlet, zero forcing)."""

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


def _rough_nu(n_fine, contrast=2.0):
    """Smooth random log-nu defined ONLY on the fine grid (not an analytic
    field a per-level dataset could re-synthesize) — forces the MG levels
    to actually restrict the fine coefficient. The smoothing length is a
    FIXED PHYSICAL fraction of the domain (sigma = n/10) so the
    grid-independence sweep varies resolution, not coefficient roughness."""
    from scipy import ndimage

    rng = np.random.default_rng(3)
    g = ndimage.gaussian_filter(rng.standard_normal((n_fine, n_fine)),
                                n_fine / 10.0)
    g = g / np.abs(g).max()
    return np.exp(contrast * g).astype(np.float32)


def _mg_varnu_relres(n, nu_fine, maxiter, coarse_op="rediscretize",
                     inputs_mode="restrict", n_coarse=9):
    import jax.numpy as jnp

    from diffnet_tpu.train import multigrid_preconditioner
    from diffnet_tpu.train.linear import solve_linear

    ds_fine = _VarNuDataset(nu_fine)

    def factory(m_n, _cache={}):
        if m_n not in _cache:
            # per-level datasets deliberately carry the WRONG (unit) nu:
            # only the fine level's dataset holds the true field, so a
            # passing test proves the restrict path feeds the levels
            ds = ds_fine if m_n == n else _VarNuDataset(
                np.ones((m_n, m_n), np.float32))
            _cache[m_n] = Poisson2D(DirectField((m_n, m_n)), ds,
                                    domain_size=m_n, batch_size=1,
                                    loss_type="resmin")
        return _cache[m_n]

    m = factory(n)
    inputs = jnp.asarray(ds_fine.inputs)[None]
    forcing = jnp.asarray(ds_fine.forcing)[None]
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    bc = np.zeros((n, n)); bc[:, [0, -1]] = 1
    b = jnp.where(jnp.asarray(bc) > 0.5, 0.0, b)

    def resfn(u):
        return m.residual_for_field(u[None], inputs, forcing)[0] - b

    M, info = multigrid_preconditioner(
        factory, n, inputs_per_level=inputs_mode, coarse_op=coarse_op,
        n_coarse=n_coarse)
    u, _ = solve_linear(resfn, (n, n), tol=1e-12, maxiter=maxiter, M=M)
    return float(jnp.linalg.norm(resfn(u)) / jnp.linalg.norm(b))


def test_multigrid_variable_nu_grid_independence():
    """MG-CG on a ~50x-contrast nu field KNOWN ONLY on the fine grid:
    restriction-fed levels give near-grid-independent convergence
    65^2 -> 129^2 -> 257^2 at a FIXED 12-iteration budget (VERDICT r2
    item 6), while levels fed their own (unit-nu) datasets stall.

    n_coarse=33: with a high-contrast coefficient the very coarse grids
    (17^2, 9^2) cannot represent the operator and the rediscretized
    V-cycle rate decays with depth (measured 4e-6 -> 3e-3 at 12 iters,
    65 -> 257, with n_coarse=9; Galerkin RAP stays flat at any depth —
    see test_multigrid_galerkin_coarse_ops)."""
    nu257 = _rough_nu(257)
    rels = {}
    for n in (65, 129, 257):
        step = (257 - 1) // (n - 1)
        rels[n] = _mg_varnu_relres(n, nu257[::step, ::step], maxiter=12,
                                   n_coarse=33)
    for n, r in rels.items():
        assert r < 3e-5, (n, r, rels)
    # wrong-operator control: per-level unit-nu rediscretization
    r_wrong = _mg_varnu_relres(129, nu257[::2, ::2], maxiter=12,
                               inputs_mode=None, n_coarse=33)
    assert r_wrong > 10 * rels[129], (r_wrong, rels[129])


def test_multigrid_chebyshev_beats_jacobi():
    """The default Chebyshev smoother (degree-n_smooth three-term
    recurrence in Dinv A — inner-product-free, same matvec count per
    sweep as Jacobi) converges markedly faster: measured at 129^2 on a
    rough RHS, 6 MG-CG iterations reach 3.5e-6 (the f32 floor) vs 4.0e-4
    for damped Jacobi."""
    import jax.numpy as jnp

    from diffnet_tpu.train import multigrid_preconditioner
    from diffnet_tpu.train.linear import solve_linear

    def factory(n):
        ds = RectangleManufactured(domain_size=n)
        ds.n_samples = 1
        return Poisson2D(DirectField((n, n)), ds, domain_size=n,
                         batch_size=1, loss_type="resmin")

    n = 129
    m = factory(n)
    inputs = jnp.asarray(m.dataset[0][0])[None]
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    bc = np.zeros((n, n)); bc[[0, -1], :] = 1; bc[:, [0, -1]] = 1
    b = jnp.where(jnp.asarray(bc) > 0.5, 0.0, b)
    forcing = jnp.zeros((1, n, n, 1), jnp.float32)

    def resfn(u):
        return m.residual_for_field(u[None], inputs, forcing)[0] - b

    rel = {}
    for sm in ("jacobi", "chebyshev"):
        M, info = multigrid_preconditioner(factory, n, smoother=sm)
        assert info["smoother"] == sm
        u, _ = solve_linear(resfn, (n, n), tol=1e-14, maxiter=6, M=M)
        rel[sm] = float(jnp.linalg.norm(resfn(u)) / jnp.linalg.norm(b))
    assert rel["chebyshev"] < 1e-5, rel
    assert rel["chebyshev"] < rel["jacobi"] / 10, rel


def test_multigrid_galerkin_coarse_ops():
    """coarse_op='galerkin' (exact matrix-free RAP) is depth-robust on the
    same variable-nu problem even with the default 9^2 coarsest grid."""
    nu = _rough_nu(129)
    r = _mg_varnu_relres(129, nu, maxiter=12, coarse_op="galerkin")
    assert r < 1e-5, r


class _VarNuDataset3D:
    """Single-sample 3D dataset with a prescribed nu field (left source /
    right sink Dirichlet faces, zero forcing) — 3D analogue of
    :class:`_VarNuDataset`."""

    def __init__(self, nu):
        n = nu.shape[0]
        bc1 = np.zeros((n, n, n)); bc1[:, :, 0] = 1
        bc2 = np.zeros((n, n, n)); bc2[:, :, -1] = 1
        self.inputs = np.stack([nu, bc1, bc2], -1).astype(np.float32)
        self.forcing = np.zeros((n, n, n, 1), np.float32)

    def __len__(self):
        return 1

    def __getitem__(self, idx):
        return self.inputs, self.forcing


def test_multigrid_galerkin_variable_nu_3d():
    """Galerkin-RAP MG-CG on a 3D variable-nu operator with the
    coefficient KNOWN ONLY on the fine grid (per-level datasets carry
    unit nu): near-grid-independent convergence 17^3 -> 33^3 at a fixed
    8-iteration budget. Exercises the one MG combination the 2D tests
    don't: trilinear transfers + 27-color probed diagonals + matrix-free
    RAP at nsd=3."""
    import jax.numpy as jnp
    from scipy import ndimage

    from diffnet_tpu.pde import Poisson3D
    from diffnet_tpu.train import multigrid_preconditioner
    from diffnet_tpu.train.linear import solve_linear

    rng = np.random.default_rng(5)
    g33 = ndimage.gaussian_filter(rng.standard_normal((33, 33, 33)), 3.3)
    g33 = g33 / np.abs(g33).max()
    nu33 = np.exp(2.0 * g33).astype(np.float32)  # ~50x contrast

    rels = {}
    for n in (17, 33):
        step = (33 - 1) // (n - 1)
        nu = nu33[::step, ::step, ::step]
        ds_fine = _VarNuDataset3D(nu)

        def factory(m_n, _cache={}, ds_fine=ds_fine, n=n):
            if m_n not in _cache:
                ds = ds_fine if m_n == n else _VarNuDataset3D(
                    np.ones((m_n, m_n, m_n), np.float32))
                _cache[m_n] = Poisson3D(DirectField((m_n, m_n, m_n)), ds,
                                        domain_size=m_n, batch_size=1,
                                        loss_type="resmin")
            return _cache[m_n]

        m = factory(n)
        inputs = jnp.asarray(ds_fine.inputs)[None]
        forcing = jnp.asarray(ds_fine.forcing)[None]
        b = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
        bc = np.zeros((n, n, n)); bc[:, :, [0, -1]] = 1
        b = jnp.where(jnp.asarray(bc) > 0.5, 0.0, b)

        def resfn(u):
            return m.residual_for_field(u[None], inputs, forcing)[0] - b

        M, _ = multigrid_preconditioner(
            factory, n, nsd=3, inputs_per_level="restrict",
            coarse_op="galerkin")
        u, _ = solve_linear(resfn, (n, n, n), tol=1e-12, maxiter=8, M=M)
        rels[n] = float(jnp.linalg.norm(resfn(u)) / jnp.linalg.norm(b))
    for n, r in rels.items():
        assert r < 3e-5, (n, rels)


def test_stokes_block_preconditioned_gmres():
    """VERDICT r2 item 4: the PSPG Stokes mixed system solved directly by
    block-preconditioned GMRES (MG on the momentum blocks + diagonal
    PSPG-Schur on pressure) in ~tens of iterations — past the LBFGS
    training ceiling (1.47e-3 u-error at 33^2 after 400 epochs,
    CONVERGENCE.md) and at discretization-limited accuracy."""
    from diffnet_tpu.data.flow import StokesMMSDataset
    from diffnet_tpu.pde.flow import StokesMMS
    from diffnet_tpu.train import stokes_linear_solve

    errs = {}
    for n in (33, 65):
        ds = StokesMMSDataset(domain_size=n)
        ds.n_samples = 1
        m = StokesMMS(None, ds, domain_size=n, batch_size=1, Re=1)
        (u, v, p), _ = stokes_linear_solve(m, maxiter=100)
        errs[n] = [np.linalg.norm(f - ex) / np.linalg.norm(ex)
                   for f, ex in ((u, m.u_exact), (v, m.v_exact),
                                 (p, m.p_exact))]
    for n, (eu, ev, ep) in errs.items():
        assert eu < 6e-4 and ev < 6e-4, (n, errs)
        assert ep < 3e-2, (n, errs)
    # O(h^2) velocity decay 33 -> 65 (discretization-limited, not a
    # solver floor): rate = log2(e33/e65)
    rate = np.log2(errs[33][0] / errs[65][0])
    assert rate > 1.7, (rate, errs)


def test_newton_allen_cahn_mms():
    """Generic Newton-Krylov (train.linear.newton_solve) on the NONLINEAR
    Allen-Cahn space-time system with the double-well reaction, warm-
    started from the one-Krylov-call reaction-free (A=0) solve — the same
    homotopy the training path needs, but seconds instead of 2x250 LBFGS
    epochs. Accuracy matches the MMS table (CONVERGENCE.md)."""
    import math

    import jax.numpy as jnp

    from diffnet_tpu.data.single_instances import AllenCahnIceMeltRectangle
    from diffnet_tpu.pde import AllenCahnIceMelt
    from diffnet_tpu.train.linear import newton_solve, solve_linear

    pi = math.pi
    A, Cn, D, k = 16.0, 0.1, 1.0, 2.0
    exact = lambda x, y: np.sin(pi * x) * np.sin(pi * y)

    def forcing(x, y):
        u = np.sin(pi * x) * np.sin(pi * y)
        u_t = pi * np.sin(pi * x) * np.cos(pi * y)
        G = 2.0 * D * A * (u - 3 * u**2 + 2 * u**3) - D * k
        return u_t + D * G + D * Cn**2 * 2 * pi**2 * u

    def linforcing(x, y):
        u = np.sin(pi * x) * np.sin(pi * y)
        u_t = pi * np.sin(pi * x) * np.cos(pi * y)
        return u_t - D * D * k + D * Cn**2 * 2 * pi**2 * u

    errs = {}
    for n in (17, 33):
        ds = AllenCahnIceMeltRectangle(domain_size=n)
        ds.n_samples = 1
        ds.bc2 = np.zeros((n, n))
        ds.bc2[:, [0, -1]] = 1.0
        ds.bc2[-1, :] = 1.0
        ds.u0 = np.zeros((n, n))
        jin = jnp.asarray(ds[0][0])[None]
        bc1, bc2 = jin[..., 1], jin[..., 2]
        # stage 1: the A=0 problem is AFFINE (calcG drops the double-well
        # STATICALLY so gmres can transpose the jaxpr) -> one Krylov call
        m1 = AllenCahnIceMelt(None, ds, domain_size=n, batch_size=1,
                              ac_A=0.0, forcing=linforcing, u0=ds.u0)

        def F1(u, m=m1):
            return m.residual(m.apply_bcs(u[None], jin), bc1, bc2)[0]

        u_lin, _ = solve_linear(F1, (n, n), method="gmres", tol=1e-8,
                                maxiter=400, restart=30)
        m = AllenCahnIceMelt(None, ds, domain_size=n, batch_size=1,
                             forcing=forcing, exact_solution=exact,
                             u0=ds.u0)

        def F(u, m=m):
            return m.residual(m.apply_bcs(u[None], jin), bc1, bc2)[0]

        x, info = newton_solve(F, u_lin, newton_iters=30, gmres_iters=150,
                               restart=25, tol=1e-9)
        u = np.asarray(m.apply_bcs(x[None], jin)[0])
        eL2, _, uex = m.calc_l2_err(u)
        errs[n] = float(eL2 / uex)
    assert errs[17] < 5e-3, errs
    assert errs[33] < 5e-4, errs


def test_gauss_newton_burgers_mms():
    """Matrix-free Gauss-Newton on the deg-2 strong-form Burgers
    collocation residual: 6-8 iterations to the MMS-table accuracy
    (CONVERGENCE.md Burgers rows need 300 LBFGS epochs)."""
    import math

    import jax.numpy as jnp

    from diffnet_tpu.pde import BurgersSpaceTime
    from diffnet_tpu.train.linear import gauss_newton_solve

    pi = math.pi

    class _DS:
        n_samples = 1

        def __init__(self, n):
            x = np.linspace(0, 1, n)
            self.xx, self.yy = np.meshgrid(x, x)
            bc1 = np.full((n, n), -10.0)
            bc1_val = np.zeros((n, n))
            bc1[0, :] = 1.0
            bc1_val[0, :] = np.sin(pi * x)
            bc2 = np.full((n, n), -10.0)
            bc2[:, 0] = 1.0
            bc2[:, -1] = 1.0
            self.inputs = np.stack([self.xx, bc1, bc2, bc1_val],
                                   -1).astype(np.float32)
            self.forcing = np.zeros((n, n, 1), np.float32)

        def __len__(self):
            return 1

        def __getitem__(self, i):
            return self.inputs, self.forcing

    exact = lambda x, y: np.sin(pi * x) * np.exp(-y)
    forcing = lambda x, y: (-np.sin(pi * x) * np.exp(-y)
                            + np.sin(pi * x) * np.exp(-y)
                            * pi * np.cos(pi * x) * np.exp(-y))
    errs = {}
    for n in (17, 33):
        ds = _DS(n)
        m = BurgersSpaceTime(None, ds, domain_size=n, batch_size=1,
                             forcing=forcing, exact_solution=exact)
        jin = jnp.asarray(ds[0][0])[None]

        def r_gp(u, m=m, jin=jin):
            ub = m.apply_bcs(u[None], jin)
            gp = m.gp_all(ub, ("N", "dx", "dy"))
            res = (gp["dy"] + gp["N"] * gp["dx"]
                   - jnp.asarray(m.f_gp, ub.dtype))
            return res * jnp.sqrt(jnp.asarray(m.gpw, ub.dtype))

        x, info = gauss_newton_solve(r_gp, jnp.zeros((n, n), jnp.float32),
                                     newton_iters=30, cg_iters=200)
        assert info["gn_iters"] <= 15, info
        u = np.asarray(m.apply_bcs(x[None], jin)[0])
        eL2, _, uex = m.calc_l2_err(u)
        errs[n] = float(eL2 / uex)
    assert errs[17] < 1e-3 and errs[33] < 1.5e-4, errs
