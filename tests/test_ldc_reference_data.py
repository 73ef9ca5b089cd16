"""NS lid-driven cavity vs the conventional-solver midline data checked into
the reference repo (the BASELINE.md accuracy anchor:
ns-ldc-numerical-results/midline_cuts_Re*_regularized_128x128.txt, used by
the reference overlay at e1_ns_ldc_resmin.py:414-424).

Reads the data from the read-only reference mount; skipped when absent.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

_REF = ("/root/reference/examples/navier-stokes/single_instance/"
        "ns-ldc-numerical-results")

pytestmark = pytest.mark.skipif(not os.path.isdir(_REF),
                                reason="reference LDC data not mounted")


class TripleField:
    def __init__(self, n):
        self.n = n

    def init(self, rng, sample=None):
        z = jnp.zeros((self.n, self.n))
        return {"u": z, "v": z, "p": z}

    def apply(self, params, inputs=None):
        b = 1 if inputs is None else inputs.shape[0]
        f = lambda k: jnp.broadcast_to(params[k][None],
                                       (b, self.n, self.n))
        return f("u"), f("v"), f("p")


def _solve_ldc(n, Re, epochs):
    from diffnet_tpu.data.flow import NSLDCDataset
    from diffnet_tpu.pde.flow import NavierStokes, ldc_bcs
    from diffnet_tpu.train.trainer import Trainer

    ds = NSLDCDataset(domain_sizes=(n, n), Re=Re)
    ds.n_samples = 1
    u_bc, v_bc, p_bc = ldc_bcs((n, n))
    m = NavierStokes(TripleField(n), ds, domain_size=n, batch_size=1, Re=Re,
                     u_bc=u_bc, v_bc=v_bc, p_bc=p_bc, loss_norm="squared")
    st = Trainer(max_epochs=epochs, optimizer="lbfgs",
                 lbfgs_max_iter=10).fit(m)
    batch = (jnp.asarray(ds[0][0])[None], jnp.asarray(ds[0][1])[None])
    u, v, p = m.apply_bcs(m.network.apply(st.params, batch[0]), batch[0])
    return np.asarray(u)[0], np.asarray(v)[0]


@pytest.mark.parametrize("re,fname,tol_u,tol_v", [
    (100, "midline_cuts_Re100_regularized_128x128.txt", 0.02, 0.03),
    # Re=1: measured u-midline errs 0.053 / 0.044 / 0.050 at 48^2 / 64^2 /
    # 96^2-continuation (scripts/ldc_validation.py --re 1) — a PLATEAU, so
    # the ~0.05 gap is a formulation floor of equal-order Q1 + VMS in the
    # viscous limit, not mesh resolution; the v-midline tracks to 0.020
    (1, "midline_cuts_Re1_regularized_128x128.txt", 0.07, 0.04),
])
def test_ldc_matches_reference_solver(re, fname, tol_u, tol_v):
    ref = np.loadtxt(os.path.join(_REF, fname), delimiter=",", skiprows=1)
    ref_s, ref_u, ref_v = ref[:, 0], ref[:, 1], ref[:, 2]
    n = 48
    u, v = _solve_ldc(n, re, epochs=500)
    y = np.linspace(0, 1, n)
    err_u = np.abs(u[:, n // 2] - np.interp(y, ref_s, ref_u))
    err_v = np.abs(v[n // 2, :] - np.interp(y, ref_s, ref_v))
    assert err_u.max() < tol_u, err_u.max()
    assert err_v.max() < tol_v, err_v.max()


def test_stokes_ldc_matches_reference_solver():
    """Stokes (PSPG) lid-driven cavity vs the reference's conventional
    solver cuts (stokes-ldc-numerical-results/midline_cuts_Re1_...txt)."""
    from diffnet_tpu.data.flow import NSLDCDataset
    from diffnet_tpu.pde.flow import StokesNSBase, ldc_bcs
    from diffnet_tpu.train.trainer import Trainer

    path = ("/root/reference/examples/stokes/single_instance/"
            "stokes-ldc-numerical-results/"
            "midline_cuts_Re1_regularized_128x128.txt")
    if not os.path.exists(path):
        pytest.skip("stokes reference data not mounted")
    ref = np.loadtxt(path, delimiter=",", skiprows=1)
    n = 48

    class StokesLDC(StokesNSBase):
        eq_type = "stokes"

    ds = NSLDCDataset(domain_sizes=(n, n), Re=1)
    ds.n_samples = 1
    u_bc, v_bc, p_bc = ldc_bcs((n, n))
    m = StokesLDC(TripleField(n), ds, domain_size=n, batch_size=1, Re=1,
                  u_bc=u_bc, v_bc=v_bc, p_bc=p_bc, loss_norm="squared")
    st = Trainer(max_epochs=600, optimizer="lbfgs",
                 lbfgs_max_iter=10).fit(m)
    batch = (jnp.asarray(ds[0][0])[None], jnp.asarray(ds[0][1])[None])
    u, v, p = m.apply_bcs(m.network.apply(st.params, batch[0]), batch[0])
    u = np.asarray(u)[0]
    v = np.asarray(v)[0]
    y = np.linspace(0, 1, n)
    err_u = np.abs(u[:, n // 2] - np.interp(y, ref[:, 0], ref[:, 1]))
    err_v = np.abs(v[n // 2, :] - np.interp(y, ref[:, 0], ref[:, 2]))
    assert err_u.max() < 0.07, err_u.max()
    assert err_v.max() < 0.04, err_v.max()


def test_ldc_newton_krylov_matches_reference_solver():
    """Newton-Krylov on the full VMS system (train.linear.ns_newton_solve:
    jax.jvp Jacobian + block-preconditioned GMRES + line search) converges
    QUADRATICALLY on LDC Re=100 — 4 Newton iterations to |F| ~ 5e-8 at
    48^2 (~100x fewer residual evaluations than the 500-epoch LBFGS
    training path) and lands CLOSER to the conventional-solver cuts
    (err_u 0.0096 vs the training path's 0.02 tolerance)."""
    from diffnet_tpu.data.flow import NSLDCDataset
    from diffnet_tpu.pde.flow import NavierStokes, ldc_bcs
    from diffnet_tpu.train.linear import ns_newton_solve

    fname = os.path.join(_REF, "midline_cuts_Re100_regularized_128x128.txt")
    ref = np.loadtxt(fname, delimiter=",", skiprows=1)
    n = 48
    ds = NSLDCDataset(domain_sizes=(n, n), Re=100)
    ds.n_samples = 1
    u_bc, v_bc, p_bc = ldc_bcs((n, n))
    m = NavierStokes(None, ds, domain_size=n, batch_size=1, Re=100,
                     u_bc=u_bc, v_bc=v_bc, p_bc=p_bc)
    (u, v, p), info = ns_newton_solve(m, newton_iters=15)
    assert info["newton_iters"] <= 8, info
    assert info["residual_history"][-1] < 1e-5, info
    y = np.linspace(0, 1, n)
    err_u = np.abs(u[:, n // 2] - np.interp(y, ref[:, 0], ref[:, 1]))
    err_v = np.abs(v[n // 2, :] - np.interp(y, ref[:, 0], ref[:, 2]))
    assert err_u.max() < 0.015, err_u.max()
    assert err_v.max() < 0.025, err_v.max()
