"""Flow past an embedded square block vs the conventional-solver midline
anchors checked into the reference repo (the last unexercised accuracy-
anchor family in BASELINE.md):

  * NS Re=10/20/30 on the L12 x H6 channel —
    ns-ldc-numerical-results/re-{10,20,30}-ns-L12-H6-midline{X,Y}.csv
    (the e2_ns_fps_resmin.py configuration; geometry forensics in
    data/flow.py::NSFPSChannelDataset — the anchors' NaN blanking pins
    the block at x in [2,3] x y in [2.5,3.5])
  * Stokes Re=1 on the L12 x H5 channel — stokes-fps/re-1-stokes-L12-
    midlineX.csv (H=5 fixed by the developed-region dp/dx = -8 nu/H^2)

Solved by the direct mixed-system stack on the ANISOTROPIC grid
(rectangular MG hierarchy + block preconditioner): Newton-Krylov for NS,
preconditioned GMRES for Stokes, pressure_gauge='dirichlet' (the outlet
p=0 column is a real BC, not a gauge pin). Reads the anchors from the
read-only reference mount; skipped when absent.
"""

import os

import numpy as np
import pytest

_REF = ("/root/reference/examples/navier-stokes/single_instance/")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF + "ns-ldc-numerical-results"),
    reason="reference FPS anchors not mounted")

_H = 0.25  # keeps the obstacle corners exactly on grid nodes


def _make(eq, Re, Ly):
    from diffnet_tpu.data.flow import NSFPSChannelDataset
    from diffnet_tpu.pde.flow import NavierStokes, StokesNSBase

    Lx = 12.0
    nx, ny = int(Lx / _H) + 1, int(Ly / _H) + 1
    y0 = (Ly - 1.0) / 2.0
    ds = NSFPSChannelDataset(domain_lengths=(Lx, Ly), domain_sizes=(nx, ny),
                             obstacle=((2.0, y0), (3.0, y0 + 1.0)), Re=Re)
    cls = NavierStokes if eq == "ns" else StokesNSBase
    m = cls(None, ds, domain_lengths=(Lx, Ly), domain_sizes=(nx, ny),
            batch_size=1, Re=Re, u_bc=ds.u_bc, v_bc=ds.v_bc, p_bc=ds.p_bc,
            pressure_gauge="dirichlet")
    return m, nx, ny, Lx, Ly


def _load(fname):
    ref = np.genfromtxt(_REF + fname, delimiter=",", skip_header=1)
    ok = ~np.isnan(ref[:, 2]) & (ref[:, 0] <= 12.0 + 1e-9)
    return ref[ok, 0], ref[ok, 1], ref[ok, 2], ref[ok, 3]


# measured errors at h=1/4 (uX / uY / vY): Re=10 0.046/0.066/0.018,
# Re=30 0.078/0.166/0.051 — the uY growth with Re is the steepening gap
# shear layer at this resolution (halves at h=1/8, examples/ns_fps.py)
@pytest.mark.parametrize("re,tol_ux,tol_uy,tol_vy", [
    (10, 0.07, 0.10, 0.04),
    (20, 0.09, 0.18, 0.06),
    (30, 0.11, 0.22, 0.08),
])
def test_ns_fps_matches_reference_solver(re, tol_ux, tol_uy, tol_vy):
    from diffnet_tpu.train.linear import ns_newton_solve

    m, nx, ny, Lx, Ly = _make("ns", re, 6.0)
    (u, v, p), info = ns_newton_solve(m, newton_iters=30, tol=1e-6,
                                      gmres_iters=80, restart=20)
    assert info["residual_history"][-1] < 1e-4

    xs, _, usX, _ = _load(f"ns-ldc-numerical-results/"
                          f"re-{re}-ns-L12-H6-midlineX.csv")
    x = np.linspace(0, Lx, nx)
    y = np.linspace(0, Ly, ny)
    err_ux = np.abs(np.interp(xs, x, u[ny // 2, :]) - usX)
    assert err_ux.max() < tol_ux, err_ux.max()

    # vertical cut through the obstacle center x = 2.5 (pinned by the
    # anchor's u-max: 1.286 here vs 1.289 in the CSV at Re=30)
    ys, _, usY, vsY = _load(f"ns-ldc-numerical-results/"
                            f"re-{re}-ns-L12-H6-midlineY.csv")
    i = int(round(2.5 / _H))
    err_uy = np.abs(np.interp(ys, y, u[:, i]) - usY)
    err_vy = np.abs(np.interp(ys, y, v[:, i]) - vsY)
    assert err_uy.max() < tol_uy, err_uy.max()
    assert err_vy.max() < tol_vy, err_vy.max()


def test_stokes_fps_matches_reference_solver():
    from diffnet_tpu.train.linear import stokes_linear_solve

    m, nx, ny, Lx, Ly = _make("stokes", 1, 5.0)
    (u, v, p), info = stokes_linear_solve(m, tol=1e-7, maxiter=200,
                                          restart=20)
    xs, ps, us, _ = _load("stokes-fps/re-1-stokes-L12-midlineX.csv")
    x = np.linspace(0, Lx, nx)
    jmid = ny // 2
    err_u = np.abs(np.interp(xs, x, u[jmid, :]) - us)
    err_p = np.abs(np.interp(xs, x, p[jmid, :]) - ps)
    # measured at h=1/4: u 0.071 max, p mean 0.089, inlet p within 4%
    assert err_u.max() < 0.10, err_u.max()
    assert err_p.mean() < 0.15, err_p.mean()
    assert abs(p[jmid, 0] - ps[0]) / ps[0] < 0.08
    # developed-region pressure slope ~ -8 nu / H^2 = -0.32 (what fixes
    # the anchor channel height H = 5)
    sl = (x >= 5.0) & (x <= 10.0)
    slope = np.polyfit(x[sl], p[jmid, sl], 1)[0]
    assert abs(slope - (-0.32)) < 0.04, slope


def test_flow_past_cloud_derived_obstacle():
    """No-slip mask from an oriented POINT CLOUD via the winding number,
    then a direct Stokes channel solve — the composition behind the
    reference's airfoil-cloud FPS variants (e2_ns_fps_af_pc.py: winding
    bc mask from a cloud; e2_ns_fps_af_bcmask.py: the image-mask route
    covered by FlowPastObjectDataset)."""
    import jax.numpy as jnp

    from diffnet_tpu.core.geometry import occupancy_from_cloud
    from diffnet_tpu.data.flow import FlowPastObjectDataset
    from diffnet_tpu.pde.flow import StokesNSBase
    from diffnet_tpu.train.linear import stokes_linear_solve

    Lx, Ly = 4.0, 1.0
    nx, ny = 33, 9
    # ellipse-ish cloud centered in the front half of the channel
    t = np.linspace(0, 2 * np.pi, 48, endpoint=False)
    rx, ry = 0.35, 0.18
    pts = np.stack([1.0 + rx * np.cos(t), 0.5 + ry * np.sin(t)], -1)
    nrm = np.stack([ry * np.cos(t), rx * np.sin(t)], -1)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    area = np.full(48, 2 * np.pi * np.hypot(rx, ry) / 48)
    chi = occupancy_from_cloud(
        jnp.asarray(pts)[None], jnp.asarray(nrm)[None],
        jnp.asarray(area)[None], (ny, nx), lengths=(Lx, Ly))
    chi = np.asarray(chi)[0]
    assert 0.02 < chi.mean() < 0.4   # the winding mask found the object

    ds = FlowPastObjectDataset(chi, domain_lengths=(Lx, Ly), Re=1)
    m = StokesNSBase(None, ds, domain_lengths=(Lx, Ly),
                     domain_sizes=(nx, ny), batch_size=1, Re=1,
                     u_bc=ds.u_bc, pressure_gauge="dirichlet")
    (u, v, p), info = stokes_linear_solve(m, tol=1e-6, maxiter=120,
                                          restart=20)
    assert np.isfinite(u).all() and np.isfinite(p).all()
    # no-slip inside the object, flow in the open channel
    assert np.abs(u[chi > 0.5]).max() < 1e-6
    assert u.max() > 0.3
