"""FDM stencil tests: analytic derivatives + equivalence with the reference's
kron-composed conv kernels (DiffNet/DiffNetFDM.py:6-60) computed independently
in numpy."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffnet_tpu.core.fdm import make_fdm


def _grid(n):
    x = np.linspace(0, 1, n)
    xx, yy = np.meshgrid(x, x)
    return xx, yy


def _ref_kernel_2d(ktype, num_pt, n):
    """Reference kernel construction (DiffNetFDM.py:41-48), independent impl."""
    if num_pt == 3:
        stencil = np.array([-1.0, 0, 1.0]) * ((n - 1) / 2.0)
        weights = {"fdm": np.array([1.0, 1, 1]), "sobel": np.array([1.0, 2, 1])}[ktype]
    else:
        stencil = np.array([1.0, -8, 0, 8, -1]) * ((n - 1) / 12.0)
        weights = {"fdm": np.ones(5), "sobel": np.array([1.0, 4, 6, 4, 1])}[ktype]
    ker_x = np.kron(weights, stencil).reshape(num_pt, num_pt) / weights.sum()
    return ker_x


def _valid_conv2d(u, k):
    kh, kw = k.shape
    H, W = u.shape
    out = np.zeros((H - kh + 1, W - kw + 1))
    for j in range(kh):
        for i in range(kw):
            out += k[j, i] * u[j : j + H - kh + 1, i : i + W - kw + 1]
    return out


@pytest.mark.parametrize("ktype", ["fdm", "sobel"])
@pytest.mark.parametrize("num_pt", [3, 5])
def test_interior_matches_reference_kernel(ktype, num_pt):
    n = 32
    rng = np.random.default_rng(0)
    u = rng.standard_normal((n, n)).astype(np.float32)
    f = make_fdm(2, n, ktype=ktype, num_pt=num_pt)
    got = np.asarray(f.dx(jnp.asarray(u), mode="interior"))
    ref = _valid_conv2d(u.astype(np.float64), _ref_kernel_2d(ktype, num_pt, n))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-3)
    got_y = np.asarray(f.dy(jnp.asarray(u), mode="interior"))
    ref_y = _valid_conv2d(u.astype(np.float64), _ref_kernel_2d(ktype, num_pt, n).T)
    np.testing.assert_allclose(got_y, ref_y, rtol=2e-4, atol=1e-3)


def test_analytic_first_derivatives():
    n = 129
    xx, yy = _grid(n)
    u = jnp.asarray(np.sin(np.pi * xx) * np.cos(np.pi * yy), jnp.float32)
    f = make_fdm(2, n)
    dx = np.asarray(f.dx(u, mode="full"))
    dy = np.asarray(f.dy(u, mode="full"))
    # boundary rows carry the one-sided-correction error (~1% of the pi-scale
    # values — intrinsic to the reference scheme); interior is O(h^2)-tight
    np.testing.assert_allclose(
        dx, np.pi * np.cos(np.pi * xx) * np.cos(np.pi * yy), atol=4e-2
    )
    np.testing.assert_allclose(
        dy, -np.pi * np.sin(np.pi * xx) * np.sin(np.pi * yy), atol=4e-2
    )
    exact_dx = np.pi * np.cos(np.pi * xx) * np.cos(np.pi * yy)
    np.testing.assert_allclose(dx[1:-1, 1:-1], exact_dx[1:-1, 1:-1], atol=2e-3)


def test_analytic_second_derivatives_and_laplacian():
    n = 129
    xx, yy = _grid(n)
    u = jnp.asarray(np.sin(np.pi * xx) * np.sin(np.pi * yy), jnp.float32)
    f = make_fdm(2, n)
    lap = np.asarray(f.laplacian(u, mode="full"))
    exact = -2 * np.pi**2 * np.sin(np.pi * xx) * np.sin(np.pi * yy)
    # interior matches tightly; boundary rows are copies of interior (ref fix)
    np.testing.assert_allclose(lap[2:-2, 2:-2], exact[2:-2, 2:-2], atol=5e-2)


def test_full_mode_boundary_correction_linear_field_exact():
    """A linear field's one-sided corrected derivative is exact everywhere."""
    n = 33
    xx, yy = _grid(n)
    u = jnp.asarray(3.0 * xx + 2.0 * yy, jnp.float32)
    f = make_fdm(2, n)
    np.testing.assert_allclose(np.asarray(f.dx(u, mode="full")), 3.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(f.dy(u, mode="full")), 2.0, atol=1e-3)


def test_3d_derivatives():
    n = 33
    x = np.linspace(0, 1, n)
    zz, yy, xx = np.meshgrid(x, x, x, indexing="ij")
    u = jnp.asarray(xx**2 + 2 * yy - zz, jnp.float32)
    f = make_fdm(3, n)
    dx = np.asarray(f.dx(u, mode="full"))
    dz = np.asarray(f.dz(u, mode="full"))
    np.testing.assert_allclose(dx[1:-1, 1:-1, 1:-1], 2 * xx[1:-1, 1:-1, 1:-1], atol=2e-3)
    np.testing.assert_allclose(dz[1:-1, 1:-1, 1:-1], -1.0, atol=2e-3)
    dxx = np.asarray(f.dxx(u, mode="full"))
    np.testing.assert_allclose(dxx[1:-1, 1:-1, 1:-1], 2.0, atol=2e-2)


def test_batched():
    n = 17
    f = make_fdm(2, n)
    u = jnp.ones((4, 2, n, n))
    out = f.dx(u, mode="interior")
    assert out.shape == (4, 2, n - 2, n - 2)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)


def test_fs_learned_kernel():
    """'fs' learned-filter kernels (reference DiffNetFDM.py:8-14) act as a
    smoothed first derivative: exact to ~0.3% on linear fields."""
    n = 33
    x = np.linspace(0, 1, n)
    xx, yy = np.meshgrid(x, x)
    u = jnp.asarray(3.0 * xx, jnp.float32)
    f = make_fdm(2, n, ktype="fs", num_pt=5)
    dx = np.asarray(f.dx(u, mode="interior"))
    np.testing.assert_allclose(dx, 3.0, rtol=5e-3)
    # smoothing direction leaves constants intact
    dy = np.asarray(f.dy(u, mode="interior"))
    np.testing.assert_allclose(dy, 0.0, atol=1e-3)


def test_fs_kernel_num_pt_handling():
    """ktype='fs' is a fixed 5-tap stencil: default num_pt upgrades to 5 and
    works; incompatible values raise (ADVICE r1)."""
    import pytest

    from diffnet_tpu.core.fdm import make_fdm

    fdm = make_fdm(2, 17, ktype="fs")  # default num_pt=3 silently -> 5
    assert fdm.num_pt == 5
    u = jnp.asarray(np.linspace(0, 1, 17)[None, :]
                    * np.ones((17, 1)))[None]
    d = fdm.dx(u, mode="full")
    assert d.shape == u.shape
    with pytest.raises(ValueError):
        make_fdm(2, 17, ktype="fs", num_pt=4)


def test_full_mode_boundary_exactness():
    """Boundary-corrected first derivatives are exact on polynomials up to
    the stencil's interior order — the reference's hardcoded 5-pt
    constants (DiffNetFDM.py:74-89) were NOT (34% error on a linear field
    at the boundary under its own replicate padding; deliberately fixed
    by solving the correction coefficients, core/fdm.py)."""
    import jax.numpy as jnp

    from diffnet_tpu.core.fdm import make_fdm

    n = 33
    x = np.linspace(0, 1, n)
    X, _ = np.meshgrid(x, x)
    for num_pt, p in ((3, 2), (5, 3)):
        f = make_fdm(2, n, num_pt=num_pt)
        u = jnp.asarray(X**p)[None]
        d = np.asarray(f.dx(u, mode="full"))[0]
        exact = p * X ** (p - 1)
        np.testing.assert_allclose(d[16], exact[16], atol=5e-3)


def test_fdmstencils_direct_construction_fs_guard():
    """FDMStencils('fs') is safe to construct directly (the num_pt upgrade
    used to live only in make_fdm; direct construction broadcast-crashed)."""
    import jax.numpy as jnp

    from diffnet_tpu.core.fdm import FDMStencils

    f = FDMStencils(nsd=2, n=17, ktype="fs")
    assert f.num_pt == 5
    u = jnp.ones((1, 17, 17))
    assert np.isfinite(np.asarray(f.dx(u, mode="full"))).all()
