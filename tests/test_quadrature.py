"""Unit tests for quadrature rules and basis tables vs closed-form math."""

import numpy as np
import pytest

from diffnet_tpu.core.quadrature import (
    gauss_quadrature_1d,
    lagrange_basis_1d,
    make_basis,
)


@pytest.mark.parametrize("ngp", [1, 2, 3, 4])
def test_gauss_exactness(ngp):
    """n-point Gauss-Legendre integrates polynomials up to degree 2n-1."""
    x, w = gauss_quadrature_1d(ngp)
    for p in range(2 * ngp):
        exact = (1 - (-1) ** (p + 1)) / (p + 1)  # ∫_{-1}^{1} x^p dx
        assert np.isclose(np.sum(w * x**p), exact, atol=1e-12), (ngp, p)


def test_gauss_matches_reference_tables():
    """Reference tables (DiffNetFEM.py:128-141) to their stated precision."""
    x2, w2 = gauss_quadrature_1d(2)
    np.testing.assert_allclose(x2, [-0.5773502691896258, 0.5773502691896258])
    np.testing.assert_allclose(w2, [1.0, 1.0])
    x3, w3 = gauss_quadrature_1d(3)
    np.testing.assert_allclose(x3, [-0.774596669, 0.0, 0.774596669], atol=1e-9)
    np.testing.assert_allclose(w3, [5.0 / 9, 8.0 / 9, 5.0 / 9], atol=1e-12)


@pytest.mark.parametrize("deg", [1, 2, 3])
def test_lagrange_cardinal_and_partition(deg):
    N, dN, d2N = lagrange_basis_1d(deg)
    nodes = np.linspace(-1, 1, deg + 1)
    # Cardinal property N_i(x_j) = delta_ij
    np.testing.assert_allclose(N(nodes), np.eye(deg + 1), atol=1e-12)
    # Partition of unity and derivative-sum zero at arbitrary points
    xi = np.linspace(-1, 1, 17)
    np.testing.assert_allclose(N(xi).sum(0), np.ones_like(xi), atol=1e-12)
    np.testing.assert_allclose(dN(xi).sum(0), np.zeros_like(xi), atol=1e-11)


def test_lagrange_matches_reference_formulas():
    """Spot-check deg-2 basis vs reference closed forms (DiffNetFEM.py:71-85)."""
    N, dN, _ = lagrange_basis_1d(2)
    xi = 0.3
    ref_N = [0.5 * xi * (xi - 1), 1 - xi**2, 0.5 * xi * (xi + 1)]
    ref_dN = [0.5 * (2 * xi - 1), -2 * xi, 0.5 * (2 * xi + 1)]
    np.testing.assert_allclose(N(xi), ref_N, atol=1e-12)
    np.testing.assert_allclose(dN(xi), ref_dN, atol=1e-12)


@pytest.mark.parametrize("nsd,deg", [(1, 1), (2, 1), (2, 2), (2, 3), (3, 1), (3, 2)])
def test_table_quadrature_integrates_basis(nsd, deg):
    """sum_gp gpw * N_table[gp, ibf] = ∫ N_ibf over the reference element,
    which by tensor-product structure is prod of 1D integrals."""
    b = make_basis(nsd, deg, h=2.0)  # h=2 -> physical == reference coords
    N1, _, _ = lagrange_basis_1d(deg)
    gx, gw = np.polynomial.legendre.leggauss(b.ngp_1d)
    int_1d = (N1(gx) * gw).sum(axis=1)  # [nbf_1d]
    nbf = deg + 1
    expected = int_1d
    for _ in range(nsd - 1):
        expected = np.einsum("j,i->ji", int_1d, expected).reshape(-1)
    got = (b.gpw[:, None] * b.tables["N"]).sum(axis=0)
    np.testing.assert_allclose(got, expected.reshape(nbf**nsd), atol=1e-12)


def test_2d_tables_match_reference_construction():
    """Rebuild the deg-1 2D tables exactly as the reference loop does
    (DiffNetFEM.py:196-227) and compare entry by entry."""
    hx = hy = 1.0 / 63  # domain_size 64, deg 1
    b = make_basis(2, 1, h=(hx, hy))
    bf = lambda x: np.array([0.5 * (1 - x), 0.5 * (1 + x)])
    bfd = lambda x: np.array([-0.5, 0.5])
    gpx, gpw = gauss_quadrature_1d(2)
    for jgp in range(2):
        for igp in range(2):
            IGP = 2 * jgp + igp
            assert np.isclose(b.gpw[IGP], gpw[igp] * gpw[jgp])
            for jbf in range(2):
                for ibf in range(2):
                    IBF = 2 * jbf + ibf
                    assert np.isclose(
                        b.tables["N"][IGP, IBF],
                        bf(gpx[igp])[ibf] * bf(gpx[jgp])[jbf],
                    )
                    assert np.isclose(
                        b.tables["dx"][IGP, IBF],
                        bfd(gpx[igp])[ibf] * bf(gpx[jgp])[jbf] * (2 / hx),
                    )
                    assert np.isclose(
                        b.tables["dy"][IGP, IBF],
                        bf(gpx[igp])[ibf] * bfd(gpx[jgp])[jbf] * (2 / hy),
                    )


def test_3d_d2z_is_not_d2x():
    """The reference 3D d2N_z table is a copy-paste of d2N_x
    (DiffNetFEM.py:450); we build the correct one. With anisotropic h they
    must differ."""
    b = make_basis(3, 2, h=(0.1, 0.2, 0.4))
    assert not np.allclose(b.tables["d2z"], b.tables["d2x"])
    # isotropy check: with equal h, d2z is the axis-permuted d2x
    b2 = make_basis(3, 2, h=0.3)
    n = b2.nbf_1d
    g = b2.ngp_1d
    d2x = b2.tables["d2x"].reshape(g, g, g, n, n, n)
    d2z = b2.tables["d2z"].reshape(g, g, g, n, n, n)
    np.testing.assert_allclose(
        d2z, d2x.transpose(2, 1, 0, 5, 4, 3), atol=1e-12
    )


def test_jxw_sums_to_volume():
    b = make_basis(2, 1, h=(0.25, 0.5))
    assert np.isclose(b.jxw.sum(), 0.25 * 0.5)
    b3 = make_basis(3, 1, h=(0.25, 0.5, 1.0))
    assert np.isclose(b3.jxw.sum(), 0.125)
