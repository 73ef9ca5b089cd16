"""Fused FEM quadrature evaluation / Galerkin projection / scatter assembly.

TPU-native replacement for the reference conv-quadrature engine
(reference: DiffNet/DiffNetFEM.py:7-18,143-174 — one ``F.conv2d`` per Gauss
point per quantity; a Navier-Stokes step issues 13+ of them, re-reading the
field from HBM each time).

Redesign: on a uniform tensor-product mesh, "evaluate field u (and any set of
derivatives) at all Gauss points of all elements" is

    patches = gather_elements(u)            # [..., nel*, nbf_total]  (slices)
    gp_vals = patches @ table.T             # ONE matmul on the MXU

where ``table`` is the fused ``[n_quantities*ngp_total, nbf_total]`` basis
matrix from :mod:`diffnet_tpu.core.quadrature`. The adjoint operation —
Galerkin projection of a Gauss-point integrand onto nodal test functions
(the reference's ``Nvalues * (...)`` reduction + ``Q1_vector_assembly``
shifted-slice adds, tests/test.py:36-41) — is the transpose matmul followed by
``scatter_elements``. Both directions read/write the field exactly once.

Layout: fields are ``[..., y, x]`` (2D) / ``[..., z, y, x]`` (3D) with any
leading batch dims; Gauss-point axes are appended LAST (channels-last, the
efficient TPU layout), i.e. ``gp_eval`` returns ``[..., nelY, nelX, ngp]``
rather than the reference's ``[B, ngp, nelY, nelX]``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .quadrature import FEMBasis

__all__ = [
    "num_elements",
    "gather_elements",
    "scatter_elements",
    "gp_eval",
    "gp_eval_stacked",
    "galerkin_project",
    "element_tensor",
    "element_action",
    "gp_coords",
    "dirichlet_zero_rows",
]


def num_elements(node_shape: Sequence[int], deg: int) -> tuple[int, ...]:
    """Elements per axis for a node grid (reference DiffNetFEM.py:42-46)."""
    return tuple((int(n) - 1) // deg for n in node_shape)


def _strided_slice(u: jax.Array, nsd: int, offs: tuple[int, ...], deg: int,
                   nel: tuple[int, ...]) -> jax.Array:
    """u[..., o_k : o_k + (nel_k-1)*deg + 1 : deg] over the trailing nsd axes."""
    idx = [slice(None)] * (u.ndim - nsd)
    for o, ne in zip(offs, nel):
        idx.append(slice(o, o + (ne - 1) * deg + 1, deg))
    return u[tuple(idx)]


def gather_elements(u: jax.Array, deg: int, nsd: int) -> jax.Array:
    """Extract per-element nodal patches.

    u: ``[..., (z,) y, x]`` nodal field ->
    ``[..., (nelZ,) nelY, nelX, nbf_total]`` where the local dof axis is
    ordered IBF = (kbf*nbf_1d + jbf)*nbf_1d + ibf (i ↔ x fastest).

    Implemented as nbf_total static strided slices + stack: XLA fuses these
    into cheap HBM reads; no im2col materialization for the common deg=1 case
    beyond the (nbf_total x) views themselves.
    """
    nbf_1d = deg + 1
    nel = num_elements(u.shape[-nsd:], deg)
    pieces = []
    if nsd == 1:
        for ibf in range(nbf_1d):
            pieces.append(_strided_slice(u, 1, (ibf,), deg, nel))
    elif nsd == 2:
        for jbf in range(nbf_1d):
            for ibf in range(nbf_1d):
                pieces.append(_strided_slice(u, 2, (jbf, ibf), deg, nel))
    else:
        for kbf in range(nbf_1d):
            for jbf in range(nbf_1d):
                for ibf in range(nbf_1d):
                    pieces.append(_strided_slice(u, 3, (kbf, jbf, ibf), deg, nel))
    return jnp.stack(pieces, axis=-1)


def scatter_elements(r_elem: jax.Array, deg: int, nsd: int,
                     node_shape: Sequence[int]) -> jax.Array:
    """Adjoint of :func:`gather_elements`: accumulate per-element, per-local-dof
    values into the global nodal array (the reference's ``Q1_vector_assembly``,
    tests/test.py:36-41, generalized to any degree/dimension).

    r_elem: ``[..., (nelZ,) nelY, nelX, nbf_total]`` ->
    ``[..., node_shape]``.
    """
    nbf_1d = deg + 1
    nel = tuple(r_elem.shape[-1 - nsd:-1])
    batch = r_elem.shape[: -1 - nsd]

    if deg == 1:
        # Fast path: every local dof writes the contiguous slice
        # [o : o + nel] (stride 1), so assembly is a sum of zero-PADDED
        # per-dof planes — one fused elementwise pass instead of 2^nsd
        # sequential read-modify-write scatter-adds.
        total = None
        ibf_lin = 0
        for offs in np.ndindex(*((nbf_1d,) * nsd)):
            pad = [(0, 0)] * len(batch) + [
                (int(o), int(ns) - int(o) - ne)
                for o, ns, ne in zip(offs, node_shape, nel)]
            piece = jnp.pad(r_elem[..., ibf_lin], pad)
            total = piece if total is None else total + piece
            ibf_lin += 1
        return total

    out = jnp.zeros(batch + tuple(node_shape), dtype=r_elem.dtype)

    def node_idx(offs):
        idx = [slice(None)] * len(batch)
        for o, ne in zip(offs, nel):
            idx.append(slice(o, o + (ne - 1) * deg + 1, deg))
        return tuple(idx)

    ibf_lin = 0
    if nsd == 1:
        for ibf in range(nbf_1d):
            out = out.at[node_idx((ibf,))].add(r_elem[..., ibf])
    elif nsd == 2:
        for jbf in range(nbf_1d):
            for ibf in range(nbf_1d):
                out = out.at[node_idx((jbf, ibf))].add(r_elem[..., ibf_lin])
                ibf_lin += 1
    else:
        for kbf in range(nbf_1d):
            for jbf in range(nbf_1d):
                for ibf in range(nbf_1d):
                    out = out.at[node_idx((kbf, jbf, ibf))].add(r_elem[..., ibf_lin])
                    ibf_lin += 1
    return out


def gp_eval_stacked(u: jax.Array, basis: FEMBasis,
                    quantities: Sequence[str]) -> jax.Array:
    """Evaluate `u` and/or its derivatives at all Gauss points — fused.

    Returns ``[..., nel*, len(quantities), ngp_total]``. Equivalent to the
    reference's ``gauss_pt_evaluation{_der_x,...}`` family
    (DiffNetFEM.py:143-174) but with all quantities in ONE contraction.
    """
    table = basis.fused_table(tuple(quantities))  # [nq*ngp, nbf]
    patches = gather_elements(u, basis.deg, basis.nsd)
    t = jnp.asarray(table, dtype=u.dtype)
    # HIGHEST precision: the contraction dim is tiny (nbf_total <= 64) so this
    # op is HBM-bound either way, and PDE residuals need full f32 accuracy
    # (bf16 MXU passes give ~1e-3 relative error).
    out = jax.lax.dot_general(
        patches, t,
        dimension_numbers=(((patches.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32 if u.dtype != jnp.float64 else None,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(u.dtype)
    return out.reshape(out.shape[:-1] + (len(quantities), basis.ngp_total))


def gp_eval(u: jax.Array, basis: FEMBasis,
            quantities: Sequence[str] = ("N",)) -> dict[str, jax.Array]:
    """Dict view of :func:`gp_eval_stacked`: quantity -> ``[..., nel*, ngp]``."""
    stacked = gp_eval_stacked(u, basis, quantities)
    return {q: stacked[..., i, :] for i, q in enumerate(quantities)}


def galerkin_project(integrand_gp: jax.Array, basis: FEMBasis, quantity: str,
                     node_shape: Sequence[int],
                     apply_jxw: bool = True) -> jax.Array:
    """Project a Gauss-point integrand onto nodal test functions and assemble.

    Computes  R[node] = sum_elem sum_gp  T_q[gp, bf(node)] * integrand * JxW
    — i.e. the weak-form term  ∫ (d^q N_i) * integrand dx  assembled into the
    global residual vector. This replaces the reference pattern
    ``torch.sum(dN_x_values * f_gp * JxW, 2)`` + ``Q1_vector_assembly``
    (e.g. tests/test.py:62-73).

    integrand_gp: ``[..., nel*, ngp_total]`` -> ``[..., node_shape]``.
    """
    table = basis.tables[quantity]  # [ngp, nbf]
    if apply_jxw:
        table = table * basis.jxw[:, None]
    t = jnp.asarray(table, dtype=integrand_gp.dtype)
    r_elem = jax.lax.dot_general(
        integrand_gp, t,
        dimension_numbers=(((integrand_gp.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=(jnp.float32
                                if integrand_gp.dtype != jnp.float64 else None),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(integrand_gp.dtype)
    return scatter_elements(r_elem, basis.deg, basis.nsd, node_shape)


def galerkin_project_multi(integrands: Sequence[tuple[jax.Array, str]],
                           basis: FEMBasis, node_shape: Sequence[int],
                           apply_jxw: bool = True) -> jax.Array:
    """Sum of several weak-form terms assembled in ONE matmul + ONE scatter:

        R = sum_q  scatter( integrand_q @ (T_q * JxW) )
          = scatter( concat_q(integrand_q) @ concat_q(T_q * JxW) )

    `integrands`: sequence of (gp_integrand [..., nel*, ngp], quantity).
    3-5x fewer HBM round-trips than chaining :func:`galerkin_project` —
    use this for any residual with more than one term.
    """
    tables = []
    for _, q in integrands:
        t = basis.tables[q]
        tables.append(t * basis.jxw[:, None] if apply_jxw else t)
    big_t = np.concatenate(tables, axis=0)  # [nq*ngp, nbf]
    igs = [ig for ig, _ in integrands]
    # broadcast all integrands to a common (batch) shape before concat
    shape = jnp.broadcast_shapes(*[ig.shape for ig in igs])
    igs = [jnp.broadcast_to(ig, shape) for ig in igs]
    big_i = jnp.concatenate(igs, axis=-1)
    t = jnp.asarray(big_t, dtype=big_i.dtype)
    r_elem = jax.lax.dot_general(
        big_i, t,
        dimension_numbers=(((big_i.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=(jnp.float32
                                if big_i.dtype != jnp.float64 else None),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(big_i.dtype)
    return scatter_elements(r_elem, basis.deg, basis.nsd, node_shape)


def gp_coords(basis: FEMBasis, node_shape: Sequence[int],
              lengths: Sequence[float] | None = None) -> tuple[np.ndarray, ...]:
    """Physical coordinates of every Gauss point, as numpy constants.

    Returns per-axis arrays ``(xgp, ygp[, zgp])`` each shaped
    ``[(nelZ,) nelY, nelX, ngp_total]`` — the channels-last counterpart of the
    reference's ``self.xgp/self.ygp`` fields (DiffNetFEM.py:234-242). Computed
    directly from the uniform-grid geometry (no conv needed).
    """
    nsd = basis.nsd
    nel = num_elements(node_shape, basis.deg)
    # 1D gp offsets within an element, per axis (x first). When `lengths` is
    # given it overrides the element size implied by basis.h.
    gp = basis.gp_1d  # [ngp_1d]
    ngp = basis.ngp_1d
    axes_1d = []
    for d in range(nsd):  # d: 0=x, 1=y, 2=z
        ne = nel[::-1][d]
        h = (lengths[d] / ne) if lengths is not None else basis.h[d]
        starts = np.arange(ne) * h
        axes_1d.append(starts[:, None] + (gp[None, :] + 1.0) * 0.5 * h)  # [ne, ngp_1d]

    out = []
    if nsd == 1:
        out.append(axes_1d[0])
    elif nsd == 2:
        nelY, nelX = nel
        xg = np.broadcast_to(axes_1d[0][None, :, None, :], (nelY, nelX, ngp, ngp))
        yg = np.broadcast_to(axes_1d[1][:, None, :, None], (nelY, nelX, ngp, ngp))
        # IGP = jgp*ngp + igp with igp ↔ x: reshape (jgp, igp) -> last axis
        out.append(xg.reshape(nelY, nelX, ngp * ngp))
        out.append(yg.reshape(nelY, nelX, ngp * ngp))
    else:
        nelZ, nelY, nelX = nel
        shp = (nelZ, nelY, nelX, ngp, ngp, ngp)  # (.., kgp, jgp, igp)
        xg = np.broadcast_to(axes_1d[0][None, None, :, None, None, :], shp)
        yg = np.broadcast_to(axes_1d[1][None, :, None, None, :, None], shp)
        zg = np.broadcast_to(axes_1d[2][:, None, None, :, None, None], shp)
        out.append(xg.reshape(nelZ, nelY, nelX, ngp**3))
        out.append(yg.reshape(nelZ, nelY, nelX, ngp**3))
        out.append(zg.reshape(nelZ, nelY, nelX, ngp**3))
    return tuple(o.astype(np.float64) for o in out)


def element_matvec(u: jax.Array, K_elem: np.ndarray, deg: int, nsd: int,
                   node_shape: Sequence[int]) -> jax.Array:
    """Assembled matvec with a constant element matrix:
    R = sum_e scatter(K_elem @ u_e).

    The reference precomputes per-test-function 2x2 conv kernels from an
    element stiffness Kmx and applies them as convolutions
    (``stiffness_vs_values_conv``, examples/poisson/single_instance/
    e2_manufactured_resmin.py:27-36,285); here it is one patch-gather, one
    [nbf, nbf] matmul, one scatter.
    """
    patches = gather_elements(u, deg, nsd)  # [..., nel*, nbf]
    K = jnp.asarray(np.asarray(K_elem), u.dtype)
    r_elem = jax.lax.dot_general(
        patches, K,
        dimension_numbers=(((patches.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(u.dtype)
    return scatter_elements(r_elem, deg, nsd, node_shape)


def element_tensor(basis: FEMBasis,
                   quantities: Sequence[str] = ("dx", "dy")) -> np.ndarray:
    """Static Galerkin element tensor for coefficient-weighted bilinear forms.

    ``A[c, a, b] = sum_gp jxw[gp] * N[gp, c] * sum_q T_q[gp, a] T_q[gp, b]``

    so that for a coefficient field expanded in the same nodal basis
    (``nu(x) = sum_c N_c(x) nu_c``), the per-element weak residual
    ``R_e[a] = ∫_e nu * sum_q (d^q N_a)(d^q u) dx`` is exactly
    ``sum_{c,b} A[c, a, b] nu_c u_b`` — no Gauss-point quantities ever exist.
    Computed once in float64 at setup; tiny ([nbf, nbf, nbf] = 64 floats for
    deg-1 2D). Replaces the per-step GP pipeline of the reference hot loop
    (DiffNet/DiffNetFEM.py:7-18,143-174) with a quadrature-exact contraction.
    """
    nbf = basis.nbf_total
    N = basis.tables["N"]            # [ngp, nbf]
    jxw = basis.jxw                  # [ngp]
    A = np.zeros((nbf, nbf, nbf), np.float64)
    for q in quantities:
        T = basis.tables[q]
        # A[c,a,b] += sum_g jxw[g] N[g,c] T[g,a] T[g,b] — two small matmul
        # stages to stay O(ngp * nbf^2) + O(ngp * nbf^3) host-side
        A += np.einsum("g,gc,ga,gb->cab", jxw, N, T, T, optimize=True)
    return A


def element_action(u: jax.Array, coeff: jax.Array, A: np.ndarray,
                   basis: FEMBasis, node_shape: Sequence[int],
                   gp_terms: Sequence[tuple[jax.Array, str]] = ()) -> jax.Array:
    """Assembled action ``R = K(coeff) u`` via the static element tensor from
    :func:`element_tensor` — TWO chained contractions, ZERO Gauss-point
    intermediates in HBM:

        t1     = coeff_patches @ A.reshape(nbf, nbf*nbf)   # one MXU matmul
        r_elem = sum_b t1[..., a, b] * u_patches[..., b]    # batched matvec
        R      = scatter_elements(r_elem)

    This is the production fast path for the Poisson/diffusion residual
    (reference hot loop DiffNet/DiffNetFEM.py:7-18 + assembly
    tests/test.py:36-41): vs the GP-pipeline path it removes the ~3x nodal
    size of Gauss-point intermediates XLA materializes between the eval and
    projection matmuls (docs/KERNELS.md). Mathematically identical to
    ``galerkin_project(sum_q coeff_gp * d^q u_gp)`` up to float round-off
    (different association order).

    For deg-1 the contraction is expanded as a pure-STENCIL expression
    (products of shifted u/coeff views, pad+sum assembled) instead of
    matmuls: the trailing nbf axis is tiny (4 / 8), so a dot wastes the
    128-wide vector lanes / MXU tiles, while the stencil form keeps the x
    axis on the lanes and fuses into a single VPU pass whose HBM traffic is
    just (read u, read coeff, write R) — the roofline for this op.

    `gp_terms`: optional extra weak-form source terms
    ``[(integrand_gp [..., nel*, ngp], quantity), ...]`` assembled into the
    SAME residual (with JxW), i.e. the result is
    ``K(coeff) u + sum_t galerkin_project(integrand_t, q_t)``. On the deg-1
    stencil path each term folds into the per-dof stencil pieces (a few
    extra madds — no separate projection matmul / scatter pass); elsewhere
    it falls back to :func:`galerkin_project_multi`.
    """
    nbf = basis.nbf_total
    if basis.deg == 1:
        # deg-1 takes the fused stencil expansion in BOTH 2D and 3D. The
        # trilinear (8 dofs x <=64 nonzero (c,b) pairs) expansion was
        # originally benched ~2x slower than the GP pipeline on CPU and
        # 3D was left on the matmul form; a round-4 re-measurement with
        # the trap-#4 protocol (scan-chained, scalar readback, 64^3 bs4)
        # shows the OPPOSITE: stencil 2.26e7 elem/s vs GP-pipeline 6.75e6
        # and matmul-form 1.00e7 on XLA:CPU (bench.py --p3d-only banks the
        # on-chip trio each round).
        return _element_action_stencil(u, coeff, A, basis, node_shape,
                                       gp_terms)
    coeff_e = gather_elements(coeff, basis.deg, basis.nsd)  # [..., nel*, nbf]
    u_e = gather_elements(u, basis.deg, basis.nsd)
    Af = jnp.asarray(np.asarray(A, np.float64).reshape(nbf, nbf * nbf),
                     u.dtype)
    t1 = jax.lax.dot_general(
        coeff_e, Af,
        dimension_numbers=(((coeff_e.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=(jnp.float32
                                if u.dtype != jnp.float64 else None),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(u.dtype)
    t1 = t1.reshape(t1.shape[:-1] + (nbf, nbf))
    r_elem = jnp.sum(t1 * u_e[..., None, :], axis=-1)
    out = scatter_elements(r_elem, basis.deg, basis.nsd, node_shape)
    if gp_terms:
        out = out + galerkin_project_multi(gp_terms, basis, node_shape)
    return out


def _element_views(x: jax.Array, nsd: int) -> list[jax.Array]:
    """deg-1 per-corner views of a nodal field on the element grid, ordered
    by the linear local-dof id (x fastest)."""
    nel = num_elements(x.shape[-nsd:], 1)
    return [_strided_slice(x, nsd, offs, 1, nel)
            for offs in np.ndindex(*((2,) * nsd))]


def _element_action_stencil(u, coeff, A, basis, node_shape, gp_terms=()):
    """deg-1 element_action as one fused elementwise (VPU) expression:

        out = sum_a pad_a( sum_{b,c} A[c,a,b] * u_view_b * coeff_view_c
                           + sum_t sum_g (T_t[g,a] jxw[g]) * integrand_t[g] )

    where the views are the 2^nsd corner slices on the element grid and
    pad_a zero-pads each local-dof contribution back to node shape. No
    matmul, no per-element patch tensors, no GP intermediates — XLA fuses
    the whole expression into a single stencil pass. The corner products
    are deliberately NOT shared across the nbf output dofs: recomputing
    them inside each pad piece lets XLA keep every piece a single fusion
    instead of materializing a tuple of element-grid product tensors
    (measured ~7% faster at 512^2 on a v5e chip)."""
    nsd = basis.nsd
    uv = _element_views(u, nsd)
    cv = _element_views(coeff, nsd)
    nbf = basis.nbf_total
    A = np.asarray(A)
    term_tables = [np.asarray(basis.tables[q] * basis.jxw[:, None])
                   for _, q in gp_terms]

    nel = num_elements(node_shape, 1)
    total = None
    for a, offs in enumerate(np.ndindex(*((2,) * nsd))):
        r_a = None
        for c in range(nbf):
            for b in range(nbf):
                w = float(A[c, a, b])
                if w == 0.0:
                    continue
                term = w * (uv[b] * cv[c])
                r_a = term if r_a is None else r_a + term
        for (integrand, _), table in zip(gp_terms, term_tables):
            for g in range(table.shape[0]):
                term = float(table[g, a]) * integrand[..., g]
                # r_a can still be None here when the A[:, a, :] row is
                # entirely zero (not the case for the Poisson stiffness,
                # but legal for other element tensors) — start the
                # accumulation instead of adding to None (ADVICE r2)
                r_a = term if r_a is None else r_a + term
        if r_a is None:  # zero A-row and no gp_terms: nothing to scatter
            continue
        # leading batch dims may have grown by broadcasting with gp_terms
        pad = [(0, 0)] * (r_a.ndim - nsd) + [
            (int(o), int(ns) - int(o) - ne)
            for o, ns, ne in zip(offs, node_shape, nel)]
        piece = jnp.pad(r_a, pad)
        total = piece if total is None else total + piece
    return total


def gp_eval_1d(u_line: jax.Array, basis: FEMBasis,
               quantities: Sequence[str] = ("N",)) -> dict[str, jax.Array]:
    """Surface-trace evaluation: 1D Gauss-point values of a nodal LINE
    (a row/column of a 2D field, or an edge of a 3D field) using the facet
    tables (reference gauss_pt_evaluation_surf, DiffNetFEM.py:146-147).

    u_line: [..., n] -> quantity -> [..., nel_1d, ngp_1d].
    """
    deg = basis.deg
    nbf = deg + 1
    n = u_line.shape[-1]
    nel = (n - 1) // deg
    pieces = [u_line[..., o:o + (nel - 1) * deg + 1:deg] for o in range(nbf)]
    patches = jnp.stack(pieces, axis=-1)  # [..., nel, nbf]
    table = np.concatenate([basis.surf_tables[q] for q in quantities], axis=0)
    t = jnp.asarray(table, u_line.dtype)  # [nq*ngp_1d, nbf]
    out = jax.lax.dot_general(
        patches, t,
        dimension_numbers=(((patches.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(u_line.dtype)
    out = out.reshape(out.shape[:-1] + (len(quantities), basis.ngp_1d))
    return {q: out[..., i, :] for i, q in enumerate(quantities)}


def dirichlet_zero_rows(R: jax.Array, bc_mask: jax.Array) -> jax.Array:
    """Zero residual entries on Dirichlet nodes (bc_mask > 0.5), matching the
    reference's post-assembly masking (e.g. examples/poisson/single_instance/
    e8_2d_poisson_mms.py:139-142)."""
    return jnp.where(bc_mask > 0.5, jnp.zeros_like(R), R)
