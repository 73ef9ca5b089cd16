"""Assembled-stencil fast path for linear grid operators.

Every deg-1 Galerkin residual on a nodal tensor-product grid is a
width-3 variable-coefficient stencil:

    (A u)[p] = sum_{k in {-1,0,1}^nsd} C_k[p] * u[p + k]

(deg-d couples d+1 nodes per axis per element -> width 2d+1). The full
coefficient field C (width^nsd maps, one per offset) can be recovered
EXACTLY from width^nsd coloring probes — the same trick
``train.linear._colored_diag`` uses for the diagonal alone: probe
vectors with 1s on a stride-``width`` lattice are far enough apart that
each output node sees exactly ONE probe node inside its stencil, so
every coefficient lands in some probe's output untangled. Out-of-range
taps extract as exactly 0 (no in-range probe node of that color exists
inside the neighborhood), so a zero-padded matvec reproduces the
operator's boundary behavior — including the module's Dirichlet row
masking — bit-for-bit in exact arithmetic.

Why this exists (TPU): the element-tensor residual path re-derives the
stencil algebra from (nu, element tensor) every call; XLA materializes
its pad/accumulate pieces as ~15 element-grid HBM intermediates
(docs/KERNELS.md byte accounting: ~1.2 GB/call at 512^2 bs32 vs a
134 MB input+output roofline). For ITERATIVE consumers — Krylov solves,
multigrid smoothing/V-cycles, power iterations — the operator is fixed
while the field changes, so assembling C once (width^nsd probe calls)
and iterating with :func:`stencil_matvec` (one fused pad + width^nsd
shifted FMAs, traffic = C + u + out ~ (width^nsd + 2) fields) is the
XLA-reachable version of the fused Pallas kernel. This is the grid
analogue of assembling a sparse matrix before a conventional solve —
the reference has no counterpart (its torch path re-evaluates conv
quadrature per loss call, DiffNet/DiffNetFEM.py:143-174).

Also the production form of Galerkin multigrid coarse operators: the
RAP of a width-3 stencil under the node-aligned linear transfers is
again a width-3 stencil, so extracting C at each level turns the
"matvec chains to the finest grid" cost of ``coarse_op='galerkin'``
into a flat per-level stencil apply.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["extract_stencil", "stencil_matvec", "stencil_diag",
           "extract_verified", "assemble_stencil"]


def _offsets(width: int, nsd: int):
    h = (width - 1) // 2
    return [tuple(int(c) - h for c in idx)
            for idx in np.ndindex(*((width,) * nsd))]


def extract_stencil(A: Callable, shape, width: int = 3, nsd: int | None = None):
    """Recover the full stencil coefficient field of a linear operator.

    A: linear map on fields of ``shape`` (leading axes of ``shape`` are
        carried along — e.g. a batch axis of per-sample operators; the
        stencil acts on the TRAILING ``nsd`` axes).
    width: stencil width per axis (3 for deg-1 elements / 5-point+corner
        FDM, 2*deg+1 for deg-2/3 elements).

    Returns ``C`` of shape ``[width**nsd, *shape]`` with
    ``C[m]`` = coefficient of offset ``_offsets(width, nsd)[m]``.
    One batched vmap dispatch of ``width**nsd`` probes; gathers are
    setup-cost only.
    """
    shape = tuple(int(s) for s in shape)
    if nsd is None:
        nsd = len(shape)
    spatial = shape[-nsd:]
    h = (width - 1) // 2
    n_probe = width ** nsd

    probes = []
    for idx in np.ndindex(*((width,) * nsd)):
        e = np.zeros(spatial, np.float32)
        e[tuple(slice(o, None, width) for o in idx)] = 1.0
        probes.append(np.broadcast_to(e, shape))
    outs = np.asarray(jax.vmap(A)(jnp.asarray(np.stack(probes))))

    # C_k[p] = outs[color(p+k)][p] with color(q) = ravel(q mod width) on
    # the trailing nsd axes. Reconstructed HOST-side with static strided
    # slices (setup-only; for each offset k, positions in residue class r
    # all read probe (r+k) mod width — width^nsd small strided copies per
    # offset, no device gathers).
    lead = (slice(None),) * (len(shape) - nsd)
    C = np.zeros((n_probe,) + shape, np.float32)
    for m, k in enumerate(_offsets(width, nsd)):
        for r_idx in np.ndindex(*((width,) * nsd)):
            c = 0
            for rc, kc in zip(r_idx, k):
                c = c * width + (rc + kc) % width
            sl = lead + tuple(slice(rc, None, width) for rc in r_idx)
            C[(m,) + sl] = outs[(c,) + sl]
    return jnp.asarray(C)


def stencil_matvec(C, u, width: int = 3, nsd: int | None = None,
                   kernel: str | None = None):
    """Apply an extracted stencil: one zero-pad of ``u`` plus
    ``width**nsd`` shifted multiply-adds — XLA fuses this into a single
    elementwise pass (traffic ~ C + u + out), the iteration kernel the
    element-tensor path cannot reach (see module docstring).

    kernel: ``'dma'`` / ``'blockspec'`` routes the apply through the
    fused Pallas gather kernel (:mod:`diffnet_tpu.ops.stencil_apply` —
    reads each C plane and the haloed u strip exactly once per tile
    instead of materializing the pad/shift pieces). width-3, nsd 2/3
    only; leading axes are collapsed into the kernel's batch axis."""
    u = jnp.asarray(u)
    if nsd is None:
        nsd = u.ndim
    if kernel is not None:
        if width != 3 or nsd not in (2, 3):
            raise ValueError(
                "kernel= supports width-3 stencils on 2/3 spatial axes "
                f"only (got width={width}, nsd={nsd}); drop kernel= for "
                "the XLA path")
        from ..ops.stencil_apply import stencil_apply
        spatial = u.shape[-nsd:]
        ub = u.reshape((-1,) + spatial)
        Cb = jnp.asarray(C).reshape((width ** nsd, -1) + spatial)
        if Cb.shape[1] == 1 and ub.shape[0] > 1:
            Cb = jnp.broadcast_to(Cb, (Cb.shape[0],) + ub.shape)
        out = stencil_apply(Cb, ub, nsd, None, kernel)
        return out.reshape(u.shape)
    h = (width - 1) // 2
    pad = [(0, 0)] * (u.ndim - nsd) + [(h, h)] * nsd
    up = jnp.pad(u, pad)
    lead = (slice(None),) * (u.ndim - nsd)
    out = None
    for m, k in enumerate(_offsets(width, nsd)):
        sl = lead + tuple(slice(h + kc, h + kc + s)
                          for kc, s in zip(k, u.shape[-nsd:]))
        term = C[m] * up[sl]
        out = term if out is None else out + term
    return out


def stencil_diag(C, width: int = 3, nsd: int | None = None):
    """Center (diagonal) coefficient of an extracted stencil — the exact
    operator diagonal ``train.linear._colored_diag`` probes for."""
    if nsd is None:
        nsd = C.ndim - 1
    h = (width - 1) // 2
    center = 0
    for _ in range(nsd):
        center = center * width + h
    return C[center]


def extract_verified(A: Callable, shape, width: int = 3,
                     nsd: int | None = None, probe=None, want=None):
    """:func:`extract_stencil` plus a one-probe defect check — the shared
    core of every extract-then-verify consumer (``solve_linear``'s
    ``assemble='stencil'``, multigrid level assembly, and
    :func:`assemble_stencil`; each applies its own raise-vs-fallback
    policy to the returned defect).

    probe/want: reuse an already-evaluated random field and its
    matrix-free image ``A(probe)`` (skips one operator application);
    generated here when omitted.

    Returns ``(C, defect)`` with ``defect`` the relative L2 mismatch of
    the stencil matvec against the matrix-free operator on the probe —
    > ~1e-4 means the operator is wider than ``width`` (pass
    ``width=2*deg+1`` for deg-d elements) or not a stencil at all.
    """
    shape = tuple(int(s) for s in shape)
    if nsd is None:
        nsd = len(shape)
    C = extract_stencil(A, shape, width=width, nsd=nsd)
    if probe is None:
        probe = jax.random.normal(jax.random.key(0), shape, jnp.float32)
        want = None
    if want is None:
        want = A(probe)
    got = stencil_matvec(C, probe, width=width, nsd=nsd)
    defect = float(jnp.linalg.norm(got - want)
                   / (jnp.linalg.norm(want) + 1e-30))
    return C, defect


def assemble_stencil(residual_fn: Callable, shape, width: int = 3,
                     nsd: int | None = None, verify: bool = True,
                     rtol: float = 1e-4):
    """Assemble an affine residual ``R(u) = A u - b`` into stencil form.

    Returns ``(matvec, b, C)`` where ``matvec(u) == A u`` via
    :func:`stencil_matvec` (jitted) and ``b = -R(0)``.

    verify: check ``matvec`` against the matrix-free operator on one
    random field and raise ValueError if the relative mismatch exceeds
    ``rtol`` — catches operators wider than ``width`` (pass
    ``width=2*deg+1`` for higher-degree elements) or non-stencil
    structure (nonlocal terms).
    """
    shape = tuple(int(s) for s in shape)
    if nsd is None:
        nsd = len(shape)
    zero = jnp.zeros(shape, jnp.float32)
    b = -residual_fn(zero)

    def A(u):
        return residual_fn(u) + b

    C, defect = extract_verified(A, shape, width=width, nsd=nsd)
    matvec = jax.jit(lambda u: stencil_matvec(C, u, width=width, nsd=nsd))
    if verify and defect > rtol:
        raise ValueError(
            f"operator is not a width-{width} stencil on the trailing "
            f"{nsd} axes (relative defect {defect:.2e}); for deg-d "
            "elements pass width=2*deg+1, and for nonlocal operators "
            "use the matrix-free path")
    return matvec, b, C
