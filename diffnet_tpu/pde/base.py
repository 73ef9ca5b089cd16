"""PDE module base classes — the functional counterpart of the reference's
``PDE(LightningModule)`` hierarchy (reference: DiffNet/base.py:6-55,
DiffNet/DiffNetFEM.py:21-284,382-481, DiffNet/DiffNetFDM.py:123-199).

Design: a :class:`PDEModule` owns *configuration and tables only* (all static
numpy / python values closed over by jit). Everything that runs on device is a
pure function of ``(params, batch)``:

    u = module.forward(params, batch)       # network apply (or direct field)
    l = module.loss(u, inputs, forcing)     # the PDE-defining loss

The Trainer (diffnet_tpu.train) jits ``loss ∘ forward`` and owns the update
loop — replacing PyTorch-Lightning's inversion of control with an explicit,
XLA-compiled step. Both reference API generations (dataset-owned and
external-loader, SURVEY.md §1) are supported: pass ``dataset=`` at
construction or a loader to ``Trainer.fit``.

Layout conventions: fields/batches are channels-LAST ``[B, (z,) y, x, C]``
(TPU-native), vs the reference's NCHW. Loss helper methods mirror the
reference names (``gauss_pt_evaluation``, ``gauss_pt_evaluation_der_x``...)
so formulations port 1:1, but all fan into ONE fused contraction when called
through :meth:`FEMModule.gp_all`.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import fem
from ..core.fdm import make_fdm
from ..core.quadrature import make_basis

__all__ = ["PDEModule", "FEM2DModule", "FEM3DModule", "FDMModule"]


class PDEModule:
    """Base PDE module (reference DiffNet/base.py:6-55).

    Parameters mirror the reference kwargs: ``nsd``, ``batch_size``,
    ``learning_rate``, ``domain_size(s)``, ``domain_length(s)``.
    """

    def __init__(self, network=None, dataset=None, **kwargs):
        self.network = network
        self.dataset = dataset
        self.kwargs = kwargs
        self.nsd = kwargs.get("nsd", 2)
        self.batch_size = kwargs.get("batch_size", 64)
        self.n_workers = kwargs.get("n_workers", 1)
        self.learning_rate = kwargs.get("learning_rate", 3e-4)
        # rematerialization: recompute the forward pass during backprop
        # instead of storing activations — the standard TPU memory/FLOP
        # trade for large grids/batches
        self.remat = kwargs.get("remat", False)

        self.domain_length = kwargs.get("domain_length", 1.0)
        self.domain_size = kwargs.get("domain_size", 64)
        lengths = kwargs.get("domain_lengths", (self.domain_length,) * 3)
        sizes = kwargs.get("domain_sizes", (self.domain_size,) * 3)
        self.domain_lengths_nd = tuple(lengths)
        self.domain_sizes_nd = tuple(int(s) for s in sizes)
        self.domain_lengthX, self.domain_lengthY = lengths[0], lengths[1]
        self.domain_sizeX, self.domain_sizeY = sizes[0], sizes[1]
        if self.nsd >= 3:
            self.domain_lengthZ = lengths[2]
            self.domain_sizeZ = sizes[2]

    # -- user hooks -----------------------------------------------------
    def loss(self, u, inputs_tensor, forcing_tensor):
        raise NotImplementedError

    def forward(self, params, batch):
        """Default forward: ``u = network(inputs)`` (reference base.py:37-40).
        Returns ``(u, inputs, forcing)``."""
        inputs_tensor, forcing_tensor = batch
        u = self.network.apply(params, inputs_tensor)
        return u, inputs_tensor, forcing_tensor

    def training_loss(self, params, batch):
        """loss ∘ forward; the Trainer jits+grads this (base.py:42-47).
        With ``remat=True`` the whole forward is checkpointed (activations
        recomputed in the backward pass)."""

        def _fwd_loss(params, batch):
            u, inputs_tensor, forcing_tensor = self.forward(params, batch)
            return jnp.mean(self.loss(u, inputs_tensor, forcing_tensor))

        if self.remat:
            return jax.checkpoint(_fwd_loss)(params, batch)
        return _fwd_loss(params, batch)

    def init_params(self, rng: jax.Array, sample_batch) -> Any:
        inputs, _ = sample_batch
        return self.network.init(rng, inputs)

    # convenience used by many reference losses
    @staticmethod
    def apply_dirichlet(u, mask, value):
        """``u = where(mask > 0.5, value, u)`` — immersed/Dirichlet masking
        (reference pattern, e.g. examples/poisson/single_instance/0_base.py:41-42)."""
        return jnp.where(mask > 0.5, jnp.broadcast_to(value, u.shape), u)

    def apply_bcs(self, u, inputs_tensor):
        """Return the BC-substituted solution field — what query/plot/L2
        tooling should consume (the reference applies the same where-masks
        before visualization/L2, e.g. e8_2d_poisson_mms.py:263-279).
        Default: identity; formulations override."""
        return u


class _FEMMixin:
    """Shared FEM setup: element counts, spacings, fused basis tables
    (reference DiffNetFEM.py:21-126)."""

    def _setup_fem(self, **kwargs):
        self.fem_basis_deg = kwargs.get("fem_basis_deg", 1)
        deg = self.fem_basis_deg
        # the reference asserts (size-1) % deg == 0 (DiffNetFEM.py:67,104);
        # without it, trailing rows/cols are silently dropped by the
        # strided element gather
        for name, size in (("X", self.domain_sizeX), ("Y", self.domain_sizeY)):
            if (size - 1) % deg:
                raise ValueError(
                    f"domain_size{name}={size} incompatible with "
                    f"fem_basis_deg={deg}: need (size-1) % deg == 0")
        if self.nsd == 3 and (self.domain_sizeZ - 1) % deg:
            raise ValueError(
                f"domain_sizeZ={self.domain_sizeZ} incompatible with "
                f"fem_basis_deg={deg}: need (size-1) % deg == 0")
        self.nbf_1d = deg + 1
        self.nbf_total = self.nbf_1d**self.nsd
        self.nelemX = int((self.domain_sizeX - 1) / deg)
        self.nelemY = int((self.domain_sizeY - 1) / deg)
        self.hx = self.domain_lengthX / self.nelemX
        self.hy = self.domain_lengthY / self.nelemY
        h = [self.hx, self.hy]
        if self.nsd == 3:
            self.nelemZ = int((self.domain_sizeZ - 1) / deg)
            self.hz = self.domain_lengthZ / self.nelemZ
            h.append(self.hz)
        # scalar aliases = the X axis ACTUALS: when the grid is configured
        # via the plural domain_sizes/domain_lengths kwargs, the singular
        # domain_size/domain_length keep their defaults (64/1.0), and
        # deriving h from them silently mis-scaled every h-based
        # stabilization parameter (SUPG tau, PSPG, momentum_scale) for
        # non-default plural configs (e.g. the 4x1 flow channel)
        self.nelem = self.nelemX
        self.h = self.hx

        self.basis = make_basis(self.nsd, deg, h=tuple(h),
                                ngp_1d=kwargs.get("ngp_1d"))
        self.ngp_1d = self.basis.ngp_1d
        self.ngp_total = self.basis.ngp_total
        self.gpw = self.basis.gpw          # [ngp_total] (numpy)
        self.jxw = self.basis.jxw          # [ngp_total] (numpy)

        node_shape = (self.domain_sizeY, self.domain_sizeX)
        if self.nsd == 3:
            node_shape = (self.domain_sizeZ,) + node_shape
        self.node_shape = node_shape
        coords = fem.gp_coords(self.basis, node_shape)
        self.xgp, self.ygp = coords[0], coords[1]
        if self.nsd == 3:
            self.zgp = coords[2]
        # nodal coordinate grids ([y,x] / [z,y,x]) as numpy (DiffNetFEM.py:229-233)
        axes = [np.linspace(0, self.domain_lengthX, self.domain_sizeX),
                np.linspace(0, self.domain_lengthY, self.domain_sizeY)]
        if self.nsd == 2:
            self.xx, self.yy = np.meshgrid(axes[0], axes[1])
        else:
            axes.append(np.linspace(0, self.domain_lengthZ, self.domain_sizeZ))
            zz, yy, xx = np.meshgrid(axes[2], axes[1], axes[0], indexing="ij")
            self.xx, self.yy, self.zz = xx, yy, zz

    # -- fused evaluation -----------------------------------------------
    def gp_all(self, u, quantities: Sequence[str]):
        """Evaluate several derivative quantities of `u` in one fused matmul.
        `u`: ``[..., (z,)y,x]`` -> dict of ``[..., nel*, ngp_total]``."""
        return fem.gp_eval(u, self.basis, quantities)

    # -- reference-parity single-quantity wrappers (DiffNetFEM.py:143-174) --
    def gauss_pt_evaluation(self, u):
        return fem.gp_eval(u, self.basis, ("N",))["N"]

    def gauss_pt_evaluation_der_x(self, u):
        return fem.gp_eval(u, self.basis, ("dx",))["dx"]

    def gauss_pt_evaluation_der_y(self, u):
        return fem.gp_eval(u, self.basis, ("dy",))["dy"]

    def gauss_pt_evaluation_der_z(self, u):
        return fem.gp_eval(u, self.basis, ("dz",))["dz"]

    def gauss_pt_evaluation_der2_x(self, u):
        return fem.gp_eval(u, self.basis, ("d2x",))["d2x"]

    def gauss_pt_evaluation_der2_y(self, u):
        return fem.gp_eval(u, self.basis, ("d2y",))["d2y"]

    def gauss_pt_evaluation_der2_z(self, u):
        return fem.gp_eval(u, self.basis, ("d2z",))["d2z"]

    def gauss_pt_evaluation_der2_xy(self, u):
        return fem.gp_eval(u, self.basis, ("d2xy",))["d2xy"]

    def gauss_pt_evaluation_der2_yz(self, u):
        return fem.gp_eval(u, self.basis, ("d2yz",))["d2yz"]

    def gauss_pt_evaluation_der2_zx(self, u):
        return fem.gp_eval(u, self.basis, ("d2zx",))["d2zx"]

    def gauss_pt_evaluation_surf(self, u_line, quantities=("N",)):
        """Facet/edge-trace Gauss evaluation of a 1D nodal line (reference
        gauss_pt_evaluation_surf, DiffNetFEM.py:146-147)."""
        return fem.gp_eval_1d(u_line, self.basis, quantities)

    # -- assembly --------------------------------------------------------
    def assemble(self, integrand_gp, quantity="N", apply_jxw=True):
        """Galerkin-project a GP integrand onto test functions and scatter
        into the nodal residual (replaces Nvalues-weighting +
        Q1_vector_assembly, tests/test.py:36-73)."""
        return fem.galerkin_project(integrand_gp, self.basis, quantity,
                                    self.node_shape, apply_jxw=apply_jxw)

    def assemble_multi(self, integrands, apply_jxw=True):
        """Assemble a sum of weak-form terms in one matmul + one scatter;
        `integrands` is a sequence of (gp_integrand, quantity) pairs."""
        return fem.galerkin_project_multi(integrands, self.basis,
                                          self.node_shape,
                                          apply_jxw=apply_jxw)

    def jxw_c(self, dtype=jnp.float32):
        """JxW as a jnp constant [ngp_total]."""
        return jnp.asarray(self.jxw, dtype)

    # -- L2 error (reference DiffNetFEM.py:348-379,560-592) ---------------
    def calc_l2_err(self, u_sol, exact_solution: Callable | None = None,
                    verbose: bool = False):
        """Quadrature L2 norm of (u_sol - exact). `exact_solution` takes gp
        coordinate arrays (x, y[, z]). Returns (eL2, uL2, u_exL2)."""
        ex = exact_solution or self.exact_solution
        u_gp = self.gauss_pt_evaluation(u_sol)
        if self.nsd == 2:
            u_ex_gp = jnp.asarray(ex(self.xgp, self.ygp), u_sol.dtype)
        else:
            u_ex_gp = jnp.asarray(ex(self.xgp, self.ygp, self.zgp), u_sol.dtype)
        jxw = self.jxw_c(u_sol.dtype)
        norm = lambda g: jnp.sqrt(jnp.sum(g**2 * jxw))
        eL2 = norm(u_gp - u_ex_gp)
        uL2 = norm(u_gp)
        u_exL2 = norm(u_ex_gp)
        if verbose:
            print(f"||u_sol||, ||uex|| = {float(uL2)}, {float(u_exL2)}")
            print(f"||e||_L2 = {float(eL2)}")
        return eL2, uL2, u_exL2


class FEM2DModule(_FEMMixin, PDEModule):
    """2D FEM PDE base (reference DiffNet2DFEM, DiffNetFEM.py:178-284)."""

    def __init__(self, network=None, dataset=None, **kwargs):
        kwargs.setdefault("nsd", 2)
        super().__init__(network, dataset, **kwargs)
        assert self.nsd == 2
        self._setup_fem(**kwargs)


class FEM3DModule(_FEMMixin, PDEModule):
    """3D FEM PDE base (reference DiffNet3DFEM, DiffNetFEM.py:382-592)."""

    def __init__(self, network=None, dataset=None, **kwargs):
        kwargs.setdefault("nsd", 3)
        super().__init__(network, dataset, **kwargs)
        assert self.nsd == 3
        self._setup_fem(**kwargs)


class FDMModule(PDEModule):
    """FDM PDE base (reference DiffNetFDM, DiffNetFDM.py:123-199)."""

    def __init__(self, network=None, dataset=None, **kwargs):
        kwargs.setdefault("nsd", 2)
        super().__init__(network, dataset, **kwargs)
        self.ktype = kwargs.get("ktype", "fdm")
        self.stencil_len = kwargs.get("stencil_len", 3)
        self.fdm = make_fdm(self.nsd, self.domain_size, ktype=self.ktype,
                            num_pt=self.stencil_len)

    # reference-parity derivative API (full-size, boundary-corrected)
    def derivative_x(self, g):
        return self.fdm.dx(g, mode="full")

    def derivative_y(self, g):
        return self.fdm.dy(g, mode="full")

    def derivative_z(self, g):
        return self.fdm.dz(g, mode="full")

    def derivative_xx(self, g):
        return self.fdm.dxx(g, mode="full")

    def derivative_yy(self, g):
        return self.fdm.dyy(g, mode="full")

    def derivative_zz(self, g):
        return self.fdm.dzz(g, mode="full")

    def calc_laplacian(self, g):
        return self.fdm.laplacian(g, mode="full")
