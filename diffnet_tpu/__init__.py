"""diffnet_tpu — a TPU-native JAX framework for neural PDE solving on
structured grids.

A ground-up re-design of the capabilities of adityabalu/DiffNet (PyTorch /
Lightning) for TPU: FEM quadrature evaluation as fused MXU contractions,
Galerkin assembly as the exact adjoint, explicit jit-compiled training
loops, pjit/Mesh data- and spatial-parallelism, flax solution networks.

Layers (bottom-up):
  core      — quadrature/basis tables, fused gather/eval/project/scatter,
              FDM stencils, winding numbers, grid interpolation
  pde       — formulation modules (Poisson, Helmholtz, advection-diffusion,
              space-time heat, Allen-Cahn, Burgers, eikonal, Stokes,
              Navier-Stokes, FSDT elasticity, topology optimization, IBN)
  models    — flax network zoo + direct nodal fields
  data      — host-side datasets (single-instance + parametric ensembles)
  train     — Trainer (adam/sgd/lbfgs), checkpoints, CSV metrics, UQ query
  parallel  — device-mesh utilities (data + spatial sharding, halo exchange)
  utils     — VTI export, plotting, xyzna point-cloud IO
"""

__version__ = "0.1.0"

from . import core, data, models, parallel, pde, train, utils  # noqa: F401
