"""Pallas fused-kernel family (interpret-validated AND measured on-chip —
see module docstrings and BENCH_MEASURED.md; the 2D stiffness kernel is
the repo throughput headline and drives the MG-CG solver fine level).

- :mod:`poisson_residual` — fused Galerkin stiffness action / resmin residual
- :mod:`poisson_residual_3d` — the 3D (trilinear, 2x2x2-GP) counterpart
- :mod:`poisson_energy`   — fused Ritz energy functional (+ fused-kernel VJP)
- :mod:`poisson_loss_grad` — resmin loss AND u-gradient in ONE launch
- :mod:`ns_residual`      — fused Navier-Stokes VMS 3-residual assembly
"""

from .ns_residual import ns_vms_residual_fused, ns_vms_residual_xla
from .poisson_energy import poisson_energy_fused
from .poisson_loss_grad import poisson_resmin_loss_fused
from .poisson_residual_3d import (poisson_residual_fused_3d,
                                  poisson_stiffness_action_3d)
from .poisson_residual import poisson_residual_fused, poisson_stiffness_action

__all__ = [
    "ns_vms_residual_fused",
    "ns_vms_residual_xla",
    "poisson_energy_fused",
    "poisson_resmin_loss_fused",
    "poisson_residual_fused",
    "poisson_residual_fused_3d",
    "poisson_stiffness_action",
    "poisson_stiffness_action_3d",
]
