from . import fdm, fem, geometry, interp, quadrature  # noqa: F401
from .fem import (  # noqa: F401
    galerkin_project,
    gather_elements,
    gp_coords,
    gp_eval,
    gp_eval_stacked,
    scatter_elements,
)
from .quadrature import FEMBasis, make_basis  # noqa: F401
