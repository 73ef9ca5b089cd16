from .advection import AdvDiff2D  # noqa: F401
from .base import FDMModule, FEM2DModule, FEM3DModule, PDEModule  # noqa: F401
from .eikonal import (Eikonal2D, Eikonal3D, EikonalFDM2D,  # noqa: F401
                      eikonal_gn_residual, signed_occupancy_init)
from .elasticity import ElasticFSDT  # noqa: F401
from .flow import (  # noqa: F401
    FlowWeakFormLDC,
    NavierStokes,
    StokesMMS,
    StokesNSBase,
    calc_tau,
    ldc_bcs,
)
from .helmholtz import Helmholtz2D  # noqa: F401
from .ibn import IBNPoisson2D, IBNPoisson3D  # noqa: F401
from .poisson import (Poisson2D, Poisson3D, PoissonFDM2D,  # noqa: F401
                      PoissonTwoDof2D)
from .spacetime import AllenCahnIceMelt, BurgersSpaceTime, SpaceTimeHeat  # noqa: F401
from .topopt import TopOpt2D  # noqa: F401
