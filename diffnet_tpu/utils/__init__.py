from .vti import VtiWriter, write_vti  # noqa: F401
from .viz import (  # noqa: F401
    ContourPlotCallback,
    plot_contours,
    plot_line_cuts,
    plot_losses,
    plot_point_histograms,
)
from .xyzna import read_xyzna, write_xyzna  # noqa: F401
from .export import export_forward, load_exported, save_exported  # noqa: F401
from .native import (  # noqa: F401
    kl_diffusivity_batch,
    winding_number_2d_host,
    winding_number_3d_host,
)
