from .vti import VtiWriter, write_vti  # noqa: F401
from .viz import ContourPlotCallback, plot_contours, plot_line_cuts  # noqa: F401
from .xyzna import read_xyzna, write_xyzna  # noqa: F401
