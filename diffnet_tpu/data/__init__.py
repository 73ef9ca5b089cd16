from . import flow, gen_input, parametric, single_instances  # noqa: F401
from .loader import InMemoryDataset, NumpyLoader  # noqa: F401
