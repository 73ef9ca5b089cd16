from .continuation import coarse_to_fine, prolong_field  # noqa: F401
from .linear import (  # noqa: F401
    gauss_newton_solve,
    module_linear_solve,
    multigrid_preconditioner,
    newton_solve,
    ns_newton_solve,
    solve_linear,
    stokes_block_preconditioner,
    stokes_linear_solve,
)
from .stencil import (  # noqa: F401
    assemble_stencil,
    extract_stencil,
    stencil_diag,
    stencil_matvec,
)
from .query import (  # noqa: F401
    calc_mean_stddev,
    point_histograms,
    query_batched,
    query_statistical,
)
from .trainer import (  # noqa: F401
    Callback,
    CSVLogger,
    EarlyStopping,
    OptimizerSwitch,
    Trainer,
    TrainState,
    load_params,
    load_state,
    make_run_dir,
    save_params,
    save_state,
)
