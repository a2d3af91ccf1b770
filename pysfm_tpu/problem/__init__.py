"""L1 measurement model: SoA bundle problem + robust costs (SURVEY §1 L1)."""

from pysfm_tpu.problem import robust  # noqa: F401
from pysfm_tpu.problem.problem import (  # noqa: F401
    BundleProblem,
    apply_update,
    build_point_obs_table,
    cost,
    make_problem,
    residuals,
    residuals_and_jacobians,
)
