"""Native tier: Pallas TPU kernels for the hot per-observation ops
(SURVEY §2 "Pallas kernels (the framework's native tier)")."""

from pysfm_tpu.solver.kernels.pallas_proj import (  # noqa: F401
    residuals_and_jacobians_pallas,
    residuals_jacobians_weights,
)
