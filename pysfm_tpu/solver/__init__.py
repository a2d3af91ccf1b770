"""L2 optimizer: on-device LM + Schur complement (SURVEY §1 L2)."""

from pysfm_tpu.solver import schur  # noqa: F401
from pysfm_tpu.solver.lm import LMStats, solve  # noqa: F401
from pysfm_tpu.utils.config import LMConfig  # noqa: F401
