"""L0 math primitives: SO(3)/SE(3) and projection models (SURVEY §1 L0)."""

from pysfm_tpu.geometry import projection, se3, so3  # noqa: F401
