"""L3 geometric front-end: features, matching, epipolar geometry, RANSAC,
triangulation, PnP (SURVEY §1 L3)."""

from pysfm_tpu.frontend import (  # noqa: F401
    epipolar,
    features,
    match,
    pnp,
    ransac,
    triangulate,
)
