"""L4 pipeline: synthetic scenes, incremental SfM, image tracking (SURVEY §1 L4)."""

from pysfm_tpu.pipeline import synthetic  # noqa: F401
from pysfm_tpu.pipeline.incremental import (  # noqa: F401
    IncrementalConfig,
    Reconstruction,
    run_incremental,
)
from pysfm_tpu.pipeline.tracks import (  # noqa: F401
    TrackingConfig,
    build_tracks,
    run_from_images,
)
