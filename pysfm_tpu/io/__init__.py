"""I/O layer (SURVEY §2 "Bundle I/O", §5 checkpoint/resume, L5).

- :mod:`pysfm_tpu.io.bal` — BAL problem files (BASELINE config 4 scale)
- :mod:`pysfm_tpu.io.bundler` — Bundler ``.out`` v0.3 (reference interop)
- :mod:`pysfm_tpu.io.checkpoint` — mid-solve checkpoint / resume
- :mod:`pysfm_tpu.io.viz` — camera frusta / point cloud / overlay plots
"""

from pysfm_tpu.io.bal import load_bal, save_bal
from pysfm_tpu.io.bundler import load_bundler, save_bundler
from pysfm_tpu.io.checkpoint import (
    SolverCheckpoint,
    latest_checkpoint,
    load_checkpoint,
    load_checkpoint_cm,
    load_checkpoint_sharded,
    load_checkpoint_sharded_cm,
    save_checkpoint,
    save_checkpoint_cm,
    save_checkpoint_sharded,
    save_checkpoint_sharded_cm,
)

__all__ = [
    "load_bal", "save_bal", "load_bundler", "save_bundler",
    "SolverCheckpoint", "save_checkpoint", "load_checkpoint",
    "save_checkpoint_sharded", "load_checkpoint_sharded",
    "save_checkpoint_cm", "load_checkpoint_cm",
    "save_checkpoint_sharded_cm", "load_checkpoint_sharded_cm",
    "latest_checkpoint",
]
