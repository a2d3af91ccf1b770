"""End-to-end images -> tracks -> incremental SfM (SURVEY §3.3 full stack).

Renders a synthetic dot-field video (bilinear splatting for subpixel truth)
of a camera translating past a 3-D point cloud, then runs the full pipeline:
Harris detection, patch matching, track linking, two-view init, PnP,
triangulation, windowed + global BA.
"""

import numpy as np
import pytest

from pysfm_tpu.pipeline import TrackingConfig, build_tracks, run_from_images
from pysfm_tpu.pipeline.incremental import IncrementalConfig
from pysfm_tpu.utils import metrics


H, W = 160, 220
FX = FY = 180.0
CX, CY = W / 2, H / 2


TEX = 5  # texture side (px)


def _render(points_px: np.ndarray, textures: np.ndarray) -> np.ndarray:
    """Splat a distinct random TEXxTEX texture per point with bilinear
    subpixel placement — per-point texture keeps patch descriptors
    discriminative (identical dots would all fail Lowe's ratio test)."""
    img = np.zeros((H, W))
    r = TEX // 2
    for (x, y), tex in zip(points_px, textures):
        if not (r + 1 <= x < W - r - 2 and r + 1 <= y < H - r - 2):
            continue
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        fx, fy = x - x0, y - y0
        for ty in range(TEX):
            for tx in range(TEX):
                for dy in range(2):
                    for dx in range(2):
                        wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                        img[y0 + ty - r + dy, x0 + tx - r + dx] += (
                            tex[ty, tx] * wgt
                        )
    return img


@pytest.fixture(scope="module")
def dot_video():
    rng = np.random.default_rng(5)
    n_pts, n_frames = 120, 6
    X = np.stack(
        [
            rng.uniform(-4, 4, n_pts),
            rng.uniform(-3, 3, n_pts),
            rng.uniform(9, 13, n_pts),
        ],
        axis=-1,
    )
    centers = np.stack(
        [np.linspace(0, 3.0, n_frames), 0.05 * rng.normal(size=n_frames),
         np.linspace(0, 0.5, n_frames)], axis=-1,
    )
    textures = rng.uniform(0.0, 1.0, (n_pts, TEX, TEX))
    images, gt_centers = [], []
    for c in centers:
        p = X - c  # identity rotation, t = -c
        px = np.stack(
            [FX * p[:, 0] / p[:, 2] + CX, FY * p[:, 1] / p[:, 2] + CY], axis=-1
        )
        images.append(_render(px, textures))
        gt_centers.append(c)
    return np.stack(images), np.stack(gt_centers), X


def test_build_tracks_consistency(dot_video):
    images, _, _ = dot_video
    uv, vis = build_tracks(images, TrackingConfig(n_keypoints=256))
    assert vis.shape[0] == images.shape[0]
    # A healthy fraction of tracks span >= 3 frames.
    lengths = vis.sum(axis=0)
    assert (lengths >= 3).sum() >= 25
    assert vis[0].sum() > 25  # first frame participates broadly


def test_images_to_reconstruction(dot_video):
    images, gt_centers, _ = dot_video
    intr = np.tile(np.array([FX, FY, CX, CY]), (images.shape[0], 1))
    rec = run_from_images(
        images, intr, "pose",
        tracking=TrackingConfig(n_keypoints=256),
        incremental_config=IncrementalConfig(
            # Cross-frame detector jitter is ~0.1px median / 0.35px p90 at
            # f=180 (the 1.6px offset to the dot centers is a consistent
            # per-track bias, i.e. a shifted 3-D point, not noise), so
            # RANSAC gates sit at ~(1px/f)^2.
            seed=4, pnp_threshold=3e-5, epipolar_threshold=3e-5,
        ),
    )
    assert rec.registered.all()
    C_est = np.asarray(
        metrics.camera_centers(rec.problem.R, rec.problem.t)
    )
    ate = float(metrics.ate_rmse(C_est, gt_centers))
    # Detection is pixel-quantized (bilinear dots, Harris integer NMS), so
    # allow a few percent of the 3-unit baseline.
    assert ate < 0.15
    assert metrics.reprojection_rmse(rec.problem) < 1.5
