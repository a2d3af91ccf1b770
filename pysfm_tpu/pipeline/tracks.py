"""Feature tracks from images: detect, match, link (SURVEY §3.3 first box).

Device side: Harris detection, patch description, and pairwise matching are
batched jax (features.py / match.py).  Host side: linking matches into
multi-frame tracks is a tiny union-find over (frame, keypoint) nodes —
pure bookkeeping, O(#matches).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from pysfm_tpu.frontend import features, match


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    n_keypoints: int = 512
    patch_radius: int = 5
    min_similarity: float = 0.85
    ratio: float = 0.75
    match_window: int = 3        # match frame f against f-1 .. f-window
    min_track_length: int = 2
    # Geometric verification of every matched pair (fundamental-matrix
    # RANSAC on pixel coords) before linking — wrong matches otherwise
    # contaminate whole tracks through the union-find.
    verify: bool = True
    verify_threshold_px: float = 2.0   # Sampson distance (px)
    verify_hypotheses: int = 128
    min_pair_matches: int = 10
    seed: int = 0


class _UnionFind:
    def __init__(self, n):
        self.parent = np.arange(n)

    def find(self, a):
        root = a
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[a] != root:
            self.parent[a], a = root, self.parent[a]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_tracks(
    images: np.ndarray,          # [F, H, W] grayscale
    config: TrackingConfig = TrackingConfig(),
) -> Tuple[np.ndarray, np.ndarray]:
    """Detect + match + link. Returns ``(uv [F, T, 2], vis [F, T])``.

    Tracks are connected components of the match graph; a component that
    claims two keypoints in the same frame has merged two physical points
    (drift/repeated texture) and is dropped entirely — keeping one of the
    claims would manufacture a track that jumps between 3-D points, which
    poisons triangulation and BA far more than a missing track does.
    """
    F = images.shape[0]
    N = config.n_keypoints
    kps, descs, valids = [], [], []
    for f in range(F):
        kp, d = features.detect_and_describe(
            jnp.asarray(images[f]), N, patch_radius=config.patch_radius
        )
        kps.append(np.asarray(kp.xy))
        valids.append(np.asarray(kp.valid))
        descs.append(d)

    import jax as _jax

    from pysfm_tpu.frontend import epipolar, ransac

    key = _jax.random.PRNGKey(config.seed)
    uf = _UnionFind(F * N)
    for f in range(1, F):
        for g in range(max(0, f - config.match_window), f):
            m = match.match_descriptors(
                descs[g], descs[f],
                valid1=jnp.asarray(valids[g]), valid2=jnp.asarray(valids[f]),
                min_similarity=config.min_similarity, ratio=config.ratio,
            )
            ok = np.asarray(m.valid)
            i1 = np.asarray(m.idx1)[ok]
            i2 = np.asarray(m.idx2)[ok]
            if config.verify and len(i1) >= max(8, config.min_pair_matches):
                x1 = jnp.asarray(kps[g][i1])
                x2 = jnp.asarray(kps[f][i2])

                def fit(_, w, x1=x1, x2=x2):
                    return epipolar.eight_point(x1, x2, w=w)

                def score(Fm, x1=x1, x2=x2):
                    return epipolar.sampson_distance(Fm, x1, x2)

                key, sub = _jax.random.split(key)
                res = ransac.ransac(
                    sub, len(i1), fit, score,
                    sample_size=8,
                    n_hypotheses=config.verify_hypotheses,
                    threshold=config.verify_threshold_px ** 2,
                )
                keep = np.asarray(res.inliers)
                i1, i2 = i1[keep], i2[keep]
            elif config.verify:
                continue  # too few matches to verify — skip the pair
            for a, b in zip(g * N + i1, f * N + i2):
                uf.union(int(a), int(b))

    # Collect components.
    roots = {}
    obs = []  # (track, frame, kp)
    for f in range(F):
        for i in range(N):
            if not valids[f][i]:
                continue
            r = uf.find(f * N + i)
            tid = roots.setdefault(r, len(roots))
            obs.append((tid, f, i))

    T = len(roots)
    uv = np.zeros((F, T, 2))
    vis = np.zeros((F, T), bool)
    conflicted = np.zeros(T, bool)
    for tid, f, i in obs:
        if vis[f, tid]:
            conflicted[tid] = True  # merged component — drop whole track
            continue
        uv[f, tid] = kps[f][i]
        vis[f, tid] = True

    keep = (vis.sum(axis=0) >= config.min_track_length) & ~conflicted
    return uv[:, keep], vis[:, keep]


def run_from_images(
    images: np.ndarray, intr: np.ndarray, camera_model: str = "pose",
    tracking: TrackingConfig = TrackingConfig(),
    incremental_config=None,
):
    """Full pipeline: images -> tracks -> incremental SfM (SURVEY §3.3)."""
    from pysfm_tpu.pipeline.incremental import IncrementalConfig, run_incremental

    uv, vis = build_tracks(images, tracking)
    cfg = incremental_config or IncrementalConfig()
    return run_incremental(uv, vis, intr, camera_model, cfg)
