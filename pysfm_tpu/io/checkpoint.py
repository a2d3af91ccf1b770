"""Checkpoint / resume of bundle-adjustment state (SURVEY §5).

The reference's only persistence is the ``bundle_io`` text format; for a
production framework the mandated mechanism is mid-solve checkpointing:
save ``(cameras, points, tracks, lambda, iteration, rng)`` and resume BA
from exactly that state (SURVEY §5 "Checkpoint / resume").

Design: one ``.npz`` per host + a tiny JSON sidecar for static metadata.
Arrays are gathered to host (for sharded problems each host saves only its
addressable shards — pass ``suffix=jax.process_index()``).  npz is
deliberately chosen over a heavier checkpoint library: BA state is a flat
dict of a dozen arrays, atomicity is achieved with a rename, and the file
round-trips with zero dependencies.  Failure recovery (SURVEY §5 "failure
detection"): re-launch the orchestrator and ``load_checkpoint`` the latest
complete file — a torn write is never visible because of the tmp+rename.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import numpy as np

from pysfm_tpu.problem import BundleProblem, make_problem


@dataclasses.dataclass
class SolverCheckpoint:
    """Everything needed to resume LM mid-solve."""

    problem: BundleProblem
    lam: float = 1e-3
    nu: float = 2.0
    iteration: int = 0
    rng_key: Optional[np.ndarray] = None
    extra: Optional[dict] = None


def save_checkpoint(path: str, ckpt: SolverCheckpoint) -> None:
    """Atomically write a checkpoint (tmp file + rename)."""
    p = ckpt.problem
    arrays = dict(
        R=np.asarray(p.R), t=np.asarray(p.t), intr=np.asarray(p.intr),
        X=np.asarray(p.X),
        obs_cam=np.asarray(p.obs_cam), obs_pt=np.asarray(p.obs_pt),
        obs_uv=np.asarray(p.obs_uv), obs_w=np.asarray(p.obs_w),
        cam_fixed=np.asarray(p.cam_fixed),
        robust_scale=np.asarray(p.robust_scale),
        lam=np.asarray(ckpt.lam), nu=np.asarray(ckpt.nu),
        iteration=np.asarray(ckpt.iteration),
    )
    if ckpt.rng_key is not None:
        arrays["rng_key"] = np.asarray(ckpt.rng_key)
    meta = {
        "camera_model": p.camera_model,
        "robust": p.robust,
        "extra": ckpt.extra or {},
        "version": 1,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    with open(path + ".json.tmp", "w") as f:
        json.dump(meta, f)
    os.replace(path + ".json.tmp", path + ".json")
    os.replace(tmp, path)


def load_checkpoint(path: str, dtype=None) -> SolverCheckpoint:
    """Load a checkpoint written by :func:`save_checkpoint`."""
    with open(path + ".json") as f:
        meta = json.load(f)
    z = np.load(path)
    prob = make_problem(
        z["R"], z["t"], z["intr"], z["X"],
        z["obs_cam"], z["obs_pt"], z["obs_uv"],
        camera_model=meta["camera_model"], robust=meta["robust"],
        robust_scale=float(z["robust_scale"]),
        obs_w=z["obs_w"], cam_fixed=z["cam_fixed"], dtype=dtype,
    )
    return SolverCheckpoint(
        problem=prob,
        lam=float(z["lam"]),
        nu=float(z["nu"]),
        iteration=int(z["iteration"]),
        rng_key=z["rng_key"] if "rng_key" in z else None,
        extra=meta.get("extra") or None,
    )


def latest_checkpoint(directory: str, prefix: str = "ckpt") -> Optional[str]:
    """Newest complete checkpoint in ``directory`` (by iteration suffix
    ``<prefix>_<iteration>.npz``), or None."""
    best: tuple[int, str] | None = None
    for name in os.listdir(directory):
        if not (name.startswith(prefix + "_") and name.endswith(".npz")):
            continue
        stem = name[len(prefix) + 1 : -4]
        if not stem.isdigit():
            continue
        full = os.path.join(directory, name)
        if not os.path.exists(full + ".json"):
            continue  # torn write — sidecar is renamed first
        it = int(stem)
        if best is None or it > best[0]:
            best = (it, full)
    return best[1] if best else None
