"""Reliable device-completion fences for benchmarking.

``jax.block_until_ready`` is NOT a trustworthy wall-clock fence through the
tunneled axon TPU runtime: it can return before the device finishes, which
produced impossible readings (>10 TB/s "bandwidth") when timing kernels.
A device->host copy, by contrast, is enqueued after all preceding work on
the stream and cannot complete early on any backend — so :func:`sync`
fetches one element of one leaf to the host and is the fence every bench
script in this repo uses.
"""

from __future__ import annotations

import time

import numpy as np


def sync(tree) -> None:
    """True completion barrier: copy one element of `tree` to host."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[0].ravel()[:1])


def timeit(fn, *args, n: int = 20, **kw) -> float:
    """Mean seconds/call over `n` calls after one warmup (compile) call."""
    sync(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / n
