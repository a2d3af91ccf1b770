"""Per-grid-step fixed-overhead probe for the grouped Pallas kernels.

Measures an EMPTY pallas_call over the same grid shape the grouped
kernels use (NB sequential steps, (8,128) blocks) to separate grid/DMA
overhead from real per-block work — the measurement behind
ROOFLINE_r04.json's ceiling analysis (the kernels are grid-overhead +
VPU-latency bound, not HBM-bound: 0.95 us/step empty, and streaming the
full b_rows operand into the empty kernel is nearly free).

Run:  python bench/grid_overhead_probe.py
"""

import sys, time
sys.path.insert(0, ".")
import os
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"
import jax, jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from pysfm_tpu.utils.timing import sync

NB = 1684
SUB, CGRP, PCH = 8, 128, 2048

def timeit(fn, *a, n=20):
    out = fn(*a); sync(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3

# empty kernel, 1 tiny input, 1 tiny output
def k_empty(bg, t_ref, o_ref):
    o_ref[...] = t_ref[...]

bg = jnp.zeros((NB,), jnp.int32)
tab = jnp.zeros((NB, SUB, CGRP), jnp.float32)
gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(NB,),
    in_specs=[pl.BlockSpec((1, SUB, CGRP), lambda b, bg: (b, 0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, SUB, CGRP), lambda b, bg: (b, 0, 0), memory_space=pltpu.VMEM),
)
f1 = jax.jit(lambda bg, tab: pl.pallas_call(k_empty, grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((NB, SUB, CGRP), jnp.float32))(bg, tab))
print("empty 1-in/1-out  :", round(timeit(f1, bg, tab), 3), "ms")

# empty kernel with 7 small inputs (like K_C)
def k7(bg, a,b,c,d,e,f,g, o_ref):
    o_ref[...] = a[...]
gs7 = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(NB,),
    in_specs=[pl.BlockSpec((1, SUB, CGRP), lambda b, bg: (b, 0, 0), memory_space=pltpu.VMEM)]*7,
    out_specs=pl.BlockSpec((1, SUB, CGRP), lambda b, bg: (b, 0, 0), memory_space=pltpu.VMEM),
)
f7 = jax.jit(lambda bg, tab: pl.pallas_call(k7, grid_spec=gs7,
    out_shape=jax.ShapeDtypeStruct((NB, SUB, CGRP), jnp.float32))(bg, *([tab]*7)))
print("empty 7-in/1-out  :", round(timeit(f7, bg, tab), 3), "ms")

# with a big b_rows-like input (18 rows)
def kb(bg, a, brt, o_ref):
    o_ref[...] = a[...] + brt[0, 0][None]
gsb = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(NB,),
    in_specs=[
      pl.BlockSpec((1, SUB, CGRP), lambda b, bg: (b, 0, 0), memory_space=pltpu.VMEM),
      pl.BlockSpec((18, 1, SUB, CGRP), lambda b, bg: (0, b, 0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((1, SUB, CGRP), lambda b, bg: (b, 0, 0), memory_space=pltpu.VMEM),
)
br = jnp.zeros((18, NB, SUB, CGRP), jnp.float32)
fb = jax.jit(lambda bg, tab, br: pl.pallas_call(kb, grid_spec=gsb,
    out_shape=jax.ShapeDtypeStruct((NB, SUB, CGRP), jnp.float32))(bg, tab, br))
print("empty + b_rows 18 :", round(timeit(fb, bg, tab, br), 3), "ms")
