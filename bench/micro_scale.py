"""Micro-benchmarks of the BAL-scale path's building blocks (gathers,
masked contractions) to find which primitive eats the time.  Tool, not a
driver contract.  Run: python bench/micro_scale.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"


def timeit(fn, *args, n=5):
    import jax

    from pysfm_tpu.utils.timing import sync

    f = jax.jit(fn)
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=856)
    ap.add_argument("--points", type=int, default=250_000)
    ap.add_argument("--obs", type=int, default=1_250_000)
    ap.add_argument("--K", type=int, default=12)
    ap.add_argument("--Kc", type=int, default=1584)
    args = ap.parse_args()
    C, P, M, K, Kc = args.cams, args.points, args.obs, args.K, args.Kc
    cp = 9
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    f32 = jnp.float32

    B_cm = jax.random.normal(ks[0], (3 * cp, M), f32)
    cam_rows = jax.random.normal(ks[1], (54, M), f32)
    pt_obs = jax.random.randint(ks[2], (P, K), 0, M)
    pt_obs_mask = jnp.ones((P, K), bool)
    cam_obs = jax.random.randint(ks[3], (C, Kc), 0, M)
    cmask = jnp.ones((C, Kc), f32)
    x = jax.random.normal(ks[4], (cp, C), f32)
    w3 = jax.random.normal(ks[5], (3, P), f32)
    camg = jax.random.randint(ks[6], (K, P), 0, C)
    ptg = jax.random.randint(ks[7], (C, Kc), 0, P)
    Bp = jax.random.normal(ks[0], (3 * cp, K, P), f32)
    Bg = jax.random.normal(ks[1], (3 * cp, C, Kc), f32)

    gb = lambda *shapes: sum(np.prod(s) * 4 for s in shapes) / 1e9

    t = timeit(lambda a: a[:, pt_obs.T], B_cm)
    print(f"gather B_cm[:, pt_obs.T] [{3*cp},{K},{P}]  {t:8.2f} ms "
          f"({gb((3*cp, K, P))/t*1e3:6.1f} GB/s out)")

    t = timeit(lambda a: a[:, cam_obs], cam_rows)
    print(f"gather cam_rows[:, cam_obs] [54,{C},{Kc}] {t:8.2f} ms "
          f"({gb((54, C, Kc))/t*1e3:6.1f} GB/s out)")

    # Row-major variants: big axis LEADING, small payload minor.
    B_rm = jnp.asarray(B_cm.T)           # [M, 27]
    cam_rows_rm = jnp.asarray(cam_rows.T)  # [M, 54]
    t = timeit(lambda a: a[pt_obs.T], B_rm)
    print(f"gather B_rm[pt_obs.T] [{K},{P},{3*cp}]    {t:8.2f} ms")
    t = timeit(lambda a: a[cam_obs], cam_rows_rm)
    print(f"gather cam_rows_rm[cam_obs] [{C},{Kc},54] {t:8.2f} ms")

    # Masked sum over track axis (the reduction after the gather).
    g = cam_rows[:, cam_obs]
    t = timeit(lambda a: jnp.sum(a * cmask, axis=-1), g)
    print(f"masked sum [54,{C},{Kc}] -> [54,{C}]      {t:8.2f} ms")

    # One-hot matmul reduction (chunked): cam_rows [54, M] x onehot [M, C].
    def onehot_red(a, oc):
        m = 1 << 19
        nch = -(-M // m)
        pad = nch * m - M
        a = jnp.pad(a, ((0, 0), (0, pad)))
        oc = jnp.pad(oc, (0, pad), constant_values=C)
        a = a.reshape(54, nch, m)
        oc = oc.reshape(nch, m)

        def chunk(args):
            ai, oci = args
            oh = (oci[:, None] == jnp.arange(C)[None, :]).astype(f32)
            return ai @ oh

        parts = jax.lax.map(chunk, (a.transpose(1, 0, 2), oc))
        return parts.sum(0)

    obs_cam = jax.random.randint(ks[2], (M,), 0, C)
    t = timeit(lambda a: onehot_red(a, obs_cam), cam_rows)
    print(f"one-hot matmul red [54,M]x[M,{C}]        {t:8.2f} ms")

    # Matvec pieces.
    t = timeit(lambda a: a[:, camg], x)
    print(f"gather x[:, camg] [{cp},{K},{P}]          {t:8.2f} ms")
    t = timeit(lambda a: a[:, ptg], w3)
    print(f"gather w3[:, ptg] [3,{C},{Kc}]            {t:8.2f} ms")

    xg = x[:, camg]
    Bp4 = Bp.reshape(3, cp, K, P)
    t = timeit(
        lambda a, b: jnp.einsum("sdkp,dkp->sp", a, b), Bp4, xg
    )
    print(f"einsum sdkp,dkp->sp (HcpT x)             {t:8.2f} ms "
          f"({gb((3*cp, K, P), (cp, K, P))/t*1e3:6.1f} GB/s in)")
    t = timeit(
        lambda a, b: jnp.sum(a * b[None], axis=(1, 2)), Bp4, xg
    )
    print(f"mul+sum  (HcpT x)                        {t:8.2f} ms")

    wg = w3[:, ptg]
    Bg4 = Bg.reshape(3, cp, C, Kc)
    t = timeit(
        lambda a, b: jnp.einsum("sdck,sck->dc", a, b), Bg4, wg
    )
    print(f"einsum sdck,sck->dc (Hcp w)              {t:8.2f} ms "
          f"({gb((3*cp, C, Kc), (3, C, Kc))/t*1e3:6.1f} GB/s in)")
    t = timeit(
        lambda a, b: jnp.sum(a * b[:, None], axis=(0, 3)), Bg4, wg
    )
    print(f"mul+sum  (Hcp w)                         {t:8.2f} ms")


if __name__ == "__main__":
    main()
