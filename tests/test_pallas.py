"""Native-tier (Pallas) kernel tests (SURVEY §5 "race detection" analog:
interpret-mode execution vs the jax path, and §3.4 three-way derivative
discipline — the jax path is itself FD/autodiff-verified, so equality here
closes the loop for the kernels).

On CPU the kernels run in interpret mode (Pallas TPU kernels don't compile
for the host), in f64 so equality with the jax path is exact to roundoff.
Compiled-mode equality on a real TPU chip is exercised by bench/roofline.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pysfm_tpu.pipeline import synthetic
from pysfm_tpu.problem import problem as problem_mod
from pysfm_tpu.solver.kernels import pallas_proj


@pytest.mark.parametrize("model", ["pose", "pose_k", "bal"])
@pytest.mark.parametrize("robust", ["gaussian", "huber", "cauchy"])
def test_proj_kernel_matches_jax_f64(model, robust):
    sc = synthetic.make_scene(
        5, 101, camera_model=model, noise_px=1.0, outlier_frac=0.1,
        outlier_px=30.0, robust=robust, robust_scale=2.0, seed=3,
        dtype=np.float64,
    )
    p = sc.problem
    r0, Jc0, Jp0, w0 = problem_mod.residuals_and_jacobians(p)
    r1, Jc1, Jp1, w1 = pallas_proj.residuals_and_jacobians_pallas(
        p, interpret=True
    )
    for a, b in ((r0, r1), (Jc0, Jc1), (Jp0, Jp1), (w0, w1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-12
        )


def test_proj_kernel_f32_close(rng):
    """f32 path: same operands, different rounding order — errors must stay
    at the few-ulp level relative to the pixel magnitudes."""
    sc = synthetic.make_scene(
        4, 200, camera_model="pose", noise_px=0.5, robust="huber",
        robust_scale=2.0, seed=7, dtype=np.float32,
    )
    p = sc.problem
    r0, Jc0, Jp0, w0 = problem_mod.residuals_and_jacobians(p)
    r1, Jc1, Jp1, w1 = pallas_proj.residuals_and_jacobians_pallas(
        p, interpret=True
    )
    uv_scale = float(jnp.max(jnp.abs(p.obs_uv))) + 1.0
    assert float(jnp.max(jnp.abs(r0 - r1))) < 1e-4 * uv_scale
    for a, b in ((Jc0, Jc1), (Jp0, Jp1), (w0, w1)):
        scale = float(jnp.max(jnp.abs(a))) + 1.0
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * scale


def test_proj_kernel_padding_lanes_are_discarded():
    """M not a multiple of the tile: the padded lanes must not leak."""
    sc = synthetic.make_scene(3, 37, camera_model="pose", seed=5,
                              dtype=np.float64)
    p = sc.problem
    r0, *_ = problem_mod.residuals_and_jacobians(p)
    r1, Jc1, Jp1, w1 = pallas_proj.residuals_and_jacobians_pallas(
        p, interpret=True
    )
    assert r1.shape == r0.shape
    assert Jc1.shape == (p.n_obs, 2, p.cam_dof)
    assert Jp1.shape == (p.n_obs, 2, 3)
    assert w1.shape == (p.n_obs,)
    assert bool(jnp.all(jnp.isfinite(r1)))
