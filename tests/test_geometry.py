"""L0 geometry tests: exp/log roundtrips, Jacobian checks (SURVEY §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysfm_tpu.geometry import projection, se3, so3


def random_rotations(rng, n):
    w = rng.normal(size=(n, 3))
    return np.asarray(so3.exp(jnp.asarray(w)))


class TestSO3:
    def test_hat_vee(self, rng):
        w = jnp.asarray(rng.normal(size=(5, 3)))
        W = so3.hat(w)
        np.testing.assert_allclose(so3.vee(W), w, atol=1e-12)
        v = jnp.asarray(rng.normal(size=(5, 3)))
        np.testing.assert_allclose(
            jnp.einsum("bij,bj->bi", W, v), jnp.cross(w, v), atol=1e-12
        )

    def test_exp_is_rotation(self, rng):
        w = jnp.asarray(rng.normal(size=(10, 3)) * 2.0)
        R = so3.exp(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)

    def test_exp_log_roundtrip(self, rng):
        # Angles spread over (0, pi), plus tiny ones for the Taylor branch.
        w = rng.normal(size=(50, 3))
        w = w / np.linalg.norm(w, axis=-1, keepdims=True)
        scales = np.concatenate(
            [np.linspace(1e-10, 3.0, 46), [1e-6, 1e-3, np.pi - 1e-4, np.pi - 1e-8]]
        )
        w = jnp.asarray(w * scales[:, None])
        back = so3.log(so3.exp(w))
        np.testing.assert_allclose(back, w, atol=1e-6)

    def test_log_exp_roundtrip_near_pi(self, rng):
        w = np.array([[np.pi - 1e-5, 0, 0], [0, 0, np.pi - 2e-4]])
        R = so3.exp(jnp.asarray(w))
        np.testing.assert_allclose(so3.log(R), w, atol=1e-4)

    def test_exp_matches_jacfwd_fd(self, rng):
        # d/dw exp(w) smooth through the small-angle branch: no NaNs.
        g = jax.jacfwd(lambda w: so3.exp(w).sum())(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_normalize(self, rng):
        R = jnp.asarray(random_rotations(rng, 4)) + 1e-4 * jnp.asarray(
            rng.normal(size=(4, 3, 3))
        )
        Rn = so3.normalize(R)
        eye = jnp.broadcast_to(jnp.eye(3), Rn.shape)
        np.testing.assert_allclose(Rn @ jnp.swapaxes(Rn, -1, -2), eye, atol=1e-12)
        np.testing.assert_allclose(jnp.linalg.det(Rn), 1.0, atol=1e-12)


class TestSE3:
    def test_inverse_compose(self, rng):
        R = jnp.asarray(random_rotations(rng, 3))
        t = jnp.asarray(rng.normal(size=(3, 3)))
        Ri, ti = se3.inverse(R, t)
        Rc, tc = se3.compose(R, t, Ri, ti)
        np.testing.assert_allclose(Rc, jnp.broadcast_to(jnp.eye(3), Rc.shape), atol=1e-12)
        np.testing.assert_allclose(tc, 0.0, atol=1e-12)

    def test_transform_roundtrip(self, rng):
        R = jnp.asarray(random_rotations(rng, 3))
        t = jnp.asarray(rng.normal(size=(3, 3)))
        X = jnp.asarray(rng.normal(size=(3, 3)))
        p = se3.transform(R, t, X)
        Ri, ti = se3.inverse(R, t)
        np.testing.assert_allclose(se3.transform(Ri, ti, p), X, atol=1e-12)

    def test_camera_center(self, rng):
        R = jnp.asarray(random_rotations(rng, 2))
        t = jnp.asarray(rng.normal(size=(2, 3)))
        C = se3.camera_center(R, t)
        np.testing.assert_allclose(se3.transform(R, t, C), 0.0, atol=1e-12)

    def test_exp_matches_small_retract(self, rng):
        xi = jnp.asarray(rng.normal(size=6) * 1e-6)
        R, t = se3.exp(xi)
        np.testing.assert_allclose(R, so3.exp(xi[:3]), atol=1e-12)
        np.testing.assert_allclose(t, xi[3:], atol=1e-11)


def _random_scene(rng, model, n=20):
    R = jnp.asarray(random_rotations(rng, n))
    t = jnp.asarray(rng.normal(size=(n, 3)) * 0.3)
    # Points safely in front of the cameras (z>0 for pinhole, z<0 ... BAL uses
    # -p/z so also needs z != 0; put them at positive z and negative for bal).
    X = jnp.asarray(rng.normal(size=(n, 3)))
    zsign = -1.0 if model == "bal" else 1.0
    X = X.at[:, 2].set(zsign * (4.0 + rng.random(n)))
    # Undo rotation so the *camera-frame* z is controlled.
    X = jnp.einsum("bji,bj->bi", R, X - t)
    if model == "bal":
        intr = jnp.asarray(
            np.stack([500 + rng.random(n) * 100, rng.normal(n) * 0 + 1e-2 * rng.random(n), 1e-4 * rng.random(n)], axis=-1)
        )
    else:
        intr = jnp.asarray(
            np.stack(
                [
                    500 + rng.random(n) * 100,
                    500 + rng.random(n) * 100,
                    320 + rng.random(n),
                    240 + rng.random(n),
                ],
                axis=-1,
            )
        )
    return R, t, intr, X


@pytest.mark.parametrize("model", projection.CAMERA_MODELS)
class TestProjection:
    def test_jacobians_vs_jacfwd(self, rng, model):
        """Analytic Jacobians == autodiff of the same projection (SURVEY §3.4)."""
        R, t, intr, X = _random_scene(rng, model)
        uv, J_cam, J_pt = projection.project_with_jac(model, R, t, intr, X)
        np.testing.assert_allclose(uv, projection.project(model, R, t, intr, X), atol=1e-12)

        def per_item(Ri, ti, intri, Xi):
            dof = projection.CAM_DOF[model]

            def f_cam(delta):
                dw, dt = delta[:3], delta[3:6]
                intr2 = intri + delta[6:dof - 6 + 6] if dof > 6 else intri
                if dof > 6:
                    intr2 = intri + delta[6:]
                return projection.project(model, so3.exp(dw) @ Ri, ti + dt, intr2, Xi)

            Jc = jax.jacfwd(f_cam)(jnp.zeros(dof, dtype=Xi.dtype))
            Jp = jax.jacfwd(lambda Xq: projection.project(model, Ri, ti, intri, Xq))(Xi)
            return Jc, Jp

        Jc_ad, Jp_ad = jax.vmap(per_item)(R, t, intr, X)
        np.testing.assert_allclose(J_cam, Jc_ad, rtol=1e-7, atol=1e-8)
        np.testing.assert_allclose(J_pt, Jp_ad, rtol=1e-7, atol=1e-8)

    def test_jacobians_vs_finite_differences(self, rng, model):
        """Central finite differences, the reference's discipline (SURVEY §4.1)."""
        R, t, intr, X = _random_scene(rng, model, n=5)
        _, J_cam, J_pt = projection.project_with_jac(model, R, t, intr, X)
        h = 1e-6
        dof = projection.CAM_DOF[model]
        Jc_fd = np.zeros((5, 2, dof))
        Jp_fd = np.zeros((5, 2, 3))
        for k in range(dof):
            d = np.zeros(dof)
            d[k] = h
            dw, dt = jnp.asarray(d[:3]), jnp.asarray(d[3:6])
            di = jnp.asarray(d[6:]) if dof > 6 else 0.0
            up = projection.project(model, so3.exp(dw)[None] @ R, t + dt, intr + di, X)
            um = projection.project(model, so3.exp(-dw)[None] @ R, t - dt, intr - di, X)
            Jc_fd[:, :, k] = np.asarray(up - um) / (2 * h)
        for k in range(3):
            d = np.zeros(3)
            d[k] = h
            up = projection.project(model, R, t, intr, X + jnp.asarray(d))
            um = projection.project(model, R, t, intr, X - jnp.asarray(d))
            Jp_fd[:, :, k] = np.asarray(up - um) / (2 * h)
        np.testing.assert_allclose(J_cam, Jc_fd, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(J_pt, Jp_fd, rtol=1e-4, atol=1e-4)


def test_pr_unpr(rng):
    x = jnp.asarray(rng.normal(size=(7, 3)))
    np.testing.assert_allclose(projection.pr(projection.unpr(x)), x, atol=1e-12)
