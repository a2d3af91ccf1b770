"""L3 frontend tests (SURVEY §4.3): triangulation returns the generating
point; 8-point recovers E from clean correspondences; RANSAC rejects planted
outliers; PnP recovers the pose; Harris+matching roundtrips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysfm_tpu.frontend import (
    epipolar, features, match, p3p, pnp, ransac, triangulate,
)
from pysfm_tpu.geometry import projection, so3
from pysfm_tpu.pipeline import synthetic


def _two_view(rng, n=60, model="pose", noise=0.0):
    """Ground-truth relative pose + correspondences in normalized coords."""
    X = rng.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 6.0])
    w = rng.normal(size=3) * 0.3
    R2 = np.asarray(so3.exp(jnp.asarray(w)))
    t2 = np.array([1.0, 0.1, -0.2])
    pn1 = X[:, :2] / X[:, 2:]
    p2 = X @ R2.T + t2
    pn2 = p2[:, :2] / p2[:, 2:]
    if noise:
        pn1 = pn1 + rng.normal(scale=noise, size=pn1.shape)
        pn2 = pn2 + rng.normal(scale=noise, size=pn2.shape)
    return jnp.asarray(X), jnp.asarray(R2), jnp.asarray(t2), jnp.asarray(pn1), jnp.asarray(pn2)


class TestTriangulate:
    @pytest.mark.parametrize("model", ["pose", "bal"])
    def test_returns_generating_point(self, rng, model):
        sc = synthetic.make_scene(4, 30, camera_model=model, noise_px=0.0, seed=9)
        p = sc.truth
        uv = np.zeros((p.n_points, p.n_cameras, 2))
        mask = np.zeros((p.n_points, p.n_cameras))
        for m in range(p.n_obs):
            i, j = int(p.obs_cam[m]), int(p.obs_pt[m])
            uv[j, i] = np.asarray(p.obs_uv[m])
            mask[j, i] = 1.0
        X = triangulate.triangulate_points(
            model, p.R, p.t, p.intr, jnp.asarray(uv), jnp.asarray(mask)
        )
        np.testing.assert_allclose(np.asarray(X), np.asarray(p.X), atol=1e-6)

    def test_refinement_improves_noisy(self, rng):
        sc = synthetic.make_scene(5, 40, noise_px=1.0, seed=10)
        p = sc.truth
        uv = np.zeros((p.n_points, p.n_cameras, 2))
        mask = np.zeros((p.n_points, p.n_cameras))
        for m in range(p.n_obs):
            uv[int(p.obs_pt[m]), int(p.obs_cam[m])] = np.asarray(p.obs_uv[m])
            mask[int(p.obs_pt[m]), int(p.obs_cam[m])] = 1.0
        X_lin = triangulate.triangulate_points(
            "pose", p.R, p.t, p.intr, jnp.asarray(uv), jnp.asarray(mask)
        )
        X_ref = triangulate.refine_points(
            "pose", p.R, p.t, p.intr, jnp.asarray(uv), jnp.asarray(mask), X_lin
        )

        def reproj_err(X):
            uvh = projection.project(
                "pose", p.R[None], p.t[None], p.intr[None], np.asarray(X)[:, None]
            )
            return float(jnp.sum(((uvh - uv) ** 2) * mask[..., None]))

        assert reproj_err(X_ref) <= reproj_err(X_lin) + 1e-9

    def test_bal_undistort_roundtrip(self, rng):
        intr = jnp.asarray([800.0, 1e-2, 1e-4])
        pn = jnp.asarray(rng.uniform(-0.3, 0.3, size=(20, 2)))
        # Forward BAL distortion of pn (pinhole convention -> bal pn = -pn).
        pnb = -pn
        r2 = jnp.sum(pnb * pnb, axis=-1, keepdims=True)
        rho = 1 + intr[1] * r2 + intr[2] * r2 * r2
        uv = intr[0] * rho * pnb
        back = triangulate.pixel_to_normalized("bal", intr, uv)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pn), atol=1e-9)


class TestEpipolar:
    def test_eight_point_recovers_E(self, rng):
        X, R2, t2, pn1, pn2 = _two_view(rng)
        E = epipolar.eight_point(pn1, pn2, essential=True)
        E_true = epipolar.essential_from_pose(R2, t2)
        # Equal up to scale/sign.
        E = E / jnp.linalg.norm(E)
        E_true = E_true / jnp.linalg.norm(E_true)
        err = min(
            float(jnp.max(jnp.abs(E - E_true))), float(jnp.max(jnp.abs(E + E_true)))
        )
        assert err < 1e-8
        d = epipolar.sampson_distance(E, pn1, pn2)
        assert float(jnp.max(d)) < 1e-12

    def test_pose_from_E_cheirality(self, rng):
        X, R2, t2, pn1, pn2 = _two_view(rng)
        E = epipolar.eight_point(pn1, pn2, essential=True)
        R, t, n_good, Xtri = epipolar.select_pose(E, pn1, pn2)
        assert int(n_good) == X.shape[0]
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-6)
        t_dir = np.asarray(t) / np.linalg.norm(np.asarray(t))
        t2_dir = np.asarray(t2) / np.linalg.norm(np.asarray(t2))
        np.testing.assert_allclose(t_dir, t2_dir, atol=1e-6)
        # Triangulated points match ground truth up to the scale gauge.
        scale = float(jnp.linalg.norm(t2))
        np.testing.assert_allclose(np.asarray(Xtri) * scale, np.asarray(X), atol=1e-5)


class TestRansac:
    def test_essential_with_outliers(self, rng):
        X, R2, t2, pn1, pn2 = _two_view(rng, n=80, noise=1e-4)
        pn2 = np.array(pn2)
        out_idx = rng.choice(80, size=20, replace=False)
        pn2[out_idx] += rng.uniform(0.05, 0.3, size=(20, 2))
        pn2 = jnp.asarray(pn2)

        def fit(idx, w):
            return epipolar.eight_point(pn1, pn2, w=w, essential=True)

        def score(E):
            return epipolar.sampson_distance(E, pn1, pn2)

        res = ransac.ransac(
            jax.random.PRNGKey(0), 80, fit, score,
            sample_size=8, n_hypotheses=256, threshold=1e-6,
        )
        inl = np.asarray(res.inliers)
        assert not np.any(inl[out_idx])
        assert inl.sum() >= 55
        R, t, _, _ = epipolar.select_pose(
            res.model, pn1, pn2, w=res.inliers.astype(pn1.dtype)
        )
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-2)


class TestPnP:
    def test_pnp_exact(self, rng):
        X = jnp.asarray(rng.uniform(-2, 2, size=(30, 3)) + np.array([0, 0, 6.0]))
        R = so3.exp(jnp.asarray(rng.normal(size=3) * 0.4))
        t = jnp.asarray([0.3, -0.2, 8.0])
        p = X @ R.T + t
        pn = p[:, :2] / p[:, 2:]
        R_est, t_est = pnp.pnp(X, pn)
        np.testing.assert_allclose(np.asarray(R_est), np.asarray(R), atol=1e-8)
        np.testing.assert_allclose(np.asarray(t_est), np.asarray(t), atol=1e-7)

    def test_pnp_ransac_outliers(self, rng):
        X = jnp.asarray(rng.uniform(-2, 2, size=(60, 3)) + np.array([0, 0, 6.0]))
        R = so3.exp(jnp.asarray(rng.normal(size=3) * 0.3))
        t = jnp.asarray([0.1, 0.4, 7.0])
        p = X @ R.T + t
        pn = np.array(p[:, :2] / p[:, 2:])
        pn += rng.normal(scale=5e-4, size=pn.shape)
        out_idx = rng.choice(60, size=15, replace=False)
        pn[out_idx] += rng.uniform(0.05, 0.2, size=(15, 2))
        R_est, t_est, inl = pnp.pnp_ransac(
            jax.random.PRNGKey(1), X, jnp.asarray(pn), threshold=1e-5
        )
        assert not np.any(np.asarray(inl)[out_idx])
        np.testing.assert_allclose(np.asarray(R_est), np.asarray(R), atol=5e-3)
        np.testing.assert_allclose(np.asarray(t_est), np.asarray(t), atol=5e-2)


class TestP3P:
    def _random_quartics(self, rng, n):
        """Quartics covering all real-root structures (4/2/0 real roots,
        repeated roots), random leading scale."""
        cs = []
        for i in range(n):
            kind = i % 4
            if kind == 0:
                c = np.poly(rng.normal(size=4) * 3)
            elif kind == 1:
                z = rng.normal() + 1j * abs(rng.normal())
                c = np.real(np.poly(
                    [rng.normal() * 3, rng.normal() * 3, z, np.conj(z)]
                ))
            elif kind == 2:
                z1 = rng.normal() + 1j * abs(rng.normal())
                z2 = rng.normal() + 1j * abs(rng.normal())
                c = np.real(np.poly([z1, np.conj(z1), z2, np.conj(z2)]))
            else:  # repeated real root
                r0 = rng.normal() * 3
                c = np.poly([r0, r0, rng.normal() * 3, rng.normal() * 3])
            cs.append(c * (rng.normal() + 0.1))
        return np.stack(cs)

    def test_quartic_real_roots(self, rng):
        """Every real root of a random quartic is recovered by a valid slot
        (cross-checked against numpy.roots); real-arithmetic path only."""
        C = self._random_quartics(rng, 400)
        roots, valid = jax.jit(jax.vmap(p3p.solve_quartic))(jnp.asarray(C))
        roots, valid = np.asarray(roots), np.asarray(valid)
        missed = 0
        for i in range(C.shape[0]):
            true = np.roots(C[i])
            true_real = true[np.abs(true.imag) < 1e-9].real
            mine = roots[i][valid[i]]
            for tr in true_real:
                err = np.min(np.abs(mine - tr)) if mine.size else np.inf
                if err / (1.0 + abs(tr)) > 1e-6:
                    missed += 1
        # Repeated-root discriminants can round to a miss; everything else
        # must be exact to 1e-6 relative.
        assert missed <= 1, missed

    def test_p3p_exact(self, rng):
        X = jnp.asarray(rng.uniform(-2, 2, size=(3, 3)) + np.array([0, 0, 6.0]))
        R = so3.exp(jnp.asarray(rng.normal(size=3) * 0.4))
        t = jnp.asarray([0.3, -0.2, 8.0])
        p = X @ R.T + t
        pn = p[:, :2] / p[:, 2:]
        Rs, ts = p3p.p3p(X, pn)
        errs = [
            float(jnp.linalg.norm(Rs[k] - R) + jnp.linalg.norm(ts[k] - t))
            for k in range(4)
            if bool(jnp.all(jnp.isfinite(Rs[k])))
        ]
        assert errs and min(errs) < 1e-6, errs

    def test_p3p_ransac_outliers(self, rng):
        X = np.asarray(rng.uniform(-2, 2, (100, 3)))
        X[:, 2] += 6.0
        R = so3.exp(jnp.asarray([0.2, -0.1, 0.3]))
        t = jnp.asarray([0.1, 0.2, 0.5])
        pc = np.asarray(X @ np.asarray(R).T + np.asarray(t))
        pn = pc[:, :2] / pc[:, 2:3]
        out = rng.random(100) < 0.5
        pn[out] += rng.normal(0, 0.3, (int(out.sum()), 2))
        R_est, t_est, inl = p3p.p3p_ransac(
            jax.random.PRNGKey(1), jnp.asarray(X), jnp.asarray(pn),
            threshold=1e-8,
        )
        rot_err = float(jnp.linalg.norm(so3.log(R_est @ R.T)))
        assert rot_err < 1e-3
        np.testing.assert_allclose(np.asarray(t_est), np.asarray(t), atol=1e-3)
        inl = np.asarray(inl)
        assert not np.any(inl[out])
        assert inl.sum() >= int((~out).sum()) - 2


class TestFeatures:
    def _image_with_corners(self, rng, n=10):
        img = np.zeros((120, 160))
        pts = np.stack(
            [rng.integers(20, 140, n), rng.integers(20, 100, n)], axis=-1
        )
        for x, y in pts:
            img[y:y + 9, x:x + 9] = rng.uniform(0.5, 1.0)
        img += rng.normal(scale=0.01, size=img.shape)
        return jnp.asarray(img), pts

    def test_harris_finds_square_corners(self, rng):
        img, pts = self._image_with_corners(rng)
        kps = features.detect_harris(img, n_keypoints=64)
        found = np.asarray(kps.xy)[np.asarray(kps.valid)]
        # Each square contributes 4 corners; every planted square must have
        # at least one detection within 3 px of one of its corners.
        for x, y in pts:
            corners = np.array(
                [[x, y], [x + 8, y], [x, y + 8], [x + 8, y + 8]]
            )
            d = np.min(
                np.linalg.norm(found[:, None] - corners[None], axis=-1)
            )
            assert d <= 3.0

    def test_match_shifted_image(self, rng):
        img, _ = self._image_with_corners(rng, n=14)
        img = np.asarray(img)
        shift = 7
        img2 = np.roll(img, shift, axis=1)
        kp1, d1 = features.detect_and_describe(jnp.asarray(img), 64)
        kp2, d2 = features.detect_and_describe(jnp.asarray(img2), 64)
        m = match.match_descriptors(d1, d2, valid1=kp1.valid, valid2=kp2.valid)
        ok = np.asarray(m.valid)
        assert ok.sum() >= 10
        xy1 = np.asarray(kp1.xy)[np.asarray(m.idx1)[ok]]
        xy2 = np.asarray(kp2.xy)[np.asarray(m.idx2)[ok]]
        dx = xy2[:, 0] - xy1[:, 0]
        dy = xy2[:, 1] - xy1[:, 1]
        # Matches must recover the planted shift (modulo the roll wrap).
        good = (np.abs(dy) < 1.5) & (np.abs((dx - shift) % img.shape[1]) < 1.5)
        assert good.mean() > 0.9
