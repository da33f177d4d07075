import numpy as np
import jax.numpy as jnp
import pytest

from esvo_tpu.geometry import se3
from esvo_tpu.geometry import camera as cam


def _random_rotation(rng):
    # rotation from random quaternion
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    return np.asarray(se3.quat_to_rot(jnp.asarray(q)))


class TestCayley:
    def test_cayley_rot_roundtrip(self):
        rng = np.random.default_rng(0)
        c = rng.standard_normal((16, 3)) * 0.3
        R = se3.cayley_to_rot(jnp.asarray(c))
        c2 = se3.rot_to_cayley(R)
        np.testing.assert_allclose(np.asarray(c2), c, atol=1e-10)

    def test_cayley_is_rotation(self):
        rng = np.random.default_rng(1)
        c = rng.standard_normal((8, 3))
        R = np.asarray(se3.cayley_to_rot(jnp.asarray(c)))
        for r in R:
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
            assert np.linalg.det(r) > 0

    def test_cayley_zero_is_identity(self):
        R = np.asarray(se3.cayley_to_rot(jnp.zeros(3)))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-15)

    def test_reference_formula_values(self):
        # independent evaluation of the closed form
        # (reference: esvo_core/src/tools/cayley.cpp:3-21)
        c = np.array([0.1, -0.2, 0.3])
        scale = 1 + np.sum(c**2)
        expected = np.array([
            [1 + c[0]**2 - c[1]**2 - c[2]**2,
             2 * (c[0] * c[1] - c[2]), 2 * (c[0] * c[2] + c[1])],
            [2 * (c[0] * c[1] + c[2]),
             1 - c[0]**2 + c[1]**2 - c[2]**2, 2 * (c[1] * c[2] - c[0])],
            [2 * (c[0] * c[2] - c[1]), 2 * (c[1] * c[2] + c[0]),
             1 - c[0]**2 - c[1]**2 + c[2]**2],
        ]) / scale
        np.testing.assert_allclose(
            np.asarray(se3.cayley_to_rot(jnp.asarray(c))), expected,
            atol=1e-14)


class TestQuat:
    def test_quat_rot_roundtrip(self):
        rng = np.random.default_rng(2)
        q = rng.standard_normal((32, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q *= np.where(q[:, 3:4] < 0, -1.0, 1.0)
        R = se3.quat_to_rot(jnp.asarray(q))
        q2 = np.asarray(se3.rot_to_quat(R))
        np.testing.assert_allclose(q2, q, atol=1e-9)

    def test_rot_to_quat_near_identity_and_pi(self):
        for axis in np.eye(3):
            for angle in [0.0, 1e-8, np.pi - 1e-6, np.pi]:
                K = np.array([[0, -axis[2], axis[1]],
                              [axis[2], 0, -axis[0]],
                              [-axis[1], axis[0], 0]])
                R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
                q = np.asarray(se3.rot_to_quat(jnp.asarray(R)))
                R2 = np.asarray(se3.quat_to_rot(jnp.asarray(q)))
                np.testing.assert_allclose(R2, R, atol=1e-7)


class TestSlerp:
    def test_endpoints(self):
        rng = np.random.default_rng(3)
        q0 = rng.standard_normal(4)
        q0 /= np.linalg.norm(q0)
        q1 = rng.standard_normal(4)
        q1 /= np.linalg.norm(q1)
        r0 = np.asarray(se3.slerp(jnp.asarray(q0), jnp.asarray(q1), 0.0))
        r1 = np.asarray(se3.slerp(jnp.asarray(q0), jnp.asarray(q1), 1.0))
        np.testing.assert_allclose(np.abs(np.dot(r0, q0)), 1.0, atol=1e-12)
        np.testing.assert_allclose(np.abs(np.dot(r1, q1)), 1.0, atol=1e-12)

    def test_midpoint_angle(self):
        # slerp half way between I and a rotation by theta about z is theta/2
        theta = 0.8
        q0 = np.array([0.0, 0, 0, 1])
        q1 = np.array([0.0, 0, np.sin(theta / 2), np.cos(theta / 2)])
        qm = np.asarray(se3.slerp(jnp.asarray(q0), jnp.asarray(q1), 0.5))
        expected = np.array([0.0, 0, np.sin(theta / 4), np.cos(theta / 4)])
        np.testing.assert_allclose(qm, expected, atol=1e-12)


class TestSE3:
    def test_inverse_compose(self):
        rng = np.random.default_rng(4)
        R = _random_rotation(rng)
        t = rng.standard_normal(3)
        T = np.asarray(se3.se3_matrix(jnp.asarray(R), jnp.asarray(t)))
        Tinv = np.asarray(se3.se3_inverse(jnp.asarray(T)))
        np.testing.assert_allclose(T @ Tinv, np.eye(4), atol=1e-12)

    def test_transform_points(self):
        rng = np.random.default_rng(5)
        R = _random_rotation(rng)
        t = rng.standard_normal(3)
        T = np.asarray(se3.se3_matrix(jnp.asarray(R), jnp.asarray(t)))
        p = rng.standard_normal((10, 3))
        out = np.asarray(se3.transform_points(jnp.asarray(T), jnp.asarray(p)))
        np.testing.assert_allclose(out, (R @ p.T).T + t, atol=1e-12)

    def test_orthonormalize(self):
        rng = np.random.default_rng(6)
        R = _random_rotation(rng)
        noisy = R + 1e-3 * rng.standard_normal((3, 3))
        R2 = np.asarray(se3.orthonormalize_rotation(jnp.asarray(noisy)))
        np.testing.assert_allclose(R2 @ R2.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R2) > 0
        assert np.abs(R2 - R).max() < 5e-3

    def test_interpolate_pose_endpoints_and_mid(self):
        rng = np.random.default_rng(7)
        T0 = np.asarray(se3.se3_matrix(jnp.asarray(_random_rotation(rng)),
                                       jnp.asarray(rng.standard_normal(3))))
        T1 = np.asarray(se3.se3_matrix(jnp.asarray(_random_rotation(rng)),
                                       jnp.asarray(rng.standard_normal(3))))
        a = np.asarray(se3.interpolate_pose(0.0, jnp.asarray(T0), 1.0,
                                            jnp.asarray(T1), 0.0))
        b = np.asarray(se3.interpolate_pose(0.0, jnp.asarray(T0), 1.0,
                                            jnp.asarray(T1), 1.0))
        np.testing.assert_allclose(a, T0, atol=1e-9)
        np.testing.assert_allclose(b, T1, atol=1e-9)
        m = np.asarray(se3.interpolate_pose(0.0, jnp.asarray(T0), 1.0,
                                            jnp.asarray(T1), 0.5))
        np.testing.assert_allclose(m[:3, 3], 0.5 * (T0[:3, 3] + T1[:3, 3]),
                                   atol=1e-12)

    def test_interpolate_pose_table(self):
        times = jnp.asarray(np.array([0.0, 1.0, 2.0, 3.0]))
        trans = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0.0]])
        poses = jnp.asarray(
            np.stack([np.block([[np.eye(3), t[:, None]], [np.zeros((1, 3)), 1]])
                      for t in trans]))
        q = jnp.asarray(np.array([0.5, 1.5, 2.25, -1.0, 10.0]))
        out = np.asarray(se3.interpolate_pose_table(times, poses, q))
        np.testing.assert_allclose(out[:, 0, 3], [0.5, 1.5, 2.25, 0.0, 3.0],
                                   atol=1e-12)


class TestCamera:
    def test_ideal_camera_lut_is_identity(self):
        c = cam.make_ideal_camera(32, 24, 40.0, 40.0, 16.0, 12.0,
                                  dtype=jnp.float64)
        gx, gy = np.meshgrid(np.arange(32), np.arange(24))
        np.testing.assert_allclose(np.asarray(c.lut[..., 0]), gx, atol=1e-9)
        np.testing.assert_allclose(np.asarray(c.lut[..., 1]), gy, atol=1e-9)
        np.testing.assert_allclose(np.asarray(c.inv_map[..., 0]), gx,
                                   atol=1e-9)
        assert bool(np.all(np.asarray(c.mask)))

    def test_cam_world_roundtrip_left(self):
        c = cam.make_ideal_camera(64, 48, 50.0, 52.0, 32.0, 24.0,
                                  dtype=jnp.float64)
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.uniform(0, 63, size=(20, 2)))
        inv_d = jnp.asarray(rng.uniform(0.2, 2.0, size=(20,)))
        p = cam.cam_to_world(c.params.P, x, inv_d)
        np.testing.assert_allclose(np.asarray(p[:, 2]),
                                   1.0 / np.asarray(inv_d), atol=1e-9)
        x2 = cam.world_to_cam(c.params.P, p)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-9)

    def test_cam_world_roundtrip_right_with_baseline(self):
        # right camera P has P[0,3] = -fx*b; roundtrip must still hold
        b = 0.15
        fx = 50.0
        c = cam.make_ideal_camera(64, 48, fx, 50.0, 32.0, 24.0, tx=-fx * b,
                                  dtype=jnp.float64)
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.uniform(5, 58, size=(20, 2)))
        inv_d = jnp.asarray(rng.uniform(0.2, 2.0, size=(20,)))
        p = cam.cam_to_world(c.params.P, x, inv_d)
        x2 = cam.world_to_cam(c.params.P, p)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-9)

    def test_distort_undistort_inverse_plumb_bob(self):
        K = jnp.asarray(np.array([[196.6, 0, 105.0], [0, 196.7, 72.5],
                                  [0, 0, 1.0]]))
        D = jnp.asarray(np.array([-0.33, 0.11, -0.0014, -0.00046]))
        R = jnp.asarray(np.eye(3))
        P = jnp.asarray(np.array([[156.9, 0, 108.2, 0], [0, 156.9, 78.4, 0],
                                  [0, 0, 1, 0.0]]))
        params = cam.PinholeParams(K=K, D=D, R=R, P=P, width=240, height=180,
                                   model="plumb_bob")
        rng = np.random.default_rng(10)
        pts = jnp.asarray(rng.uniform(40, 140, size=(50, 2)))
        rect = cam.undistort_points(params, pts)
        back = cam.distort_points(params, rect)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                                   atol=1e-6)

    def test_distort_undistort_inverse_equidistant(self):
        K = jnp.asarray(np.array([[200.0, 0, 120.0], [0, 200.0, 90.0],
                                  [0, 0, 1.0]]))
        D = jnp.asarray(np.array([-0.05, 0.01, -0.002, 0.0005]))
        R = jnp.asarray(np.eye(3))
        P = jnp.asarray(np.array([[180.0, 0, 120.0, 0], [0, 180.0, 90.0, 0],
                                  [0, 0, 1, 0.0]]))
        params = cam.PinholeParams(K=K, D=D, R=R, P=P, width=240, height=180,
                                   model="equidistant")
        rng = np.random.default_rng(11)
        pts = jnp.asarray(rng.uniform(30, 150, size=(50, 2)))
        rect = cam.undistort_points(params, pts)
        back = cam.distort_points(params, rect)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                                   atol=1e-6)

    def test_load_reference_rig(self):
        import os
        calib = "/root/reference/esvo_core/calib/rpg"
        if not os.path.isdir(calib):
            pytest.skip("reference calib not available")
        rig = cam.load_rig(calib, dtype=jnp.float64)
        # baseline of the rpg DAVIS240C rig is ~14.8 cm
        assert 0.13 < float(rig.baseline) < 0.16
        # masks must keep a usable interior region
        assert float(jnp.mean(rig.left.mask.astype(jnp.float32))) > 0.5
        # LUT maps the principal point region near itself (sanity)
        lut = np.asarray(rig.left.lut)
        assert np.isfinite(lut).all()

    def test_remap_bilinear_identity_and_shift(self):
        rng = np.random.default_rng(12)
        img = jnp.asarray(rng.uniform(0, 255, size=(16, 20)))
        grid = np.stack(np.meshgrid(np.arange(20.0), np.arange(16.0)),
                        axis=-1)
        out = cam.remap_bilinear(img, jnp.asarray(grid))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-12)
        # half-pixel x-shift equals the mean of horizontal neighbors
        shifted = cam.remap_bilinear(img, jnp.asarray(grid + [0.5, 0.0]))
        expect = 0.5 * (np.asarray(img)[:, :-1] + np.asarray(img)[:, 1:])
        np.testing.assert_allclose(np.asarray(shifted)[:, :-1], expect,
                                   atol=1e-12)


class TestPoseRows:
    """SoA (12, N) pose-rows layout (se3.rows_*), the TPU-native carrier
    of per-event transforms inside depth_refinement.solve."""

    def _random_transforms(self, n, rng):
        Ts = []
        for _ in range(n):
            w = rng.normal(size=3)
            R = np.asarray(se3.so3_exp(jnp.asarray(w)))
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = rng.normal(size=3)
            Ts.append(T)
        return np.stack(Ts)

    def test_rows_roundtrip(self):
        rng = np.random.default_rng(3)
        T = self._random_transforms(17, rng)
        rows = se3.rows_from_matrices(jnp.asarray(T))
        assert rows.shape == (12, 17)
        back = np.asarray(se3.matrices_from_rows(rows))
        np.testing.assert_allclose(back, T, atol=1e-12)
        # rows[4*i + j] == T[:, i, j]
        for i in range(3):
            for j in range(4):
                np.testing.assert_allclose(np.asarray(rows[4 * i + j]),
                                           T[:, i, j])

    def test_rows_apply_matches_matmul(self):
        rng = np.random.default_rng(4)
        T = self._random_transforms(33, rng)
        p = rng.normal(size=(33, 3))
        rows = se3.rows_from_matrices(jnp.asarray(T))
        qx, qy, qz = se3.rows_apply(rows, jnp.asarray(p[:, 0]),
                                    jnp.asarray(p[:, 1]),
                                    jnp.asarray(p[:, 2]))
        expect = np.einsum("nij,nj->ni", T[:, :3, :3], p) + T[:, :3, 3]
        np.testing.assert_allclose(np.stack([qx, qy, qz], 1), expect,
                                   atol=1e-12)
