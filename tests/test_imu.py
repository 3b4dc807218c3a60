"""IMU capture layer: orientation math, world alignment, sample queue,
wire-format marshalling (reference examples/public/assets/imu.js +
src/system.js:143-156)."""

import math
import threading

import numpy as np
import pytest

from alvaar_tpu.io.imu import (ImuCapture, ImuSample, pack_imu_buffer,
                               quat_from_axis_angle, quat_from_euler_zxy,
                               quat_mul, screen_orientation_angle,
                               unpack_imu_buffer, world_transform)


def ref_euler_zxy(x, y, z):
    """The reference's fromEuler(..., 'ZXY') formula verbatim
    (imu.js:49-54), returned as (w, x, y, z)."""
    c1, c2, c3 = math.cos(x / 2), math.cos(y / 2), math.cos(z / 2)
    s1, s2, s3 = math.sin(x / 2), math.sin(y / 2), math.sin(z / 2)
    return np.array([c1 * c2 * c3 - s1 * s2 * s3,
                     s1 * c2 * c3 - c1 * s2 * s3,
                     c1 * s2 * c3 + s1 * c2 * s3,
                     c1 * c2 * s3 + s1 * s2 * c3])


class TestQuaternionMath:
    def test_euler_zxy_matches_reference_formula(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            x, y, z = rng.uniform(-math.pi, math.pi, 3)
            np.testing.assert_allclose(quat_from_euler_zxy(x, y, z),
                                       ref_euler_zxy(x, y, z), atol=1e-12)

    def test_euler_zxy_is_z_then_x_then_y_intrinsic(self):
        x, y, z = 0.3, -0.7, 1.1
        qz = quat_from_axis_angle((0, 0, 1), z)
        qx = quat_from_axis_angle((1, 0, 0), x)
        qy = quat_from_axis_angle((0, 1, 0), y)
        expect = quat_mul(quat_mul(qz, qx), qy)
        np.testing.assert_allclose(quat_from_euler_zxy(x, y, z), expect,
                                   atol=1e-12)

    def test_world_transforms(self):
        # iOS: -90 deg about x (imu.js:170-171)
        np.testing.assert_allclose(
            world_transform("ios"),
            [math.cos(-math.pi / 4), math.sin(-math.pi / 4), 0, 0],
            atol=1e-12)
        # Android: +90 deg about y (imu.js:172)
        np.testing.assert_allclose(
            world_transform("android"),
            [math.cos(math.pi / 4), 0, math.sin(math.pi / 4), 0],
            atol=1e-12)
        np.testing.assert_allclose(world_transform("none"), [1, 0, 0, 0])
        with pytest.raises(ValueError):
            world_transform("vision_pro")

    def test_screen_orientation_angles(self):
        assert screen_orientation_angle("landscape_left") == 90
        assert screen_orientation_angle("landscape_right") == 270
        assert screen_orientation_angle("portrait") == 0


class TestImuCapture:
    def test_orientation_change_gate(self):
        cap = ImuCapture(platform="none")
        assert cap.push_orientation(10.0, 0.0, 0.0)
        q1 = cap.orientation.copy()
        # identical event: gated out (imu.js:182-185)
        assert not cap.push_orientation(10.0, 0.0, 0.0)
        np.testing.assert_array_equal(cap.orientation, q1)
        assert cap.push_orientation(10.0, 5.0, 0.0)

    def test_orientation_applies_world_transform(self):
        cap = ImuCapture(platform="ios")
        cap.push_orientation(30.0, -40.0, 120.0)
        d2r = math.pi / 180
        expect = quat_mul(world_transform("ios"),
                          quat_from_euler_zxy(30 * d2r, -40 * d2r, 120 * d2r))
        np.testing.assert_allclose(cap.orientation, expect, atol=1e-12)

    def test_motion_queue_drains_and_clears(self):
        cap = ImuCapture()
        for i in range(5):
            cap.push_motion(0.01 * i, (i, 0, 0), (0, 0, 9.0))
        got = cap.drain()
        assert len(got) == 5
        assert got[2].gyro[0] == 2
        assert cap.drain() == []

    def test_motion_queue_bounded_drop_oldest(self):
        cap = ImuCapture(max_samples=3)
        for i in range(7):
            cap.push_motion(float(i), (i, 0, 0), (0, 0, 0))
        got = cap.drain()
        assert [s.timestamp for s in got] == [4.0, 5.0, 6.0]
        assert cap.dropped == 4

    def test_thread_safety_smoke(self):
        cap = ImuCapture(max_samples=10_000)
        def feed():
            for i in range(500):
                cap.push_motion(i, (0, 0, 0), (0, 0, 0))
                cap.push_orientation(i % 90, 0, 0)
        ts = [threading.Thread(target=feed) for _ in range(4)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert len(cap.drain()) + cap.dropped == 2000


class TestWireFormat:
    def test_pack_unpack_round_trip(self):
        q = np.array([0.5, 0.5, 0.5, 0.5])
        samples = [ImuSample(0.1 * i, np.array([i, 0, 1.0]),
                             np.array([0, i, 2.0])) for i in range(4)]
        buf = pack_imu_buffer(q, samples)
        # layout: [qw qx qy qz, n, (ts gx gy gz ax ay az)*n] (system.js:143-156)
        assert buf.shape == (5 + 7 * 4,)
        assert buf[4] == 4
        q2, s2 = unpack_imu_buffer(buf)
        np.testing.assert_array_equal(q2, q)
        assert len(s2) == 4
        np.testing.assert_array_equal(s2[3].gyro, samples[3].gyro)
        np.testing.assert_array_equal(s2[1].accel, samples[1].accel)

    def test_pack_caps_at_buffer_budget(self):
        samples = [ImuSample(float(i), np.zeros(3), np.zeros(3))
                   for i in range(60)]
        buf = pack_imu_buffer(np.array([1, 0, 0, 0]), samples)
        # 256-double heap buffer (system.js:66) → at most 35 samples
        assert buf.shape[0] <= 256
        assert buf[4] == 35


class TestEngineIntegration:
    def test_capture_feeds_find_camera_pose_with_imu(self):
        """The capture layer's orientation is consumable by the fused-pose
        API: rotation comes from the IMU quaternion (mirrored like the
        reference, system.cpp:67-70), translation from SLAM deltas."""
        from alvaar_tpu import AlvaAR, SlamConfig
        cfg = SlamConfig(width=128, height=96, cell_size=32, window_size=4,
                         max_landmarks=64, ransac_iters=8, ba_iters=1,
                         pyramid_levels=2, klt_iters=3,
                         min_init_keypoints=4, use_five_point=False,
                         use_homography_init=False)
        slam = AlvaAR(128, 96, fov=60.0, config=cfg)
        cap = ImuCapture(platform="android")
        cap.push_orientation(15.0, -5.0, 30.0)
        cap.push_motion(0.0, (0.1, 0, 0), (0, 0, 0.2))
        rng = np.random.default_rng(0)
        frame = rng.uniform(0, 255, (96, 128)).astype(np.float32)
        q, motion = cap.snapshot()
        T = slam.find_camera_pose_with_imu(frame, q, motion)
        assert T.shape == (4, 4)
        assert np.isfinite(T).all()
        cap.drain()
