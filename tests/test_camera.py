import jax.numpy as jnp
import numpy as np

from alvaar_tpu.geom import Camera


def make_cam():
    return Camera.create(458.0, 457.0, 367.0, 248.0,
                         k1=-0.28, k2=0.07, p1=2e-4, p2=1.8e-5)


class TestCamera:
    def test_project_unproject_pinhole(self, rng):
        cam = Camera.create(500.0, 500.0, 320.0, 240.0)
        x = jnp.asarray(rng.uniform(-1, 1, size=(64, 3)), jnp.float32)
        x = x.at[:, 2].set(jnp.abs(x[:, 2]) + 1.0)
        px = cam.project(x)
        bv = cam.bearing(px)
        xn = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        np.testing.assert_allclose(bv, xn, atol=1e-5)

    def test_undistort_inverts_distortion(self, rng):
        cam = make_cam()
        x = jnp.asarray(rng.uniform(-0.4, 0.4, size=(128, 3)), jnp.float32)
        x = x.at[:, 2].set(1.0)
        px_undist = cam.project(x)
        px_dist = cam.project_dist(x)
        recovered = cam.undistort(px_dist, iters=8)
        np.testing.assert_allclose(recovered, px_undist, atol=0.05)

    def test_zero_distortion_identity(self, rng):
        cam = Camera.create(500.0, 500.0, 320.0, 240.0)
        px = jnp.asarray(rng.uniform(0, 640, size=(32, 2)), jnp.float32)
        np.testing.assert_allclose(cam.undistort(px), px, atol=1e-4)

    def test_from_fov(self):
        cam = Camera.from_fov(640, 480, 45.0)
        # min-axis rule (reference system.js:101-123)
        f = (480 / 2.0) / np.tan(np.deg2rad(45.0) / 2.0)
        np.testing.assert_allclose(cam.fx, f, rtol=1e-5)
        np.testing.assert_allclose(cam.cx, 320.0)
        np.testing.assert_allclose(cam.cy, 240.0)

    def test_roi_mask(self):
        cam = Camera.from_fov(640, 480)
        px = jnp.asarray([[10.0, 100.0], [100.0, 100.0], [630.0, 100.0],
                          [100.0, 470.0]])
        mask = cam.in_roi(px, 640, 480, border=20)
        np.testing.assert_array_equal(mask, [False, True, False, False])
