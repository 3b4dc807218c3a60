"""Pinhole camera with radial-tangential distortion — batched, differentiable.

TPU-native equivalent of the reference's CameraCalibration
(reference src/slam/src/camera_calibration.{hpp,cpp}): K = [fx, fy, cx, cy],
distortion (k1, k2, p1, p2), project/unproject, undistortion by fixed-point
iteration (replacing cv::undistortPoints, camera_calibration.cpp:57-72),
and an ROI border mask (camera_calibration.cpp:20-22).

All methods broadcast over leading batch dims and are jit/vmap/grad-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Camera(NamedTuple):
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    # radial-tangential distortion
    k1: jax.Array
    k2: jax.Array
    p1: jax.Array
    p2: jax.Array

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0,
               dtype=jnp.float32) -> "Camera":
        f = lambda v: jnp.asarray(v, dtype)
        return Camera(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(p1), f(p2))

    @staticmethod
    def from_fov(width: int, height: int, fov_deg: float = 45.0,
                 dtype=jnp.float32) -> "Camera":
        """Derive intrinsics from a diagonal-ish FoV guess, zero distortion —
        the JS-side default intrinsics (reference src/system.js:84-141:
        fx = fy = min over both axes of (half-size / tan(fov/2)))."""
        fov = jnp.deg2rad(jnp.asarray(fov_deg, dtype))
        fx = (width / 2.0) / jnp.tan(fov / 2.0)
        fy = (height / 2.0) / jnp.tan(fov / 2.0)
        f = jnp.minimum(fx, fy)
        return Camera.create(f, f, width / 2.0, height / 2.0, dtype=dtype)

    @property
    def has_distortion(self):
        return (self.k1 != 0) | (self.k2 != 0) | (self.p1 != 0) | (self.p2 != 0)

    # ------------------------------------------------------------------
    def _distort_normalized(self, xn):
        """Apply radtan distortion to normalized coords [..., 2]."""
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + self.k1 * r2 + self.k2 * r2 * r2
        xy = x * y
        xd = x * radial + 2.0 * self.p1 * xy + self.p2 * (r2 + 2.0 * x * x)
        yd = y * radial + self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * xy
        return jnp.stack([xd, yd], axis=-1)

    def project(self, x_cam):
        """Camera-frame points [..., 3] → undistorted pixels [..., 2]
        (reference projectCamToImage, camera_calibration.cpp:24-32)."""
        z = x_cam[..., 2:3]
        xn = x_cam[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        return self._k_apply(xn)

    def project_dist(self, x_cam):
        """Camera-frame points → distorted pixels (reference
        projectCamToImageDist via cv::projectPoints,
        camera_calibration.cpp:34-55)."""
        z = x_cam[..., 2:3]
        xn = x_cam[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        return self._k_apply(self._distort_normalized(xn))

    def _k_apply(self, xn):
        return jnp.stack(
            [self.fx * xn[..., 0] + self.cx, self.fy * xn[..., 1] + self.cy],
            axis=-1,
        )

    def _k_unapply(self, px):
        return jnp.stack(
            [(px[..., 0] - self.cx) / self.fx, (px[..., 1] - self.cy) / self.fy],
            axis=-1,
        )

    def undistort(self, px, iters: int = 5):
        """Distorted pixels [..., 2] → undistorted pixels, by the same
        fixed-point iteration cv::undistortPoints uses (reference
        camera_calibration.cpp:57-72).  ``iters`` is static."""
        xd = self._k_unapply(px)

        def body(_, xu):
            # invert: xd = distort(xu)  ⇒  xu ← (xd - tangential(xu)) / radial(xu)
            x, y = xu[..., 0], xu[..., 1]
            r2 = x * x + y * y
            radial = 1.0 + self.k1 * r2 + self.k2 * r2 * r2
            dx = 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
            dy = self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
            return jnp.stack(
                [(xd[..., 0] - dx) / radial, (xd[..., 1] - dy) / radial], axis=-1
            )

        xu = jax.lax.fori_loop(0, iters, body, xd)
        return self._k_apply(xu)

    def bearing(self, px_undist):
        """Undistorted pixels [..., 2] → unit bearing vectors [..., 3]
        (reference frame.cpp:101-109: normalize(K⁻¹ [u, v, 1]))."""
        xn = self._k_unapply(px_undist)
        v = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def in_roi(self, px, width: int, height: int, border: int = 20):
        """Inside-image-with-border mask (reference
        camera_calibration.cpp:20-22 setROIMask; feature_tracker.cpp inBorder)."""
        x, y = px[..., 0], px[..., 1]
        return (x >= border) & (x < width - border) & (y >= border) & (y < height - border)
