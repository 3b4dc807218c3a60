"""Synthetic-geometry fixtures for solver tests (OpenGV test pattern,
reference src/libs/opengv/test/random_generators.cpp)."""

import jax.numpy as jnp
import numpy as np

from alvaar_tpu.geom import SE3, Camera, so3_exp


def random_pose(rng, rot_scale=0.5, t_scale=1.0, dtype=jnp.float32):
    phi = rng.normal(size=3) * rot_scale
    t = rng.normal(size=3) * t_scale
    return SE3(so3_exp(jnp.asarray(phi, dtype)), jnp.asarray(t, dtype))


def scene_points(rng, n, depth_range=(4.0, 10.0), spread=3.0):
    pts = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(*depth_range, size=n)
    return jnp.asarray(pts)


def observe(pose_cw: SE3, cam: Camera, points_w, noise_px=0.0, rng=None):
    """Project world points into a camera; returns (px, bearings, in_front)."""
    Xc = pose_cw.apply(points_w)
    px = cam.project(Xc)
    if noise_px and rng is not None:
        px = px + jnp.asarray(rng.normal(size=px.shape) * noise_px, px.dtype)
    bearings = cam.bearing(px)
    return px, bearings, Xc[..., 2] > 0.1


def add_outliers(rng, px, frac, width=640, height=480):
    """Replace a fraction of observations with uniform garbage."""
    n = px.shape[0]
    n_out = int(n * frac)
    idx = rng.choice(n, size=n_out, replace=False)
    garbage = rng.uniform([0, 0], [width, height], size=(n_out, 2))
    px = np.asarray(px).copy()
    px[idx] = garbage
    is_outlier = np.zeros(n, bool)
    is_outlier[idx] = True
    return jnp.asarray(px, jnp.float32), is_outlier


def pose_error(a: SE3, b: SE3):
    """(rotation deg, translation) error between two poses."""
    dq = a.compose(b.inverse())
    ang = float(2 * np.arccos(np.clip(abs(float(dq.q[0])), 0, 1)) * 180 / np.pi)
    dt = float(jnp.linalg.norm(a.t - b.t))
    return ang, dt
