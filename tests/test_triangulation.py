"""Synthetic-scene triangulation tests (OpenGV test pattern,
reference src/libs/opengv/test/test_triangulation.cpp)."""

import jax.numpy as jnp
import numpy as np

from alvaar_tpu.geom import SE3, so3_exp, triangulate_midpoint
from alvaar_tpu.geom.triangulation import triangulation_depths


def synth_scene(rng, n=128, baseline=0.5, noise=0.0):
    """Ground-truth points + two cameras; returns bearings in each frame."""
    pts_c0 = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n, 3)).astype(np.float32)
    phi = rng.normal(size=3) * 0.1
    t = np.array([baseline, 0.02, -0.01], np.float32)
    T_c0_c1 = SE3(so3_exp(jnp.asarray(phi, jnp.float32)), jnp.asarray(t))
    pts_c1 = T_c0_c1.inverse().apply(jnp.asarray(pts_c0))
    f0 = pts_c0 / np.linalg.norm(pts_c0, axis=-1, keepdims=True)
    f1 = np.asarray(pts_c1) / np.linalg.norm(np.asarray(pts_c1), axis=-1, keepdims=True)
    if noise:
        f0 = f0 + rng.normal(size=f0.shape) * noise
        f1 = f1 + rng.normal(size=f1.shape) * noise
        f0 /= np.linalg.norm(f0, axis=-1, keepdims=True)
        f1 /= np.linalg.norm(f1, axis=-1, keepdims=True)
    return jnp.asarray(pts_c0), T_c0_c1, jnp.asarray(f0, jnp.float32), jnp.asarray(f1, jnp.float32)


class TestTriangulation:
    def test_exact(self, rng):
        pts, T, f0, f1 = synth_scene(rng)
        rec = triangulate_midpoint(T, f0, f1)
        np.testing.assert_allclose(rec, pts, atol=1e-2, rtol=1e-3)

    def test_noisy(self, rng):
        pts, T, f0, f1 = synth_scene(rng, noise=1e-4)
        rec = triangulate_midpoint(T, f0, f1)
        err = np.linalg.norm(np.asarray(rec - pts), axis=-1)
        assert np.median(err) < 0.05

    def test_depths_positive(self, rng):
        pts, T, f0, f1 = synth_scene(rng)
        _, d0, d1 = triangulation_depths(T, f0, f1)
        assert bool(jnp.all(d0 > 0)) and bool(jnp.all(d1 > 0))

    def test_degenerate_parallel_rays_finite(self):
        T = SE3.identity()
        f = jnp.asarray([[0.0, 0.0, 1.0]])
        rec = triangulate_midpoint(T, f, f)
        assert bool(jnp.all(jnp.isfinite(rec)))
