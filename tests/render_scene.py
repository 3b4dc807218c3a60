"""Synthetic scene renderer for end-to-end SLAM tests.

Renders a two-depth textured world (near plane z=5 on the left, far plane
z=8 on the right — two planes so the essential-matrix bootstrap is not
planar-degenerate) by ray-plane intersection + bilinear texture lookup.
Ground-truth camera poses are known exactly, giving the golden-trajectory
harness the reference lacks (SURVEY §4: video.html eyeballing was the
reference's only validation)."""

import numpy as np

from alvaar_tpu.geom import SE3, so3_exp
import jax.numpy as jnp


def make_texture(rng, size=1024, octaves=5):
    tex = np.zeros((size, size), np.float32)
    for o in range(octaves):
        s = 2 ** (o + 2)
        small = rng.normal(size=(size // s + 2, size // s + 2)).astype(np.float32)
        idx = np.linspace(0, small.shape[0] - 1.001, size)
        i0 = idx.astype(int)
        f = idx - i0
        rows = small[i0] * (1 - f)[:, None] + small[i0 + 1] * f[:, None]
        tex += (rows[:, i0] * (1 - f)[None, :] + rows[:, i0 + 1] * f[None, :]) * (2.0 ** o)
    tex -= tex.min()
    tex *= 220.0 / tex.max()
    return tex + 20.0


class TwoPlaneScene:
    def __init__(self, rng, width=320, height=240, fov=60.0,
                 z_near=5.0, z_far=8.0, tex_scale=60.0):
        self.w, self.h = width, height
        self.z_near, self.z_far = z_near, z_far
        self.tex_scale = tex_scale
        self.tex_a = make_texture(rng)
        self.tex_b = make_texture(rng)
        f = (min(width, height) / 2.0) / np.tan(np.deg2rad(fov) / 2.0)
        self.fx = self.fy = f
        self.cx, self.cy = width / 2.0, height / 2.0
        self.fov = fov

    def _sample(self, tex, u, v):
        n = tex.shape[0]
        u = np.mod(u * self.tex_scale, n - 1.001)
        v = np.mod(v * self.tex_scale, n - 1.001)
        u0, v0 = u.astype(int), v.astype(int)
        fu, fv = u - u0, v - v0
        return (tex[v0, u0] * (1 - fv) * (1 - fu) + tex[v0, u0 + 1] * (1 - fv) * fu
                + tex[v0 + 1, u0] * fv * (1 - fu) + tex[v0 + 1, u0 + 1] * fv * fu)

    def render(self, T_wc: np.ndarray) -> np.ndarray:
        """Render the scene from camera-to-world pose T_wc (4x4)."""
        yy, xx = np.mgrid[0:self.h, 0:self.w]
        d_cam = np.stack([(xx - self.cx) / self.fx,
                          (yy - self.cy) / self.fy,
                          np.ones_like(xx, np.float32)], axis=-1)
        R, t = T_wc[:3, :3], T_wc[:3, 3]
        d_w = d_cam @ R.T
        o_w = t

        img = np.full((self.h, self.w), 50.0, np.float32)
        dz = d_w[..., 2]
        dz = np.where(np.abs(dz) < 1e-9, 1e-9, dz)
        # near plane (z = z_near) on world x < 0, far plane elsewhere
        t_near = (self.z_near - o_w[2]) / dz
        p_near = o_w + d_w * t_near[..., None]
        use_near = (t_near > 0.1) & (p_near[..., 0] < 0)
        t_far = (self.z_far - o_w[2]) / dz
        p_far = o_w + d_w * t_far[..., None]
        use_far = (t_far > 0.1) & ~use_near

        img = np.where(use_near,
                       self._sample(self.tex_a, p_near[..., 0], p_near[..., 1]),
                       img)
        img = np.where(use_far,
                       self._sample(self.tex_b, p_far[..., 0], p_far[..., 1]),
                       img)
        return img


def trajectory(n_frames, step=0.02, rot_step=0.002):
    """Sideways-dominant trajectory (good parallax for mono init).
    Returns [n, 4, 4] T_wc poses.

    Vectorized: ONE batched so3_exp/matrix device call instead of
    n_frames round-trips (each dispatch through the axon TPU tunnel
    costs ~0.5 s, which made this loop minutes of bench budget).
    Per-frame values are bit-identical to the loop form: so3_exp and
    quat_to_matrix are elementwise over the batch, and the float64
    intermediates below reproduce np.array([...], np.float32) casts."""
    i = np.arange(n_frames, dtype=np.float64)
    z = np.zeros(n_frames, np.float64)
    phis = np.stack([z, rot_step * i, z], axis=-1).astype(np.float32)
    q = so3_exp(jnp.asarray(phis))                            # [n, 4]
    R = np.asarray(SE3(q, jnp.zeros((n_frames, 3), np.float32)).matrix())
    T = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    T[:, :3, :3] = R[:, :3, :3]
    T[:, :3, 3] = np.stack(
        [step * i, 0.3 * step * i, 0.05 * step * i], axis=-1
    ).astype(np.float32)
    return T


def ate_rmse(est_t: np.ndarray, gt_t: np.ndarray) -> float:
    """Absolute trajectory error after similarity (sim3) alignment —
    monocular scale is arbitrary (reference visual_frontend.cpp:547)."""
    mu_e, mu_g = est_t.mean(0), gt_t.mean(0)
    e, g = est_t - mu_e, gt_t - mu_g
    cov = g.T @ e / len(e)
    U, S, Vt = np.linalg.svd(cov)
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    var_e = (e * e).sum() / len(e)
    s = np.trace(np.diag(S) @ D) / max(var_e, 1e-12)
    aligned = s * e @ R.T + mu_g
    return float(np.sqrt(((aligned - gt_t) ** 2).sum(axis=1).mean()))
