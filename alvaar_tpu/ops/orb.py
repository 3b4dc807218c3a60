"""Oriented binary descriptors (ORB-style) — batched over keypoints.

TPU-native equivalent of the reference's descriptor path
(reference src/slam/src/feature_extractor.cpp:179-209 calling cv::ORB at a
single scale; OpenCV hot loops ICAngles / computeOrbDescriptors at
modules/features2d/src/orb.cpp:181,220):

  * orientation = intensity-centroid angle over a 31-diameter circular patch,
  * descriptor  = 256 steered binary intensity comparisons on the blurred
    image, packed into 8 uint32 words.

Divergence (document-and-diverge): the 256 comparison-point pairs are OUR
OWN deterministic pattern — BRIEF-style Gaussian pairs from a fixed seed —
not OpenCV's learned ``bit_pattern_31_`` table.  Bit-level ORB parity is
neither required nor useful here: the engine only ever matches its own
descriptors against its own (reference map_point.cpp:204-222,
mapper.cpp:354-588), so any discriminative pattern with the same geometry
works; a fresh pattern also avoids copying reference code.

Everything is gather + compare: N keypoints × 256 pairs × 2 samples as one
[N, 512] bilinear gather.  The comparison itself is branch-free and packs
via bit shifts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from alvaar_tpu.ops.image import bilinear_sample, _sep_conv

PATCH_RADIUS = 15  # 31-diameter patch (reference orb.cpp HARRIS patch)
DESC_BITS = 256
DESC_WORDS = DESC_BITS // 32


def _make_pattern(seed: int = 12345) -> np.ndarray:
    """Deterministic BRIEF pattern: [256, 2, 2] (pair, point, xy) offsets,
    Gaussian sigma = patch/5 (Calonder et al. BRIEF G-II), clipped to the
    patch circle."""
    rng = np.random.default_rng(seed)
    sigma = (2 * PATCH_RADIUS + 1) / 5.0
    pts = rng.normal(0.0, sigma, size=(DESC_BITS, 2, 2))
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    too_far = norm > (PATCH_RADIUS - 1)
    pts = np.where(too_far, pts * (PATCH_RADIUS - 1) / np.maximum(norm, 1e-9), pts)
    return pts.astype(np.float32)


_PATTERN = _make_pattern()  # [256, 2, 2]


def _circular_offsets():
    d = np.arange(-PATCH_RADIUS, PATCH_RADIUS + 1)
    oy, ox = np.meshgrid(d, d, indexing="ij")
    mask = ox * ox + oy * oy <= PATCH_RADIUS * PATCH_RADIUS
    return (ox[mask].astype(np.float32), oy[mask].astype(np.float32))


_CIRC_OX, _CIRC_OY = _circular_offsets()


def ic_angle(img, xy, valid=None):
    """Intensity-centroid orientation (reference orb.cpp:181 ICAngles):
    angle = atan2(m01, m10) over the circular 31-patch.  Returns radians
    [N]."""
    ox = jnp.asarray(_CIRC_OX)
    oy = jnp.asarray(_CIRC_OY)
    sample_xy = xy[:, None, :] + jnp.stack([ox, oy], axis=-1)[None]
    vals = bilinear_sample(img, sample_xy)  # [N, P]
    m10 = jnp.sum(vals * ox[None], axis=-1)
    m01 = jnp.sum(vals * oy[None], axis=-1)
    return jnp.arctan2(m01, m10)


def describe(img, xy, valid, *, blur: bool = True):
    """Compute oriented 256-bit descriptors at keypoints.

    Args:
      img: [H, W] f32 grayscale.
      xy: [N, 2] keypoint positions.
      valid: [N] bool.

    Returns:
      desc: [N, 8] uint32 packed descriptors (zeros where invalid).
      angle: [N] f32 radians.
    """
    if blur:
        # integral-image 5x5 box blur stand-in for ORB's 7x7 (orb.cpp uses
        # boxed smoothing before comparisons)
        img = _sep_conv(img, [0.2] * 5)

    angle = ic_angle(img, xy)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    pat = jnp.asarray(_PATTERN)  # [256, 2, 2]
    px, py = pat[..., 0], pat[..., 1]  # [256, 2]
    rx = ca[:, None, None] * px[None] - sa[:, None, None] * py[None]
    ry = sa[:, None, None] * px[None] + ca[:, None, None] * py[None]
    sample_xy = xy[:, None, None, :] + jnp.stack([rx, ry], axis=-1)  # [N,256,2,2]
    vals = bilinear_sample(img, sample_xy)  # [N, 256, 2]
    bits = (vals[..., 0] < vals[..., 1])  # [N, 256] bool

    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = bits.reshape(-1, DESC_WORDS, 32).astype(jnp.uint32) << shifts[None, None]
    desc = words.sum(axis=-1, dtype=jnp.uint32)  # [N, 8]
    return jnp.where(valid[:, None], desc, 0), angle
