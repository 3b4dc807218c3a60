"""Oriented binary descriptors (ORB-style) — batched over keypoints.

TPU-native equivalent of the reference's descriptor path
(reference src/slam/src/feature_extractor.cpp:179-209 calling cv::ORB at a
single scale; OpenCV hot loops ICAngles / computeOrbDescriptors at
modules/features2d/src/orb.cpp:181,220):

  * orientation = intensity-centroid angle over a 31-diameter circular
    patch at the ROUNDED keypoint center (OpenCV also uses integer
    centers),
  * descriptor  = 256 steered binary intensity comparisons on the blurred
    image, packed into 8 uint32 words.

Divergence (document-and-diverge): the 256 comparison-point pairs are OUR
OWN deterministic pattern — BRIEF-style Gaussian pairs from a fixed seed —
not OpenCV's learned ``bit_pattern_31_`` table.  Bit-level ORB parity is
neither required nor useful: the engine only ever matches its own
descriptors against its own (reference map_point.cpp:204-222).

TPU structure: ONE vmapped dynamic_slice pulls a [36, 36] patch per
keypoint (HLO gathers inside the per-frame loop cost ~1.4 ms; slice
batches ~0.5 ms); the moment sums are static masked reductions over the
patch; the steered samples are 4-tap bilinear reads from each point's own
tiny flat patch via take_along_axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from alvaar_tpu.ops.image import extract_patches, _sep_conv

PATCH_RADIUS = 15  # 31-diameter moment patch (reference orb.cpp HARRIS patch)
DESC_BITS = 256
DESC_WORDS = DESC_BITS // 32
_PSZ = 36          # extracted patch size
_PLO = 17          # patch center offset: patch covers [-17, +18]


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


def _circle_masks():
    d = np.arange(-PATCH_RADIUS, PATCH_RADIUS + 1)
    oy, ox = np.meshgrid(d, d, indexing="ij")
    inside = (ox * ox + oy * oy <= PATCH_RADIUS * PATCH_RADIUS)
    return (np.where(inside, ox, 0).astype(np.float32),
            np.where(inside, oy, 0).astype(np.float32))


_MASK_X, _MASK_Y = _circle_masks()  # [31, 31]


def _patch_centers(img, xy):
    h, w = img.shape
    c = jnp.floor(xy + 0.5).astype(jnp.int32)
    return jnp.stack([jnp.clip(c[:, 0], _PLO, w - (_PSZ - _PLO)),
                      jnp.clip(c[:, 1], _PLO, h - (_PSZ - _PLO))], axis=1)


def _moment_angle(patches):
    """Intensity-centroid angle from [N, 36, 36] patches (integer-center
    moments, reference orb.cpp:181 ICAngles)."""
    lo = _PLO - PATCH_RADIUS
    win = patches[:, lo:lo + 31, lo:lo + 31]
    m10 = jnp.sum(win * jnp.asarray(_MASK_X)[None], axis=(1, 2))
    m01 = jnp.sum(win * jnp.asarray(_MASK_Y)[None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def ic_angle(img, xy, valid=None):
    """Orientation [N] in radians at (rounded) keypoint centers."""
    patches = extract_patches(img, _patch_centers(img, xy), _PSZ, _PLO)
    return _moment_angle(patches)


def describe(img, xy, valid, *, blur: bool = True):
    """Compute oriented 256-bit descriptors at keypoints.

    Returns (desc [N, 8] uint32 — zeros where invalid, angle [N] f32)."""
    if blur:
        # 5x5 box blur stand-in for ORB's 7x7 pre-smoothing
        img = _sep_conv(img, [0.2] * 5)

    centers = _patch_centers(img, xy)
    patches = extract_patches(img, centers, _PSZ, _PLO)   # [N, 36, 36]
    angle = _moment_angle(patches)
    frac = xy - centers.astype(xy.dtype)                   # |frac| ≤ ~0.5

    ca, sa = jnp.cos(angle), jnp.sin(angle)
    pat = jnp.asarray(_PATTERN)                            # [256, 2, 2]
    px, py = pat[..., 0], pat[..., 1]                      # [256, 2]
    rx = ca[:, None, None] * px[None] - sa[:, None, None] * py[None]
    ry = sa[:, None, None] * px[None] + ca[:, None, None] * py[None]
    # in-patch coordinates (within [2, 33] — safely inside 36)
    sx = (rx + frac[:, None, None, 0:1][..., 0] + _PLO).reshape(-1, 512)
    sy = (ry + frac[:, None, None, 1:2][..., 0] + _PLO).reshape(-1, 512)

    # 4-tap bilinear from each point's OWN flat patch (tiny operand)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    fx = sx - x0
    fy = sy - y0
    flat = patches.reshape(-1, _PSZ * _PSZ)
    idx = y0 * _PSZ + x0
    v00 = jnp.take_along_axis(flat, idx, 1)
    v01 = jnp.take_along_axis(flat, idx + 1, 1)
    v10 = jnp.take_along_axis(flat, idx + _PSZ, 1)
    v11 = jnp.take_along_axis(flat, idx + _PSZ + 1, 1)
    vals = (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx).reshape(-1, DESC_BITS, 2)

    bits = (vals[..., 0] < vals[..., 1])                   # [N, 256]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = bits.reshape(-1, DESC_WORDS, 32).astype(jnp.uint32) << shifts[None, None]
    desc = words.sum(axis=-1, dtype=jnp.uint32)
    return jnp.where(valid[:, None], desc, 0), angle
