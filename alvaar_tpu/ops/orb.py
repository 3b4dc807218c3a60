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

Divergences (document-and-diverge):
  * the 256 comparison-point pairs are OUR OWN deterministic pattern —
    BRIEF-style Gaussian pairs from a fixed seed — not OpenCV's learned
    ``bit_pattern_31_`` table.  Bit-level ORB parity is neither required
    nor useful: the engine only ever matches its own descriptors against
    its own (reference map_point.cpp:204-222);
  * steering quantizes the angle to 2π/30 bins — the granularity of the
    original ORB paper (Rublee et al. §4.1; OpenCV interpolates instead).

TPU structure (gather-free): patches come from the one-hot MXU extraction
(ops/image.extract_patches); the steered sampling is a LUT of 30 static
±1 difference matrices D_a [1296, 256] (one per angle bin, nearest-pixel
taps like OpenCV's cvRound), so all 256 comparisons for all points are
``patch_rows @ D_a`` — 30 small bf16 matmuls accumulated under the
bin mask.  A one-hot row selects whole bf16 pixels exactly; a sign flip
needs |v0 − v1| below bf16 rounding (≲1 intensity step), which only
perturbs comparisons that are noise anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from alvaar_tpu.ops.image import extract_patches_pl, _sep_conv

PATCH_RADIUS = 15  # 31-diameter moment patch (reference orb.cpp HARRIS patch)
DESC_BITS = 256
DESC_WORDS = DESC_BITS // 32
NUM_ANGLE_BINS = 30  # ORB paper §4.1: 2π/30 steering granularity
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


def _make_diff_luts() -> np.ndarray:
    """[NUM_ANGLE_BINS, _PSZ*_PSZ, 256] ±1 matrices: column b of bin a has
    +1 at the rotated-and-rounded in-patch index of pattern point 1 and
    −1 at point 0, so (flat_patch @ D_a)[b] = v1 − v0 and bit b = diff>0."""
    luts = np.zeros((NUM_ANGLE_BINS, _PSZ * _PSZ, DESC_BITS), np.float32)
    for a in range(NUM_ANGLE_BINS):
        ang = 2.0 * np.pi * a / NUM_ANGLE_BINS
        ca, sa = np.cos(ang), np.sin(ang)
        rx = np.rint(ca * _PATTERN[..., 0] - sa * _PATTERN[..., 1]) + _PLO
        ry = np.rint(sa * _PATTERN[..., 0] + ca * _PATTERN[..., 1]) + _PLO
        idx = (ry.astype(np.int64) * _PSZ + rx.astype(np.int64))  # [256, 2]
        for b in range(DESC_BITS):
            luts[a, idx[b, 0], b] -= 1.0
            luts[a, idx[b, 1], b] += 1.0
    return luts


_DIFF_LUTS = _make_diff_luts()


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


def _moment_angle(patches_pl):
    """Intensity-centroid angle from point-last [36, 36, N] patches
    (integer-center moments, reference orb.cpp:181 ICAngles)."""
    lo = _PLO - PATCH_RADIUS
    win = patches_pl[lo:lo + 31, lo:lo + 31, :]            # [31, 31, N]
    m10 = jnp.sum(win * jnp.asarray(_MASK_X)[:, :, None], axis=(0, 1))
    m01 = jnp.sum(win * jnp.asarray(_MASK_Y)[:, :, None], axis=(0, 1))
    return jnp.arctan2(m01, m10)


def ic_angle(img, xy, valid=None):
    """Orientation [N] in radians at (rounded) keypoint centers."""
    patches = extract_patches_pl(img, _patch_centers(img, xy), _PSZ, _PLO)
    return _moment_angle(patches)


def describe(img, xy, valid, *, blur: bool = True):
    """Compute oriented 256-bit descriptors at keypoints.

    Returns (desc [N, 8] uint32 — zeros where invalid, angle [N] f32)."""
    if blur:
        # 5x5 box blur stand-in for ORB's 7x7 pre-smoothing
        img = _sep_conv(img, [0.2] * 5)

    centers = _patch_centers(img, xy)
    patches = extract_patches_pl(img, centers, _PSZ, _PLO)  # [36, 36, N]
    angle = _moment_angle(patches)

    n = xy.shape[0]
    two_pi = 2.0 * jnp.pi
    abin = jnp.floor((angle % two_pi) / two_pi
                     * NUM_ANGLE_BINS + 0.5).astype(jnp.int32) % NUM_ANGLE_BINS

    # steered comparisons: 30 masked bf16 matmuls against the static LUTs
    flat = patches.reshape(_PSZ * _PSZ, n).T.astype(jnp.bfloat16)  # [N, 1296]
    luts = jnp.asarray(_DIFF_LUTS, jnp.bfloat16)
    diff = jnp.zeros((n, DESC_BITS), jnp.float32)
    for a in range(NUM_ANGLE_BINS):
        d_a = jax.lax.dot(flat, luts[a],
                          preferred_element_type=jnp.float32)  # [N, 256]
        diff = jnp.where((abin == a)[:, None], d_a, diff)

    bits = diff > 0                                        # [N, 256]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = bits.reshape(-1, DESC_WORDS, 32).astype(jnp.uint32) << shifts[None, None]
    desc = words.sum(axis=-1, dtype=jnp.uint32)
    return jnp.where(valid[:, None], desc, 0), angle
