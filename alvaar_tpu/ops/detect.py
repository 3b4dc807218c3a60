"""Grid-based Shi-Tomasi corner detection with subpixel refinement.

TPU-native equivalent of the reference's FeatureExtractor::detectFeaturePoints
(reference src/slam/src/feature_extractor.cpp:45-155): per empty 40x40 grid
cell, blur + min-eigenvalue response, pick the max-response pixel, subpixel
refine.  The reference loops over cells with cv::parallel_for_; here the
whole image is one response pass and the per-cell argmax is a single masked
reshape-reduce — every cell is computed every frame, occupancy simply masks
the result (fixed shapes, no branching).

Divergences (document-and-diverge):
  * occupancy suppression is "reject candidate within cell_size/4 of a live
    keypoint" rather than rasterized mask circles (feature_extractor.cpp:32-36)
    — same effect, O(cells x kps) instead of a mask image;
  * subpixel refinement is a closed-form 2D quadratic fit on the 3x3 response
    neighborhood instead of cv::cornerSubPix's 30-iteration gradient loop
    (feature_extractor.cpp:147-155) — sub-0.1px agreement on real corners,
    one gather instead of 30 iterations;
  * the adaptive absolute threshold (feature_extractor.cpp:138-145) becomes
    a static relative quality gate vs the image max response.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from alvaar_tpu.ops.image import gaussian_blur3, sobel_gradients, _sep_conv


class Detections(NamedTuple):
    xy: jax.Array      # [num_cells, 2] f32 subpixel positions
    score: jax.Array   # [num_cells] f32 min-eig response
    valid: jax.Array   # [num_cells] bool


def shi_tomasi_response(img):
    """Min-eigenvalue corner response (cv::cornerMinEigenVal, 3x3 block,
    3x3 sobel — reference corner.cpp:550), after a 3x3 Gaussian pre-blur
    (feature_extractor.cpp:59)."""
    blurred = gaussian_blur3(img)
    dx, dy = sobel_gradients(blurred)
    # 3x3 box window sums of gradient products
    box = [1.0 / 3.0] * 3
    sxx = _sep_conv(dx * dx, box)
    syy = _sep_conv(dy * dy, box)
    sxy = _sep_conv(dx * dy, box)
    half_trace = 0.5 * (sxx + syy)
    disc = jnp.sqrt(((sxx - syy) * 0.5) ** 2 + sxy * sxy)
    return half_trace - disc


def _pad_to_cells(resp, cell: int):
    h, w = resp.shape
    ph = (-h) % cell
    pw = (-w) % cell
    if ph or pw:
        resp = jnp.pad(resp, ((0, ph), (0, pw)), constant_values=-jnp.inf)
    return resp


def grid_argmax(resp, cell: int):
    """Per-cell argmax: [H, W] → (xy [C, 2] i32, score [C]) with C = grid
    cell count; positions are image coordinates of each cell's peak."""
    h, w = resp.shape
    r = _pad_to_cells(resp, cell)
    gh, gw = r.shape[0] // cell, r.shape[1] // cell
    tiles = r.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh, gw, cell * cell)
    flat_idx = jnp.argmax(tiles, axis=-1)
    score = jnp.take_along_axis(tiles, flat_idx[..., None], axis=-1)[..., 0]
    iy = flat_idx // cell
    ix = flat_idx % cell
    cy = jnp.arange(gh)[:, None] * cell + iy
    cx = jnp.arange(gw)[None, :] * cell + ix
    xy = jnp.stack([cx, cy], axis=-1).reshape(-1, 2)
    return xy, score.reshape(-1)


def subpix_refine(resp, xy_int):
    """Closed-form quadratic-fit subpixel peak refinement on the response
    surface.  xy_int: [N, 2] i32; returns [N, 2] f32.

    3x3 neighborhoods come from one vmapped dynamic_slice batch (in-loop
    HLO gathers are slow on TPU, see ops/image.extract_patches)."""
    h, w = resp.shape
    x = jnp.clip(xy_int[:, 0], 1, w - 2)
    y = jnp.clip(xy_int[:, 1], 1, h - 2)
    from alvaar_tpu.ops.image import extract_patches
    nb = extract_patches(resp, jnp.stack([x, y], axis=1), 3, 1)  # [N, 3, 3]

    def at(dy, dx):
        return nb[:, 1 + dy, 1 + dx]

    c = at(0, 0)
    dxx = at(0, 1) + at(0, -1) - 2 * c
    dyy = at(1, 0) + at(-1, 0) - 2 * c
    dxy = 0.25 * (at(1, 1) - at(1, -1) - at(-1, 1) + at(-1, -1))
    gx = 0.5 * (at(0, 1) - at(0, -1))
    gy = 0.5 * (at(1, 0) - at(-1, 0))
    det = dxx * dyy - dxy * dxy
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    ox = -(dyy * gx - dxy * gy) / det
    oy = -(dxx * gy - dxy * gx) / det
    # reject runaway fits (flat response)
    good = (jnp.abs(ox) <= 1.0) & (jnp.abs(oy) <= 1.0)
    ox = jnp.where(good, ox, 0.0)
    oy = jnp.where(good, oy, 0.0)
    return jnp.stack([x + ox, y + oy], axis=-1).astype(jnp.float32)


def detect_grid(img, existing_xy, existing_valid, *, cell: int,
                border: int, quality: float = 0.001) -> Detections:
    """Full detection pass: response → per-cell peak → occupancy + quality
    gates → subpixel positions.

    Args:
      img: [H, W] f32 grayscale.
      existing_xy: [K, 2] live keypoint positions (for occupancy suppression,
        reference feature_extractor.cpp:32-36 mask circles).
      existing_valid: [K] bool.
      cell: grid cell size (config.cell_size).
      border: ROI border.
      quality: relative response gate vs global max.
    """
    h, w = img.shape
    resp = shi_tomasi_response(img)
    xy_int, score = grid_argmax(resp, cell)
    xy = subpix_refine(resp, xy_int)

    # occupancy: cells containing a live keypoint are skipped, and candidates
    # within cell/4 of any live keypoint are rejected
    gw = -(-w // cell)
    kp_cell = (jnp.clip(existing_xy[:, 1].astype(jnp.int32), 0, h - 1) // cell) * gw \
        + (jnp.clip(existing_xy[:, 0].astype(jnp.int32), 0, w - 1) // cell)
    cell_ids = jnp.arange(xy.shape[0])
    occupied = jnp.any(
        (cell_ids[:, None] == kp_cell[None, :]) & existing_valid[None, :], axis=1
    )
    d2 = jnp.sum((xy[:, None, :] - existing_xy[None, :, :]) ** 2, axis=-1)
    too_close = jnp.any(
        (d2 < (cell / 4.0) ** 2) & existing_valid[None, :], axis=1
    )

    in_border = (
        (xy[:, 0] >= border) & (xy[:, 0] < w - border)
        & (xy[:, 1] >= border) & (xy[:, 1] < h - border)
    )
    good_score = score > quality * jnp.max(score)
    valid = in_border & good_score & ~occupied & ~too_close & jnp.isfinite(score)
    return Detections(xy=xy, score=jnp.where(valid, score, 0.0), valid=valid)
