"""Batched forward-backward pyramidal Lucas-Kanade tracking.

TPU-native equivalent of the reference's FeatureTracker::fbKltTracking
(reference src/slam/src/feature_tracker.cpp:35-103), which wraps
cv::calcOpticalFlowPyrLK (hot loop LKTrackerInvoker::operator(),
reference opencv modules/video/src/lkpyramid.cpp:183): per point, per
pyramid level, iterate a 2x2 Gauss-Newton on the 9x9 intensity window.

The reference tracks points one at a time inside a parallel_for; here ALL
N points iterate together as [N, 81] tensor ops — gathers + reductions the
TPU pipeline fuses, with a convergence *freeze mask* instead of early exit
(fixed iteration count, XLA-friendly).  The spatial-gradient matrix is
computed once per level from the template window (same inverse-compositional
shortcut OpenCV uses), so each iteration is one bilinear gather + two
reductions.

Status gates mirror the reference:
  * min-eigenvalue of the gradient matrix (trackability),
  * window intensity residual ≤ klt_err_max (feature_tracker.cpp:48-73),
  * in-border check,
  * forward-backward round trip ≤ klt_fb_dist, backward pass at level 0 only
    (feature_tracker.cpp:84-103).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from alvaar_tpu.ops.image import bilinear_sample


class TrackResult(NamedTuple):
    xy: jax.Array       # [N, 2] tracked positions
    status: jax.Array   # [N] bool
    err: jax.Array      # [N] mean |residual| over the window


def _window_offsets(win: int):
    r = win // 2
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    return jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)  # [win*win, 2]


def _lk_level(img_prev, img_cur, pts_prev, guess, valid, *,
              win: int, iters: int, eps: float, min_eig: float = 1e-4):
    """One pyramid level of LK for all points.

    pts_prev/guess are in THIS level's pixel coordinates.
    Returns (new_guess [N,2], track_ok [N], err [N]).
    """
    offs = _window_offsets(win)  # [W2, 2]
    tpl_xy = pts_prev[:, None, :] + offs[None, :, :]  # [N, W2, 2]

    # template window + gradients (central differences on the same level)
    tpl = bilinear_sample(img_prev, tpl_xy)
    gx = 0.5 * (bilinear_sample(img_prev, tpl_xy + jnp.asarray([1.0, 0.0]))
                - bilinear_sample(img_prev, tpl_xy - jnp.asarray([1.0, 0.0])))
    gy = 0.5 * (bilinear_sample(img_prev, tpl_xy + jnp.asarray([0.0, 1.0]))
                - bilinear_sample(img_prev, tpl_xy - jnp.asarray([0.0, 1.0])))

    gxx = jnp.sum(gx * gx, axis=-1)
    gxy = jnp.sum(gx * gy, axis=-1)
    gyy = jnp.sum(gy * gy, axis=-1)
    det = gxx * gyy - gxy * gxy
    trace = gxx + gyy
    eig_min = 0.5 * (trace - jnp.sqrt(jnp.maximum(trace * trace - 4 * det, 0.0)))
    trackable = eig_min / (win * win) > min_eig
    det_safe = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    # inverse of G (2x2)
    i00 = gyy / det_safe
    i01 = -gxy / det_safe
    i11 = gxx / det_safe

    def body(carry, _):
        xy, frozen = carry
        cur = bilinear_sample(img_cur, xy[:, None, :] + offs[None, :, :])
        r = cur - tpl  # [N, W2]
        b0 = jnp.sum(r * gx, axis=-1)
        b1 = jnp.sum(r * gy, axis=-1)
        dx = -(i00 * b0 + i01 * b1)
        dy = -(i01 * b0 + i11 * b1)
        step = jnp.stack([dx, dy], axis=-1)
        step = jnp.where(frozen[:, None], 0.0, step)
        xy = xy + step
        frozen = frozen | (jnp.sum(step * step, axis=-1) < eps * eps)
        return (xy, frozen), None

    frozen0 = ~(valid & trackable)
    (xy, _), _ = jax.lax.scan(body, (guess, frozen0), None, length=iters)

    cur = bilinear_sample(img_cur, xy[:, None, :] + offs[None, :, :])
    err = jnp.mean(jnp.abs(cur - tpl), axis=-1)
    h, w = img_cur.shape
    r = win // 2 + 1
    inb = ((xy[:, 0] >= r) & (xy[:, 0] < w - r)
           & (xy[:, 1] >= r) & (xy[:, 1] < h - r))
    return xy, valid & trackable & inb, err


def klt_pyramidal(pyr_prev: Sequence[jax.Array], pyr_cur: Sequence[jax.Array],
                  pts: jax.Array, prior: jax.Array, valid: jax.Array, *,
                  levels: int, win: int = 9, iters: int = 30,
                  eps: float = 0.01, err_max: float = 30.0) -> TrackResult:
    """Forward pyramidal LK from coarsest of ``levels`` to level 0.

    Args:
      pyr_prev / pyr_cur: image pyramids (tuple of [H,W] f32, level 0 first).
      pts: [N, 2] level-0 positions in the previous frame.
      prior: [N, 2] level-0 initial guesses in the current frame
        (the motion-model projection, reference visual_frontend.cpp:125-152).
      valid: [N] bool slot mask.
      levels: number of levels to use (1 = level 0 only — the reference's
        motion-prior pass uses 1, the retry pass uses all 3).
    """
    scale = 2.0 ** (levels - 1)
    guess = prior / scale
    ok = valid
    err = jnp.zeros(pts.shape[0], pts.dtype)
    for lvl in range(levels - 1, -1, -1):
        s = 2.0 ** lvl
        guess_lvl = guess if lvl == levels - 1 else guess * 2.0
        xy, ok_lvl, err = _lk_level(
            pyr_prev[lvl], pyr_cur[lvl], pts / s, guess_lvl, valid,
            win=win, iters=iters, eps=eps,
        )
        ok = ok & ok_lvl
        guess = xy
    status = ok & (err <= err_max)
    return TrackResult(xy=guess, status=status, err=err)


def fb_klt_track(pyr_prev, pyr_cur, pts, prior, valid, *, levels: int,
                 win: int = 9, iters: int = 30, eps: float = 0.01,
                 err_max: float = 30.0, fb_dist: float = 0.5) -> TrackResult:
    """Forward-backward KLT (reference fbKltTracking,
    feature_tracker.cpp:35-103): forward over ``levels``, backward on
    level 0 only, round-trip gate at ``fb_dist`` pixels."""
    fwd = klt_pyramidal(pyr_prev, pyr_cur, pts, prior, valid,
                        levels=levels, win=win, iters=iters, eps=eps,
                        err_max=err_max)
    bwd = klt_pyramidal(pyr_cur, pyr_prev, fwd.xy, pts, fwd.status,
                        levels=1, win=win, iters=iters, eps=eps,
                        err_max=err_max)
    rt = jnp.linalg.norm(bwd.xy - pts, axis=-1)
    status = fwd.status & bwd.status & (rt <= fb_dist)
    return TrackResult(xy=fwd.xy, status=status, err=fwd.err)
