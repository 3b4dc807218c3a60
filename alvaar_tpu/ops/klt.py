"""Batched forward-backward pyramidal Lucas-Kanade tracking.

TPU-native equivalent of the reference's FeatureTracker::fbKltTracking
(reference src/slam/src/feature_tracker.cpp:35-103) wrapping
cv::calcOpticalFlowPyrLK (hot loop at opencv modules/video/src/
lkpyramid.cpp:183): per point, per pyramid level, a 2x2 Gauss-Newton
iteration on a 9x9 intensity window.

TPU-first design — the **correlation-volume formulation**.  Naive LK
bilinearly re-samples the current image inside the iteration loop; on TPU,
gathers inside a loop are catastrophic (the big operand is re-staged from
HBM every iteration, ~0.5 ms each).  Instead, note the inverse-compositional
GN step only needs

    b(d) = Σ_w [ J(x + d + w) − T(w) ] · ∇T(w)

and bilinear sampling is *linear* in the integer-shift lattice, so

    Σ_w bilin(J)(x + d + w) · ∇T(w)  ==  bilin_d( C )(d),
    C[dy, dx] = Σ_w J[x + (dy,dx) + w] · ∇T(w)

— i.e. precompute the correlation volumes C_gx, C_gy over all integer
shifts ONCE per level (static unfold: 81 shifted multiply-accumulates, no
gathers), then every GN iteration is a 4-tap bilinear read of a tiny
[N, 17, 17] volume via one-hot tent weights (an einsum — zero gathers,
zero dynamic slices).  This is mathematically EXACT, not an approximation.

Per level pass: 2 patch gathers (outside the loop) + 2 correlation volumes
+ 30 iterations of [N,17]·[N,17,17]·[N,17] contractions.  Per-level drift
is capped at ±SEARCH_R px (the volume radius) — points needing more are
reported as failures, and the pyramid/motion-prior structure keeps real
tracks well inside the cap.

Status gates mirror the reference: min-eigenvalue trackability, window
L1 residual ≤ err_max (evaluated once at the converged displacement),
in-border check, and the forward-backward round-trip gate at level 0
(feature_tracker.cpp:84-103).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class TrackResult(NamedTuple):
    xy: jax.Array       # [N, 2] tracked positions
    status: jax.Array   # [N] bool
    err: jax.Array      # [N] mean |residual| over the window


SEARCH_R = 8        # default correlation-volume radius (px per level)
BACKWARD_R = 2      # radius for the backward verification pass: a good
                    # round trip lands within fb_dist (0.5 px) of the
                    # start, and a bad one pins to the volume edge and is
                    # rejected — so a tiny volume is sufficient AND cheap


from alvaar_tpu.ops.image import extract_patches as _extract_patches


def _frac_blend(patch, fx, fy, out: int):
    """Bilinear blend of 4 integer-shifted [out, out] views of ``patch``
    (static slices): result[p] = patch[p + (fy, fx)] for fractional f."""
    p00 = patch[:, :out, :out]
    p01 = patch[:, :out, 1:out + 1]
    p10 = patch[:, 1:out + 1, :out]
    p11 = patch[:, 1:out + 1, 1:out + 1]
    fx = fx[:, None, None]
    fy = fy[:, None, None]
    return (p00 * (1 - fy) * (1 - fx) + p01 * (1 - fy) * fx
            + p10 * fy * (1 - fx) + p11 * fy * fx)


def _correlate(J, K, win: int, cr: int):
    """C[n, dy, dx] = Σ_w J[n, (dy,dx) + w + R'] K[n, w] — static unfold:
    one shifted multiply-add per window tap, no gathers.

    J: [N, S, S] with S = cr + win - 1;  K: [N, win, win];
    returns [N, cr, cr]."""
    N = J.shape[0]
    C = jnp.zeros((N, cr, cr), J.dtype)
    for wy in range(win):
        for wx in range(win):
            C = C + J[:, wy:wy + cr, wx:wx + cr] * K[:, wy:wy + 1, wx:wx + 1]
    return C


def _tent_weights(d, size: int):
    """One-hot bilinear ("tent") weights: w[n, i] = max(0, 1 - |i - d_n|)."""
    i = jnp.arange(size, dtype=d.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(i[None, :] - d[:, None]))


def _use_pallas_default() -> bool:
    """The fused Pallas kernel currently matches (not beats) the XLA
    correlation-volume path — extraction dominates both — so the default
    stays XLA; flip per-call with use_pallas=True (TPU only)."""
    return False


def _lk_level(img_prev, img_cur, pts_prev, guess, valid, *,
              win: int, iters: int, eps: float, search_r: int = SEARCH_R,
              min_eig: float = 1e-4, use_pallas: bool | None = None):
    """One pyramid level of correlation-volume LK for all points.

    pts_prev/guess in THIS level's pixel coordinates.
    Returns (new_xy [N,2], track_ok [N], err [N])."""
    h, w = img_cur.shape
    R = search_r
    cr = 2 * R + 1                     # volume side
    r = win // 2                       # 4
    tpl_size = win + 3                 # 12: win + gradient margin + bilinear
    j_size = cr + win - 1

    # ---- template window + gradients from the previous image ----
    base_t = jnp.floor(pts_prev).astype(jnp.int32)
    base_t = jnp.stack(
        [jnp.clip(base_t[:, 0], r + 2, w - r - 4),
         jnp.clip(base_t[:, 1], r + 2, h - r - 4)], axis=1)
    ft = pts_prev - base_t.astype(pts_prev.dtype)      # in [0,1) when unclipped
    ft = jnp.clip(ft, 0.0, 1.0)
    tp = _extract_patches(img_prev, base_t, tpl_size, r + 1)  # [-5..6]
    # blended 11x11 window centered on the point: covers w ∈ [-5..5]
    t11 = _frac_blend(tp, ft[:, 0], ft[:, 1], win + 2)
    T = t11[:, 1:win + 1, 1:win + 1]                   # 9x9
    gx = 0.5 * (t11[:, 1:win + 1, 2:win + 2] - t11[:, 1:win + 1, 0:win])
    gy = 0.5 * (t11[:, 2:win + 2, 1:win + 1] - t11[:, 0:win, 1:win + 1])

    gxx = jnp.sum(gx * gx, axis=(1, 2))
    gxy = jnp.sum(gx * gy, axis=(1, 2))
    gyy = jnp.sum(gy * gy, axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
    trackable = eig_min / (win * win) > min_eig
    det_safe = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    i00 = gyy / det_safe
    i01 = -gxy / det_safe
    i11 = gxx / det_safe

    # constant template terms of b(d)
    cx0 = jnp.sum(T * gx, axis=(1, 2))
    cy0 = jnp.sum(T * gy, axis=(1, 2))

    # ---- current-image search patch + correlation volumes ----
    base_j = jnp.floor(guess + 0.5).astype(jnp.int32)
    margin = R + r + 1
    base_j = jnp.stack(
        [jnp.clip(base_j[:, 0], margin, w - margin - 1),
         jnp.clip(base_j[:, 1], margin, h - margin - 1)], axis=1)
    Jp = _extract_patches(img_cur, base_j, j_size, margin - 1)

    # ---- GN iterations on the volumes (gather-free) ----
    d0 = guess - base_j.astype(guess.dtype)            # start displacement
    lim = R - 1.001
    frozen0 = ~(valid & trackable)
    d0c = jnp.clip(d0, -lim, lim)

    if use_pallas is None:
        use_pallas = _use_pallas_default()

    if use_pallas:
        # fused single-kernel path: correlation + iterations + final error
        from alvaar_tpu.ops.pallas.lk_kernel import lk_iterate_pallas
        cons = jnp.stack([cx0, cy0, i00, i01, i11,
                          d0[:, 0], d0[:, 1],
                          frozen0.astype(jnp.float32)], axis=0)
        out = lk_iterate_pallas(
            T.transpose(1, 2, 0), gx.transpose(1, 2, 0),
            gy.transpose(1, 2, 0), Jp.transpose(1, 2, 0), cons,
            win=win, search_r=R, iters=iters, eps=eps)
        d = jnp.stack([out[0], out[1]], axis=-1)
        err = out[2]
        at_edge = out[3] > 0.5
    else:
        C_gx = _correlate(Jp, gx, win, cr)
        C_gy = _correlate(Jp, gy, win, cr)
        # stacked volumes: one contraction per iteration serves both axes
        C2 = jnp.stack([C_gx, C_gy], axis=1)           # [N, 2, cr, cr]
        c0 = jnp.stack([cx0, cy0], axis=-1)            # [N, 2]

        frozen = frozen0
        d = d0c
        # unrolled GN: pure VPU work; unrolling lets XLA fuse across
        # iterations (loop-carried scan adds per-iteration overhead).
        # The bilinear volume read is written as broadcast-multiply-reduce,
        # NOT einsum/dot_general: a batched [2,cr,cr]x[cr] contraction with
        # batch N would pad each tiny matmul to MXU tiles and dominate the
        # whole tracker, especially under stream-batch vmap.
        for _ in range(iters):
            wx = _tent_weights(d[:, 0] + R, cr)        # [N, cr]
            wy = _tent_weights(d[:, 1] + R, cr)
            bl = jnp.sum(C2 * wy[:, None, :, None] * wx[:, None, None, :],
                         axis=(2, 3))                  # [N, 2]
            b = bl - c0
            sx = -(i00 * b[:, 0] + i01 * b[:, 1])
            sy = -(i01 * b[:, 0] + i11 * b[:, 1])
            step = jnp.stack([sx, sy], axis=-1)
            step = jnp.where(frozen[:, None], 0.0, step)
            d = jnp.clip(d + step, -lim, lim)
            frozen = frozen | (jnp.sum(step * step, axis=-1) < eps * eps)

        # ---- final window, L1 error (banded tent blend, once) ----
        rows = jnp.arange(win, dtype=d.dtype)
        py = (d[:, 1:2] + (R + r)) + rows[None] - r    # [N, 9] target rows
        px = (d[:, 0:1] + (R + r)) + rows[None] - r
        iy = jnp.arange(j_size, dtype=d.dtype)
        Sy = jnp.maximum(0.0, 1.0 - jnp.abs(iy[None, None, :] - py[:, :, None]))
        Sx = jnp.maximum(0.0, 1.0 - jnp.abs(iy[None, None, :] - px[:, :, None]))
        # rows blend then cols blend (broadcast-reduce, no batched matmul)
        Wr = jnp.sum(Sy[:, :, :, None] * Jp[:, None, :, :], axis=2)  # [N,9,jq]
        Wnd = jnp.sum(Wr[:, :, None, :] * Sx[:, None, :, :], axis=3)  # [N,9,9]
        err = jnp.mean(jnp.abs(Wnd - T), axis=(1, 2))
        at_edge = jnp.any(jnp.abs(d) >= lim - 1e-3, axis=-1)

    xy = base_j.astype(d.dtype) + d
    rb = float(r + 1)
    inb = ((xy[:, 0] >= rb) & (xy[:, 0] < w - rb)
           & (xy[:, 1] >= rb) & (xy[:, 1] < h - rb))
    # a point pinned to the volume edge did not converge there
    # ... unless it started there because the prior was already at the edge
    started_edge = jnp.any(jnp.abs(d0c) >= lim - 1e-3, axis=-1)
    ok = valid & trackable & inb & (~at_edge | started_edge)
    return xy, ok, err


def klt_pyramidal(pyr_prev: Sequence[jax.Array], pyr_cur: Sequence[jax.Array],
                  pts: jax.Array, prior: jax.Array, valid: jax.Array, *,
                  levels: int, win: int = 9, iters: int = 30,
                  eps: float = 0.01, err_max: float = 30.0,
                  search_r: int = SEARCH_R,
                  use_pallas: bool | None = None) -> TrackResult:
    """Forward pyramidal LK from coarsest of ``levels`` to level 0.

    Args:
      pyr_prev / pyr_cur: image pyramids (tuple of [H,W] f32, level 0 first).
      pts: [N, 2] level-0 positions in the previous frame.
      prior: [N, 2] level-0 initial guesses in the current frame
        (motion-model projections, reference visual_frontend.cpp:125-152).
      valid: [N] bool slot mask.
      levels: number of levels (1 = level 0 only — the reference's
        motion-prior pass; the retry pass uses all 3).
    """
    scale = 2.0 ** (levels - 1)
    guess = prior / scale
    ok = valid
    err = jnp.zeros(pts.shape[0], pts.dtype)
    for lvl in range(levels - 1, -1, -1):
        s = 2.0 ** lvl
        guess_lvl = guess if lvl == levels - 1 else guess * 2.0
        # only the coarsest level searches the full radius; finer levels
        # refine an upsampled estimate whose error is ~2x the previous
        # level's convergence tolerance
        r_lvl = search_r if lvl == levels - 1 else min(search_r, 4)
        xy, ok_lvl, err = _lk_level(
            pyr_prev[lvl], pyr_cur[lvl], pts / s, guess_lvl, valid,
            win=win, iters=iters, eps=eps, search_r=r_lvl,
            use_pallas=use_pallas,
        )
        ok = ok & ok_lvl
        guess = xy
    status = ok & (err <= err_max)
    return TrackResult(xy=guess, status=status, err=err)


def fb_klt_track(pyr_prev, pyr_cur, pts, prior, valid, *, levels: int,
                 win: int = 9, iters: int = 30, eps: float = 0.01,
                 err_max: float = 30.0, fb_dist: float = 0.5,
                 search_r: int = SEARCH_R,
                 use_pallas: bool | None = None) -> TrackResult:
    """Forward-backward KLT (reference fbKltTracking,
    feature_tracker.cpp:35-103): forward over ``levels``, backward on
    level 0 only, round-trip gate at ``fb_dist`` pixels."""
    fwd = klt_pyramidal(pyr_prev, pyr_cur, pts, prior, valid,
                        levels=levels, win=win, iters=iters, eps=eps,
                        err_max=err_max, search_r=search_r,
                        use_pallas=use_pallas)
    # the backward pass starts from an exact prior (the forward start
    # point) and only verifies a 0.5 px round trip — a short iteration
    # budget converges or the fb gate rejects
    bwd = klt_pyramidal(pyr_cur, pyr_prev, fwd.xy, pts, fwd.status,
                        levels=1, win=win, iters=min(iters, 12), eps=eps,
                        err_max=err_max, search_r=BACKWARD_R,
                        use_pallas=use_pallas)
    rt = jnp.linalg.norm(bwd.xy - pts, axis=-1)
    status = fwd.status & bwd.status & (rt <= fb_dist)
    return TrackResult(xy=fwd.xy, status=status, err=fwd.err)


def _window_offsets(win: int):
    """9x9 window offsets [win*win, 2] — kept for tests/tools."""
    r = win // 2
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    return jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)
