"""The per-frame SLAM step — one jitted XLA program.

TPU-native equivalent of the reference's VisualFrontend::track +
System::processCameraPose (reference src/slam/src/visual_frontend.cpp:21-35,
system.cpp:156-175).  The entire per-frame iteration — preprocessing,
two-stage KLT, pose estimation, keyframe decision, and (conditionally) the
full keyframe pipeline including local BA — compiles into a single program
with ``lax.cond`` branches; no host round-trips mid-frame.

Status codes preserved from the reference (system.cpp:163-174):
1 = tracking, 2 = reset performed, 3 = initializing.

Divergence (document-and-diverge): P3P-LMedS runs only when requested
(tracking-ratio < 33% or a previous PnP failure, the reference's
``p3pReq_`` path) rather than on every frame as the reference's configured
``p3pEnabled_=true`` does (system.cpp:19) — the motion-prior + PnP path is
the standard fast path, and the recovery path is reached identically.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from alvaar_tpu.config import SlamConfig
from alvaar_tpu.geom.camera import Camera
from alvaar_tpu.geom.lie import SE3
from alvaar_tpu.ops.image import build_pyramid, clahe
from alvaar_tpu.ops.klt import fb_klt_track
from alvaar_tpu.solvers.absolute import p3p_lmeds
from alvaar_tpu.solvers.essential import essential_ransac
from alvaar_tpu.solvers.pnp import pnp_refine
from alvaar_tpu.worldmap.keyframe import create_keyframe
from alvaar_tpu.worldmap.state import MapState, init_map_state, reset_map_state


class StepOutput(NamedTuple):
    status: jax.Array       # int32: 1 tracking / 2 reset / 3 initializing
    pose_wc: jax.Array      # [4, 4] T_wc (camera-to-world, reference getTwc)
    points: jax.Array       # [K, 2] tracked keypoint pixels
    points_valid: jax.Array  # [K]
    num_tracked: jax.Array
    num_3d: jax.Array
    is_keyframe: jax.Array


def preprocess(gray, cfg: SlamConfig):
    """Optional CLAHE + pyramid (reference visual_frontend.cpp:672-698)."""
    img = gray.astype(jnp.float32)
    if cfg.use_clahe:
        img = clahe(img, clip=cfg.clahe_clip)
    return build_pyramid(img, cfg.pyramid_levels)


# ---------------------------------------------------------------------------
# Tracking
# ---------------------------------------------------------------------------

def _track_keypoints(state: MapState, pyr_cur, pose_prior: SE3, cam: Camera,
                     cfg: SlamConfig, allow_cond: bool = True):
    """Two-stage forward-backward KLT (reference
    visual_frontend.cpp:103-243): 3D keypoints tracked at 1 pyramid level
    from motion-prior projections; failures and 2D keypoints retried on
    the full pyramid from their previous positions.

    ``allow_cond`` (static): permit runtime ``lax.cond`` branches (the
    stage-2 compaction fallback) — real branches single-stream, but a
    select-both under vmap, so the batched serving path passes False."""
    is3d = (state.kp_valid & state.lm_valid[state.kp_lm]
            & state.lm_is3d[state.kp_lm])

    # motion-prior projections (distorted, like the raw pixel stream)
    proj = cam.project_dist(pose_prior.apply(state.lm_pos[state.kp_lm]))
    in_img = cam.in_roi(proj, cfg.width, cfg.height, border=1)
    prior_ok = is3d & in_img

    from alvaar_tpu.ops.klt import pallas_available
    klt_args = dict(win=cfg.klt_window, iters=cfg.klt_iters, eps=cfg.klt_eps,
                    err_max=cfg.klt_err_max, fb_dist=cfg.klt_fb_dist,
                    use_pallas=cfg.use_pallas and pallas_available())
    # tracking resolution: KLT runs at pyramid level ``track_base_level``
    # (half-res for the HD preset — patch-extraction cost scales with
    # image area; see config.py) while keypoint coordinates stay in
    # native pixels.
    L = cfg.track_base_level
    sc = float(2 ** L)
    pyr_p, pyr_c = state.prev_pyr[L:], pyr_cur[L:]
    pts_t, proj_t = state.kp_px / sc, proj / sc
    # motion-prior stage: the prior is accurate to a few px, so a small
    # search volume suffices (stage 2 re-tries failures at full radius)
    s1 = fb_klt_track(pyr_p, pyr_c, pts_t, proj_t, prior_ok,
                      levels=cfg.klt_prior_levels, search_r=4, **klt_args)
    stage2_mask = state.kp_valid & (~prior_ok | (prior_ok & ~s1.status))
    s2_levels = max(1, cfg.pyramid_levels - L)
    K = state.kp_px.shape[0]
    cap = cfg.klt_stage2_slots
    if allow_cond and cap is not None and cap < K:
        # fixed retry sub-batch (config.py klt_stage2_slots): compact the
        # stage-2 candidates into [cap] slots; overflow frames (bootstrap,
        # post-keyframe detection spikes) take the full-width branch
        _, idx = jax.lax.top_k(stage2_mask.astype(jnp.float32), cap)
        sel_valid = stage2_mask[idx]

        def compact(_):
            s2c = fb_klt_track(pyr_p, pyr_c, pts_t[idx], pts_t[idx],
                               sel_valid, levels=s2_levels, **klt_args)
            xy = pts_t.at[idx].set(s2c.xy)
            status = jnp.zeros((K,), bool).at[idx].set(
                s2c.status & sel_valid)
            return xy, status

        def full(_):
            s2f = fb_klt_track(pyr_p, pyr_c, pts_t, pts_t, stage2_mask,
                               levels=s2_levels, **klt_args)
            return s2f.xy, s2f.status

        s2_xy, s2_status = jax.lax.cond(
            jnp.sum(stage2_mask) <= cap, compact, full, None)
        from alvaar_tpu.ops.klt import TrackResult
        s2 = TrackResult(xy=s2_xy, status=s2_status,
                         err=jnp.zeros((K,), pts_t.dtype))
    else:
        s2 = fb_klt_track(pyr_p, pyr_c, pts_t, pts_t, stage2_mask,
                          levels=s2_levels, **klt_args)

    ok1 = prior_ok & s1.status
    ok2 = stage2_mask & s2.status
    kp_px = jnp.where(ok1[:, None], s1.xy * sc,
                      jnp.where(ok2[:, None], s2.xy * sc, state.kp_px))
    kp_valid = ok1 | ok2
    kp_und = cam.undistort(kp_px)

    # P3P request when the motion-prior stage underperforms
    # (reference visual_frontend.cpp:197-203: < 1/3 of priors tracked)
    n_priors = jnp.sum(prior_ok)
    n_good1 = jnp.sum(ok1)
    p3p_req = (n_priors > 0) & (n_good1.astype(jnp.float32)
                                < 0.33 * n_priors.astype(jnp.float32))
    return state._replace(kp_px=kp_px, kp_und=kp_und, kp_valid=kp_valid,
                          p3p_req=state.p3p_req | p3p_req)


# ---------------------------------------------------------------------------
# Pose estimation
# ---------------------------------------------------------------------------

def _compute_pose(state: MapState, cam: Camera, cfg: SlamConfig, key,
                  allow_p3p: bool = True):
    """P3P recovery (conditional) + motion-only PnP
    (reference visual_frontend.cpp:245-417).

    ``allow_p3p=False`` (static) compiles WITHOUT the P3P branch — the
    batched serving path uses it so the expensive RANSAC does not lower
    to select-everything under vmap; recovery then runs in a gated
    sub-batch phase (parallel/multistream.py)."""
    is3d = (state.kp_valid & state.lm_valid[state.kp_lm]
            & state.lm_is3d[state.kp_lm])
    n3d = jnp.sum(is3d)
    pts_w = state.lm_pos[state.kp_lm]
    bearings = cam.bearing(state.kp_und)

    do_p3p = state.p3p_req if not cfg.use_p3p else (
        state.p3p_req | (state.pose_failures > 0))

    def with_p3p(_):
        # (fx + fy) / 2, reference multi_view_geometry.cpp:73-74
        r = p3p_lmeds(key, bearings, pts_w, is3d,
                      focal=0.5 * (cam.fx + cam.fy),
                      iters=cfg.ransac_iters, err_px=cfg.ransac_err_px,
                      min_inliers=cfg.p3p_min_inliers)
        pose = jax.tree.map(
            lambda a, b: jnp.where(r.success, a, b), r.pose, state.pose)
        mask = jnp.where(r.success, r.inliers, is3d)
        return pose, mask, r.success

    def without_p3p(_):
        return state.pose, is3d, jnp.asarray(True)

    if allow_p3p:
        pose_init, pnp_mask, p3p_ok = jax.lax.cond(do_p3p, with_p3p,
                                                   without_p3p, None)
    else:
        pose_init, pnp_mask, p3p_ok = without_p3p(None)

    res = pnp_refine(pose_init, cam, pts_w, state.kp_und, pnp_mask,
                     iters=cfg.pnp_iters, huber_delta=cfg.huber_thresh)
    n_in = res.num_inliers
    n_used = jnp.sum(pnp_mask)
    success = ((n3d >= 4) & p3p_ok & (n_in >= 5)
               & (n_in.astype(jnp.float32) >= 0.5 * n_used.astype(jnp.float32))
               & jnp.all(jnp.isfinite(res.pose.t)))

    pose = jax.tree.map(lambda a, b: jnp.where(success, a, b),
                        res.pose, state.pose)
    # drop PnP outlier observations from the frame (reference removes them
    # via removeObsFromCurrFrameById)
    kp_valid = jnp.where(success, state.kp_valid & (res.inliers | ~is3d),
                         state.kp_valid)
    p3p_req = jnp.where(success, False, True)
    failures = jnp.where(success, 0, state.pose_failures + 1)
    return state._replace(
        pose=pose, kp_valid=kp_valid, p3p_req=p3p_req,
        pose_failures=failures,
        reset_requested=state.reset_requested | (failures > cfg.max_pose_failures),
    ), success, do_p3p


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _parallax_vs_kf(state: MapState, cam: Camera, rotation_compensated: bool,
                    median: bool):
    """Parallax of current keypoints vs the latest keyframe's observations
    (reference computeParallax, visual_frontend.cpp:596-670), using the
    stable-slot invariant for the correspondence."""
    slot = state.cur_kf_slot
    K = state.kp_lm.shape[0]
    same = (state.kf_obs_lm[slot] == state.kp_lm) & \
        state.kf_obs_valid[slot] & state.kp_valid
    kf_px = state.kf_obs_px[slot]
    cur_px = state.kp_und
    if rotation_compensated:
        # rotate current bearings into the keyframe camera and reproject
        T_kf = jax.tree.map(lambda x: x[slot], state.kf_pose)   # T_cw
        R_rel = SE3(T_kf.q, jnp.zeros(3, T_kf.t.dtype)).compose(
            SE3(state.pose.q, jnp.zeros(3, T_kf.t.dtype)).inverse())
        bv = cam.bearing(cur_px)
        cur_px = cam.project(R_rel.rotate(bv))
    d = jnp.linalg.norm(cur_px - kf_px, axis=-1)
    n = jnp.sum(same)
    if median:
        big = jnp.asarray(jnp.inf, d.dtype)
        srt = jnp.sort(jnp.where(same, d, big))
        pos = jnp.clip(n // 2, 0, K - 1)
        val = srt[pos]
        return jnp.where(n > 0, val, 0.0), n
    avg = jnp.sum(jnp.where(same, d, 0.0)) / jnp.maximum(n, 1)
    return jnp.where(n > 0, avg, 0.0), n


def _init_gate(state: MapState, cam: Camera, cfg: SlamConfig):
    """Bootstrap readiness check (reference checkReadyForInit,
    visual_frontend.cpp:419-551)."""
    par, n_common = _parallax_vs_kf(state, cam, rotation_compensated=True,
                                    median=False)
    return (par >= cfg.init_parallax_px) & (n_common >= 8)


def init_essential_phase(state: MapState, cam: Camera,
                         cfg: SlamConfig) -> MapState:
    """The deferred essential-bootstrap phase for batched serving: runs
    ``try_essential`` with a key drawn from the state's own PRNG stream
    (the gated sub-batch scheduler invokes it only for streams whose
    init gate passed this frame)."""
    key, sub = jax.random.split(state.rng_key)
    state = state._replace(rng_key=key)
    state, _ = _try_essential(state, cam, cfg, sub)
    return state


def _try_essential(state: MapState, cam: Camera, cfg: SlamConfig, key):
    """5-pt essential bootstrap (reference visual_frontend.cpp:419-551).
    Returns (state, became_ready)."""
    slot = state.cur_kf_slot

    def try_essential(st: MapState):
        same = (st.kf_obs_lm[slot] == st.kp_lm) & \
            st.kf_obs_valid[slot] & st.kp_valid
        f_kf = cam.bearing(st.kf_obs_px[slot])
        f_cur = cam.bearing(st.kp_und)
        focal = 0.5 * (cam.fx + cam.fy)
        k_e, k_h = jax.random.split(key)
        if cfg.use_five_point:
            from alvaar_tpu.solvers.fivept import essential_ransac_5pt
            solver = essential_ransac_5pt
        else:
            solver = essential_ransac
        r = solver(k_e, f_kf, f_cur, same,
                   focal=focal,
                   iters=cfg.ransac_iters,
                   err_px=cfg.ransac_err_px,
                   min_inliers=cfg.init_min_inliers)
        if cfg.use_homography_init:
            # ORB-SLAM-style model selection (beyond the reference's
            # 5-pt-only bootstrap): a planar-dominant scene is better
            # explained by a homography; both models are scored with
            # the same triangulation/cheirality/angular metric, so the
            # inlier counts compare directly
            from alvaar_tpu.solvers.homography import homography_ransac
            rh, _ = homography_ransac(k_h, f_kf, f_cur, same,
                                      focal=focal,
                                      iters=cfg.ransac_iters,
                                      err_px=cfg.ransac_err_px,
                                      min_inliers=cfg.init_min_inliers)
            use_h = rh.success & (rh.num_inliers > r.num_inliers)
            r = jax.tree.map(
                lambda a, b: jnp.where(use_h, a, b), rh, r)
        # r.pose is T_kf_cur = T_wc of the current frame (kf0 at identity)
        pose_cw = r.pose.inverse()
        new_pose = jax.tree.map(lambda a, b: jnp.where(r.success, a, b),
                                pose_cw, st.pose)
        # drop epipolar outliers from the frame
        kp_valid = jnp.where(r.success,
                             st.kp_valid & (r.inliers | ~same), st.kp_valid)
        return st._replace(pose=new_pose, kp_valid=kp_valid,
                           ready_for_init=st.ready_for_init | r.success), r.success

    return try_essential(state)


def _attempt_init(state: MapState, cam: Camera, cfg: SlamConfig, key):
    """Gate + essential bootstrap under one ``lax.cond`` (the
    single-stream latency path; batched serving defers the solve to a
    gated sub-batch phase instead).  Returns (state, became_ready)."""
    gate = _init_gate(state, cam, cfg)
    return jax.lax.cond(
        gate,
        lambda st: _try_essential(st, cam, cfg, key),
        lambda st: (st, jnp.asarray(False)),
        state)


# ---------------------------------------------------------------------------
# Keyframe policy
# ---------------------------------------------------------------------------

def _keyframe_required(state: MapState, cam: Camera, cfg: SlamConfig):
    """(reference checkNewKeyframeRequired, visual_frontend.cpp:554-594)."""
    slot = state.cur_kf_slot
    med_rot_par, _ = _parallax_vs_kf(state, cam, rotation_compensated=True,
                                     median=True)
    id_diff = state.frame_id - state.last_kf_frame_id
    n_occupied = jnp.sum(state.kp_valid)
    n3d = jnp.sum(state.kp_valid & state.lm_is3d[state.kp_lm]
                  & state.lm_valid[state.kp_lm])
    kf_n3d = jnp.sum(state.kf_obs_valid[slot]
                     & state.lm_is3d[state.kf_obs_lm[slot]]
                     & state.lm_valid[state.kf_obs_lm[slot]])

    max_kps = cfg.max_keypoints
    c_occ = (id_diff >= 5) & (n_occupied < 0.33 * max_kps)
    c_low3d = (id_diff >= 2) & (n3d < 20)
    c_fresh = (id_diff < 2) & (n3d > 0.5 * max_kps)

    kf_par = (cfg.kf_parallax_px if cfg.kf_parallax_px is not None
              else cfg.init_parallax_px)
    cx = med_rot_par >= kf_par / 2.0
    c0 = med_rot_par >= kf_par
    c1 = n3d < 0.75 * kf_n3d
    c2 = (n_occupied < 0.5 * max_kps) & (n3d < 0.85 * kf_n3d)

    return c_occ | c_low3d | (~c_fresh & ((c0 | c1 | c2) & cx))


# ---------------------------------------------------------------------------
# The step
# ---------------------------------------------------------------------------

class TrackFlags(NamedTuple):
    """Per-frame outcomes the serving layer schedules on."""
    kf_req: jax.Array     # keyframe required (already reset-gated)
    p3p_need: jax.Array   # pose failed and P3P recovery was deferred
    init_gate: jax.Array  # bootstrap gate passed, essential solve deferred


def track_phase(state: MapState, gray, cam: Camera, cfg: SlamConfig,
                dt=1.0, *, defer_heavy: bool = False
                ) -> tuple[MapState, TrackFlags]:
    """Per-frame work WITHOUT the keyframe pipeline: preprocess → motion
    prior → two-stage KLT → [init | PnP] → keyframe decision.

    Returns ``(state, TrackFlags)``.  The current frame's pyramid is left
    in ``state.prev_pyr`` so a (possibly deferred) keyframe phase can read
    the keyframe image from the state alone.  This split mirrors the
    reference's frontend/mapper thread boundary
    (visual_frontend.cpp:21-35 hands the keyframe to the async mapper,
    mapper.cpp:9-143) and is what lets multi-stream serving batch the
    cheap track phase every frame while amortizing the expensive keyframe
    pipeline over a small stream sub-batch (parallel/multistream.py).

    ``defer_heavy`` (static): compile WITHOUT the P3P-recovery and
    essential-bootstrap RANSAC branches.  Under vmap a ``lax.cond``
    lowers to select-everything, so the batched serving path would pay
    both heavy solvers for every stream every frame; instead it requests
    them via TrackFlags and the scheduler runs gated sub-batch phases
    (``recovery_phase`` / ``init_essential_phase``).
    """
    pyr_cur = preprocess(gray, cfg)
    dt = jnp.maximum(jnp.asarray(dt, jnp.float32), 1e-6)
    key, k1, k2 = jax.random.split(state.rng_key, 3)
    state = state._replace(rng_key=key)
    F = jnp.asarray(False)

    # ---- shared KLT, hoisted OUT of the phase switch.  Under vmap (the
    # batched serving path) lax.switch lowers to run-all-branches-and-
    # select, so a per-branch _track_keypoints would execute the ~most
    # expensive kernel of the frame TWICE per stream per frame (init +
    # tracking branches).  The tracking work is identical across phases —
    # only the motion prior differs — so compute the prior with a select
    # and track once.  On frame 0 no keypoint slot is valid, so tracking
    # is a masked no-op there (its one-lifetime cost is irrelevant).
    is_first = state.frame_id == 0
    in_tracking = state.ready_for_init & ~is_first
    prev_pose = state.pose
    # constant-velocity prior: T_cw_prior = Exp(-vel·dt) ∘ T_cw
    ext_pose = SE3.exp(-state.vel * dt).compose(state.pose)
    pose_prior = jax.tree.map(
        lambda a, b: jnp.where(in_tracking, a, b), ext_pose, state.pose)
    state = _track_keypoints(state, pyr_cur, pose_prior, cam, cfg,
                             allow_cond=not defer_heavy)

    def first_frame(st: MapState):
        st = st._replace(pose=SE3.identity(dtype=st.kp_px.dtype))
        return st, jnp.asarray(True), F, F

    def init_phase(st: MapState):
        # pure 2D tracking happened in the shared pass (no 3D priors yet)
        n2d = jnp.sum(st.kp_valid)
        st = st._replace(
            reset_requested=st.reset_requested | (n2d < cfg.min_init_keypoints))
        if defer_heavy:
            return st, F, F, _init_gate(st, cam, cfg)
        st, became_ready = _attempt_init(st, cam, cfg, k1)
        return st, became_ready, F, F

    def tracking_phase(st: MapState):
        st = st._replace(pose=pose_prior)
        st, success, do_p3p = _compute_pose(st, cam, cfg, k1,
                                            allow_p3p=not defer_heavy)
        # motion model update: vel = log(T_wc_prev⁻¹ ∘ T_wc_cur) / dt
        #                          = log(T_cw_prev ∘ T_wc_cur) / dt
        new_vel = prev_pose.compose(st.pose.inverse()).log() / dt
        st = st._replace(vel=jnp.where(success, new_vel, st.vel))
        kf_req = _keyframe_required(st, cam, cfg)
        p3p_need = (do_p3p & ~success) if defer_heavy else F
        return st, kf_req & success, p3p_need, F

    branch = jnp.where(is_first, 0,
                       jnp.where(~state.ready_for_init, 1, 2))
    state, kf_required, p3p_need, init_gate = jax.lax.switch(
        branch, [first_frame, init_phase, tracking_phase], state)
    state = state._replace(prev_pyr=pyr_cur)
    return state, TrackFlags(
        kf_req=kf_required & ~state.reset_requested,
        p3p_need=p3p_need & ~state.reset_requested,
        init_gate=init_gate & ~state.reset_requested)


def recovery_phase(state: MapState, cam: Camera, cfg: SlamConfig
                   ) -> MapState:
    """Deferred P3P + PnP redo on the current frame (the heavy branch the
    batched track phase skipped).  Reuses the frame's KLT results held in
    the state; failure bookkeeping is NOT double-counted — the track
    phase already recorded this frame's failure."""
    pre_fail = state.pose_failures
    pre_reset = state.reset_requested
    key, sub = jax.random.split(state.rng_key)
    state = state._replace(rng_key=key, p3p_req=jnp.asarray(True))
    st, success, _ = _compute_pose(state, cam, cfg, sub, allow_p3p=True)
    return st._replace(
        pose_failures=jnp.where(success, 0, pre_fail),
        reset_requested=jnp.where(success, pre_reset, st.reset_requested))


def keyframe_phase(state: MapState, cam: Camera, cfg: SlamConfig) -> MapState:
    """The keyframe pipeline on the frame held in ``state.prev_pyr``
    (reference visual_frontend.cpp:27-33 → mapper)."""
    return create_keyframe(state, state.prev_pyr, cam, cfg)


def finalize_phase(state: MapState, kf_created, cfg: SlamConfig,
                   defer_reset: bool = False) -> tuple[MapState, StepOutput]:
    """Status + reset dispatch and output marshalling
    (reference system.cpp:156-175).

    ``defer_reset`` (static): skip the reset branch — under vmap the
    ``lax.cond`` lowers to a select over the ENTIRE state pytree for
    every stream every frame; the batched serving path instead resets
    flagged streams in a gated sub-batch after finalize (the
    ``reset_requested`` flag stays set until then, which the next
    frame's election consumes)."""
    status = jnp.where(state.reset_requested, 2,
                       jnp.where(state.ready_for_init, 1, 3)).astype(jnp.int32)
    out = StepOutput(
        status=status,
        pose_wc=state.pose.inverse().matrix(),
        points=state.kp_und,
        points_valid=state.kp_valid,
        num_tracked=jnp.sum(state.kp_valid),
        num_3d=jnp.sum(state.kp_valid & state.lm_is3d[state.kp_lm]
                       & state.lm_valid[state.kp_lm]),
        is_keyframe=kf_created & ~state.reset_requested,
    )
    if not defer_reset:
        state = jax.lax.cond(
            state.reset_requested,
            lambda s: reset_map_state(s, cfg),
            lambda s: s,
            state)
    state = state._replace(frame_id=jnp.where(status == 2, 0,
                                              state.frame_id + 1))
    return state, out


@partial(jax.jit, static_argnames=("cfg",))
def slam_step(state: MapState, gray, cam: Camera, cfg: SlamConfig,
              dt=1.0) -> tuple[MapState, StepOutput]:
    """Process one grayscale frame; returns the new state and outputs.

    Mirrors the reference call stack (SURVEY §3.2): preprocess → motion
    prior → two-stage KLT → [init | PnP] → keyframe decision → [keyframe
    pipeline] → status dispatch.  Composed of ``track_phase`` →
    conditional ``keyframe_phase`` → ``finalize_phase``; multi-stream
    serving recomposes the same phases with a sub-batched keyframe
    scheduler instead of the inline ``lax.cond``.

    ``dt`` is the time since the previous frame in arbitrary units
    (seconds when the caller passes real timestamps; 1.0 per frame
    otherwise).  The constant-velocity motion model stores ``vel`` as a
    per-unit-time twist and scales by ``dt``, so frame drops extrapolate
    correctly (the reference's dt-scaled MotionModel,
    visual_frontend.hpp:11-68 — its wall-clock timestamping quirk at
    system.cpp:114 is replaced by caller-provided time, SURVEY §7).
    """
    state, flags = track_phase(state, gray, cam, cfg, dt)

    # keyframe pipeline (reference visual_frontend.cpp:27-33)
    state = jax.lax.cond(
        flags.kf_req,
        lambda s: keyframe_phase(s, cam, cfg),
        lambda s: s,
        state)

    return finalize_phase(state, flags.kf_req, cfg)
