"""Keyframe pipeline: creation, eviction, triangulation, BA, culling.

TPU-native equivalent of the reference's MapManager::createKeyframe +
Mapper::processNewKeyframe (reference src/slam/src/map_manager.cpp:24-252,
mapper.cpp:9-143): every step is a masked array transformation of the
fixed-shape MapState — nothing allocates, nothing branches per element.

Key structural invariant (replaces the reference's id-keyed hash maps):
a landmark keeps the SAME keypoint slot k from detection until track loss,
and keyframe observations are written from the current keypoint table, so
a landmark's pixel in keyframe w lives at ``kf_obs_px[w, k]`` — verified by
``kf_obs_lm[w, k] == lm`` (slots can be recycled after loss).  This turns
the reference's per-landmark hash lookups (frame.cpp getKeypointById) into
O(1) gathers.

Divergences (document-and-diverge):
  * inverse-depth anchors are re-derived every keyframe as "oldest live
    observer" from the world position (the reference keeps the first
    observer and re-anchors on removal, map_manager.cpp:515-675) — same
    geometry, self-healing under ring eviction;
  * descriptor bags keep a fixed-size ring per landmark with medoid
    re-election (``_push_descriptor_bags`` below; map_point.cpp:131-181
    keeps an unbounded vector) — same most-representative semantics over
    the last G observations instead of all of them;
  * matchingToLocalMap (mapper.cpp:293-588) lands separately.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from alvaar_tpu.config import SlamConfig
from alvaar_tpu.geom.camera import Camera
from alvaar_tpu.geom.lie import SE3
from alvaar_tpu.geom.triangulation import triangulate_midpoint
from alvaar_tpu.ops.detect import detect_grid
from alvaar_tpu.ops.orb import describe
from alvaar_tpu.solvers.ba import BAProblem, local_ba
from alvaar_tpu.worldmap.matching import match_to_local_map
from alvaar_tpu.worldmap.state import (
    MapState,
    allocate_slots,
    covisibility,
    landmark_world_positions,
    masked_scatter_set,
)


def _oldest_observer(state: MapState, exclude_slot=None):
    """Per landmark: ring slot of the oldest live observing keyframe.

    Returns (slot [L] int32, has_observer [L] bool)."""
    obs = state.lm_obs & state.kf_valid[None, :]
    if exclude_slot is not None:
        obs = obs & (jnp.arange(state.kf_valid.shape[0]) != exclude_slot)[None, :]
    ids = jnp.where(obs, state.kf_id[None, :], jnp.iinfo(jnp.int32).max)
    slot = jnp.argmin(ids, axis=1).astype(jnp.int32)
    has = jnp.any(obs, axis=1)
    return slot, has


def _lm_bound_in_frame(state: MapState):
    """[L] bool — landmark currently bound to a live keypoint slot."""
    L = state.lm_valid.shape[0]
    bound = jnp.zeros((L,), bool)
    return bound.at[state.kp_lm].max(state.kp_valid)


def evict_and_write_keyframe(state: MapState, cfg: SlamConfig) -> MapState:
    """Overwrite the ring slot for the new keyframe and bind the current
    frame's keypoints as its observations (reference mapper.cpp:14-18
    eviction + map_manager.cpp:24-81 prepareFrame observation wiring)."""
    W = cfg.window_size
    slot = state.next_kf_id % W

    # clear the evicted slot's observations
    lm_obs = state.lm_obs.at[:, slot].set(False)

    # kill landmarks left with zero observers and no live track
    # (reference MapPoint::isBad, map_point.cpp:183-202)
    bound = _lm_bound_in_frame(state)
    n_obs = jnp.sum(lm_obs & state.kf_valid[None, :], axis=1)
    lm_valid = state.lm_valid & ((n_obs > 0) | bound)

    # write the new keyframe
    kf_pose = jax.tree.map(
        lambda ring, cur: ring.at[slot].set(cur), state.kf_pose, state.pose)
    kf_valid = state.kf_valid.at[slot].set(True)
    kf_id = state.kf_id.at[slot].set(state.next_kf_id)

    obs_ok = state.kp_valid & lm_valid[state.kp_lm]
    kf_obs_lm = state.kf_obs_lm.at[slot].set(state.kp_lm)
    kf_obs_px = state.kf_obs_px.at[slot].set(state.kp_und)
    kf_obs_valid = state.kf_obs_valid.at[slot].set(obs_ok)
    lm_obs = lm_obs.at[state.kp_lm, slot].max(obs_ok)

    return state._replace(
        lm_obs=lm_obs, lm_valid=lm_valid, kf_pose=kf_pose, kf_valid=kf_valid,
        kf_id=kf_id, kf_obs_lm=kf_obs_lm, kf_obs_px=kf_obs_px,
        kf_obs_valid=kf_obs_valid, cur_kf_slot=slot,
        last_kf_frame_id=state.frame_id,
        next_kf_id=state.next_kf_id + 1,
    )


def reanchor_landmarks(state: MapState, cfg: SlamConfig) -> MapState:
    """Re-derive every 3D landmark's inverse-depth anchor as its oldest
    live observer, from the stored world position — keeps the
    parametrization valid under ring eviction."""
    slot, has = _oldest_observer(state)
    T_a = jax.tree.map(lambda x: x[slot], state.kf_pose)  # T_cw
    X_a = T_a.apply(state.lm_pos)
    z = X_a[:, 2]
    z_ok = z > 1e-3
    z_safe = jnp.where(z_ok, z, 1.0)
    upd = state.lm_is3d & state.lm_valid & has & z_ok
    lm_anchor = jnp.where(upd, slot, state.lm_anchor)
    lm_mxy = jnp.where(upd[:, None], X_a[:, :2] / z_safe[:, None], state.lm_mxy)
    lm_invd = jnp.where(upd, 1.0 / z_safe, state.lm_invd)
    return state._replace(lm_anchor=lm_anchor, lm_mxy=lm_mxy, lm_invd=lm_invd)


def _push_descriptor_bags(state: MapState, desc, ok_tracked,
                          cfg: SlamConfig):
    """Append each tracked keypoint's fresh descriptor to its landmark's
    ring bag and re-elect the bag medoid (min summed Hamming to the rest)
    as the representative (reference MapPoint::addDesc +
    most-representative selection, map_point.cpp:131-181).

    Returns (lm_desc, lm_desc_bag, lm_desc_cnt)."""
    L, G, _ = state.lm_desc_bag.shape
    lm = state.kp_lm                                     # [K]
    cnt = state.lm_desc_cnt[lm]                          # [K]
    ring = cnt % G
    bag_flat = masked_scatter_set(
        state.lm_desc_bag.reshape(L * G, 8), lm * G + ring, desc, ok_tracked)
    bag = bag_flat.reshape(L, G, 8)
    cnt_new = masked_scatter_set(state.lm_desc_cnt, lm, cnt + 1, ok_tracked)

    # medoid among the filled entries, only for the updated landmarks
    bags_k = bag[lm]                                     # [K, G, 8]
    n_k = jnp.minimum(cnt + 1, G)                        # [K] filled entries
    x = bags_k[:, :, None, :] ^ bags_k[:, None, :, :]
    d = jnp.sum(jax.lax.population_count(x).astype(jnp.int32), -1)  # [K,G,G]
    filled = jnp.arange(G)[None, :] < n_k[:, None]       # [K, G]
    sums = jnp.sum(jnp.where(filled[:, :, None] & filled[:, None, :], d, 0),
                   axis=-1)
    sums = jnp.where(filled, sums, jnp.iinfo(jnp.int32).max)
    med = jnp.argmin(sums, axis=-1)                      # [K]
    rep = jnp.take_along_axis(bags_k, med[:, None, None], axis=1)[:, 0]
    lm_desc = masked_scatter_set(state.lm_desc, lm, rep, ok_tracked)
    return lm_desc, bag, cnt_new


def describe_and_detect(state: MapState, pyr, cam: Camera,
                        cfg: SlamConfig) -> MapState:
    """ORB-describe the tracked keypoints, then fill empty grid cells with
    new detections → new 2D landmarks (reference map_manager.cpp:193-222
    extractKeypoints: describe tracked, detect in free cells, add).

    Detection runs at native resolution (level 0 — HD buys keypoint
    precision); descriptors are sampled at the TRACKING level
    (cfg.track_base_level) — descriptors are only ever matched against
    descriptors the engine itself computed (reference map_point.cpp:204-
    222), so any consistent scale works, and patch extraction cost scales
    with image area (config.py track_base_level note)."""
    slot = state.cur_kf_slot
    gray = pyr[0]
    dimg = pyr[cfg.track_base_level]
    dsc = float(2 ** cfg.track_base_level)

    # describe tracked keypoints; bag + medoid representative
    desc, _ = describe(dimg, state.kp_px / dsc, state.kp_valid)
    ok_tracked = state.kp_valid & state.lm_valid[state.kp_lm]
    lm_desc_all, lm_bag, lm_cnt = _push_descriptor_bags(
        state, desc, ok_tracked, cfg)
    state = state._replace(lm_desc_bag=lm_bag, lm_desc_cnt=lm_cnt)

    # detect new corners in unoccupied cells
    det = detect_grid(gray, state.kp_px, state.kp_valid,
                      cell=cfg.cell_size, border=cfg.image_border,
                      quality=state.detect_quality)
    state = state._replace(detect_quality=det.new_quality)
    new_desc, _ = describe(dimg, det.xy / dsc, det.valid)

    # allocate keypoint slots and landmark slots for each accepted detection
    kp_slot, kp_ok = allocate_slots(state.kp_valid, det.valid)
    lm_slot, lm_ok = allocate_slots(state.lm_valid, det.valid & kp_ok)
    ok = det.valid & kp_ok & lm_ok

    und = cam.undistort(det.xy)

    kp_px = masked_scatter_set(state.kp_px, kp_slot, det.xy, ok)
    kp_und = masked_scatter_set(state.kp_und, kp_slot, und, ok)
    kp_lm = masked_scatter_set(state.kp_lm, kp_slot, lm_slot, ok)
    kp_valid = masked_scatter_set(state.kp_valid, kp_slot,
                                  jnp.ones_like(ok), ok)

    lm_valid = masked_scatter_set(state.lm_valid, lm_slot,
                                  jnp.ones_like(ok), ok)
    lm_is3d = masked_scatter_set(state.lm_is3d, lm_slot,
                                 jnp.zeros_like(ok), ok)
    lm_desc2 = masked_scatter_set(lm_desc_all, lm_slot, new_desc, ok)
    # fresh landmarks: seed the bag with the detection descriptor
    L, G, _ = state.lm_desc_bag.shape
    lm_bag2 = masked_scatter_set(
        state.lm_desc_bag.reshape(L * G, 8), lm_slot * G, new_desc,
        ok).reshape(L, G, 8)
    lm_cnt2 = masked_scatter_set(state.lm_desc_cnt, lm_slot,
                                 jnp.ones_like(lm_slot), ok)
    # detection-time intensity for colored point-cloud export
    # (reference map_manager.cpp:254-318 samples the keyframe image)
    h, w = gray.shape
    yi = jnp.clip(jnp.round(det.xy[:, 1]).astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(jnp.round(det.xy[:, 0]).astype(jnp.int32), 0, w - 1)
    lm_color2 = masked_scatter_set(state.lm_color, lm_slot, gray[yi, xi], ok)
    # fresh landmark rows: recycled slots may hold stale incidence — reset
    fresh_rows = jnp.zeros((ok.shape[0],) + state.lm_obs.shape[1:],
                           bool).at[:, slot].set(True)
    lm_obs = masked_scatter_set(state.lm_obs, lm_slot, fresh_rows, ok)

    # the new keyframe observes the new detections
    kf_obs_lm = state.kf_obs_lm.at[slot].set(masked_scatter_set(
        state.kf_obs_lm[slot], kp_slot, lm_slot, ok))
    kf_obs_px = state.kf_obs_px.at[slot].set(masked_scatter_set(
        state.kf_obs_px[slot], kp_slot, und, ok))
    kf_obs_valid = state.kf_obs_valid.at[slot].set(masked_scatter_set(
        state.kf_obs_valid[slot], kp_slot, jnp.ones_like(ok), ok))

    return state._replace(
        kp_px=kp_px, kp_und=kp_und, kp_lm=kp_lm, kp_valid=kp_valid,
        lm_valid=lm_valid, lm_is3d=lm_is3d, lm_desc=lm_desc2,
        lm_desc_bag=lm_bag2, lm_desc_cnt=lm_cnt2, lm_color=lm_color2,
        lm_obs=lm_obs,
        kf_obs_lm=kf_obs_lm, kf_obs_px=kf_obs_px, kf_obs_valid=kf_obs_valid)


def triangulate_temporal(state: MapState, cam: Camera,
                         cfg: SlamConfig) -> MapState:
    """Temporal triangulation of the new keyframe's 2D landmarks against
    their oldest observing keyframe (reference mapper.cpp:144-291):
    midpoint triangulation, positive-depth gate (z > 0.1 both views),
    reprojection gate (≤ mapMaxReprojectionError in both views); failures
    with >20 px parallax lose the new observation."""
    slot = state.cur_kf_slot
    K = state.kp_lm.shape[0]
    lm = state.kf_obs_lm[slot]                  # [K]
    obs_ok = state.kf_obs_valid[slot]

    first_w, has_other = _oldest_observer(state, exclude_slot=slot)
    w_i = first_w[lm]                           # [K] oldest observer slot
    # the stable-slot invariant: landmark lm sits at the same slot k there
    same = (state.kf_obs_lm[w_i, jnp.arange(K)] == lm) & \
        state.kf_obs_valid[w_i, jnp.arange(K)]
    cand = (obs_ok & ~state.lm_is3d[lm] & state.lm_valid[lm]
            & has_other[lm] & same & (w_i != slot))

    T_i = jax.tree.map(lambda x: x[w_i], state.kf_pose)   # T_cw oldest
    T_j = state.pose                                      # T_cw new (== kf slot pose)
    # relative pose of new cam (j) in old cam (i): T_ci_cj = T_cw_i ∘ T_wc_j
    T_ij = T_i.compose(T_j.inverse())

    px_i = state.kf_obs_px[w_i, jnp.arange(K)]
    px_j = state.kf_obs_px[slot]
    f_i = cam.bearing(px_i)
    f_j = cam.bearing(px_j)

    X_i = triangulate_midpoint(T_ij, f_i, f_j)            # in cam i
    X_j = T_ij.inverse().apply(X_i)
    z_i, z_j = X_i[..., 2], X_j[..., 2]

    proj_i = cam.project(X_i)
    proj_j = cam.project(X_j)
    e_i = jnp.linalg.norm(proj_i - px_i, axis=-1)
    e_j = jnp.linalg.norm(proj_j - px_j, axis=-1)

    depth_ok = (z_i > 0.1) & (z_j > 0.1)
    reproj_ok = (e_i <= cfg.triang_max_reproj_px) & (e_j <= cfg.triang_max_reproj_px)
    good = cand & depth_ok & reproj_ok

    # rotation-compensated parallax for the rejection rule
    rot_f_j = T_ij.rotate(f_j)
    rot_px = cam.project(rot_f_j)
    parallax = jnp.linalg.norm(rot_px - px_i, axis=-1)
    drop = cand & ~good & (parallax > 20.0)

    # update landmarks that triangulated (masked scatter: stale lm ids in
    # invalid rows must not collide with live writes)
    X_w = T_i.inverse().apply(X_i)
    z_safe = jnp.where(z_i > 1e-3, z_i, 1.0)
    lm_pos = masked_scatter_set(state.lm_pos, lm, X_w, good)
    lm_is3d = state.lm_is3d.at[lm].max(good)
    lm_anchor = masked_scatter_set(state.lm_anchor, lm, w_i, good)
    lm_mxy = masked_scatter_set(state.lm_mxy, lm,
                                X_i[..., :2] / z_safe[..., None], good)
    lm_invd = masked_scatter_set(state.lm_invd, lm, 1.0 / z_safe, good)

    # drop bad high-parallax observations from the new keyframe
    kf_obs_valid = state.kf_obs_valid.at[slot].set(
        state.kf_obs_valid[slot] & ~drop)
    lm_obs = state.lm_obs.at[lm, slot].min(~drop)

    return state._replace(
        lm_pos=lm_pos, lm_is3d=lm_is3d, lm_anchor=lm_anchor, lm_mxy=lm_mxy,
        lm_invd=lm_invd, kf_obs_valid=kf_obs_valid, lm_obs=lm_obs)


def refine_landmark_depths(state: MapState, cam: Camera,
                           cfg: SlamConfig) -> MapState:
    """Re-triangulate existing 3D landmarks against the NEW keyframe:
    midpoint triangulation between each landmark's anchor observation and
    its new-keyframe observation, accepted only when it reduces the
    summed two-view reprojection error (and passes depth/parallax
    gates).  Kills the young-map depth bias of short-baseline initial
    triangulations that local BA's few iterations correct only slowly
    (docs/ROADMAP.md accuracy notes; the reference relies on Ceres
    iterating the same correction across many keyframes).

    Only ``lm_pos`` is written — ``reanchor_landmarks`` (which runs
    after) re-derives the anchored inverse-depth parametrization."""
    slot = state.cur_kf_slot
    K = state.kp_lm.shape[0]
    kr = jnp.arange(K)
    lm = state.kf_obs_lm[slot]
    obs_ok = (state.kf_obs_valid[slot] & state.lm_valid[lm]
              & state.lm_is3d[lm])
    a = jnp.clip(state.lm_anchor[lm], 0, state.kf_valid.shape[0] - 1)
    same = (state.kf_obs_lm[a, kr] == lm) & state.kf_obs_valid[a, kr]
    cand = obs_ok & same & (a != slot) & state.kf_valid[a]

    T_a = jax.tree.map(lambda x: x[a], state.kf_pose)      # [K] T_cw
    T_j = jax.tree.map(lambda x: x[slot], state.kf_pose)
    T_aj = T_a.compose(SE3(T_j.q, T_j.t).inverse())        # X_a = T_aj·X_j
    px_a = state.kf_obs_px[a, kr]
    px_j = state.kf_obs_px[slot]
    f_a = cam.bearing(px_a)
    f_j = cam.bearing(px_j)

    X_a = triangulate_midpoint(T_aj, f_a, f_j)             # anchor frame
    X_j = T_aj.inverse().apply(X_a)
    z_a, z_j = X_a[..., 2], X_j[..., 2]
    e_new = (jnp.linalg.norm(cam.project(X_a) - px_a, axis=-1)
             + jnp.linalg.norm(cam.project(X_j) - px_j, axis=-1))

    # current two-view error of the stored position
    Xw = state.lm_pos[lm]
    Xa_cur = T_a.apply(Xw)
    Xj_cur = SE3(T_j.q, T_j.t).apply(Xw)
    e_cur = (jnp.linalg.norm(cam.project(Xa_cur) - px_a, axis=-1)
             + jnp.linalg.norm(cam.project(Xj_cur) - px_j, axis=-1))

    # parallax gate: ≥ ~1° between the two rays (in the anchor frame)
    rot_fj = T_aj.rotate(f_j)
    cosang = jnp.sum(f_a * rot_fj, axis=-1)
    good = (cand & (z_a > 0.1) & (z_j > 0.1)
            & (cosang < jnp.cos(jnp.deg2rad(1.0)))
            & (e_new < e_cur))

    X_w_new = T_a.inverse().apply(X_a)
    lm_pos = masked_scatter_set(state.lm_pos, lm, X_w_new, good)
    return state._replace(lm_pos=lm_pos)


def build_ba_problem(state: MapState, cfg: SlamConfig) -> BAProblem:
    """Assemble the window's BA problem (the exact inputs run_local_ba
    solves — also consumed by the Ceres-oracle validation harness,
    tools/ref_native/ba_oracle.cpp).

    Gauge/constant policy (reference optimizer.cpp:94-107,235-247):
    low-covisibility keyframes are constant; the two oldest live ones
    are always constant.  Divergence (document-and-diverge): with only
    TWO live keyframes (the bootstrap pair) the second-oldest stays
    FREE — otherwise the init baseline direction is frozen forever and
    a skewed essential bootstrap can never be repaired (the rotation
    gauge + reprojection keep the problem well-posed; monocular scale
    is held by LM damping).
    """
    slot = state.cur_kf_slot
    covis = covisibility(state)
    score = covis[:, slot]
    constant = (score < cfg.ba_min_covisibility) & state.kf_valid
    ids = jnp.where(state.kf_valid, state.kf_id, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(ids)
    n_live = jnp.sum(state.kf_valid)
    constant = constant.at[order[0]].set(True)
    constant = constant.at[order[1]].set(
        jnp.where(n_live >= 3, True, constant[order[1]]))
    constant = constant | ~state.kf_valid

    obs_lm = state.kf_obs_lm
    ba_obs = (state.kf_obs_valid
              & state.lm_valid[obs_lm] & state.lm_is3d[obs_lm])

    return BAProblem(
        poses=state.kf_pose, kf_valid=state.kf_valid, constant=constant,
        anchor_kf=state.lm_anchor, anchor_mxy=state.lm_mxy,
        invdepth=state.lm_invd, lm_valid=state.lm_valid & state.lm_is3d,
        obs_lm=obs_lm, obs_px=state.kf_obs_px, obs_valid=ba_obs)


def run_local_ba(state: MapState, cam: Camera, cfg: SlamConfig) -> MapState:
    """Local BA over the window + write-back + outlier pruning + culling
    (reference mapper.cpp:63-71 optimize → optimizer.cpp localBA)."""
    slot = state.cur_kf_slot
    prob = build_ba_problem(state, cfg)
    obs_lm = prob.obs_lm
    ba_obs = prob.obs_valid
    res = local_ba(prob, cam, iters=cfg.ba_iters, refine_iters=2,
                   huber_delta=cfg.huber_thresh)

    # write back poses and landmark positions
    lm_pos = landmark_world_positions(
        res.poses, state.lm_anchor, state.lm_mxy, res.invdepth)
    lm_pos = jnp.where((state.lm_valid & state.lm_is3d)[:, None],
                       lm_pos, state.lm_pos)

    # prune outlier observations (reference optimizer.cpp:361-530)
    remove = ba_obs & ~res.obs_inlier                     # [W, K]
    kf_obs_valid = state.kf_obs_valid & ~remove
    W, K = remove.shape
    w_idx = jnp.repeat(jnp.arange(W), K)
    lm_obs = state.lm_obs.at[obs_lm.reshape(-1), w_idx].min(
        ~remove.reshape(-1))

    # cull landmarks: 3D with <2 observers and no live track
    bound = _lm_bound_in_frame(state)
    n_obs = jnp.sum(lm_obs & state.kf_valid[None, :], axis=1)
    lm_valid = state.lm_valid & ~(state.lm_is3d & (n_obs < 2) & ~bound)

    # the new keyframe's pose moved → current frame pose follows it
    new_pose = jax.tree.map(lambda x: x[slot], res.poses)

    return state._replace(
        kf_pose=res.poses, lm_invd=res.invdepth, lm_pos=lm_pos,
        kf_obs_valid=kf_obs_valid, lm_obs=lm_obs, lm_valid=lm_valid,
        pose=new_pose)


def filter_redundant_keyframes(state: MapState, cfg: SlamConfig) -> MapState:
    """Remove keyframes whose 3D observations are redundantly covered
    (reference mapper.cpp:75-141): a keyframe dies when more than
    ``kf_filtering_ratio`` (0.95) of its 3D landmarks are observed by more
    than 4 keyframes, or when it has fewer than ba_min_covisibility/2 3D
    observations.  The newest keyframe and keyframe 0 are exempt; the
    filter only runs once ≥20 keyframes exist (mapper.cpp:77)."""
    if cfg.kf_filtering_ratio >= 1.0:
        return state
    W = cfg.window_size
    slot = state.cur_kf_slot

    lm3d = state.lm_valid & state.lm_is3d
    n_obs_lm = jnp.sum(state.lm_obs & state.kf_valid[None, :], axis=1)
    well_observed = lm3d & (n_obs_lm > 4)

    obs3d = (state.kf_obs_valid
             & lm3d[state.kf_obs_lm])                       # [W, K]
    good = obs3d & well_observed[state.kf_obs_lm]
    n_total = jnp.sum(obs3d, axis=1)
    n_good = jnp.sum(good, axis=1)
    ratio = n_good.astype(jnp.float32) / jnp.maximum(n_total, 1).astype(jnp.float32)

    eligible = (state.kf_valid
                & (jnp.arange(W) != slot)
                & (state.kf_id > 0)
                & (state.next_kf_id - 1 >= 20))
    too_sparse = n_total < cfg.ba_min_covisibility // 2
    remove = eligible & ((ratio > cfg.kf_filtering_ratio) | too_sparse)

    kf_valid = state.kf_valid & ~remove
    kf_obs_valid = state.kf_obs_valid & ~remove[:, None]
    lm_obs = state.lm_obs & kf_valid[None, :]
    # cull landmarks that lost their support
    bound = _lm_bound_in_frame(state)
    n_obs = jnp.sum(lm_obs & kf_valid[None, :], axis=1)
    lm_valid = state.lm_valid & ~(state.lm_is3d & (n_obs < 2) & ~bound)
    return state._replace(kf_valid=kf_valid, kf_obs_valid=kf_obs_valid,
                          lm_obs=lm_obs, lm_valid=lm_valid)


def create_keyframe(state: MapState, pyr, cam: Camera,
                    cfg: SlamConfig) -> MapState:
    """Full keyframe pipeline (reference visual_frontend.cpp:27-33 →
    map_manager createKeyframe → mapper processNewKeyframe).

    ``pyr``: the keyframe image pyramid (level 0 first)."""
    state = evict_and_write_keyframe(state, cfg)
    state = describe_and_detect(state, pyr, cam, cfg)

    is_later_kf = state.next_kf_id > 1  # next_kf_id already incremented
    state = jax.lax.cond(
        is_later_kf,
        lambda s: triangulate_temporal(s, cam, cfg),
        lambda s: s,
        state)
    # local-map matching + merge (reference mapper.cpp:59,293-588)
    state = jax.lax.cond(
        is_later_kf,
        lambda s: match_to_local_map(s, cam, cfg),
        lambda s: s,
        state)
    # wide-baseline depth refinement of existing landmarks (beyond
    # reference parity — see refine_landmark_depths)
    state = jax.lax.cond(
        is_later_kf,
        lambda s: refine_landmark_depths(s, cam, cfg),
        lambda s: s,
        state)
    state = reanchor_landmarks(state, cfg)

    # bad-bootstrap detection (reference mapper.cpp:27-50)
    n3d_now = jnp.sum(state.kp_valid & state.lm_is3d[state.kp_lm]
                      & state.lm_valid[state.kp_lm])
    kf_idx = state.next_kf_id - 1
    bad_boot = state.ready_for_init & (
        ((kf_idx == 1) & (n3d_now < 30))
        | ((kf_idx < 10) & (kf_idx >= 2) & (n3d_now < 3)))

    # BA from the SECOND keyframe on (the bootstrap pair gets a two-view
    # refinement pass the reference never does — its first local BA
    # waits for the third keyframe)
    run_ba = (kf_idx >= 1) & (n3d_now > 0) & ~bad_boot
    state = jax.lax.cond(
        run_ba,
        lambda s: run_local_ba(s, cam, cfg),
        lambda s: s,
        state)
    # redundancy filtering after BA (reference mapper.cpp:63-141 order)
    state = filter_redundant_keyframes(state, cfg)
    return state._replace(
        reset_requested=state.reset_requested | bad_boot)
