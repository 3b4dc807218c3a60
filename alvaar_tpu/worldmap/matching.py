"""Local-map projection matching + landmark merging.

TPU-native equivalent of the reference's Mapper::matchingToLocalMap /
matchToMap / MapManager::mergeMapPoints (reference src/slam/src/
mapper.cpp:293-588, map_manager.cpp:428-513): when a new keyframe is made,
established 3D map points NOT observed by it are projected in; if a
current keypoint lies within 2 px of the projection, has a similar binary
descriptor (best/second Hamming NNDR 0.9, absolute gate 0.2·256 bits), was
never co-observed with the candidate in any keyframe, and the candidate
re-projects consistently into the keypoint's own observers, then the
keypoint's (young) landmark is MERGED into the established one — its
observations transfer, the young slot dies, and the live track re-binds.

This is the map-reuse mechanism that kills duplicate landmarks and
re-grounds tracking in previously-mapped territory.

TPU-first shape: the reference loops map points × surrounding-grid
keypoints with hash lookups; here it is three dense [L, K] passes —
a projection-distance matrix, an MXU Hamming matrix, and an incidence
matmul for the disjointness test — followed by masked argmin selection and
vectorized merge scatters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from alvaar_tpu.config import SlamConfig
from alvaar_tpu.geom.camera import Camera
from alvaar_tpu.geom.lie import SE3
from alvaar_tpu.ops.hamming import hamming_min_crossbag
from alvaar_tpu.worldmap.state import MapState, masked_scatter_set

MAX_PROJ_PX = 2.0           # reference state.hpp:63


def match_to_local_map(state: MapState, cam: Camera,
                       cfg: SlamConfig) -> MapState:
    """Match unobserved 3D landmarks into the new keyframe and merge."""
    slot = state.cur_kf_slot
    K = state.kp_lm.shape[0]
    L = state.lm_valid.shape[0]
    W = state.kf_valid.shape[0]

    kp_lm = state.kp_lm
    kp_young = state.lm_valid[kp_lm] & state.kp_valid

    # ---- candidate old landmarks: valid, 3D, not observed by this kf ----
    cand = (state.lm_valid & state.lm_is3d & ~state.lm_obs[:, slot])
    Xc = state.pose.apply(state.lm_pos)              # current-cam frame
    z = Xc[:, 2]
    view_cos = z / jnp.linalg.norm(Xc, axis=-1).clip(1e-9)
    fov_v = 0.5 * cfg.height / cam.fy
    fov_h = 0.5 * cfg.width / cam.fx
    view_th = jnp.cos(jnp.arctan(jnp.maximum(fov_h, fov_v)))
    proj = cam.project_dist(Xc)
    in_img = cam.in_roi(proj, cfg.width, cfg.height, border=1)
    cand = cand & (z > 0.1) & (jnp.abs(view_cos) >= view_th) & in_img

    n3d_frame = jnp.sum(state.kp_valid & state.lm_is3d[kp_lm]
                        & state.lm_valid[kp_lm])
    max_px = jnp.where(n3d_frame < 30, 2.0 * MAX_PROJ_PX, MAX_PROJ_PX)

    # ---- [L, K] gates ----
    px_dist = jnp.linalg.norm(proj[:, None, :] - state.kp_px[None, :, :],
                              axis=-1)
    # disjoint observers: candidate lm and keypoint's lm never share a kf
    inc = (state.lm_obs & state.kf_valid[None, :]).astype(jnp.float32)
    overlap = jnp.dot(inc, inc[kp_lm].T,
                      preferred_element_type=jnp.float32)  # [L, K]
    # bag-aware distance: min cross-bag Hamming (reference
    # map_point.cpp:204-222 computeMinDescDist — the single-representative
    # distance is weaker exactly under the viewpoint change where merging
    # matters)
    G = state.lm_desc_bag.shape[1]
    filled = jnp.arange(G)[None, :] < jnp.minimum(state.lm_desc_cnt, G)[:, None]
    desc_dist = hamming_min_crossbag(
        state.lm_desc_bag, filled,
        state.lm_desc_bag[kp_lm], filled[kp_lm])           # [L, K]

    max_desc = float(cfg.match_max_hamming)
    pair_ok = (cand[:, None] & kp_young[None, :]
               & (px_dist <= max_px)
               & (overlap < 0.5)
               & (kp_lm[None, :] != jnp.arange(L)[:, None]))

    BIG = jnp.asarray(1e9, jnp.float32)
    d = jnp.where(pair_ok, desc_dist.astype(jnp.float32), BIG)

    # ---- per-landmark best/second NNDR (reference mapper.cpp:523-545) ----
    neg2, idx2 = jax.lax.top_k(-d, 2)                 # [L, 2]
    best, sec = -neg2[:, 0], -neg2[:, 1]
    best_k = idx2[:, 0]
    lm_match_ok = (best <= max_desc) & ~(cfg.match_nndr * sec < best)

    # ---- per-keypoint: keep the lowest-distance landmark ----
    lm_best = jnp.where(lm_match_ok, best, BIG)
    # scatter-min over keypoints
    kp_best = jnp.full((K,), 1e9, jnp.float32).at[best_k].min(
        jnp.where(lm_match_ok, lm_best, BIG))
    is_winner = lm_match_ok & (lm_best <= kp_best[best_k] + 1e-6)
    # tie-break duplicates deterministically: lowest landmark id wins
    winner_lm = jnp.full((K,), L, jnp.int32).at[best_k].min(
        jnp.where(is_winner, jnp.arange(L, dtype=jnp.int32), L))
    merge = (winner_lm < L) & kp_young                 # [K]
    old_lm = jnp.clip(winner_lm, 0, L - 1)

    # ---- co-keyframe reprojection gate on the K selected pairs ----
    # avg over the young lm's observers of ||obs px − proj(old lm)||
    young = kp_lm                                      # [K]
    obs_y = state.lm_obs[young] & state.kf_valid[None, :]  # [K, W]
    # stable-slot invariant: young lm's pixel in kf w is kf_obs_px[w, k]
    k_idx = jnp.arange(K)
    same = (state.kf_obs_lm[:, k_idx] == young[None, :]) & \
        state.kf_obs_valid[:, k_idx]                   # [W, K]
    obs_y = obs_y & same.T
    pos_old = state.lm_pos[old_lm]                     # [K, 3]
    # project old lm into every kf: [W, K, 2].  Undistorted projection —
    # kf_obs_px stores undistorted pixels (keyframe.py writes kp_und), so
    # a distorted projection would bias the gate for distorted cameras.
    proj_kw = jax.vmap(
        lambda q, t: cam.project(SE3(q, t).apply(pos_old))
    )(state.kf_pose.q, state.kf_pose.t)                # [W, K, 2]
    co_d = jnp.linalg.norm(proj_kw - state.kf_obs_px[:, k_idx], axis=-1)
    n_co = jnp.sum(obs_y.T, axis=0)                    # [K]
    co_avg = jnp.sum(jnp.where(obs_y.T, co_d, 0.0), axis=0) / \
        jnp.maximum(n_co, 1).astype(jnp.float32)
    merge = merge & ((n_co == 0) | (co_avg <= max_px))

    # ---- vectorized merge ----
    # 1. transfer young observations to old: obs rows OR
    young_rows = state.lm_obs[young] & merge[:, None]  # [K, W]
    lm_obs = state.lm_obs.at[jnp.where(merge, old_lm, L - 1)].max(
        jnp.where(merge[:, None], young_rows, False))
    # (route masked-out rows to a no-op via max(False))
    # 2. rewrite keyframe observation tables: wherever kf_obs_lm == young
    #    (for merged k) point it at old_lm
    rewrite = same & merge[None, :] & state.kf_obs_valid[:, k_idx]
    kf_obs_lm = jnp.where(rewrite, old_lm[None, :], state.kf_obs_lm)
    # 3. kill young landmarks
    lm_valid = masked_scatter_set(
        state.lm_valid, young, jnp.zeros((K,), bool), merge)
    lm_obs = masked_scatter_set(
        lm_obs, young, jnp.zeros((K, W), bool), merge)
    # 4. rebind current-frame keypoints
    kp_lm_new = jnp.where(merge, old_lm, kp_lm)

    return state._replace(kp_lm=kp_lm_new, kf_obs_lm=kf_obs_lm,
                          lm_obs=lm_obs, lm_valid=lm_valid)
