"""The SLAM map as one fixed-shape device-resident pytree.

TPU-native replacement for the reference's pointer-graph map
(reference src/slam/src/{frame,map_point,map_manager}.{hpp,cpp}):
``unordered_map<int, Keypoint>`` keyed stores, shared_ptr landmark objects,
covisibility score maps — all become masked arrays:

  * the current frame's keypoints: ``[K]`` slots (K = grid-cell budget,
    reference state.cpp:8-11), each slot bound to a landmark pool id;
  * the keyframe window: a ``[W]`` ring buffer (W = 30, the reference's
    hard eviction horizon, mapper.cpp:14-18) with an ``[W, K]`` observation
    table — exactly the shape local BA consumes;
  * the landmark pool: ``[L]`` slots with validity masks, anchored
    inverse-depth parametrization, packed binary descriptors, and an
    ``[L, W]`` observation-incidence matrix that makes covisibility a
    single matmul (reference updateFrameCovisibility's hash-map walk,
    map_manager.cpp:83-164).

Nothing is ever allocated or freed: "removal" flips masks, "creation"
claims free slots via top-k.  The whole map lives on device; the host only
ever sees poses and point exports.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from alvaar_tpu.config import SlamConfig
from alvaar_tpu.geom.lie import SE3


class MapState(NamedTuple):
    # ---- current frame -------------------------------------------------
    pose: SE3            # T_cw of the current frame
    kp_px: jax.Array     # [K, 2] raw (distorted) pixel positions
    kp_und: jax.Array    # [K, 2] undistorted pixel positions
    kp_lm: jax.Array     # [K] int32 landmark pool slot per keypoint
    kp_valid: jax.Array  # [K] bool
    prev_pyr: Tuple[jax.Array, ...]  # previous frame pyramid (KLT source)

    # ---- keyframe ring [W] ----------------------------------------------
    kf_pose: SE3          # [W] T_cw
    kf_valid: jax.Array   # [W] bool
    kf_id: jax.Array      # [W] int32 global keyframe id in each slot (-1 empty)
    kf_obs_lm: jax.Array     # [W, K] int32 landmark slot observed
    kf_obs_px: jax.Array     # [W, K, 2] undistorted obs pixels
    kf_obs_valid: jax.Array  # [W, K] bool

    # ---- landmark pool [L] -----------------------------------------------
    lm_pos: jax.Array     # [L, 3] world position (valid iff lm_is3d)
    lm_anchor: jax.Array  # [L] int32 ring slot of the anchor keyframe
    lm_mxy: jax.Array     # [L, 2] normalized coords in the anchor frame
    lm_invd: jax.Array    # [L] inverse depth in the anchor frame
    lm_valid: jax.Array   # [L] bool
    lm_is3d: jax.Array    # [L] bool (triangulated)
    lm_obs: jax.Array     # [L, W] bool observation incidence
    lm_desc: jax.Array    # [L, 8] uint32 representative descriptor
    lm_desc_bag: jax.Array  # [L, G, 8] uint32 descriptor bag (ring)
    lm_desc_cnt: jax.Array  # [L] int32 descriptors ever pushed (ring ptr)
    lm_color: jax.Array   # [L] float32 intensity at detection (viz export,
                          # reference map_point.hpp color_ / getPointCloud)

    # ---- motion model (reference visual_frontend.hpp:11-68) ---------------
    vel: jax.Array        # [6] se3 log of frame-to-frame motion (T_wc convention)

    # ---- bookkeeping scalars ----------------------------------------------
    frame_id: jax.Array        # int32
    next_kf_id: jax.Array      # int32 — id the NEXT keyframe will get
    cur_kf_slot: jax.Array     # int32 ring slot of the latest keyframe
    last_kf_frame_id: jax.Array  # frame id at which the latest keyframe was made
    ready_for_init: jax.Array  # bool — 5-pt bootstrap succeeded (slamReadyForInit_)
    pose_failures: jax.Array   # int32 consecutive PnP failures
    reset_requested: jax.Array  # bool
    p3p_req: jax.Array         # bool — P3P recovery requested (bad KLT/PnP)
    kf_pending: jax.Array      # bool — keyframe requested but deferred by the
                               # multi-stream scheduler (parallel/multistream.py)
    detect_quality: jax.Array  # f32 adaptive detector threshold (reference
                               # FeatureExtractor::maxQuality_, adapted by
                               # fill ratio — feature_extractor.cpp:136-145)
    rng_key: jax.Array         # [2] uint32 PRNG state


def init_map_state(cfg: SlamConfig, dtype=jnp.float32) -> MapState:
    K = cfg.max_keypoints
    W = cfg.window_size
    L = cfg.max_landmarks
    pyr = tuple(jnp.zeros(s, dtype) for s in cfg.pyr_shapes)
    return MapState(
        pose=SE3.identity(dtype=dtype),
        kp_px=jnp.zeros((K, 2), dtype),
        kp_und=jnp.zeros((K, 2), dtype),
        kp_lm=jnp.zeros((K,), jnp.int32),
        kp_valid=jnp.zeros((K,), bool),
        prev_pyr=pyr,
        kf_pose=SE3.identity((W,), dtype),
        kf_valid=jnp.zeros((W,), bool),
        kf_id=jnp.full((W,), -1, jnp.int32),
        kf_obs_lm=jnp.zeros((W, K), jnp.int32),
        kf_obs_px=jnp.zeros((W, K, 2), dtype),
        kf_obs_valid=jnp.zeros((W, K), bool),
        lm_pos=jnp.zeros((L, 3), dtype),
        lm_anchor=jnp.zeros((L,), jnp.int32),
        lm_mxy=jnp.zeros((L, 2), dtype),
        lm_invd=jnp.ones((L,), dtype),
        lm_valid=jnp.zeros((L,), bool),
        lm_is3d=jnp.zeros((L,), bool),
        lm_obs=jnp.zeros((L, W), bool),
        lm_desc=jnp.zeros((L, 8), jnp.uint32),
        lm_desc_bag=jnp.zeros((L, cfg.desc_bag_size, 8), jnp.uint32),
        lm_desc_cnt=jnp.zeros((L,), jnp.int32),
        lm_color=jnp.zeros((L,), dtype),
        vel=jnp.zeros((6,), dtype),
        frame_id=jnp.asarray(0, jnp.int32),
        next_kf_id=jnp.asarray(0, jnp.int32),
        cur_kf_slot=jnp.asarray(0, jnp.int32),
        last_kf_frame_id=jnp.asarray(0, jnp.int32),
        ready_for_init=jnp.asarray(False),
        pose_failures=jnp.asarray(0, jnp.int32),
        reset_requested=jnp.asarray(False),
        p3p_req=jnp.asarray(False),
        kf_pending=jnp.asarray(False),
        detect_quality=jnp.asarray(cfg.detector_quality, jnp.float32),
        rng_key=jax.random.PRNGKey(cfg.seed),
    )


def reset_map_state(state: MapState, cfg: SlamConfig) -> MapState:
    """Full reset preserving only the PRNG stream and the adapted detector
    threshold (reference System::reset, system.cpp:42-55, resets frame,
    frontend, map manager, and state flags — but the FeatureExtractor is
    constructed once in configure, so maxQuality_ survives resets)."""
    fresh = init_map_state(cfg, state.kp_px.dtype)
    return fresh._replace(rng_key=state.rng_key,
                          detect_quality=state.detect_quality)


# ---------------------------------------------------------------------------
# Derived quantities
# ---------------------------------------------------------------------------

def covisibility(state: MapState) -> jax.Array:
    """[W, W] shared-3D-observation counts — the covisibility graph
    (reference map_manager.cpp:83-164) as one matmul over the incidence
    matrix."""
    inc = (state.lm_obs & (state.lm_valid & state.lm_is3d)[:, None])
    f = inc.astype(jnp.float32)
    return jnp.dot(f.T, f, preferred_element_type=jnp.float32).astype(jnp.int32)


def landmark_world_positions(kf_pose: SE3, lm_anchor, lm_mxy, lm_invd):
    """Recompute [L, 3] world positions from the anchored inverse-depth
    parametrization (keeps lm_pos in sync after BA updates)."""
    T_a = jax.tree.map(lambda x: x[lm_anchor], kf_pose)  # T_cw of anchors
    invd_safe = jnp.where(jnp.abs(lm_invd) < 1e-9, 1e-9, lm_invd)
    X_a = jnp.concatenate(
        [lm_mxy, jnp.ones_like(lm_invd)[:, None]], axis=-1) / invd_safe[:, None]
    return T_a.inverse().apply(X_a)


def apply_world_correction(state: MapState, dT: SE3, scale=None) -> MapState:
    """Rigidly re-gauge the whole map by a world-frame transform
    ``X_w' = s · dT · X_w`` (loop-closure correction).

    Applied when a confirmed loop relocalizes the current camera against
    stored geometry: ``dT = T_wc_reloc ∘ T_wc_current⁻¹`` maps the drifted
    world frame onto the loop-consistent one.  Because landmarks are
    anchored inverse-depth (lm_mxy/lm_invd are ANCHOR-frame relative),
    transforming every keyframe pose and world position consistently
    leaves the parametrization valid — no per-landmark re-anchoring.
    ``scale`` optionally corrects monocular scale drift (sim3 gauge);
    it rescales translations and depths about the world origin.

    The reference has no equivalent — its vendored iBoW-LCD is never
    linked and a detected loop would change nothing (SURVEY §2.3);
    this exceeds parity.
    """
    s = jnp.asarray(1.0 if scale is None else scale, state.lm_pos.dtype)
    dT_inv = dT.inverse()

    def fix_pose(T_cw: SE3) -> SE3:
        # T_cw' = T_cw ∘ (s·dT)⁻¹ : rotation from dT, translation rescaled
        out = T_cw.compose(dT_inv)
        return SE3(out.q, s * T_cw.t + T_cw.rotate(
            jnp.broadcast_to(dT_inv.t, T_cw.t.shape)))

    # poses: X_c' = s·X_c (camera-frame depths re-gauge with the map)
    new_pose = fix_pose(state.pose)
    new_kf_pose = fix_pose(state.kf_pose)
    # sim3 action X_w' = s·R_d·X_w + t_d
    new_lm_pos = s * dT.rotate(state.lm_pos) + dT.t
    # inverse depth shrinks as the world grows: z' = s·z
    new_invd = state.lm_invd / s
    return state._replace(pose=new_pose, kf_pose=new_kf_pose,
                          lm_pos=new_lm_pos, lm_invd=new_invd)


def masked_scatter_set(arr, idx, values, mask):
    """Deterministic masked scatter: ``arr[idx[i]] = values[i]`` only where
    ``mask[i]``.

    Plain ``arr.at[idx].set(where(mask, values, arr[idx]))`` is UNSAFE when
    masked-out rows carry stale indices that collide with live writes (the
    scatter winner is unspecified).  Masked-out rows are routed to a padded
    dummy row instead.
    """
    n = arr.shape[0]
    pad = jnp.concatenate([arr, jnp.zeros_like(arr[:1])], axis=0)
    safe_idx = jnp.where(mask, idx, n)
    return pad.at[safe_idx].set(values)[:n]


def allocate_slots(valid_mask, want_mask):
    """Claim free slots in a fixed pool.

    Args:
      valid_mask: [L] bool — occupied slots.
      want_mask: [N] bool — which of N requests actually need a slot.

    Returns:
      slot_idx: [N] int32 — a distinct free slot per request (arbitrary
        for requests with want=False or when the pool is exhausted),
      granted: [N] bool — request satisfied.
    """
    n = want_mask.shape[0]
    free_score = jnp.where(valid_mask, -jnp.inf,
                           -jnp.arange(valid_mask.shape[0], dtype=jnp.float32))
    _, free_slots = jax.lax.top_k(free_score, n)     # first n free slots
    num_free = jnp.sum(~valid_mask)
    # rank of each request among wanted ones
    rank = jnp.cumsum(want_mask.astype(jnp.int32)) - 1
    granted = want_mask & (rank < num_free) & (rank < n)
    slot_idx = free_slots[jnp.clip(rank, 0, n - 1)]
    return slot_idx.astype(jnp.int32), granted
