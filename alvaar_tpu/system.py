"""AlvaAR-compatible system facade over the TPU pipeline.

Mirrors the reference's public API surface (reference src/system.js:47-236
and src/slam/src/system.{hpp,cpp}): ``Initialize``-style construction from
(width, height, fov), ``findCameraPose``, ``findCameraPoseWithIMU``,
``findPlane``, ``getFramePoints``, ``reset`` — with the same status
semantics (1 = tracking → pose returned; 2 = reset → None; 3 =
initializing → None) and the same default intrinsics guess (fx = fy from
the min-axis FoV rule, zero distortion — system.js:84-141).

The host↔device contract (the reference's JS↔WASM shared-heap ABI,
system.js:63-67) maps to: one frame upload per call, the entire MapState
resident on device across calls, and small pose/point readbacks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from alvaar_tpu.config import SlamConfig
from alvaar_tpu.frontend.step import slam_step
from alvaar_tpu.geom.camera import Camera
from alvaar_tpu.geom.lie import SE3, quat_conj, quat_mul, quat_to_matrix
from alvaar_tpu.ops.image import rgba_to_gray
from alvaar_tpu.solvers.plane import find_plane_ransac
from alvaar_tpu.worldmap.state import init_map_state


def pose_to_array(T_wc: np.ndarray) -> np.ndarray:
    """4x4 → 16-float column-major array, the reference's wire format
    (reference utils.cpp:3-27 toPoseArray)."""
    return np.asarray(T_wc, np.float32).T.reshape(-1).copy()


def pose_to_three(T_wc: np.ndarray) -> tuple:
    """4x4 T_wc → (quaternion (x,y,z,w), position (x,y,z)) with the
    renderer handedness flips of the reference's Three.js connector
    (reference dist/alva_ar_three.js:27-38: quaternion (-x, y, z, w),
    position (x, -y, -z))."""
    from alvaar_tpu.geom.lie import matrix_to_quat
    import jax.numpy as _jnp

    q = np.asarray(matrix_to_quat(_jnp.asarray(T_wc[:3, :3])))  # (w,x,y,z)
    t = np.asarray(T_wc[:3, 3])
    quat_xyzw = np.array([-q[1], q[2], q[3], q[0]], np.float32)
    pos = np.array([t[0], -t[1], -t[2]], np.float32)
    return quat_xyzw, pos


class AlvaAR:
    """Monocular visual SLAM with the AlvaAR API, TPU-native inside."""

    def __init__(self, width: int, height: int, fov: float = 45.0,
                 config: Optional[SlamConfig] = None,
                 camera: Optional[Camera] = None,
                 enable_loop_closure: bool = False,
                 loop_db_capacity: int = 256,
                 loop_delay: int = 50):
        self.config = (config or SlamConfig())
        if self.config.width != width or self.config.height != height:
            self.config = SlamConfig(
                **{**{f.name: getattr(self.config, f.name)
                      for f in self.config.__dataclass_fields__.values()},
                   "width": width, "height": height})
        self.camera = camera if camera is not None else Camera.from_fov(
            width, height, fov)
        self.state = init_map_state(self.config)
        self._last_out = None
        self._last_ts: Optional[float] = None
        # IMU-fusion accumulators (reference system.cpp:87-101)
        self._imu_translation = np.zeros(3, np.float64)
        self._imu_prev_slam_t: Optional[np.ndarray] = None

        # loop closure (capability beyond the reference, which vendors
        # iBoW-LCD but never links it — SURVEY §2.3)
        self.loop_db = None
        self.last_loop = None
        self.last_loop_correction = None
        self.loop_delay = loop_delay
        if enable_loop_closure:
            from alvaar_tpu.loopclosure.detector import db_init
            self.loop_db = db_init(loop_db_capacity, self.config.max_keypoints)

        self._find_plane_cache = {}

    def _find_plane(self, iters: int):
        """Per-iteration-count jitted plane solver (iters is static)."""
        fn = self._find_plane_cache.get(iters)
        if fn is None:
            cfg = self.config
            fn = jax.jit(lambda key, pts, valid, cam_c: find_plane_ransac(
                key, pts, valid, cam_c, iters=iters,
                min_points=cfg.plane_min_points,
                max_tilt_deg=cfg.plane_max_tilt_deg,
                inlier_scale=cfg.plane_inlier_scale))
            self._find_plane_cache[iters] = fn
        return fn

    # ------------------------------------------------------------------
    def _to_gray(self, frame) -> jax.Array:
        frame = jnp.asarray(frame)
        if frame.ndim == 3:
            return rgba_to_gray(frame)
        return frame.astype(jnp.float32)

    def _dt(self, timestamp: Optional[float]) -> float:
        """Inter-frame dt from caller timestamps (seconds); 1.0 per frame
        when the caller provides none.  The reference stamps frames with
        wall-clock time inside the engine (system.cpp:114, a documented
        quirk); here time comes from the caller (SURVEY §7)."""
        if timestamp is None:
            self._last_ts = None
            return 1.0
        dt = 1.0 if self._last_ts is None else float(timestamp) - self._last_ts
        self._last_ts = float(timestamp)
        return dt if dt > 0 else 1.0

    def find_camera_pose(self, frame,
                         timestamp: Optional[float] = None
                         ) -> Optional[np.ndarray]:
        """Run one SLAM iteration.  Returns the 4x4 camera-to-world pose
        (T_wc) when tracking (status 1), else None (status 2/3 — reference
        system.js:179-199 returns the pose only on status 1).

        ``timestamp``: frame time in seconds; enables dt-scaled
        constant-velocity extrapolation under frame drops."""
        gray = self._to_gray(frame)
        self.state, out = slam_step(self.state, gray, self.camera,
                                    self.config, self._dt(timestamp))
        self._last_out = out
        self.last_status = int(out.status)
        if self.loop_db is not None:
            if bool(out.is_keyframe):
                self._on_keyframe()
            # auto-relocalization: when PnP keeps failing and a reset is
            # imminent, try recovering the pose against the loop database
            # BEFORE the engine's terminal reset fires (the reference's
            # only recovery is reset + re-init, SURVEY §3.5 — this
            # exceeds parity)
            elif (self.last_status == 1
                  and int(self.state.pose_failures) >= 2):
                self._try_autorelocalize()
        if self.last_status == 1:
            return np.asarray(out.pose_wc)
        return None

    # ------------------------------------------------------------------
    def _on_keyframe(self) -> None:
        """Push the new keyframe into the loop database, query it, and —
        on a confirmed loop — apply a world-frame gauge correction
        (reference pipeline lcdetector.cc:54-267 stops at detection; the
        correction step exceeds parity, see apply_world_correction)."""
        from alvaar_tpu.loopclosure.detector import (db_add, detect_loop,
                                                     relocalize)

        st = self.state
        slot = int(st.cur_kf_slot)
        lm = st.kf_obs_lm[slot]
        desc = st.lm_desc[lm]
        kf_id = st.kf_id[slot]
        pose = SE3(st.kf_pose.q[slot], st.kf_pose.t[slot])
        valid = st.kf_obs_valid[slot] & st.lm_valid[lm]
        self.loop_db, res = detect_loop(self.loop_db, desc, valid, kf_id,
                                        delay=self.loop_delay)
        self.loop_db = db_add(
            self.loop_db, desc, st.lm_pos[lm],
            st.lm_is3d[lm] & valid, valid, kf_id, pose)
        self.last_loop = res if bool(res.found) else None
        self.last_loop_correction = None
        if self.last_loop is not None:
            # geometric verification + correction: P3P the current frame
            # against the matched entry's stored 3D landmarks
            key, sub = jax.random.split(st.rng_key)
            self.state = st = st._replace(rng_key=key)
            r = relocalize(self.loop_db, res.entry, desc,
                           self.camera.bearing(st.kf_obs_px[slot]), valid,
                           sub,
                           focal=0.5 * (self.camera.fx + self.camera.fy))
            if bool(r.success):
                from alvaar_tpu.worldmap.state import apply_world_correction
                T_reloc_wc = SE3(r.pose.q, r.pose.t).inverse()
                T_cur_cw = SE3(st.pose.q, st.pose.t)
                dT = T_reloc_wc.compose(T_cur_cw)   # world_old → world_loop
                self.state = apply_world_correction(st, dT)
                self.last_loop_correction = np.asarray(dT.matrix())

    def relocalize(self) -> Optional[np.ndarray]:
        """Attempt pose recovery against the loop database using the
        current frame's tracked keypoints (descriptor match + P3P-LMedS).
        Returns a 4x4 T_wc or None.  This is a capability the reference
        lacks — its only recovery is full reset + re-init (SURVEY §3.5).

        One batched program: candidate voting + top-k entry P3P under
        vmap (loopclosure/detector.py relocalize_topk), not a per-entry
        host loop."""
        res = self._relocalize_solve()
        if res is None or not bool(res.success):
            return None
        return np.asarray(SE3(res.pose.q, res.pose.t).inverse().matrix())

    def _relocalize_solve(self):
        if self.loop_db is None or self._last_out is None:
            return None
        from alvaar_tpu.loopclosure.detector import relocalize_topk

        st = self.state
        key, sub = jax.random.split(st.rng_key)
        self.state = st = st._replace(rng_key=key)
        n_live = int(jnp.sum(st.kp_valid))
        if n_live >= 20:
            desc = st.lm_desc[st.kp_lm]
            bearings = self.camera.bearing(st.kp_und)
            valid = st.kp_valid
        else:
            # cold lost state (tracks gone): detect + describe fresh
            # features on the last frame held in the state — the
            # ORB-SLAM-style relocalization mode the stale keypoint
            # table cannot serve
            desc, bearings, valid = self._describe_current_frame()
        return relocalize_topk(
            self.loop_db, desc, bearings, valid, sub,
            focal=0.5 * (self.camera.fx + self.camera.fy))

    def _describe_current_frame(self):
        """Fresh detection + description on the last processed frame
        (state.prev_pyr[0]); returns (desc [K,8], bearings [K,3],
        valid [K])."""
        fn = getattr(self, "_describe_frame_fn", None)
        if fn is None:
            cfg, cam = self.config, self.camera

            @jax.jit
            def fn(gray):
                from alvaar_tpu.ops.detect import detect_grid
                from alvaar_tpu.ops.orb import describe
                det = detect_grid(gray, jnp.zeros((1, 2), jnp.float32),
                                  jnp.zeros((1,), bool),
                                  cell=cfg.cell_size,
                                  border=cfg.image_border,
                                  quality=cfg.detector_quality)
                desc, _ = describe(gray, det.xy, det.valid)
                und = cam.undistort(det.xy)
                return desc, cam.bearing(und), det.valid

            self._describe_frame_fn = fn
        return fn(self.state.prev_pyr[0])

    def _try_autorelocalize(self) -> bool:
        """On impending tracking loss (consecutive PnP failures), snap the
        engine's pose back to a database-recovered one so the next PnP
        gets a loop-consistent prior instead of escalating to reset."""
        res = self._relocalize_solve()
        if res is None or not bool(res.success):
            return False
        self.state = self.state._replace(
            pose=SE3(res.pose.q, res.pose.t),
            vel=jnp.zeros_like(self.state.vel),
            pose_failures=jnp.zeros_like(self.state.pose_failures),
            p3p_req=jnp.asarray(True))
        return True

    def find_camera_pose_with_imu(self, frame, orientation, motion=None,
                                  timestamp: Optional[float] = None
                                  ) -> np.ndarray:
        """IMU-attitude + visual-odometry-translation fusion (reference
        system.cpp:57-104): the returned rotation comes from the device
        orientation quaternion ((w, x, y, z), mirrored like the reference's
        −x convention), the translation from accumulated SLAM deltas.
        Motion (gyro/accel) samples are accepted for API parity; the
        reference parses and discards them (system.cpp:75-81) — full VIO is
        future work there and here.  Always returns a pose (status 1),
        like the reference (system.cpp:103)."""
        gray = self._to_gray(frame)
        self.state, out = slam_step(self.state, gray, self.camera,
                                    self.config, self._dt(timestamp))
        self._last_out = out
        self.last_status = 1

        qw, qx, qy, qz = [float(v) for v in orientation]
        q = jnp.asarray([qw, -qx, qy, qz], jnp.float32)  # mirror x (ref :67)
        R = np.asarray(quat_to_matrix(quat_conj(q)))     # inverse (ref :70)

        slam_t = np.asarray(out.pose_wc)[:3, 3]
        if int(out.status) == 1:
            if self._imu_prev_slam_t is not None:
                self._imu_translation += slam_t - self._imu_prev_slam_t
            self._imu_prev_slam_t = slam_t.copy()
        else:
            self._imu_prev_slam_t = None

        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = self._imu_translation.astype(np.float32)
        return T

    def find_plane(self,
                   num_iterations: Optional[int] = None) -> Optional[np.ndarray]:
        """Dominant horizontal plane among currently observed 3D map
        points (reference system.cpp:123-137,177-342).  Returns a 4x4
        plane-to-world pose or None.  Iteration count defaults to
        ``config.plane_iters`` (the reference's JS default 250,
        system.js:202)."""
        if num_iterations is None:
            num_iterations = self.config.plane_iters
        st = self.state
        bound3d = (st.kp_valid & st.lm_valid[st.kp_lm]
                   & st.lm_is3d[st.kp_lm])
        # one entry per bound landmark (kp binding is unique per landmark)
        pts = st.lm_pos[st.kp_lm]
        cam_c = SE3(st.pose.q, st.pose.t).inverse().t
        key, sub = jax.random.split(st.rng_key)
        self.state = st._replace(rng_key=key)
        res = self._find_plane(num_iterations)(sub, pts, bound3d, cam_c)
        if not bool(res.success):
            return None
        pose = SE3(res.pose.q, res.pose.t)
        return np.asarray(pose.matrix())

    def get_frame_points(self) -> np.ndarray:
        """[N, 2] int32 tracked keypoint pixels of the last processed frame
        (reference system.cpp:139-154 / system.js:214-231 — without the
        reference's buffer over-run quirk, SURVEY §7)."""
        if self._last_out is None:
            return np.zeros((0, 2), np.int32)
        pts = np.asarray(self._last_out.points)
        valid = np.asarray(self._last_out.points_valid)
        return pts[valid].astype(np.int32)

    def get_map_points(self, colored: bool = True):
        """Export the current 3D map as a point cloud.

        Returns (points [N, 3] float32 world positions, colors [N] uint8
        grayscale) when ``colored`` (reference MapManager::getPointCloud,
        map_manager.cpp:254-318 — its colored viz export), else just the
        points."""
        st = self.state
        mask = np.asarray(st.lm_valid & st.lm_is3d)
        pts = np.asarray(st.lm_pos)[mask]
        if not colored:
            return pts
        colors = np.clip(np.asarray(st.lm_color)[mask], 0, 255
                         ).astype(np.uint8)
        return pts, colors

    def save_map(self, path: str) -> None:
        """Persist the full SLAM map to ``path`` (io/checkpoint.py)."""
        from alvaar_tpu.io.checkpoint import save_map
        save_map(path, self.state, self.config)

    def load_map(self, path: str) -> None:
        """Restore a map saved by :meth:`save_map`; tracking resumes
        against it on the next frame (relocalize first if the camera
        moved)."""
        from alvaar_tpu.io.checkpoint import load_map
        self.state = load_map(path, self.config)
        self._last_ts = None

    def reset(self) -> None:
        """Full reset (reference system.cpp:42-55)."""
        self.state = init_map_state(self.config)._replace(
            rng_key=self.state.rng_key)
        self._last_out = None
        self._last_ts = None
        self._imu_translation[:] = 0
        self._imu_prev_slam_t = None
