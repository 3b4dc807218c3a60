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


class PendingResult:
    """Deferred per-frame result from :meth:`AlvaAR.find_camera_pose_async`.

    Holds device-resident outputs; nothing syncs until a property is read.
    This is the TPU-native shape of the reference's per-frame contract
    (reference src/system.js:173-199): the work is dispatched on the call,
    the readback happens when the caller looks — so a caller that reads
    results one frame late (or in batches) never pays the host↔device
    round-trip latency in the frame loop."""

    __slots__ = ("_packed", "_points", "_points_valid", "_np")

    def __init__(self, packed, points, points_valid):
        self._packed = packed
        self._points = points
        self._points_valid = points_valid
        self._np = None
        # start the tiny packed readback as a NON-blocking D2H transfer
        # now, overlapped with subsequent frames' compute: on a tunneled
        # device a synchronous np.asarray costs a full network round-trip
        # (~30 ms) per result, which would dominate the frame loop
        try:
            packed.copy_to_host_async()
        except AttributeError:  # non-jax array (tests pass np arrays)
            pass

    def _sync(self):
        if self._np is None:
            self._np = np.asarray(self._packed)
        return self._np

    @property
    def status(self) -> int:
        return int(self._sync()[0])

    @property
    def pose(self) -> Optional[np.ndarray]:
        """4x4 T_wc when tracking (status 1), else None."""
        p = self._sync()
        if int(p[0]) != 1:
            return None
        return p[1:17].reshape(4, 4).astype(np.float32)

    @property
    def num_tracked(self) -> int:
        return int(self._sync()[17])

    @property
    def num_3d(self) -> int:
        return int(self._sync()[18])

    @property
    def is_keyframe(self) -> bool:
        return bool(self._sync()[19] > 0.5)

    def frame_points(self) -> np.ndarray:
        pts = np.asarray(self._points)
        valid = np.asarray(self._points_valid)
        return pts[valid].astype(np.int32)

    @staticmethod
    def drain(results) -> None:
        """Synchronize MANY pending results with one batched device
        read.  Per-result ``np.asarray`` costs a full host<->device
        round-trip each (milliseconds on a tunneled device); a frame
        loop that reads its results late should drain them in batches.
        """
        pending = [r for r in results if r._np is None]
        if not pending:
            return
        host = jax.device_get([r._packed for r in pending])
        for r, h in zip(pending, host):
            r._np = np.asarray(h)


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
        self.last_loop_inliers = 0
        # Keyframes still inside the live optimization window are NOT
        # loop candidates: their geometry is already constrained by
        # local BA, their DB entries are stale snapshots of a map the
        # BA keeps moving, and a "correction" against one fights the
        # optimizer (observed: corrections vs in-window entries grew
        # terminal drift on the out-and-back e2e).  The reference's
        # p-frame delay plays the same no-recent-frames role
        # (lcdetector.h:51); window residency is the engine-correct
        # floor for it.
        self.loop_delay = max(loop_delay, self.config.window_size)
        if enable_loop_closure:
            from alvaar_tpu.loopclosure.detector import db_init
            self.loop_db = db_init(loop_db_capacity, self.config.max_keypoints)

        self._find_plane_cache = {}
        self._step_cache = {}
        self._scan_cache = {}

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

    def _get_step(self, frame_np):
        """Jitted per-frame step for this frame layout: donated state (the
        map stays in the same HBM buffers across frames), device-side
        gray conversion, and ONE small packed output so a synchronous
        caller pays a single readback round-trip.  packed[20] f32 =
        [status, pose(16, row-major), num_tracked, num_3d, is_keyframe]."""
        key = (frame_np.shape, str(frame_np.dtype))
        fn = self._step_cache.get(key)
        if fn is None:
            cfg, cam = self.config, self.camera
            ndim = len(frame_np.shape)

            def step(state, frame, dt):
                if ndim == 3:
                    gray = rgba_to_gray(frame)
                else:
                    gray = frame.astype(jnp.float32)
                state, out = slam_step(state, gray, cam, cfg, dt)
                packed = jnp.concatenate([
                    out.status[None].astype(jnp.float32),
                    out.pose_wc.reshape(-1),
                    out.num_tracked[None].astype(jnp.float32),
                    out.num_3d[None].astype(jnp.float32),
                    out.is_keyframe[None].astype(jnp.float32)])
                return state, packed, out.points, out.points_valid

            fn = jax.jit(step, donate_argnums=(0,))
            self._step_cache[key] = fn
        return fn

    def _dispatch(self, frame, timestamp) -> PendingResult:
        frame_np = np.asarray(frame)
        step = self._get_step(frame_np)
        # dt as a plain Python float: a traced weak-f32 scalar argument.
        # jnp.float32(dt) here would be a separate tiny device_put per
        # frame — on a tunneled device every transfer costs ~2-5 ms of
        # latency regardless of size, so the per-frame budget allows
        # exactly ONE host->device transfer: the frame itself.
        dt = float(self._dt(timestamp))
        self.state, packed, pts, ptsv = step(
            self.state, jnp.asarray(frame_np), dt)
        res = PendingResult(packed, pts, ptsv)
        self._last_out = res
        return res

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

    @property
    def last_status(self) -> int:
        """Status of the last processed frame (1 tracking / 2 reset /
        3 initializing; reference system.cpp:163-174).  Reading this on a
        pending async result synchronizes it."""
        return self._last_out.status if self._last_out is not None else 0

    def find_camera_pose(self, frame,
                         timestamp: Optional[float] = None
                         ) -> Optional[np.ndarray]:
        """Run one SLAM iteration.  Returns the 4x4 camera-to-world pose
        (T_wc) when tracking (status 1), else None (status 2/3 — reference
        system.js:179-199 returns the pose only on status 1).

        ``timestamp``: frame time in seconds; enables dt-scaled
        constant-velocity extrapolation under frame drops.

        This call is synchronous (pose or None decided before return) and
        costs one host↔device round-trip.  Latency-insensitive callers
        should use :meth:`find_camera_pose_async` or
        :meth:`process_frames`, which pipeline the device work."""
        res = self._dispatch(frame, timestamp)
        self._loop_closure_hooks(res)
        return res.pose

    def find_camera_pose_async(self, frame,
                               timestamp: Optional[float] = None
                               ) -> PendingResult:
        """Dispatch one SLAM iteration WITHOUT waiting for the result.

        Returns a :class:`PendingResult`; reading any of its properties
        synchronizes.  Back-to-back calls pipeline host dispatch over
        device execution, so the frame loop runs at device speed instead
        of round-trip speed.  With loop closure enabled, keyframe
        bookkeeping needs the keyframe flag each frame, which makes this
        equivalent to the synchronous call."""
        res = self._dispatch(frame, timestamp)
        self._loop_closure_hooks(res)
        return res

    def process_frames(self, frames, timestamps=None, chunk: int = 32):
        """Run SLAM over a frame sequence at full device throughput.

        ``frames``: [N, H, W] gray or [N, H, W, 4] RGBA array (or list of
        frames).  Frames are staged to the device in ``chunk``-sized
        batches and the per-frame recurrence runs under one ``lax.scan``
        per batch — the config-1 "video.html workload" shape
        (reference examples/public/video.html:148-195) with the per-call
        ABI costs amortized away.

        Returns (statuses [N] int32, poses [N, 4, 4] float32); pose rows
        are only meaningful where status == 1."""
        frames = np.asarray(frames)
        n = frames.shape[0]
        if timestamps is None:
            dts = np.ones(n, np.float32)
        else:
            ts = np.asarray(timestamps, np.float64)
            dts = np.concatenate([[1.0], np.diff(ts)]).astype(np.float32)
            dts[dts <= 0] = 1.0
            self._last_ts = float(ts[-1])
        # Pad N up to a chunk multiple so ONE compiled scan shape covers
        # any sequence length: pad steps carry valid=False and pass the
        # state through untouched under a lax.cond, costing ~nothing at
        # runtime.  (The previous tail strategy — per-frame step
        # dispatches — cost a host->device round-trip per tail frame
        # through the TPU tunnel, which on a 300-frame/chunk-64 workload
        # [44-frame tail] halved the measured throughput.)
        pad = (-n) % chunk
        if pad:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], pad, axis=0)])
            dts = np.concatenate([dts, np.ones(pad, np.float32)])
        valid = np.ones(n + pad, bool)
        valid[n:] = False
        statuses, poses = [], []
        for lo in range(0, n + pad, chunk):
            fr = frames[lo:lo + chunk]
            scan = self._get_scan(fr)
            self.state, (st, po) = scan(self.state, jnp.asarray(fr),
                                        jnp.asarray(dts[lo:lo + chunk]),
                                        jnp.asarray(valid[lo:lo + chunk]))
            statuses.append(st)
            poses.append(po)
        self._last_out = None
        statuses = np.concatenate([np.asarray(s) for s in statuses])[:n]
        poses = np.concatenate([np.asarray(p) for p in poses])[:n]
        return statuses, poses

    def _get_scan(self, frames_np):
        """Jitted chunk scan keyed by chunk layout (donated state).
        Each step is gated on a per-frame valid flag so padded tails
        pass the state through unchanged (see process_frames)."""
        key = (frames_np.shape, str(frames_np.dtype))
        fn = self._scan_cache.get(key)
        if fn is None:
            cfg, cam = self.config, self.camera
            ndim = len(frames_np.shape) - 1

            def body(state, inp):
                frame, dt, ok = inp

                def run_step(state):
                    if ndim == 3:
                        gray = rgba_to_gray(frame)
                    else:
                        gray = frame.astype(jnp.float32)
                    state, out = slam_step(state, gray, cam, cfg, dt)
                    return state, (out.status, out.pose_wc)

                def skip(state):
                    return state, (jnp.zeros((), jnp.int32),
                                   jnp.zeros((4, 4), jnp.float32))

                return jax.lax.cond(ok, run_step, skip, state)

            def run(state, frames, dts, valid):
                return jax.lax.scan(body, state, (frames, dts, valid))

            fn = jax.jit(run, donate_argnums=(0,))
            self._scan_cache[key] = fn
        return fn

    def _loop_closure_hooks(self, res: PendingResult) -> None:
        if self.loop_db is None:
            return
        # EVERY surviving keyframe must reach the loop database — the
        # reference hands each keyframe to the detector unconditionally
        # (lcdetector.cc:54-69).  The r3 "pipelined facade" regression
        # gated this hook on status==1, which left bootstrap keyframes
        # out of the database entirely and on short loops starved the
        # delay-gated candidate set to zero.  Bootstrap keyframes are
        # NOT pushed at creation though (their landmarks are not
        # triangulated yet — a snapshot then is geometry-free, is3d=0):
        # the first tracking-keyframe hook backfills every older live
        # keyframe with its live, triangulated geometry (_on_keyframe).
        if res.status == 1 and res.is_keyframe:
            self._on_keyframe()
        # auto-relocalization: when PnP keeps failing and a reset is
        # imminent, try recovering the pose against the loop database
        # BEFORE the engine's terminal reset fires (the reference's
        # only recovery is reset + re-init, SURVEY §3.5 — this
        # exceeds parity)
        elif (res.status == 1
              and int(self.state.pose_failures) >= 2):
            self._try_autorelocalize()

    # ------------------------------------------------------------------
    def _push_kf_to_db(self, slot: int) -> None:
        """db_add of one live keyframe ring slot."""
        from alvaar_tpu.loopclosure.detector import db_add
        st = self.state
        lm = st.kf_obs_lm[slot]
        valid = st.kf_obs_valid[slot] & st.lm_valid[lm]
        self.loop_db = db_add(
            self.loop_db, st.lm_desc[lm], st.lm_pos[lm],
            st.lm_is3d[lm] & valid, valid, st.kf_id[slot],
            SE3(st.kf_pose.q[slot], st.kf_pose.t[slot]))

    def _on_keyframe(self) -> None:
        """Push the new keyframe into the loop database, query it, and —
        on a confirmed loop — apply a world-frame gauge correction
        (reference pipeline lcdetector.cc:54-267 stops at detection; the
        correction step exceeds parity, see apply_world_correction)."""
        from alvaar_tpu.loopclosure.detector import detect_loop

        st = self.state
        slot = int(st.cur_kf_slot)
        if int(self.loop_db.ptr) == 0:
            # Backfill keyframes created before the first hook fired
            # (bootstrap keyframes, created while status was still 3):
            # every live ring slot older than the current keyframe, in
            # id order, snapshotted NOW — after init triangulation — so
            # their entries carry real 3D geometry for verification.
            ids = np.asarray(st.kf_id)
            live = np.asarray(st.kf_valid)
            older = [i for i in range(len(ids))
                     if live[i] and i != slot and ids[i] < int(ids[slot])]
            for s2 in sorted(older, key=lambda i: ids[i]):
                self._push_kf_to_db(int(s2))
        lm = st.kf_obs_lm[slot]
        desc = st.lm_desc[lm]
        kf_id = st.kf_id[slot]
        valid = st.kf_obs_valid[slot] & st.lm_valid[lm]
        self.loop_db, res = detect_loop(self.loop_db, desc, valid,
                                        kf_id, delay=self.loop_delay)
        self._push_kf_to_db(slot)
        self.last_loop = res if bool(res.found) else None
        self.last_loop_correction = None
        if self.last_loop is not None:
            # geometric verification + correction: motion-only LM from
            # the CURRENT pose against the matched entry's stored 3D
            # landmarks (detector.verify_loop).  Verification must start
            # from the current pose — P3P from scratch picks the
            # spurious far branch on near-coplanar matches and its
            # "correction" then REPLACES drift with a trajectory-scale
            # jump (observed: |dT| 1.85 on a 1.8 m track); the cold
            # P3P path stays in relocalize() where it belongs.
            from alvaar_tpu.loopclosure.detector import verify_loop
            pose_kf = SE3(st.kf_pose.q[slot], st.kf_pose.t[slot])
            r_pose, r_ok, n_in = verify_loop(
                self.loop_db, res.entry, desc, st.kf_obs_px[slot], valid,
                self.camera, pose_kf)
            self.last_loop_inliers = int(n_in)
            if bool(r_ok):
                from alvaar_tpu.worldmap.state import apply_world_correction
                T_reloc_wc = SE3(r_pose.q, r_pose.t).inverse()
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
            def fn(gray, dimg, quality):
                from alvaar_tpu.ops.detect import detect_grid
                from alvaar_tpu.ops.orb import describe
                det = detect_grid(gray, jnp.zeros((1, 2), jnp.float32),
                                  jnp.zeros((1,), bool),
                                  cell=cfg.cell_size,
                                  border=cfg.image_border,
                                  quality=quality)
                # descriptors at the tracking level — the scale the loop
                # DB entries were described at (worldmap/keyframe.py
                # describe_and_detect)
                desc, _ = describe(dimg,
                                   det.xy / float(2 ** cfg.track_base_level),
                                   det.valid)
                und = cam.undistort(det.xy)
                return desc, cam.bearing(und), det.valid

            self._describe_frame_fn = fn
        return fn(self.state.prev_pyr[0],
                  self.state.prev_pyr[self.config.track_base_level],
                  self.state.detect_quality)

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
        res = self._dispatch(frame, timestamp)

        qw, qx, qy, qz = [float(v) for v in orientation]
        q = jnp.asarray([qw, -qx, qy, qz], jnp.float32)  # mirror x (ref :67)
        R = np.asarray(quat_to_matrix(quat_conj(q)))     # inverse (ref :70)

        if res.status == 1:
            slam_t = res._sync()[1:17].reshape(4, 4)[:3, 3]
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
        return self._last_out.frame_points()

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
