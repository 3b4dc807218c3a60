"""Benchmark: monocular SLAM throughput per chip (BASELINE.json targets).

Headline metric (the ONE JSON line on stdout): aggregate multi-stream
throughput at 640x480 — BASELINE configs 1+5 combined: B independent
camera streams served on one chip by the split-phase batched step
(track every frame for all streams, keyframe pipeline on a top-k
sub-batch; parallel/multistream.py), frames pre-staged in HBM and the
whole serving loop under one ``lax.scan``.  vs_baseline = fps / 500
(the driver target: ≥500 frames/sec/chip).

The headline JSON prints TWICE — immediately after the multi-stream
bench (kill insurance) and again as the very LAST stdout line (the
driver parses the last JSON line in the output tail).  Both lines are
identical and they are the only bare-JSON lines on any stream —
auxiliary metrics are prefixed ``aux ``.  A wall-clock budget
(``--budget`` / $ALVAAR_BENCH_BUDGET, default 1500 s) guards the aux
stages: each is skipped when its worst-case cold-compile estimate no
longer fits, so the process exits 0 inside the driver timeout.

Auxiliary metrics (stderr, ``aux``-prefixed JSON-per-line for humans/CI):
  * config 1 single-stream latency path: fps + ATE on the synthetic
    golden trajectory (the video.html workload,
    reference examples/public/video.html:148-195);
  * config 2: findPlane on a 720p tabletop scene (250 RANSAC iters,
    reference system.js:202 default);
  * config 4: local BA at a 10k-landmark pool (reference budget ≤5 LM
    iters + ≤10 ms, optimizer.cpp:251-262);
  * multi-stream per-stream ATE parity vs the single-stream path.

Usage: python bench.py [--streams B] [--frames N]
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def aux(metric, value, unit, **kw):
    # "aux " prefix keeps these lines from parsing as bare JSON — the
    # driver's headline parse must only ever match the real headline.
    log("aux " + json.dumps({"metric": metric,
                             "value": round(float(value), 3),
                             "unit": unit, **kw}))


def render_frames_cached(seed, width, height, fov, tex_scale, gt):
    """Render (or load) the synthetic golden sequence.

    Pure-numpy rendering of M frames costs minutes on a 1-vCPU bench
    host — real budget the driver's timeout cannot spare — so rendered
    sequences are cached under ~/.cache keyed by every scene parameter
    PLUS the renderer source hash (a render_scene.py change invalidates
    stale frames instead of silently reusing them)."""
    import hashlib
    import os
    sys.path.insert(0, "tests")
    import render_scene
    from render_scene import TwoPlaneScene

    src = hashlib.md5(open(render_scene.__file__, "rb").read()).hexdigest()
    gt_hash = hashlib.md5(np.ascontiguousarray(gt).tobytes()).hexdigest()
    key = (f"{src[:10]}_{seed}_{width}x{height}_{fov}_{tex_scale}_"
           f"{gt_hash[:12]}")
    path = os.path.expanduser(
        "~/.cache/alvaar_frames_"
        + hashlib.md5(key.encode()).hexdigest()[:12] + ".npy")
    if os.path.exists(path):
        return np.load(path)
    scene = TwoPlaneScene(np.random.default_rng(seed), width=width,
                          height=height, fov=fov, tex_scale=tex_scale)
    # f32: every consumer casts to float32 at device_put, and the renderer's
    # f64 intermediates double the cache size/load time for nothing
    frames = np.stack([scene.render(gt[i]).astype(np.float32)
                       for i in range(len(gt))])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, frames)
    os.replace(tmp, path)
    return frames


def bench_single(jax, jnp, cfg, cam, frames_dev, gt, reps=3, matched=None):
    """``matched``: optional (frames_np [M,H,W], offs [B], N) — after the
    timed slice-0 run, evaluate the SAME compiled program on every
    stream's staggered slice and return the median per-slice ATE.  The
    multistream-vs-single accuracy ratio must compare the multistream
    median (over B slices) against single-stream medians on the SAME B
    slices: slice difficulty varies ~25x on this trajectory (measured
    0.55-14.2 cm across the 16 slices on v5e), so the old slice-0-only
    denominator (0.76 cm, one of the easiest) inflated the serving
    "penalty" to 2.38x when the like-for-like value is ~1.17x."""
    from alvaar_tpu.frontend.step import slam_step
    from alvaar_tpu.worldmap.state import init_map_state
    from render_scene import ate_rmse

    N = frames_dev.shape[0]
    state0 = init_map_state(cfg)

    @jax.jit
    def run_all(state, frames):
        def body(state, frame):
            state, out = slam_step(state, frame, cam, cfg)
            return state, (out.status, out.pose_wc)
        return jax.lax.scan(body, state, frames)

    log("compiling single-stream pipeline...")
    t0 = time.time()
    _, (statuses, poses) = jax.block_until_ready(run_all(state0, frames_dev))
    log(f"  compile+first run: {time.time() - t0:.1f}s")
    walls = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(run_all(state0, frames_dev))
        walls.append(time.time() - t0)
    wall = min(walls)

    statuses = np.asarray(statuses)
    poses = np.asarray(poses)
    idx = np.where(statuses == 1)[0]
    ate = (ate_rmse(poses[idx][:, :3, 3], gt[idx][:, :3, 3])
           if len(idx) >= 10 else float("nan"))

    matched_median = None
    if matched is not None:
        frames_np, offs, n_sl = matched
        ates = []
        for o in offs:
            fd = jax.device_put(jnp.asarray(frames_np[o:o + n_sl],
                                            jnp.float32))
            _, (st_b, ps_b) = jax.block_until_ready(run_all(state0, fd))
            st_b, ps_b = np.asarray(st_b), np.asarray(ps_b)
            ib = np.where(st_b == 1)[0]
            if len(ib) >= 10:
                gt_b = gt[o:o + n_sl]
                ates.append(ate_rmse(ps_b[ib][:, :3, 3],
                                     gt_b[ib][:, :3, 3]))
        matched_median = float(np.median(ates)) if ates else float("nan")

    # accuracy parity vs the NATIVE reference engine on the same frames
    # (tools/ref_native; BASELINE: ATE within 1% of the WASM reference)
    from alvaar_tpu.utils.parity import ate_vs_reference
    par = ate_vs_reference(statuses, poses, "ref_synthetic_640.npz")
    if par is not None:
        aux("ate_vs_reference_synthetic", par["ate_pct"], "%",
            ref_noise_pct=round(par["ref_noise_pct"], 3),
            median_pairwise=round(par["ref_noise_median_pct"], 3),
            overlap=par["overlap"], passed=par["parity_pass"])
    return N / wall, ate, len(idx), matched_median


def bench_multistream(jax, jnp, cfg, cam, frames_np, gt, B, kf_slots,
                      reps=3):
    """frames_np: [M, H, W] rendered sequence; each stream gets a
    staggered slice so keyframe demand spreads across frames."""
    from alvaar_tpu.parallel.multistream import (init_multistream_state,
                                                 make_multistream_scan)
    from render_scene import ate_rmse

    M = frames_np.shape[0]
    stagger = 3
    N = M - stagger * (B - 1)
    offs = [stagger * b for b in range(B)]
    seq = np.stack([frames_np[o:o + N] for o in offs], axis=1)  # [N, B, H, W]
    frames_dev = jax.device_put(jnp.asarray(seq, jnp.float32))
    dts = jnp.ones((N, B), jnp.float32)
    states = init_multistream_state(cfg, B)

    run = make_multistream_scan(cfg, cam, kf_slots=kf_slots)
    log(f"compiling multi-stream scan (B={B}, kf_slots={kf_slots})...")
    t0 = time.time()
    _, (statuses, poses) = jax.block_until_ready(run(states, frames_dev, dts))
    log(f"  compile+first run: {time.time() - t0:.1f}s")
    walls = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(run(states, frames_dev, dts))
        walls.append(time.time() - t0)
    wall = min(walls)

    statuses = np.asarray(statuses)          # [N, B]
    poses = np.asarray(poses)                # [N, B, 4, 4]
    ates, tracked = [], []
    for b in range(B):
        idx = np.where(statuses[:, b] == 1)[0]
        tracked.append(len(idx))
        if len(idx) >= 10:
            gt_b = gt[offs[b]:offs[b] + N]
            ates.append(ate_rmse(poses[idx, b][:, :3, 3],
                                 gt_b[idx][:, :3, 3]))
    agg_fps = N * B / wall
    return agg_fps, (float(np.median(ates)) if ates else float("nan")), \
        int(np.median(tracked)), N, frames_dev, dts, states


def bench_multistream_loop(jax, jnp, cfg, cam, frames_dev, dts, states,
                           kf_slots, reps=2):
    """Headline workload with per-stream loop closure enabled (detection
    + verification + sim3 correction inside the keyframe sub-batch) —
    the long-session serving configuration.

    Returns (fps, median tracked count) — tracking quality is validated,
    not just speed, so a regression that breaks poses under loop closure
    (e.g. a bad sim3 correction) fails the benchmark."""
    from alvaar_tpu.parallel.multistream import (init_multistream_loopdbs,
                                                 make_multistream_scan)
    N, B = frames_dev.shape[:2]
    dbs = init_multistream_loopdbs(cfg, B, capacity=256)
    run = make_multistream_scan(cfg, cam, kf_slots=kf_slots,
                                loop_closure=True)
    log(f"compiling loop-closure serving scan (B={B})...")
    _, (statuses, poses) = jax.block_until_ready(
        run(states, frames_dev, dts, dbs))
    statuses = np.asarray(statuses)                       # [N, B]
    tracked = int(np.median((statuses == 1).sum(axis=0)))
    assert tracked >= N // 3, \
        f"loop-closure scan tracks only {tracked}/{N} frames"
    assert np.isfinite(np.asarray(poses)).all(), \
        "non-finite poses under loop closure"
    walls = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(run(states, frames_dev, dts, dbs))
        walls.append(time.time() - t0)
    return N * B / min(walls), tracked


def bench_1080p_streams(jax, jnp, B=8, N=12):
    """Config 5 resolution check: aggregate throughput for B concurrent
    1080p streams on ONE chip (the full 64-stream target runs the same
    program stream-sharded over a v5e slice — linear in chips, zero
    collectives).  Uses the hd_serving preset: the keypoint budget stays
    at the 480p level (the whole point of the preset — see config.py)."""
    sys.path.insert(0, "tests")
    from render_scene import trajectory

    from alvaar_tpu.config import hd_serving
    from alvaar_tpu.geom.camera import Camera
    from alvaar_tpu.parallel.multistream import (init_multistream_state,
                                                 make_multistream_scan)

    cfg = hd_serving()
    cam = Camera.from_fov(cfg.width, cfg.height, 60.0)
    M = N + 3 * (B - 1)
    gt = trajectory(M, step=0.04)
    frames = render_frames_cached(7, cfg.width, cfg.height, 60.0, 120.0, gt)
    seq = np.stack([frames[3 * b:3 * b + N] for b in range(B)], axis=1)
    frames_dev = jax.device_put(jnp.asarray(seq, jnp.float32))
    dts = jnp.ones((N, B), jnp.float32)
    states = init_multistream_state(cfg, B)
    run = make_multistream_scan(cfg, cam, kf_slots=2)
    log(f"compiling 1080p multi-stream scan (B={B})...")
    jax.block_until_ready(run(states, frames_dev, dts))
    walls = []
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(run(states, frames_dev, dts))
        walls.append(time.time() - t0)
    return N * B / min(walls)


def ate_vs_reference_video(poses, statuses):
    """% parity vs the recorded reference runs on video.mp4 (None when
    tests/golden/ref_video.npz is absent).

    Pass criterion (stated, per VERDICT r3 #3): the reference is
    nondeterministic (std::random_device RANSAC, system.cpp:210), so
    parity = our ATE-to-closest-run <= max(1%, the reference's own
    MEDIAN pairwise run-to-run spread) — i.e. we look like one more
    reference run.  RPE is reported alongside to separate local accuracy
    from accumulated-drift disagreement."""
    from alvaar_tpu.utils.parity import ate_vs_reference
    par = ate_vs_reference(statuses, poses, "ref_video.npz")
    if par is None:
        return None
    aux("ate_vs_reference_video_noise_floor", par["ref_noise_pct"], "%",
        median_pairwise=round(par["ref_noise_median_pct"], 3),
        n_ref_runs=par["n_ref_runs"], overlap=par["overlap"])
    aux("rpe_vs_reference_video_rot", par["rpe_rot_deg"], "deg/frame",
        trans=round(par["rpe_trans"], 5))
    # per-segment drift localization (VERDICT r4 item 8): in each
    # 50-frame window, our ATE-to-closest-ref vs the reference's own
    # pairwise spread there — shows WHERE disagreement accumulates and
    # whether it ever leaves the reference's nondeterminism envelope
    from alvaar_tpu.utils.parity import windowed_parity
    wp = windowed_parity(statuses, poses, "ref_video.npz")
    if wp is not None:
        aux("video_parity_windows", wp["worst_ratio"], "x_ref_median",
            inside_envelope=wp["inside_envelope"],
            worst_ratio_max=round(wp["worst_ratio_max"], 3),
            within_max=wp["within_max"],
            windows=[[w, round(o, 2), round(m, 2), round(x, 2)]
                     for w, o, m, x in wp["windows"]])
    return par


def bench_real_video(jax, jnp, n_frames=300):
    """Config 1 on the reference's own demo video (the exact input of
    examples/public/video.html:148-195), via the native libav decoder,
    through the PUBLIC AlvaAR API.

    Measures both consumption modes:
      * process_frames — chunked device-resident scan (the throughput
        path for file/offline workloads);
      * find_camera_pose_async per frame — the interactive frame loop,
        pipelined (statuses drained at the end).
    Returns (fps_stream, fps_async, tracked, total, poses, timestamps)
    or None when video/decoder is absent."""
    import os
    path = "/root/reference/examples/public/assets/video.mp4"
    if not os.path.exists(path):
        return None
    try:
        from alvaar_tpu.io.video import VideoReader
        v = VideoReader(path)
    except Exception as e:
        log(f"video decoder unavailable: {e}")
        return None
    from alvaar_tpu import AlvaAR
    alva = AlvaAR(v.width, v.height, fov=45.0)
    frames, tss = [], []
    for i, (gray, ts) in enumerate(v):
        if i >= n_frames:
            break
        frames.append(gray)
        tss.append(ts)
    frames = np.stack(frames)

    # ---- throughput path: process_frames (warm the chunk scan — one
    # program covers any length now that tails are padded+masked).  Two
    # measured reps, best-of: the first pass after a compile still pays
    # executable warm-up through the tunnel (observed 3-60x on rep 0).
    chunk = 64
    alva.process_frames(frames[:chunk], timestamps=tss[:chunk],
                        chunk=chunk)
    walls = []
    for _ in range(2):
        alva.reset()
        t0 = time.time()
        statuses, poses = alva.process_frames(frames, timestamps=tss,
                                              chunk=chunk)
        walls.append(time.time() - t0)
    fps_stream = len(frames) / min(walls)
    tracked = int((statuses == 1).sum())

    # ---- interactive path: per-frame async dispatch; results drained
    # with ONE batched device read inside the timed region (the
    # per-result np.asarray alternative costs a tunnel round-trip each)
    from alvaar_tpu.system import PendingResult
    alva.reset()
    alva.find_camera_pose_async(frames[0], timestamp=tss[0])  # warm cache
    walls = []
    for _ in range(2):
        alva.reset()
        t0 = time.time()
        results = [alva.find_camera_pose_async(frames[i], timestamp=tss[i])
                   for i in range(len(frames))]
        PendingResult.drain(results)
        walls.append(time.time() - t0)
    tracked_async = sum(r.status == 1 for r in results)
    fps_async = len(frames) / min(walls)
    assert tracked_async == tracked or abs(tracked_async - tracked) < 10
    return fps_stream, fps_async, tracked, len(frames), poses, statuses


def bench_plane_720p(jax, jnp):
    """Config 2: findPlane on a 720p tabletop scene."""
    from alvaar_tpu.config import SlamConfig
    from alvaar_tpu.geom.camera import Camera
    from alvaar_tpu.solvers.plane import find_plane_ransac

    rng = np.random.default_rng(5)
    n = 2048
    # tabletop: dominant plane normal to the solver's vertical (+z,
    # find_plane_ransac's horizontality convention) + clutter in front
    pts = np.empty((n, 3), np.float32)
    flat = rng.random(n) < 0.7
    pts[:, 0] = rng.uniform(-2, 2, n)
    pts[:, 1] = rng.uniform(-1.5, 1.5, n)
    pts[:, 2] = np.where(flat, 3.0 + rng.normal(0, 0.005, n),
                         rng.uniform(1.0, 2.8, n))
    valid = jnp.ones(n, bool)
    cam_c = jnp.zeros(3, jnp.float32)

    key = jax.random.PRNGKey(0)
    pts_d = jnp.asarray(pts)

    # device-resident latency: production calls findPlane against the
    # device-resident map (system.py find_plane), so the budget compares
    # device time — a single dispatch through the TPU tunnel is
    # dominated by ~20-40 ms of enqueue->sync latency.  Chain N solves
    # (distinct PRNG keys so no CSE) in one program and difference.
    def chain(n):
        @jax.jit
        def f(k, p, v, c):
            def body(carry, i):
                r = find_plane_ransac(jax.random.fold_in(k, i), p, v, c,
                                      iters=250, min_points=32,
                                      max_tilt_deg=5.0, inlier_scale=1.4)
                return carry, r.success
            _, succ = jax.lax.scan(body, 0, jnp.arange(n))
            return succ
        return f

    def best(fn, reps=5):
        # sync by host readback, NOT block_until_ready: on the axon
        # platform block_until_ready returns early for small programs
        # (observed: a 1025-solve chain "synced" in 0.03 ms while the
        # actual execution took 300 ms), so only a forced D2H read
        # bounds the wall.  The ~40 ms readback constant cancels in the
        # chain difference below.
        out = np.asarray(fn(key, pts_d, valid, cam_c))
        walls = []
        for _ in range(reps):
            t0 = time.time()
            out = np.asarray(fn(key, pts_d, valid, cam_c))
            walls.append(time.time() - t0)
        return min(walls), out

    t1, succ1 = best(chain(1))
    t129, succ129 = best(chain(129))
    ok = bool(succ129.all())
    if t129 < t1:
        log(f"WARN plane timing inverted (t1={t1 * 1e3:.2f}ms "
            f"t129={t129 * 1e3:.2f}ms); reporting single-dispatch")
        return t1 * 1e3, t1 * 1e3, ok
    return (t129 - t1) / 128 * 1e3, t1 * 1e3, ok


def bench_loop_closure(jax, jnp, capacity=256, kps=192):
    """Config 3: loop-closure query latency against a FULL database —
    one detect_loop (dense Hamming + voting + islands) + one db_add, the
    per-keyframe cost of the long-loop workload (reference pipeline
    lcdetector.cc:54-267)."""
    from alvaar_tpu.loopclosure.detector import db_add, db_init, detect_loop
    from alvaar_tpu.geom.lie import SE3

    rng = np.random.default_rng(3)
    db = db_init(capacity, kps)
    descs = jnp.asarray(
        rng.integers(0, 2 ** 32, (capacity, kps, 8), dtype=np.uint32))
    pts = jnp.asarray(rng.normal(0, 2, (capacity, kps, 3)), jnp.float32)
    ones = jnp.ones(kps, bool)
    for i in range(capacity):
        db = db_add(db, descs[i], pts[i], ones, ones,
                    jnp.asarray(i, jnp.int32), SE3.identity())
    jax.block_until_ready(db)
    q = descs[10]
    qid = jnp.asarray(capacity + 100, jnp.int32)

    def one(db):
        db2, res = detect_loop(db, q, ones, qid)
        db2 = db_add(db2, q, pts[10], ones, ones, qid, SE3.identity())
        return db2, res

    db2, res = jax.block_until_ready(one(db))

    # device-resident latency (launch overhead through the TPU tunnel
    # dominates a single dispatch; production queries run inside the
    # jitted keyframe phase): chain N query+insert rounds in one program
    # and difference the walls.
    def chain(n):
        @jax.jit
        def f(db):
            def body(d, _):
                d2, r = detect_loop.__wrapped__(d, q, ones, qid)
                d2 = db_add.__wrapped__(d2, q, pts[10], ones, ones, qid,
                                        SE3.identity())
                return d2, r.found
            d, found = jax.lax.scan(body, db, None, length=n)
            return found
        return f

    def best(fn, reps=5):
        # np.asarray sync, not block_until_ready — see bench_plane_720p:
        # axon's block_until_ready returns early on small programs, and
        # this chain's output ([n] bool) is tiny.  The readback constant
        # cancels in the chain difference.
        np.asarray(fn(db))
        walls = []
        for _ in range(reps):
            t0 = time.time()
            out = np.asarray(fn(db))
            walls.append(time.time() - t0)
        return min(walls)

    # long chain: per-query latency is ~26 us, far below the tunnel's
    # per-dispatch jitter — difference 1 vs 65 chained rounds so the
    # signal (64 queries) dominates the jitter (a 9-round chain measured
    # negative on noisy runs)
    t1 = best(chain(1))
    t65 = best(chain(65))
    if t65 < t1:
        # an inverted differential measurement means the run was noise-
        # dominated; report NaN rather than masking it as 0 latency
        log(f"WARN loop-query timing inverted (t1={t1 * 1e3:.2f}ms "
            f"t65={t65 * 1e3:.2f}ms); reporting NaN")
        return float("nan"), bool(res.found)
    return (t65 - t1) / 64 * 1e3, bool(res.found)


def bench_ba_10k(jax, jnp):
    """Config 4: full local BA with a 10k-landmark pool."""
    from alvaar_tpu.config import SlamConfig
    from alvaar_tpu.geom.camera import Camera
    from alvaar_tpu.geom.lie import SE3
    from alvaar_tpu.solvers.ba import BAProblem, local_ba

    cfg = SlamConfig(max_landmarks=10240)
    W, K, L = cfg.window_size, cfg.max_keypoints, cfg.max_landmarks
    cam = Camera.from_fov(cfg.width, cfg.height, 60.0)
    rng = np.random.default_rng(0)
    q = rng.normal(0, 1, (W, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    obs_lm = np.tile(rng.integers(0, L, (1, K)), (W, 1)).astype(np.int32)
    prob = BAProblem(
        poses=SE3(jnp.asarray(q),
                  jnp.asarray(rng.normal(0, 0.5, (W, 3)), jnp.float32)),
        kf_valid=jnp.ones(W, bool),
        constant=jnp.asarray(np.arange(W) < 2),
        anchor_kf=jnp.asarray(rng.integers(0, W, L), jnp.int32),
        anchor_mxy=jnp.asarray(rng.normal(0, 0.3, (L, 2)), jnp.float32),
        invdepth=jnp.asarray(1 / rng.uniform(2, 8, L), jnp.float32),
        lm_valid=jnp.ones(L, bool),
        obs_lm=jnp.asarray(obs_lm),
        obs_px=jnp.asarray(rng.uniform(20, 460, (W, K, 2)), jnp.float32),
        obs_valid=jnp.asarray(rng.random((W, K)) < 0.6))
    # device-resident latency: the BA runs INSIDE the jitted slam step in
    # production, so the budget compares device time, not per-launch host
    # round-trips (which dominate a single dispatch through the TPU
    # tunnel).  Chain N solves in one program and difference the walls.
    def chain(n):
        @jax.jit
        def f(p):
            def body(carry, _):
                r = local_ba(p._replace(poses=carry.poses,
                                        invdepth=carry.invdepth), cam)
                return r, None
            r, _ = jax.lax.scan(body, local_ba(p, cam), None, length=n - 1)
            return r.cost
        return f

    def best(fn, reps=5):
        # np.asarray sync — axon's block_until_ready returns early on
        # small programs and this chain outputs one scalar cost; the
        # readback constant cancels in the chain difference.
        np.asarray(fn(prob))
        walls = []
        for _ in range(reps):
            t0 = time.time()
            out = np.asarray(fn(prob))
            walls.append(time.time() - t0)
        return min(walls)

    t1 = best(chain(1))
    t9 = best(chain(9))
    if t9 < t1:
        # a failed/noisy measurement must be visible, not clamped to ~0
        # (ADVICE r4: an inverted difference would fabricate a perfect
        # latency) — report the single-dispatch wall instead
        log(f"WARN BA timing inverted (t1={t1 * 1e3:.2f}ms "
            f"t9={t9 * 1e3:.2f}ms); reporting single-dispatch")
        return t1 * 1e3, t1 * 1e3
    return (t9 - t1) / 8 * 1e3, t1 * 1e3


def main():
    t_start = time.time()
    import os
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=16)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--kf-slots", type=int, default=None,
                    help="keyframe sub-batch size (default: streams/6)")
    ap.add_argument("--skip-aux", action="store_true")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("ALVAAR_BENCH_BUDGET",
                                                 "1500")),
                    help="wall-clock budget in seconds; aux stages whose "
                         "worst-case cost no longer fits are skipped")
    args = ap.parse_args()
    if args.kf_slots is None:
        # measured optimum: slots just above the aggregate keyframe
        # demand (~streams/6); B=16 S=3 -> 526 fps on v5e
        args.kf_slots = max(3, -(-args.streams // 6))

    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeat bench runs on this single-core
    # host skip the ~3 min/program XLA compiles
    cache_dir = os.path.expanduser("~/.cache/alvaar_jax_cache")
    cache_warm = os.path.isdir(cache_dir) and bool(os.listdir(cache_dir))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # disclose cache state so "compile+first run" timings are
    # interpretable across revisions (a warm cache makes them cache hits)
    log(f"persistent compile cache: {'WARM' if cache_warm else 'cold'} "
        f"({cache_dir})")

    sys.path.insert(0, "tests")
    from render_scene import trajectory

    from alvaar_tpu import SlamConfig
    from alvaar_tpu.geom.camera import Camera

    cfg = SlamConfig()  # production 640x480, W=30, L=4096
    cam = Camera.from_fov(cfg.width, cfg.height, 60.0)
    log(f"devices: {jax.devices()}")

    M = args.frames + 3 * (args.streams - 1)
    gt = trajectory(M, step=0.04)
    log(f"rendering {M} frames at {cfg.width}x{cfg.height} (cached)...")
    frames_np = render_frames_cached(42, cfg.width, cfg.height, 60.0,
                                     120.0, gt)

    # ---- headline: multi-stream aggregate ----
    agg_fps, ms_ate, ms_tracked, N, frames_dev, dts, states0 = \
        bench_multistream(
            jax, jnp, cfg, cam, frames_np, gt, args.streams, args.kf_slots)
    # The headline bare-JSON line prints TWICE: immediately (so a killed
    # later stage can't lose the round's number) AND as the very last
    # stdout line (the driver parses the LAST JSON line in the output
    # tail — r01-r03 records prove it; r04's early-only print yielded
    # parsed=null).  Both lines are identical, so either parse is right.
    headline = json.dumps({
        "metric": "multistream_fps_per_chip_640x480",
        "value": round(agg_fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(agg_fps / 500.0, 4),
    })
    print(headline, flush=True)
    aux("multistream_ate_median", ms_ate * 100, "cm",
        tracked=f"{ms_tracked}/{N}", streams=args.streams)
    log(f"multi-stream: {agg_fps:.1f} frames/sec/chip aggregate "
        f"({args.streams} streams, {agg_fps / args.streams:.1f} fps each)")

    def fits(name, est_cold, est_warm=None):
        """Budget gate: run a stage only if its worst-case cost fits in
        the remaining wall-clock budget."""
        est = (est_warm if cache_warm and est_warm is not None
               else est_cold)
        left = args.budget - (time.time() - t_start)
        if left < est:
            log(f"SKIP {name}: needs ~{est:.0f}s, {left:.0f}s left "
                f"of {args.budget:.0f}s budget")
            return False
        return True

    # ---- aux stages, in descending value order, each budget-gated and
    # fault-isolated (one failure must not lose the rest) ----
    held = {"frames_dev": frames_dev, "states0": states0}
    del frames_dev, states0

    def stage_loop():
        try:
            fps_lc, tracked_lc = bench_multistream_loop(
                jax, jnp, cfg, cam, held["frames_dev"], dts,
                held["states0"], args.kf_slots)
            aux("multistream_loop_fps", fps_lc, "frames/sec",
                streams=args.streams, target=500,
                tracked_median=f"{tracked_lc}/{N}")
        finally:
            # ~2.4 GB of staged frames — free before the 1080p stage
            held.clear()

    def stage_single():
        offs = [3 * b for b in range(args.streams)]
        fps1, ate1, tracked1, matched_med = bench_single(
            jax, jnp, cfg, cam,
            jax.device_put(jnp.asarray(frames_np[:args.frames],
                                       jnp.float32)), gt,
            matched=(frames_np, offs, args.frames))
        aux("single_stream_fps", fps1, "frames/sec",
            latency_ms=round(1e3 / fps1, 2))
        aux("single_stream_ate", ate1 * 100, "cm",
            tracked=f"{tracked1}/{args.frames}")
        # like-for-like serving penalty: multistream median over B slices
        # vs single-stream median over the SAME B slices (see
        # bench_single docstring; slice-0-only was a 2x confound)
        aux("multistream_vs_single_ate_ratio",
            ms_ate / max(matched_med or ate1, 1e-9), "x", bound=1.5,
            single_matched_median_cm=round((matched_med or 0) * 100, 3),
            single_slice0_cm=round(ate1 * 100, 3))

    def stage_ba():
        ms, ms_launch = bench_ba_10k(jax, jnp)
        aux("local_ba_10k_landmarks", ms, "ms", budget_ms=10,
            single_launch_ms=round(ms_launch, 2))

    def stage_1080p():
        fps_hd = bench_1080p_streams(jax, jnp)
        aux("multistream_1080p_fps", fps_hd, "frames/sec", streams=8)

    def stage_video():
        rv = bench_real_video(jax, jnp)
        if rv is not None:
            fps_v, fps_async, tracked_v, total_v, rv_poses, rv_st = rv
            aux("real_video_fps", fps_v, "frames/sec",
                tracked=f"{tracked_v}/{total_v}")
            aux("real_video_async_fps", fps_async, "frames/sec")
            par = ate_vs_reference_video(rv_poses, rv_st)
            if par is not None:
                aux("ate_vs_reference_video", par["ate_pct"], "%",
                    criterion="<= max(1%, median pairwise ref spread)",
                    passed=par["parity_pass"])

    def stage_plane():
        ms, ms_dispatch, ok = bench_plane_720p(jax, jnp)
        aux("findplane_720p_latency", ms, "ms", iters=250, success=ok,
            single_dispatch_ms=round(ms_dispatch, 2))

    def stage_loopq():
        ms, found = bench_loop_closure(jax, jnp)
        aux("loop_query_latency_256kf", ms, "ms", detected=found)

    # (name, fn, worst-case cold seconds, warm-cache seconds)
    stages = [
        ("multistream_loop", stage_loop, 240, 40),
        ("single_stream", stage_single, 180, 40),
        ("ba_10k", stage_ba, 120, 30),
        ("1080p_streams", stage_1080p, 300, 60),
        ("real_video", stage_video, 240, 90),
        ("findplane_720p", stage_plane, 60, 15),
        ("loop_query", stage_loopq, 90, 20),
    ]
    if not args.skip_aux:
        for name, fn, est_cold, est_warm in stages:
            if not fits(name, est_cold, est_warm):
                if name == "multistream_loop":
                    held.clear()
                continue
            try:
                fn()
            except Exception as e:  # noqa: BLE001 — fault isolation
                log(f"FAIL {name}: {type(e).__name__}: {e}")

    log(f"bench total wall: {time.time() - t_start:.1f}s "
        f"(budget {args.budget:.0f}s)")
    # re-print the headline as the FINAL stdout line (see comment above)
    print(headline, flush=True)


if __name__ == "__main__":
    main()
