"""Loop-closure detection + relocalization tests (iBoW-LCD behavioral
model, reference src/libs/ibow_lcd/src/lcdetector.cc)."""

import jax
import jax.numpy as jnp
import numpy as np

from alvaar_tpu.geom import SE3, Camera
from alvaar_tpu.loopclosure.detector import (
    db_add,
    db_init,
    detect_loop,
    relocalize,
)
from tests.synthetic_scene import observe, pose_error, random_pose, scene_points

K = 96
CAM = Camera.create(500.0, 500.0, 320.0, 240.0)


def random_descs(rng, n=K):
    return jnp.asarray(rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32))


def perturb(rng, desc, bits=8):
    """Flip a few random bits per descriptor (viewpoint noise)."""
    d = np.asarray(desc).copy()
    for _ in range(bits):
        word = rng.integers(0, 8, size=d.shape[0])
        bit = rng.integers(0, 32, size=d.shape[0])
        d[np.arange(d.shape[0]), word] ^= (1 << bit).astype(np.uint32)
    return jnp.asarray(d)


def build_db(rng, n_entries=80):
    db = db_init(128, K)
    descs = []
    for i in range(n_entries):
        d = random_descs(rng)
        descs.append(d)
        db = db_add(db, d, jnp.zeros((K, 3)), jnp.zeros(K, bool),
                    jnp.ones(K, bool), jnp.asarray(i, jnp.int32),
                    SE3.identity())
    return db, descs


class TestLoopDetection:
    def test_detects_revisit(self, rng):
        db, descs = build_db(rng)
        # query = noisy copy of keyframe 10's descriptors, current id 80
        q = perturb(rng, descs[10], bits=10)
        db, res = detect_loop(db, q, jnp.ones(K, bool),
                              jnp.asarray(80, jnp.int32))
        assert bool(res.found)
        assert abs(int(res.match_kf_id) - 10) <= 2

    def test_no_false_positive_on_novel_view(self, rng):
        db, _ = build_db(rng)
        q = random_descs(rng)  # unrelated
        db, res = detect_loop(db, q, jnp.ones(K, bool),
                              jnp.asarray(80, jnp.int32))
        assert not bool(res.found)

    def test_delay_queue_excludes_recent(self, rng):
        db, descs = build_db(rng)
        # an exact copy of keyframe 75 — too recent (delay 50)
        db, res = detect_loop(db, descs[75], jnp.ones(K, bool),
                              jnp.asarray(80, jnp.int32))
        assert not bool(res.found) or int(res.match_kf_id) <= 30

    def test_temporal_priority(self, rng):
        db, descs = build_db(rng)
        q1 = perturb(rng, descs[20], bits=6)
        db, r1 = detect_loop(db, q1, jnp.ones(K, bool),
                             jnp.asarray(90, jnp.int32))
        assert bool(r1.found)
        q2 = perturb(rng, descs[21], bits=6)
        db, r2 = detect_loop(db, q2, jnp.ones(K, bool),
                             jnp.asarray(91, jnp.int32))
        assert bool(r2.found)
        assert abs(int(r2.match_kf_id) - 21) <= 11  # stays in the island


class TestRelocalization:
    def test_recovers_pose(self, rng):
        # stored keyframe with real geometry + descriptors
        pose_db = random_pose(rng)
        pts = scene_points(rng, K)
        desc = random_descs(rng)
        db = db_init(16, K)
        db = db_add(db, desc, pts, jnp.ones(K, bool), jnp.ones(K, bool),
                    jnp.asarray(0, jnp.int32), pose_db)

        # query: new camera seeing the same landmarks, noisy descriptors
        pose_q = pose_db.retract(jnp.asarray(
            rng.normal(size=6) * 0.05, jnp.float32))
        _, bearings, _ = observe(pose_q, CAM, pts, noise_px=0.3, rng=rng)
        q = perturb(rng, desc, bits=6)

        res = relocalize(db, jnp.asarray(0), q, bearings, jnp.ones(K, bool),
                         jax.random.PRNGKey(0), focal=500.0)
        assert bool(res.success)
        ang, dt = pose_error(res.pose, pose_q)
        assert ang < 1.0 and dt < 0.1

    def test_fails_on_garbage(self, rng):
        pts = scene_points(rng, K)
        db = db_init(16, K)
        db = db_add(db, random_descs(rng), pts, jnp.ones(K, bool),
                    jnp.ones(K, bool), jnp.asarray(0, jnp.int32),
                    SE3.identity())
        bearings = CAM.bearing(jnp.asarray(
            rng.uniform([0, 0], [640, 480], (K, 2)), jnp.float32))
        res = relocalize(db, jnp.asarray(0), random_descs(rng), bearings,
                         jnp.ones(K, bool), jax.random.PRNGKey(0), focal=500.0)
        assert not bool(res.success)


class TestBatchedRelocalization:
    def test_topk_finds_right_entry(self, rng):
        """relocalize_topk must pick the correct entry out of a populated
        database in ONE batched program."""
        from alvaar_tpu.loopclosure.detector import relocalize_topk

        db = db_init(32, K)
        poses, descs, pts_all = [], [], []
        for i in range(20):
            p = random_pose(rng)
            pts = scene_points(rng, K)
            d = random_descs(rng)
            poses.append(p); descs.append(d); pts_all.append(pts)
            db = db_add(db, d, pts, jnp.ones(K, bool), jnp.ones(K, bool),
                        jnp.asarray(i, jnp.int32), p)

        target = 7
        pose_q = poses[target].retract(jnp.asarray(
            rng.normal(size=6) * 0.05, jnp.float32))
        _, bearings, _ = observe(pose_q, CAM, pts_all[target],
                                 noise_px=0.3, rng=rng)
        q = perturb(rng, descs[target], bits=6)
        res = relocalize_topk(db, q, bearings, jnp.ones(K, bool),
                              jax.random.PRNGKey(1), focal=500.0)
        assert bool(res.success)
        ang, dt = pose_error(res.pose, pose_q)
        assert ang < 1.0 and dt < 0.1

    def test_topk_fails_on_garbage(self, rng):
        from alvaar_tpu.loopclosure.detector import relocalize_topk

        db, _ = build_db(rng, n_entries=20)
        bearings = CAM.bearing(jnp.asarray(
            rng.uniform([0, 0], [640, 480], (K, 2)), jnp.float32))
        res = relocalize_topk(db, random_descs(rng), bearings,
                              jnp.ones(K, bool), jax.random.PRNGKey(0),
                              focal=500.0)
        assert not bool(res.success)


class TestWorldCorrection:
    def test_gauge_alignment_consistency(self, rng):
        """apply_world_correction must keep the anchored inverse-depth
        parametrization consistent: recomputing landmark world positions
        from the corrected poses reproduces the corrected lm_pos."""
        from alvaar_tpu.config import SlamConfig
        from alvaar_tpu.worldmap.state import (apply_world_correction,
                                               init_map_state,
                                               landmark_world_positions)

        cfg = SlamConfig(width=128, height=96, cell_size=32, window_size=6,
                         max_landmarks=64)
        st = init_map_state(cfg)
        W, L = 6, 64
        qs = []
        for _ in range(W):
            qs.append(np.asarray(random_pose(rng).q))
        st = st._replace(
            kf_pose=SE3(jnp.asarray(np.stack(qs)),
                        jnp.asarray(rng.normal(size=(W, 3)), jnp.float32)),
            kf_valid=jnp.ones(W, bool),
            lm_anchor=jnp.asarray(rng.integers(0, W, L), jnp.int32),
            lm_mxy=jnp.asarray(rng.normal(0, 0.2, (L, 2)), jnp.float32),
            lm_invd=jnp.asarray(1.0 / rng.uniform(2, 6, L), jnp.float32),
            lm_valid=jnp.ones(L, bool), lm_is3d=jnp.ones(L, bool))
        st = st._replace(lm_pos=landmark_world_positions(
            st.kf_pose, st.lm_anchor, st.lm_mxy, st.lm_invd))

        dT = random_pose(rng)
        for s in (1.0, 1.3):
            out = apply_world_correction(st, dT, scale=s)
            recomputed = landmark_world_positions(
                out.kf_pose, out.lm_anchor, out.lm_mxy, out.lm_invd)
            np.testing.assert_allclose(np.asarray(recomputed),
                                       np.asarray(out.lm_pos),
                                       rtol=1e-4, atol=1e-4)
            # and the direct sim3 action matches
            expect = s * np.asarray(dT.rotate(st.lm_pos)) + np.asarray(dT.t)
            np.testing.assert_allclose(np.asarray(out.lm_pos), expect,
                                       rtol=1e-5, atol=1e-5)

    def test_correction_snaps_current_pose(self, rng):
        """dT built from a reloc result must map the current pose onto the
        relocalized one (the facade's loop-correction contract)."""
        from alvaar_tpu.config import SlamConfig
        from alvaar_tpu.worldmap.state import (apply_world_correction,
                                               init_map_state)

        cfg = SlamConfig(width=128, height=96, cell_size=32, window_size=6,
                         max_landmarks=64)
        st = init_map_state(cfg)._replace(pose=random_pose(rng))
        T_reloc_cw = random_pose(rng)
        dT = T_reloc_cw.inverse().compose(st.pose)
        out = apply_world_correction(st, dT)
        ang, dt = pose_error(out.pose, T_reloc_cw)
        assert ang < 1e-3 and dt < 1e-4


class TestVerifyLoop:
    """verify_loop: geometric loop verification by motion-only LM from
    the current pose (detector.verify_loop) — the degenerate-P3P-safe
    path the world correction rides on."""

    def _entry(self, rng, pts):
        from alvaar_tpu.loopclosure.detector import verify_loop  # noqa
        desc = random_descs(rng)
        db = db_init(16, K)
        db = db_add(db, desc, pts, jnp.ones(K, bool), jnp.ones(K, bool),
                    jnp.asarray(0, jnp.int32), SE3.identity())
        return db, desc

    def test_recovers_small_drift(self, rng):
        from alvaar_tpu.loopclosure.detector import verify_loop
        pose_true = random_pose(rng)
        pts = scene_points(rng, K)
        db, desc = self._entry(rng, pts)
        px, _, _ = observe(pose_true, CAM, pts, noise_px=0.2, rng=rng)
        # current pose = truth + small drift (the loop-closure premise)
        pose_drifted = pose_true.retract(jnp.asarray(
            rng.normal(size=6) * 0.03, jnp.float32))
        q = perturb(rng, desc, bits=6)
        pose, ok, n_in = verify_loop(db, jnp.asarray(0), q, px,
                                     jnp.ones(K, bool), CAM, pose_drifted)
        assert bool(ok) and int(n_in) >= 12
        ang, dt = pose_error(pose, pose_true)
        assert ang < 0.5 and dt < 0.05

    def test_planar_landmarks_no_far_branch(self, rng):
        """Near-coplanar landmarks: P3P-LMedS picks a spurious far
        solution here (why verify_loop exists); LM from the current pose
        must either return a pose near the truth or fail — never succeed
        with a trajectory-scale jump."""
        from alvaar_tpu.loopclosure.detector import verify_loop
        pose_true = random_pose(rng)
        pts = scene_points(rng, K)
        pts = pts.at[:, 2].set(5.0 + 0.02 * pts[:, 2])   # squash to a plane
        db, desc = self._entry(rng, pts)
        px, _, _ = observe(pose_true, CAM, pts, noise_px=0.2, rng=rng)
        pose_drifted = pose_true.retract(jnp.asarray(
            rng.normal(size=6) * 0.03, jnp.float32))
        q = perturb(rng, desc, bits=6)
        pose, ok, _ = verify_loop(db, jnp.asarray(0), q, px,
                                  jnp.ones(K, bool), CAM, pose_drifted)
        if bool(ok):
            ang, dt = pose_error(pose, pose_true)
            assert dt < 0.2, f"verified pose jumped {dt:.2f} units"

    def test_fails_on_garbage_matches(self, rng):
        from alvaar_tpu.loopclosure.detector import verify_loop
        pts = scene_points(rng, K)
        db, _ = self._entry(rng, pts)
        px = jnp.asarray(rng.uniform([0, 0], [640, 480], (K, 2)), jnp.float32)
        pose, ok, _ = verify_loop(db, jnp.asarray(0), random_descs(rng), px,
                                  jnp.ones(K, bool), CAM, SE3.identity())
        assert not bool(ok)
