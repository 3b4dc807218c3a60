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
