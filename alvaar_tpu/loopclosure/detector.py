"""Loop-closure detection + relocalization over a keyframe database.

TPU-native equivalent of the vendored iBoW-LCD / OBIndex2 stack
(reference src/libs/ibow_lcd/src/lcdetector.cc:54-267,
src/libs/obindex2/lib/binary_index.cc) — which the reference builds but
never links (SURVEY §2.3); BASELINE config 3 still names loop closure +
relocalization as a capability target, so this module exceeds reference
parity by also wiring geometric relocalization.

Design (per SURVEY §2.3 "tree becomes dense top-K Hamming search on TPU"):
  * the incremental binary-tree index (binary_tree.cc buildTree /
    traverseFromRoot) becomes a flat fixed-shape database of the last D
    keyframes' descriptor sets — brute-force Hamming via ONE ±1 MXU matmul
    [K_q, 256] x [256, D*K] beats tree traversal at these sizes;
  * kNN + NNDR 0.8 ratio filter (lcdetector.cc:169-181) = top-2 over the
    distance matrix;
  * image voting + min-max score normalization with 0.3 cutoff
    (lcdetector.cc:183-204);
  * temporal "islands" of ±island_r keyframes with score accumulation and
    overlap-priority tracking (lcdetector.cc:206-267, island.h:29) —
    every candidate acts as an island center, scores accumulate over its
    neighborhood by a banded mask, and consistency with the previous
    detection earns the reference's overlap priority;
  * the p-frame delay queue (lcdetector.h:51) becomes an id-distance gate.

Relocalization (new capability): each database entry stores its landmarks'
3D positions, so a detected loop (or a lost tracker) can recover an
absolute pose by descriptor matching + P3P-LMedS against the stored
geometry.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from alvaar_tpu.geom.lie import SE3
from alvaar_tpu.ops.hamming import (hamming_matrix_matmul, hamming_vs_pm1,
                                    unpack_pm1_i8)
from alvaar_tpu.solvers.absolute import AbsolutePoseResult, p3p_lmeds


class LoopDB(NamedTuple):
    desc: jax.Array     # [D, K, 8] uint32 keyframe descriptors
    desc_pm: jax.Array  # [D*K, 256] int8 ±1 resident unpack of ``desc`` —
                        # querying unpacks 50 MB of DB bits otherwise
                        # (~8 ms HBM-bound per query at D=256);
                        # maintained incrementally by db_add
    sig: jax.Array      # [D, 256] f32 per-entry coarse signature (mean of
                        # the entry's valid ±1 descriptor bits) — a global
                        # image descriptor used to prefilter the dense
                        # Hamming pass to the top-E entries, the dense-DB
                        # analogue of OBIndex2's pruned tree descent
                        # (reference binary_tree.cc traverseFromRoot)
    lm_pos: jax.Array   # [D, K, 3] landmark world positions at store time
    lm_is3d: jax.Array  # [D, K] bool
    kp_valid: jax.Array  # [D, K] bool
    kf_id: jax.Array    # [D] int32 global keyframe id (-1 empty)
    pose_q: jax.Array   # [D, 4] stored T_cw quaternions
    pose_t: jax.Array   # [D, 3]
    ptr: jax.Array      # int32 ring pointer
    last_match: jax.Array  # int32 kf id of previous detection (-1 none)


class LoopResult(NamedTuple):
    found: jax.Array      # bool
    entry: jax.Array      # int32 database slot of the best match
    match_kf_id: jax.Array  # int32 global keyframe id
    score: jax.Array      # float island score


def _top2_min(dist):
    """Row-wise (best, second, best_idx) over a WIDE [N, M] distance
    matrix via three reduction passes.  ``lax.top_k`` over a 49k-wide
    axis lowers to a full sort (~8 ms at D*K=49152 on v5e); min+argmin
    passes are pure VPU reductions (~0.1 ms)."""
    bi = jnp.argmin(dist, axis=1)
    best = jnp.take_along_axis(dist, bi[:, None], axis=1)[:, 0]
    masked = jnp.where(jnp.arange(dist.shape[1])[None, :] == bi[:, None],
                       jnp.inf, dist)
    second = jnp.min(masked, axis=1)
    return best, second, bi


def db_init(capacity: int, max_kps: int, dtype=jnp.float32) -> LoopDB:
    return LoopDB(
        desc=jnp.zeros((capacity, max_kps, 8), jnp.uint32),
        desc_pm=jnp.full((capacity * max_kps, 256), -1, jnp.int8),
        sig=jnp.zeros((capacity, 256), dtype),
        lm_pos=jnp.zeros((capacity, max_kps, 3), dtype),
        lm_is3d=jnp.zeros((capacity, max_kps), bool),
        kp_valid=jnp.zeros((capacity, max_kps), bool),
        kf_id=jnp.full((capacity,), -1, jnp.int32),
        pose_q=jnp.zeros((capacity, 4), dtype).at[:, 0].set(1.0),
        pose_t=jnp.zeros((capacity, 3), dtype),
        ptr=jnp.asarray(0, jnp.int32),
        last_match=jnp.asarray(-1, jnp.int32),
    )


@jax.jit
def db_add(db: LoopDB, desc, lm_pos, lm_is3d, kp_valid, kf_id,
           pose: SE3) -> LoopDB:
    """Insert a keyframe into the ring database."""
    i = db.ptr % db.kf_id.shape[0]
    K = db.desc.shape[1]
    pm = unpack_pm1_i8(desc)
    nv = jnp.maximum(jnp.sum(kp_valid), 1).astype(db.sig.dtype)
    sig_row = jnp.sum(jnp.where(kp_valid[:, None], pm, 0)
                      .astype(db.sig.dtype), axis=0) / nv
    return db._replace(
        desc=db.desc.at[i].set(desc),
        desc_pm=jax.lax.dynamic_update_slice(db.desc_pm, pm, (i * K, 0)),
        sig=db.sig.at[i].set(sig_row),
        lm_pos=db.lm_pos.at[i].set(lm_pos),
        lm_is3d=db.lm_is3d.at[i].set(lm_is3d),
        kp_valid=db.kp_valid.at[i].set(kp_valid),
        kf_id=db.kf_id.at[i].set(kf_id),
        pose_q=db.pose_q.at[i].set(pose.q),
        pose_t=db.pose_t.at[i].set(pose.t),
        ptr=db.ptr + 1,
    )


@partial(jax.jit, static_argnames=("nndr", "min_score", "island_r", "delay",
                                   "min_votes", "prefilter"))
def detect_loop(db: LoopDB, desc_q, valid_q, query_kf_id, *,
                nndr: float = 0.8, min_score: float = 0.3,
                island_r: int = 10, delay: int = 50,
                min_votes: int = 8,
                prefilter: int = 16) -> tuple[LoopDB, LoopResult]:
    """Query the database with the current keyframe's descriptors.

    ``prefilter``: when the database holds more than this many entries,
    a coarse signature pass (query mean-descriptor vs per-entry ``sig``,
    one [D, 256] matvec) selects the top-``prefilter`` entries and the
    dense per-descriptor Hamming pass runs only against those — the
    dense-DB analogue of OBIndex2's pruned tree search (reference
    binary_tree.cc traverseFromRoot / lcdetector.cc:117-142), ~D/E times
    cheaper at keyframe cadence.  Set 0 to always run the full pass.

    Returns (db with updated temporal-consistency state, LoopResult).
    """
    D, K, _ = db.desc.shape
    Kq = desc_q.shape[0]
    BIG = jnp.asarray(1e9, jnp.float32)

    uq = unpack_pm1_i8(desc_q)                              # [Kq, 256]
    # entry-level gates: empty slots + the delay queue (recent keyframes
    # are not loop candidates)
    entry_ok = (db.kf_id >= 0) & (query_kf_id - db.kf_id > delay)

    if prefilter and D > prefilter:
        # ---- coarse pass: query signature vs per-entry signatures ----
        nq = jnp.maximum(jnp.sum(valid_q), 1).astype(db.sig.dtype)
        qsig = jnp.sum(jnp.where(valid_q[:, None], uq, 0)
                       .astype(db.sig.dtype), axis=0) / nq  # [256]
        coarse = db.sig @ qsig                              # [D]
        coarse = jnp.where(entry_ok, coarse, -jnp.inf)
        _, top_e = jax.lax.top_k(coarse, prefilter)         # [E]
        E = prefilter

        # ---- dense Hamming only on the E selected entries ----
        sub_pm = db.desc_pm.reshape(D, K, 256)[top_e].reshape(E * K, 256)
        dots = jax.lax.dot_general(uq, sub_pm, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        dist = (256 - dots).astype(jnp.float32) * 0.5       # [Kq, E*K]
        sub_ok = (db.kp_valid[top_e].reshape(-1)
                  & entry_ok[top_e].repeat(K))
        dist = jnp.where(sub_ok[None, :] & valid_q[:, None], dist, BIG)
        best, second, bi = _top2_min(dist)
        match_img = top_e[bi // K]                          # [Kq] db slot
    else:
        # ---- one dense Hamming pass: [Kq, D*K] int8 MXU contraction
        # against the resident ±1 DB (no per-query unpack) ----
        dots = jax.lax.dot_general(uq, db.desc_pm, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        dist = (256 - dots).astype(jnp.float32) * 0.5
        db_ok = (db.kp_valid.reshape(-1)
                 & entry_ok[:, None].repeat(K, 1).reshape(-1))
        dist = jnp.where(db_ok[None, :] & valid_q[:, None], dist, BIG)
        best, second, bi = _top2_min(dist)
        match_img = bi // K                                 # [Kq] db slot

    # ---- kNN + NNDR ratio filter (lcdetector.cc:169-181) ----
    match_ok = (best <= second * nndr) & (best < 256.0)

    # ---- image voting (searchImages) ----
    votes = jnp.zeros((D,), jnp.float32).at[match_img].add(
        jnp.where(match_ok, 1.0, 0.0))

    # ---- min-max normalization + cutoff (lcdetector.cc:183-204) ----
    has_any = jnp.any(votes > 0)
    vmax = jnp.max(votes)
    vmin = jnp.min(jnp.where(db.kf_id >= 0, votes, jnp.inf))
    vmin = jnp.where(jnp.isfinite(vmin), vmin, 0.0)
    norm = (votes - vmin) / jnp.maximum(vmax - vmin, 1e-9)
    cand = (norm > min_score) & (db.kf_id >= 0) & (votes >= min_votes)

    # ---- temporal islands (lcdetector.cc:206-267) ----
    ids = db.kf_id
    near = (jnp.abs(ids[:, None] - ids[None, :]) <= island_r) \
        & cand[None, :] & (ids[:, None] >= 0)
    island_score = jnp.sum(jnp.where(near, norm[None, :], 0.0), axis=1) / \
        jnp.maximum(jnp.sum(near, axis=1), 1).astype(jnp.float32)
    island_score = jnp.where(cand, island_score, -1.0)

    # overlap priority with the previous detection (getPriorIslands)
    prior = (jnp.abs(ids - db.last_match) <= island_r) & (db.last_match >= 0)
    island_score = island_score + jnp.where(prior & cand, 0.5, 0.0)

    entry = jnp.argmax(island_score)
    found = has_any & cand[entry] & (jnp.sum(cand) > 0)
    match_kf = jnp.where(found, ids[entry], -1)

    db = db._replace(last_match=jnp.where(found, match_kf, db.last_match))
    return db, LoopResult(found=found, entry=entry.astype(jnp.int32),
                          match_kf_id=match_kf.astype(jnp.int32),
                          score=island_score[entry])


@partial(jax.jit, static_argnames=("nndr", "iters", "min_inliers"))
def verify_loop(db: LoopDB, entry, desc_q, px_q, valid_q, cam, pose0: SE3,
                *, nndr: float = 0.8, iters: int = 8,
                min_inliers: int = 12):
    """Geometric verification of a DETECTED loop: NNDR-match the query
    keyframe's descriptors to the entry's stored 3D landmarks, then
    refine FROM THE CURRENT POSE with motion-only LM (solvers/pnp).

    Verification is not cold recovery: by definition of a loop closure
    the current pose is already near the truth up to accumulated drift,
    so the solve must start there.  P3P-LMedS from scratch (relocalize
    below, the right tool when tracking is LOST) picks the spurious
    far branch when the matched landmarks are near-coplanar — observed
    as |correction| ≈ the whole trajectory span on the two-plane test
    scene — while LM from the current pose stays in the true basin and
    returns the small drift correction.

    Returns (pose T_cw, success, num_inliers)."""
    from alvaar_tpu.solvers.pnp import pnp_refine
    desc_db = db.desc[entry]
    ok_db = db.kp_valid[entry] & db.lm_is3d[entry]
    dist = hamming_matrix_matmul(desc_q, desc_db).astype(jnp.float32)
    BIG = jnp.asarray(1e9, jnp.float32)
    dist = jnp.where(ok_db[None, :] & valid_q[:, None], dist, BIG)
    neg2, idx2 = jax.lax.top_k(-dist, 2)
    best, second = -neg2[:, 0], -neg2[:, 1]
    m_ok = (best <= second * nndr) & (best < 64.0)
    pts_w = db.lm_pos[entry][idx2[:, 0]]
    import math
    res = pnp_refine(pose0, cam, pts_w, px_q, m_ok, iters=iters,
                     huber_delta=math.sqrt(5.9915))
    n_used = jnp.maximum(jnp.sum(m_ok), 1)
    ok = ((res.num_inliers >= min_inliers)
          & (res.num_inliers >= 0.5 * n_used)
          & jnp.all(jnp.isfinite(res.pose.t)))
    return res.pose, ok, res.num_inliers


@partial(jax.jit, static_argnames=("nndr", "iters"))
def relocalize(db: LoopDB, entry, desc_q, bearings_q, valid_q, key, *,
               focal, nndr: float = 0.8, iters: int = 100,
               min_inliers: int = 12) -> AbsolutePoseResult:
    """Recover an absolute pose against a stored keyframe's geometry:
    descriptor NNDR matching to the entry's 3D landmarks, then P3P-LMedS.
    The capability the reference lacks (its recovery is always full reset,
    SURVEY §3.5)."""
    desc_db = db.desc[entry]                 # [K, 8]
    ok_db = db.kp_valid[entry] & db.lm_is3d[entry]
    dist = hamming_matrix_matmul(desc_q, desc_db).astype(jnp.float32)
    BIG = jnp.asarray(1e9, jnp.float32)
    dist = jnp.where(ok_db[None, :] & valid_q[:, None], dist, BIG)
    neg2, idx2 = jax.lax.top_k(-dist, 2)
    best, second = -neg2[:, 0], -neg2[:, 1]
    m_ok = (best <= second * nndr) & (best < 64.0)
    pts_w = db.lm_pos[entry][idx2[:, 0]]

    res = p3p_lmeds(key, bearings_q, pts_w, m_ok, focal=focal,
                    iters=iters, min_inliers=min_inliers)
    return res


@partial(jax.jit, static_argnames=("nndr", "iters", "topk", "min_inliers"))
def relocalize_topk(db: LoopDB, desc_q, bearings_q, valid_q, key, *,
                    focal, nndr: float = 0.8, iters: int = 100,
                    topk: int = 8,
                    min_inliers: int = 12) -> AbsolutePoseResult:
    """Batched relocalization against the WHOLE database in one program:
    one dense Hamming pass votes for candidate entries, the ``topk``
    highest-voted entries are P3P-LMedS-solved under ``vmap``, and the
    solve with the most inliers wins.  Replaces the O(D)-dispatch host
    loop (one kernel launch per entry) with exactly one launch."""
    D, K, _ = db.desc.shape

    # ---- vote: same dense pass as detect_loop, no delay gate ----
    dist = hamming_vs_pm1(desc_q, db.desc_pm)
    db_ok = (db.kp_valid & db.lm_is3d & (db.kf_id >= 0)[:, None]).reshape(-1)
    BIG = jnp.asarray(1e9, jnp.float32)
    dist = jnp.where(db_ok[None, :] & valid_q[:, None], dist, BIG)
    best, second, bi = _top2_min(dist)
    m_ok = (best <= second * nndr) & (best < 64.0)
    votes = jnp.zeros((D,), jnp.float32).at[bi // K].add(
        jnp.where(m_ok, 1.0, 0.0))

    _, entries = jax.lax.top_k(votes, topk)               # [E]

    keys = jax.random.split(key, topk)
    res = jax.vmap(
        lambda e, k: relocalize(db, e, desc_q, bearings_q, valid_q, k,
                                focal=focal, nndr=nndr, iters=iters,
                                min_inliers=min_inliers)
    )(entries, keys)

    n_in = jnp.where(res.success, res.num_inliers, -1)
    b = jnp.argmax(n_in)
    pick = lambda x: jax.tree.map(lambda a: a[b], x)
    return AbsolutePoseResult(
        pose=pick(res.pose), success=res.success[b],
        inliers=res.inliers[b], num_inliers=res.num_inliers[b])
