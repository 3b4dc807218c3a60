"""Hamming distance on packed 256-bit descriptors — popcount and MXU paths.

TPU-native equivalent of the reference's descriptor matching primitive
``cv::norm(a, b, NORM_HAMMING)`` → hal::normHamming (reference
src/slam/src/map_point.cpp:204-222, mapper.cpp:478; OpenCV
core/include/opencv2/core/hal/hal.hpp:58).  The reference computes one
distance per call inside nested loops; here the full [N, M] distance matrix
is one op:

  * popcount path: XOR + ``lax.population_count`` + word-sum — exact, good
    for small N·M;
  * matmul path: unpack bits to ±1 and use the MXU:
    ``dist = (256 - A·Bᵀ) / 2`` — exact in f32 accumulation, and the right
    formulation for loop-closure scoring over thousands of keyframe
    descriptors (SURVEY §2.3 "popcount matmul").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DESC_BITS = 256


def unpack_pm1(desc):
    """[N, 8] uint32 → [N, 256] float32 in {-1, +1} (bit=1 → +1)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., None] >> shifts[None, None]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[:-1] + (DESC_BITS,))
    return bits.astype(jnp.float32) * 2.0 - 1.0


def unpack_pm1_i8(desc):
    """[N, 8] uint32 → [N, 256] int8 in {-1, +1} — the resident form for
    repeatedly-queried descriptor databases (unpacking a large DB on
    every query is pure HBM traffic; int8 costs 8x the packed bytes but
    turns each query into one int8 MXU matmul)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., None] >> shifts[None, None]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[:-1] + (DESC_BITS,))
    return (bits.astype(jnp.int8) * 2 - 1).astype(jnp.int8)


def hamming_vs_pm1(query, db_pm1):
    """[Kq, 8] uint32 query vs an int8 ±1 resident DB [M, 256] →
    [Kq, M] f32 Hamming distances via one int8→int32 MXU contraction."""
    uq = unpack_pm1_i8(query)
    dots = jax.lax.dot_general(uq, db_pm1, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)
    return (DESC_BITS - dots).astype(jnp.float32) * 0.5


def hamming_matrix_popcount(a, b):
    """[N, 8] x [M, 8] uint32 → [N, M] int32 Hamming distances."""
    x = a[:, None, :] ^ b[None, :, :]
    return jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)


def hamming_matrix_matmul(a, b):
    """MXU formulation: dist = (256 - <±1 bits>) / 2.  Exact: the dot of
    ±1 vectors accumulates in f32 (integers ≤ 256)."""
    ua = unpack_pm1(a)
    ub = unpack_pm1(b)
    dots = jnp.dot(ua, ub.T, preferred_element_type=jnp.float32)
    return ((DESC_BITS - dots) * 0.5).astype(jnp.int32)


def hamming_matrix(a, b, *, prefer_mxu: bool = None):
    """Choose the path by problem size: the MXU wins once N*M is large."""
    if prefer_mxu is None:
        prefer_mxu = a.shape[0] * b.shape[0] >= 64 * 64
    return hamming_matrix_matmul(a, b) if prefer_mxu else hamming_matrix_popcount(a, b)


def hamming_rowwise(a, b):
    """Paired distances: [N, 8] x [N, 8] → [N]."""
    return jnp.sum(jax.lax.population_count(a ^ b).astype(jnp.int32), axis=-1)


def hamming_min_crossbag(bag_a, filled_a, bag_b, filled_b):
    """Min cross-bag Hamming distance — the reference's
    MapPoint::computeMinDescDist (reference src/slam/src/
    map_point.cpp:204-222): the distance between two landmarks is the
    minimum Hamming over all (desc_a, desc_b) pairs of their descriptor
    bags, which is what makes matching survive viewpoint change.

    Args:
      bag_a: [N, G, 8] uint32, filled_a: [N, G] bool.
      bag_b: [M, G, 8] uint32, filled_b: [M, G] bool.
    Returns [N, M] f32 (DESC_BITS+1 where either bag is empty).

    Shape strategy: one [N, M*G] MXU pass per A-bag entry (G unrolled)
    with a running min — peak memory [N, M, G] instead of [N*G, M*G]."""
    n, g, _ = bag_a.shape
    m = bag_b.shape[0]
    ub = unpack_pm1(bag_b.reshape(m * g, 8))              # [M*G, 256]
    big = jnp.float32(DESC_BITS + 1)
    best = jnp.full((n, m), big, jnp.float32)
    for gi in range(g):
        ua = unpack_pm1(bag_a[:, gi])                     # [N, 256]
        dots = jnp.dot(ua, ub.T, preferred_element_type=jnp.float32)
        d = ((DESC_BITS - dots) * 0.5).reshape(n, m, g)
        d = jnp.where(filled_b[None, :, :], d, big)
        d = jnp.min(d, axis=-1)                           # [N, M]
        best = jnp.minimum(best, jnp.where(filled_a[:, gi][:, None], d, big))
    return best


def best_two(dists, valid_cols=None, axis=-1):
    """Best and second-best distances + best index along ``axis`` — the
    NNDR-matching primitive (reference mapper.cpp:467-489 best/second ratio).
    Invalid columns are masked to a huge distance."""
    if valid_cols is not None:
        big = jnp.asarray(10 * DESC_BITS, dists.dtype)
        dists = jnp.where(valid_cols, dists, big)
    neg = -dists.astype(jnp.float32)
    top2, idx2 = jax.lax.top_k(neg, 2)
    return -top2[..., 0], -top2[..., 1], idx2[..., 0]
