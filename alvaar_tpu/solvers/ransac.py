"""Batched hypothesize-all-at-once robust estimation (RANSAC / LMedS).

TPU-native replacement for OpenGV's sequential sample-consensus loops
(reference src/libs/opengv/include/opengv/sac/implementation/Ransac.hpp:45
and Lmeds.hpp:43,95-140): instead of iterating hypotheses until a stopping
criterion, ALL H hypotheses are generated at once (one gather), all
candidate models are solved in parallel (vmap'd minimal solver), and all
N points are scored against all C candidates as one [C, N] pass — then a
single argmin/argmax picks the winner.  Seeded PRNG makes runs
deterministic (the reference seeds from std::random_device,
system.cpp:210 — we deliberately diverge).

Masked-median machinery implements LMedS scoring over variable inlier
counts on fixed shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_minimal(key, valid, k: int, num_hyp: int):
    """Draw ``num_hyp`` minimal samples of ``k`` distinct indices from the
    valid slots of a fixed-size pool.

    Uses the Gumbel-top-k trick: per hypothesis, perturb log-validity with
    Gumbel noise and take the top k — distinct indices, valid-only (as long
    as ≥k valid slots exist), fully batched.

    Returns: idx [num_hyp, k] int32, ok [num_hyp] bool (enough valid slots).
    """
    n = valid.shape[0]
    g = jax.random.gumbel(key, (num_hyp, n))
    scores = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(scores, k)
    ok = jnp.sum(valid) >= k
    return idx, jnp.broadcast_to(ok, (num_hyp,))


def masked_quantile(errs, valid, q: float):
    """Quantile of ``errs`` over valid entries, batched over leading dims.

    errs: [..., N]; valid: [N] or [..., N].  Invalid entries sort to +inf;
    the quantile index is computed from the (dynamic) valid count.
    LMedS-median = q 0.5 (reference Lmeds.hpp:95-140); the plane detector
    scores with q 0.2 (reference system.cpp:244-252 20th percentile).
    """
    big = jnp.asarray(jnp.inf, errs.dtype)
    masked = jnp.where(valid, errs, big)
    srt = jnp.sort(masked, axis=-1)
    count = jnp.sum(valid, axis=-1).astype(jnp.int32)
    pos = jnp.clip((count.astype(jnp.float32) * q).astype(jnp.int32),
                   0, errs.shape[-1] - 1)
    return jnp.take_along_axis(srt, pos[..., None], axis=-1)[..., 0]


def score_inliers(errs, valid, thresh):
    """Inlier mask + count for candidate errors [..., N]."""
    inl = (errs < thresh) & valid
    return inl, jnp.sum(inl, axis=-1)


def select_best_by_count(counts, cand_valid):
    """argmax over candidates with validity mask; returns (idx, count)."""
    c = jnp.where(cand_valid, counts, -1)
    i = jnp.argmax(c)
    return i, c[i]


def select_best_by_median(medians, cand_valid):
    """argmin of LMedS scores with validity mask."""
    m = jnp.where(cand_valid, medians, jnp.inf)
    i = jnp.argmin(m)
    return i, m[i]
