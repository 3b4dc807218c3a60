"""Closed-form batched real-root solvers for cubics and quartics.

TPU-native foundation for the minimal solvers (P3P's Grunert quartic).
XLA on TPU has no nonsymmetric eigensolver, so companion-matrix root
finding (what jnp.roots / OpenGV's Eigen path use) is unavailable; instead
we solve quartics in closed form (resolvent cubic by Cardano's
trigonometric method + Ferrari factorization into two quadratics), fully
branch-free with validity masks, then polish real roots with two Newton
steps to recover f32 accuracy.

All functions broadcast over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def solve_cubic_real_max(b, c, d):
    """Largest real root of x^3 + b x^2 + c x + d (batched, branch-free).

    Uses the trigonometric method for three real roots and the Cardano
    cbrt form for one real root, selected by discriminant sign via where.
    """
    # depressed: x = t - b/3 → t^3 + p t + q
    p = c - b * b / 3.0
    q = 2.0 * b ** 3 / 27.0 - b * c / 3.0 + d
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # --- three-real-roots branch (disc <= 0, p < 0) ---
    p_neg = jnp.minimum(p, -_EPS)
    m = 2.0 * jnp.sqrt(-p_neg / 3.0)
    arg = jnp.clip(3.0 * q / (p_neg * m), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3.0
    # the largest of the three roots is m*cos(theta) with theta in [0, pi/3]
    t_tri = m * jnp.cos(theta)

    # --- one-real-root branch (disc > 0) ---
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u3 = -q / 2.0 + sq
    v3 = -q / 2.0 - sq
    t_one = jnp.cbrt(u3) + jnp.cbrt(v3)

    t = jnp.where(disc > 0, t_one, t_tri)
    return t - b / 3.0


def solve_quartic_real(c4, c3, c2, c1, c0, *, newton_iters: int = 2):
    """Real roots of c4 x^4 + c3 x^3 + c2 x^2 + c1 x + c0.

    Returns (roots [..., 4], valid [..., 4]).  Invalid lanes hold 0.
    Leading-coefficient degeneracy is epsilon-guarded; RANSAC-style callers
    reject bad hypotheses downstream by scoring, so a slightly perturbed
    root set on degenerate input is acceptable.
    """
    c4s = jnp.where(jnp.abs(c4) < _EPS, _EPS, c4)
    p = c3 / c4s
    q = c2 / c4s
    r = c1 / c4s
    s = c0 / c4s

    # depressed quartic: x = y - p/4 → y^4 + A y^2 + B y + C
    p2 = p * p
    A = q - 3.0 * p2 / 8.0
    B = r - p * q / 2.0 + p2 * p / 8.0
    C = s - p * r / 4.0 + p2 * q / 16.0 - 3.0 * p2 * p2 / 256.0

    # resolvent cubic: z^3 + 2A z^2 + (A^2 - 4C) z - B^2 = 0
    z0 = solve_cubic_real_max(2.0 * A, A * A - 4.0 * C, -B * B)
    z0 = jnp.maximum(z0, 0.0)
    w = jnp.sqrt(z0)

    biquad = z0 < 1e-10  # B ≈ 0 → biquadratic fallback
    w_safe = jnp.where(biquad, 1.0, w)

    # Ferrari factorization: (y^2 + w y + e0)(y^2 - w y + e1)
    half = 0.5 * (A + z0)
    e0 = half - B / (2.0 * w_safe)
    e1 = half + B / (2.0 * w_safe)

    def quad_roots(bq, cq):
        disc = bq * bq - 4.0 * cq
        ok = disc >= 0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        return (-bq + sq) / 2.0, (-bq - sq) / 2.0, ok

    r0a, r0b, ok0 = quad_roots(w, e0)
    r1a, r1b, ok1 = quad_roots(-w, e1)

    # biquadratic: y^2 = (-A ± sqrt(A^2 - 4C)) / 2
    dbq = A * A - 4.0 * C
    sbq = jnp.sqrt(jnp.maximum(dbq, 0.0))
    y2a = (-A + sbq) / 2.0
    y2b = (-A - sbq) / 2.0
    bq_ok = dbq >= 0
    b0a = jnp.sqrt(jnp.maximum(y2a, 0.0))
    b1a = jnp.sqrt(jnp.maximum(y2b, 0.0))

    roots_f = jnp.stack([r0a, r0b, r1a, r1b], axis=-1)
    valid_f = jnp.stack([ok0, ok0, ok1, ok1], axis=-1)
    roots_b = jnp.stack([b0a, -b0a, b1a, -b1a], axis=-1)
    valid_b = jnp.stack(
        [bq_ok & (y2a >= 0)] * 2 + [bq_ok & (y2b >= 0)] * 2, axis=-1
    )

    y = jnp.where(biquad[..., None], roots_b, roots_f)
    valid = jnp.where(biquad[..., None], valid_b, valid_f)
    x = y - (p / 4.0)[..., None]

    # Newton polish on the ORIGINAL quartic (recovers f32 accuracy)
    def f_and_df(xv):
        f = (((c4[..., None] * xv + c3[..., None]) * xv + c2[..., None]) * xv
             + c1[..., None]) * xv + c0[..., None]
        df = ((4.0 * c4[..., None] * xv + 3.0 * c3[..., None]) * xv
              + 2.0 * c2[..., None]) * xv + c1[..., None]
        return f, df

    for _ in range(newton_iters):
        f, df = f_and_df(x)
        df = jnp.where(jnp.abs(df) < _EPS, _EPS, df)
        x = x - f / df

    return jnp.where(valid, x, 0.0), valid
