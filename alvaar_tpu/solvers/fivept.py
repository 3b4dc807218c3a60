"""Nister five-point minimal essential-matrix solver, TPU-native.

Replaces the reference's OpenGV Nister solver used at bootstrap
(reference src/libs/opengv/src/relative_pose/modules/fivept_nister/
modules.cpp, call site src/slam/src/multi_view_geometry.cpp:263-280).

Math (Nister, "An efficient solution to the five-point relative pose
problem", PAMI 2004):

  1. the 5 epipolar constraints f1ᵀE f0 = 0 give a 4-D null space:
     E = x·X + y·Y + z·Z + w·W (batched SVD of the [5, 9] system);
  2. det(E) = 0 and 2·E Eᵀ E − tr(E Eᵀ)·E = 0 yield 10 cubic equations
     in (x, y, z, w) — built here via STATIC monomial-product index
     tables (degree-1 × degree-1 → degree-2 → degree-3 convolutions),
     giving a 10×20 coefficient matrix;
  3. Gauss-Jordan elimination of the 10 monomials of degree ≥ 2 in
     (x, y) — one ``linalg.solve`` of the 10×10 left block — leaves each
     of them expressed in the 10 basis monomials
     v = [xz², xz, x, yz², yz, y, z³, z², z, 1] (w = 1);
  4. Nister's z-elimination: the identities x²z − z·(x²) = 0,
     y²z − z·(y²) = 0, xyz − z·(xy) = 0 turn three row pairs into a 3×3
     matrix B(z) of z-polynomials acting on [x, y, 1]ᵀ; det B(z) is the
     famous degree-10 polynomial;
  5. real roots: TPU has no nonsymmetric eigensolver, so roots are found
     branch-free by evaluating the HOMOGENEOUS degree-10 polynomial on a
     trig grid z = tan θ, θ ∈ (−π/2, π/2) (handles unbounded roots),
     followed by fixed-count bisection on every sign-change interval —
     all masked fixed-shape ops, vmappable across RANSAC samples;
  6. each real root gives (x, y) from the null space of B(z), hence E.

The solver returns up to 10 E candidates per sample (mask for dead
roots); RANSAC scores every candidate of every sample exactly like the
8-point path (decompose → triangulate → angular error + cheirality).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from alvaar_tpu.geom.lie import SE3, matrix_to_quat
from alvaar_tpu.solvers.essential import (RelativePoseResult,
                                          _score_candidates,
                                          decompose_essential,
                                          refine_relative_pose)
from alvaar_tpu.solvers.ransac import sample_minimal

# ---------------------------------------------------------------------------
# Static monomial algebra tables (built once with numpy at import)
# ---------------------------------------------------------------------------
# degree-1 basis: [x, y, z, w]
# degree-2 basis: 10 monomials, degree-3 basis: 20 monomials.
# A monomial is its exponent tuple (ex, ey, ez, ew).


def _monomials(total):
    out = []
    for ex in range(total, -1, -1):
        for ey in range(total - ex, -1, -1):
            for ez in range(total - ex - ey, -1, -1):
                out.append((ex, ey, ez, total - ex - ey - ez))
    return out

_DEG1 = _monomials(1)          # 4
_DEG2 = _monomials(2)          # 10
_DEG3_RAW = _monomials(3)      # 20

# order the 20 degree-3 monomials per Nister: first the 10 with
# degree >= 2 in (x, y), then the basis v = [xz2, xzw, xw2, yz2, yzw,
# yw2, z3, z2w, zw2, w3]
_HEAD = [m for m in _DEG3_RAW if m[0] + m[1] >= 2]
_TAIL_ORDER = [(1, 0, 2, 0), (1, 0, 1, 1), (1, 0, 0, 2),
               (0, 1, 2, 0), (0, 1, 1, 1), (0, 1, 0, 2),
               (0, 0, 3, 0), (0, 0, 2, 1), (0, 0, 1, 2), (0, 0, 0, 3)]
# deterministic head order (x-major graded):
_HEAD_ORDER = [(3, 0, 0, 0), (2, 1, 0, 0), (1, 2, 0, 0), (0, 3, 0, 0),
               (2, 0, 1, 0), (2, 0, 0, 1), (1, 1, 1, 0), (1, 1, 0, 1),
               (0, 2, 1, 0), (0, 2, 0, 1)]
_DEG3 = _HEAD_ORDER + _TAIL_ORDER
assert sorted(_DEG3) == sorted(_DEG3_RAW)

_D1 = {m: i for i, m in enumerate(_DEG1)}
_D2 = {m: i for i, m in enumerate(_DEG2)}
_D3 = {m: i for i, m in enumerate(_DEG3)}

def _mul_table(basis_a, basis_b, out_index):
    """[len(a), len(b)] int table: index of a_i * b_j in the out basis."""
    t = np.zeros((len(basis_a), len(basis_b)), np.int32)
    for i, ma in enumerate(basis_a):
        for j, mb in enumerate(basis_b):
            m = tuple(ea + eb for ea, eb in zip(ma, mb))
            t[i, j] = out_index[m]
    return t

_T11 = _mul_table(_DEG1, _DEG1, _D2)   # deg1*deg1 -> deg2
_T21 = _mul_table(_DEG2, _DEG1, _D3)   # deg2*deg1 -> deg3

# rows of the head (eliminated) monomials we need for step 4:
_ROW_X2Z = _HEAD_ORDER.index((2, 0, 1, 0))
_ROW_X2W = _HEAD_ORDER.index((2, 0, 0, 1))
_ROW_Y2Z = _HEAD_ORDER.index((0, 2, 1, 0))
_ROW_Y2W = _HEAD_ORDER.index((0, 2, 0, 1))
_ROW_XYZ = _HEAD_ORDER.index((1, 1, 1, 0))
_ROW_XYW = _HEAD_ORDER.index((1, 1, 0, 1))


def _p1_mul(a, b):
    """deg1 coeff vectors [..., 4] x [..., 4] -> deg2 [..., 10]."""
    prod = a[..., :, None] * b[..., None, :]               # [..., 4, 4]
    out = jnp.zeros(a.shape[:-1] + (10,), a.dtype)
    return out.at[..., _T11.reshape(-1)].add(prod.reshape(a.shape[:-1] + (16,)))

def _p2_mul(a, b):
    """deg2 [..., 10] x deg1 [..., 4] -> deg3 [..., 20]."""
    prod = a[..., :, None] * b[..., None, :]               # [..., 10, 4]
    out = jnp.zeros(a.shape[:-1] + (20,), a.dtype)
    return out.at[..., _T21.reshape(-1)].add(prod.reshape(a.shape[:-1] + (40,)))


def _constraint_matrix(basis):
    """basis: [..., 4, 3, 3] null-space matrices (X, Y, Z, W) →
    M [..., 10, 20] cubic-constraint coefficients."""
    # E entries as degree-1 polynomials: P[i, j] = [..., 4] coeffs
    P = jnp.moveaxis(basis, -3, -1)                        # [..., 3, 3, 4]

    def p1(i, j):
        return P[..., i, j, :]

    # det(E) via cofactor expansion: deg3 poly
    def det3():
        out = 0
        for j, (a, b) in zip(range(3), [(1, 2), (0, 2), (0, 1)]):
            minor = (_p1_mul(p1(1, a), p1(2, b))
                     - _p1_mul(p1(1, b), p1(2, a)))        # deg2
            term = _p2_mul(minor, p1(0, j))
            out = out + (term if j != 1 else -term)
        return out

    # EEt[i, j] = sum_k E[i,k] E[j,k]  (deg2)
    EEt = [[sum(_p1_mul(p1(i, k), p1(j, k)) for k in range(3))
            for j in range(3)] for i in range(3)]
    trace = EEt[0][0] + EEt[1][1] + EEt[2][2]

    rows = [det3()]
    for i in range(3):
        for j in range(3):
            # (2 EEt - tr I) E  row (i, j)
            acc = 0
            for k in range(3):
                c2 = 2.0 * EEt[i][k]
                if i == k:
                    c2 = c2 - trace
                acc = acc + _p2_mul(c2, p1(k, j))
            rows.append(acc)
    return jnp.stack(rows, axis=-2)                        # [..., 10, 20]


def _poly_conv(a, b):
    """1-D polynomial product along the last axis (ascending powers)."""
    la, lb = a.shape[-1], b.shape[-1]
    out = jnp.zeros(a.shape[:-1] + (la + lb - 1,), a.dtype)
    for i in range(la):
        out = out.at[..., i:i + lb].add(a[..., i:i + 1] * b)
    return out


def _degree10(C):
    """C: [..., 10, 10] elimination result (head = C @ v).  Returns
    (poly [..., 11] ascending z-coeffs, B-builder rows for x/y recovery).

    Basis v order: [xz², xz, x, yz², yz, y, z³, z², z, 1].
    Row identity m − C_m·v with m ∈ {x²z, x², y²z, y², xyz, xy}:
    k = row(x²z) − z·row(x²w), l = row(y²z) − z·row(y²w),
    m = row(xyz) − z·row(xyw) — each a z-polynomial 10-vector whose dot
    with v must vanish; grouping by (x, y, 1) gives B(z)."""
    dtype = C.dtype

    def zpoly_rows(r_hi, r_lo):
        """row(m·z) − z·row(m·w): [..., 10] deg-0 minus z·deg-0 →
        [..., 10, 2] coeff (const, z)."""
        hi = C[..., r_hi, :]
        lo = C[..., r_lo, :]
        return jnp.stack([hi, -lo], axis=-1)               # [..., 10, 2]

    def group(row):                                        # [..., 10, 2]
        # coefficient of x: v[0..2] are x·{z², z, 1} → poly in z:
        # row[:, 0]*z^2... assemble ascending-z polys
        def comb(idxs, shifts, width):
            out = jnp.zeros(row.shape[:-2] + (width,), dtype)
            for i, s in zip(idxs, shifts):
                out = out.at[..., s:s + 2].add(row[..., i, :])
            return out
        # x-group: xz² (shift 2), xz (1), x (0) → degree ≤ 3
        bx = comb([0, 1, 2], [2, 1, 0], 4)
        by = comb([3, 4, 5], [2, 1, 0], 4)
        # const group: z³ (3), z² (2), z (1), 1 (0) → degree ≤ 4
        bc = comb([6, 7, 8, 9], [3, 2, 1, 0], 5)
        return bx, by, bc

    k = group(zpoly_rows(_ROW_X2Z, _ROW_X2W))
    l = group(zpoly_rows(_ROW_Y2Z, _ROW_Y2W))
    m = group(zpoly_rows(_ROW_XYZ, _ROW_XYW))

    # det of B(z) = | kx ky kc ; lx ly lc ; mx my mc |
    def minor(a, b, c, d):
        return _poly_conv(a, d) - _poly_conv(b, c)

    p = (_poly_conv(k[0], minor(l[1], l[2], m[1], m[2]))
         - _poly_conv(k[1], minor(l[0], l[2], m[0], m[2]))
         + _poly_conv(k[2], minor(l[0], l[1], m[0], m[1])))
    # degrees: kx(≤3)*[ly(≤3)*mc(≤4)] → ≤10; conv widths: 4+(4+5-1)-1=11 ✓
    return p, (k, l, m)


def _real_roots_deg10(p, n_grid: int = 128, bisect_iters: int = 30):
    """All real roots of p(z) (ascending coeffs [..., 11]) via the
    homogeneous trig parametrization z = s/c, (s, c) = (sin θ, cos θ):
    p_h(θ) = Σ a_i sⁱ c^(10−i), θ ∈ (−π/2, π/2) (covers unbounded z).
    Sign-change scan on an n_grid partition + fixed-count bisection —
    branch-free, fixed shapes, vmappable.  Returns (roots [..., n_grid],
    mask [..., n_grid]); a degree-10 polynomial has ≤10 live entries."""
    deg = p.shape[-1] - 1

    def ph(theta):
        """theta [..., M] (batch dims matching p's) → p_h [..., M]."""
        s, c = jnp.sin(theta), jnp.cos(theta)
        powers = jnp.stack([s ** i * c ** (deg - i)
                            for i in range(deg + 1)], axis=-1)
        return jnp.sum(p[..., None, :] * powers, axis=-1)

    eps = 1e-3
    thetas = jnp.linspace(-jnp.pi / 2 + eps, jnp.pi / 2 - eps, n_grid + 1)
    grid = jnp.broadcast_to(thetas, p.shape[:-1] + (n_grid + 1,))
    vals = ph(grid)
    lo_v, hi_v = vals[..., :-1], vals[..., 1:]
    has_root = jnp.sign(lo_v) * jnp.sign(hi_v) < 0
    lo, hi = grid[..., :-1], grid[..., 1:]

    def body(carry, _):
        lo, hi, lo_v = carry
        mid = 0.5 * (lo + hi)
        mv = ph(mid)
        left = jnp.sign(mv) * jnp.sign(lo_v) < 0
        return (jnp.where(left, lo, mid), jnp.where(left, mid, hi),
                jnp.where(left, lo_v, mv)), None

    (lo, hi, _), _ = jax.lax.scan(body, (lo, hi, lo_v), None,
                                  length=bisect_iters)
    return jnp.tan(0.5 * (lo + hi)), has_root


def essential_from_5pt(f0, f1, n_grid: int = 64, bisect_iters: int = 26):
    """f0, f1: [..., 5, 3] bearings.  Returns (E [..., R, 3, 3],
    valid [..., R]) with R = n_grid candidate slots (≤10 live)."""
    A = jnp.einsum("...mi,...mj->...mij", f1, f0)
    A = A.reshape(A.shape[:-2] + (9,))                      # [..., 5, 9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    basis = Vt[..., 5:9, :]                                 # [..., 4, 9]
    # order: E = x·X + y·Y + z·Z + 1·W  (rows 0..3 = X, Y, Z, W)
    basis = basis.reshape(basis.shape[:-1] + (3, 3))

    M = _constraint_matrix(basis)                           # [..., 10, 20]
    M1 = M[..., :, :10]
    M2 = M[..., :, 10:]
    # regularize: degenerate samples give a singular left block
    eye = jnp.eye(10, dtype=M.dtype)
    C = jnp.linalg.solve(M1 + 1e-12 * eye, M2)              # head = -C·v... sign:
    # M1·head + M2·v = 0  →  head = -(M1⁻¹M2)·v = (-C)·v
    C = -C

    p, (k, l, m) = _degree10(C)
    roots, mask = _real_roots_deg10(p, n_grid=n_grid,
                                    bisect_iters=bisect_iters)
    # compress to ≤10 live roots (a degree-10 polynomial cannot have
    # more) so downstream candidate scoring stays small
    _, top = jax.lax.top_k(mask.astype(jnp.int32), 10)
    top = jnp.sort(top, axis=-1)
    roots = jnp.take_along_axis(roots, top, axis=-1)       # [..., 10]
    mask = jnp.take_along_axis(mask, top, axis=-1)

    # recover (x, y) per root from B(z)·[x, y, 1]ᵀ = 0 using two rows
    def polyval(c, z):
        # c: [..., 10?, W]? here c: [..., W] coeff ascending; z: [..., R]
        out = 0.0
        for i in range(c.shape[-1]):
            out = out + c[..., i:i + 1] * z ** i
        return out

    kx, ky, kc = (polyval(c, roots) for c in k)             # [..., R]
    lx, ly, lc = (polyval(c, roots) for c in l)
    # null vector of [[kx, ky, kc], [lx, ly, lc]] via cross product
    n1 = jnp.stack([kx, ky, kc], axis=-1)
    n2 = jnp.stack([lx, ly, lc], axis=-1)
    nv = jnp.cross(n1, n2)                                  # [..., R, 3]
    wcomp = nv[..., 2]
    safe = jnp.where(jnp.abs(wcomp) > 1e-12, wcomp, 1.0)
    x = nv[..., 0] / safe
    y = nv[..., 1] / safe

    coeff = jnp.stack([x, y, roots, jnp.ones_like(roots)], axis=-1)
    E = jnp.einsum("...rc,...cij->...rij", coeff, basis)
    # normalize for conditioning
    En = jnp.linalg.norm(E, axis=(-2, -1), keepdims=True).clip(1e-12)
    return E / En, mask & (jnp.abs(wcomp) > 1e-12)


def essential_ransac_5pt(key, f0, f1, valid, *, focal, iters: int = 100,
                         err_px: float = 3.0, min_inliers: int = 10,
                         n_grid: int = 64) -> RelativePoseResult:
    """RANSAC relative pose with the Nister minimal solver: 5-point
    samples, ≤10 essential candidates per sample, scored like the 8-point
    path (reference multi_view_geometry.cpp:225-320)."""
    idx, samp_ok = sample_minimal(key, valid, 5, iters)
    E, emask = essential_from_5pt(f0[idx], f1[idx],
                                  n_grid=n_grid)           # [H, R, 3, 3]
    H, R = emask.shape
    E = E.reshape(H * R, 3, 3)
    cand_ok = (emask & samp_ok[:, None]).reshape(H * R)

    R4, t4 = decompose_essential(E)                        # [H*R, 4, ...]
    C = H * R * 4
    pose_10 = SE3(matrix_to_quat(R4.reshape(C, 3, 3)), t4.reshape(C, 3))
    pose_01 = pose_10.inverse()

    thresh = 2.0 * (1.0 - jnp.cos(jnp.arctan(err_px / focal)))
    err, posdepth = _score_candidates(pose_01, f0, f1, thresh)
    inl = (err < thresh) & posdepth & valid[None]
    counts = jnp.sum(inl, axis=-1)
    counts = jnp.where(jnp.repeat(cand_ok, 4), counts, -1)
    best = jnp.argmax(counts)

    best_pose = jax.tree.map(lambda x: x[best], pose_01)
    inliers = inl[best]
    # local optimization: LSQ refit on the winning inlier set
    best_pose, inliers, num = refine_relative_pose(
        best_pose, inliers, f0, f1, thresh, valid)
    success = num >= min_inliers
    return RelativePoseResult(best_pose, inliers, num, success)
