"""Fused Pallas kernel for the KLT correlation-volume iteration.

The XLA formulation of one LK level pass (ops/klt.py) emits hundreds of
small kernels: 162 unfold taps + 30 GN iterations × ~8 ops + the final
window contraction, each with launch overhead.  This kernel fuses the
whole pass — correlation-volume build, all GN iterations, and the final
L1-error window — into ONE Pallas program with everything VMEM-resident.

Layout: point-LAST ([..., N]) so the point dimension rides the 128-lane
axis and every per-point scalar broadcasts across lanes; window/shift
dimensions unroll as static python loops on the sublane axis.  There are
no gathers and no dynamic slices anywhere — bilinear reads of the volumes
use tent-weight contractions, exactly as the XLA path (same math).

Inputs (all point-last):
  T, gx, gy: [win, win, N] template window + gradients
  Jp:        [S, S, N] search patch, S = 2R + win
  cons:      [8, N] scalars: c0x, c0y, i00, i01, i11, d0x, d0y, frozen
Outputs:
  out:       [4, N]: dx, dy, err, edge-flag
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(T_ref, gx_ref, gy_ref, Jp_ref, cons_ref, out_ref, *,
            win: int, search_r: int, iters: int, eps: float):
    cr = 2 * search_r + 1
    R = float(search_r)
    lim = R - 1.001

    T = T_ref[:]          # [win, win, N]
    gx = gx_ref[:]
    gy = gy_ref[:]
    Jp = Jp_ref[:]        # [S, S, N]
    c0x = cons_ref[0, :]
    c0y = cons_ref[1, :]
    i00 = cons_ref[2, :]
    i01 = cons_ref[3, :]
    i11 = cons_ref[4, :]
    dx = jnp.clip(cons_ref[5, :], -lim, lim)
    dy = jnp.clip(cons_ref[6, :], -lim, lim)
    frozen = cons_ref[7, :] > 0.5

    # ---- correlation volumes by static unfold (no gathers) ----
    n = T.shape[-1]
    Cx = jnp.zeros((cr, cr, n), jnp.float32)
    Cy = jnp.zeros((cr, cr, n), jnp.float32)
    for wy in range(win):
        for wx in range(win):
            js = Jp[wy:wy + cr, wx:wx + cr, :]
            Cx = Cx + js * gx[wy, wx, :]
            Cy = Cy + js * gy[wy, wx, :]

    # ---- GN iterations ----
    iy = jax.lax.broadcasted_iota(jnp.int32, (cr, n), 0).astype(jnp.float32)

    # NOTE: unrolled on purpose — lax.fori_loop in this kernel crashes the
    # Mosaic compile helper in this environment
    for _ in range(iters):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy - (dy + R)[None, :]))  # [cr,N]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(iy - (dx + R)[None, :]))
        # b = Σ_y Σ_x wy[y] wx[x] C[y, x]
        tx = jnp.sum(wy[:, None, :] * Cx, axis=0)   # [cr, N]
        ty = jnp.sum(wy[:, None, :] * Cy, axis=0)
        bx = jnp.sum(tx * wx, axis=0) - c0x          # [N]
        by = jnp.sum(ty * wx, axis=0) - c0y
        sx = -(i00 * bx + i01 * by)
        sy = -(i01 * bx + i11 * by)
        sx = jnp.where(frozen, 0.0, sx)
        sy = jnp.where(frozen, 0.0, sy)
        dx = jnp.clip(dx + sx, -lim, lim)
        dy = jnp.clip(dy + sy, -lim, lim)
        frozen = frozen | (sx * sx + sy * sy < eps * eps)

    # ---- final window L1 error via tent-matrix contraction ----
    S = Jp.shape[0]
    iS = jax.lax.broadcasted_iota(jnp.int32, (S, n), 0).astype(jnp.float32)
    err_acc = jnp.zeros((n,), jnp.float32)
    # window row r sits at patch position dy + R + r (matching the XLA
    # path's banded shift matrices)
    for r_i in range(win):
        wyr = jnp.maximum(0.0, 1.0 - jnp.abs(iS - (dy + R + r_i)[None, :]))
        t1 = jnp.sum(Jp * wyr[:, None, :], axis=0)   # [S, N]
        for c_i in range(win):
            wxc = jnp.maximum(0.0, 1.0 - jnp.abs(
                iS - (dx + R + c_i)[None, :]))
            w_val = jnp.sum(t1 * wxc, axis=0)        # [N]
            err_acc = err_acc + jnp.abs(w_val - T[r_i, c_i, :])
    err = err_acc / float(win * win)

    at_edge = (jnp.abs(dx) >= lim - 1e-3) | (jnp.abs(dy) >= lim - 1e-3)
    out_ref[0, :] = dx
    out_ref[1, :] = dy
    out_ref[2, :] = err
    out_ref[3, :] = at_edge.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("win", "search_r", "iters",
                                             "eps", "interpret"))
def lk_iterate_pallas(T, gx, gy, Jp, cons, *, win: int, search_r: int,
                      iters: int, eps: float, interpret: bool = False):
    """Run the fused LK pass.  All inputs point-last (see module doc)."""
    n = T.shape[-1]
    kernel = functools.partial(_kernel, win=win, search_r=search_r,
                               iters=iters, eps=eps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(T, gx, gy, Jp, cons)
