"""Fused Pallas kernel for one KLT level pass.

TPU-native core of the reference's cv::calcOpticalFlowPyrLK hot loop
(reference opencv modules/video/src/lkpyramid.cpp:183 LKTrackerInvoker):
template blend + gradients + Hessian, correlation-volume build, all
Gauss-Newton iterations, and the final L1-error window — ONE Pallas
program, everything VMEM-resident.

Why a kernel at all: the XLA formulation emits this as hundreds of small
VPU ops on [..., s, s] arrays, and XLA's layout assignment tiles the two
minor window dims onto the (8, 128) vector registers — a 17×17 slice pads
to 24×128, i.e. ~9% lane utilization, and there is no way to force a
point-minor layout from jnp.  Here the layout is explicit: every tensor is
point-LAST ([s, s, N]) so the point axis rides the 128 lanes and window
dims unroll as static loops.

Patch extraction stays outside (ops/image.extract_patches_pl — an MXU
one-hot matmul); this kernel consumes raw integer-base patches:

Inputs (point-last, N padded to the chunk size):
  tp:   [tpl, tpl, N]  raw template patch at integer base (tpl = win + 3)
  Jp:   [S, S, N]      search patch, S = 2R + win
  cons: [8, N]         ftx, fty (template fractional), d0x, d0y (start
                       displacement), frozen0 (1.0 = skip), pad×3
Outputs:
  out:  [8, N]: dx, dy, err, at_edge, trackable, i00·det-ok path outputs

Mosaic constraints honored (learned in round 1): no 1-D/float iota
(broadcasted int iota + astype), no multi-carry lax.fori_loop (static
unroll), static shapes only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(tp_ref, Jp_ref, cons_ref, out_ref, *,
            win: int, search_r: int, iters: int, eps: float, min_eig: float):
    cr = 2 * search_r + 1
    R = float(search_r)
    lim = R - 1.001

    tp = tp_ref[:]        # [tpl, tpl, N]
    Jp = Jp_ref[:]        # [S, S, N]
    ftx = cons_ref[0, :]
    fty = cons_ref[1, :]
    dx = jnp.clip(cons_ref[2, :], -lim, lim)
    dy = jnp.clip(cons_ref[3, :], -lim, lim)
    frozen = cons_ref[4, :] > 0.5

    # ---- template: bilinear frac blend + gradients + Hessian ----
    out = win + 2
    fx = ftx[None, None, :]
    fy = fty[None, None, :]
    t11 = (tp[:out, :out, :] * (1 - fy) * (1 - fx)
           + tp[:out, 1:out + 1, :] * (1 - fy) * fx
           + tp[1:out + 1, :out, :] * fy * (1 - fx)
           + tp[1:out + 1, 1:out + 1, :] * fy * fx)    # [11, 11, N]
    T = t11[1:win + 1, 1:win + 1, :]                   # [9, 9, N]
    gx = 0.5 * (t11[1:win + 1, 2:win + 2, :] - t11[1:win + 1, 0:win, :])
    gy = 0.5 * (t11[2:win + 2, 1:win + 1, :] - t11[0:win, 1:win + 1, :])

    gxx = jnp.sum(gx * gx, axis=(0, 1))                # [N]
    gxy = jnp.sum(gx * gy, axis=(0, 1))
    gyy = jnp.sum(gy * gy, axis=(0, 1))
    det = gxx * gyy - gxy * gxy
    trc = gxx + gyy
    eig_min = 0.5 * (trc - jnp.sqrt(jnp.maximum(trc * trc - 4 * det, 0.0)))
    trackable = eig_min / float(win * win) > min_eig
    det_safe = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    i00 = gyy / det_safe
    i01 = -gxy / det_safe
    i11 = gxx / det_safe
    c0x = jnp.sum(T * gx, axis=(0, 1))
    c0y = jnp.sum(T * gy, axis=(0, 1))
    frozen = frozen | ~trackable

    # ---- correlation volumes by static unfold (no gathers) ----
    n = tp.shape[-1]
    Cx = jnp.zeros((cr, cr, n), jnp.float32)
    Cy = jnp.zeros((cr, cr, n), jnp.float32)
    for wy_ in range(win):
        for wx_ in range(win):
            js = Jp[wy_:wy_ + cr, wx_:wx_ + cr, :]
            Cx = Cx + js * gx[wy_, wx_, :]
            Cy = Cy + js * gy[wy_, wx_, :]

    # ---- GN iterations (unrolled: fori_loop multi-carry breaks Mosaic) --
    iy = jax.lax.broadcasted_iota(jnp.int32, (cr, n), 0).astype(jnp.float32)
    for _ in range(iters):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy - (dy + R)[None, :]))  # [cr,N]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(iy - (dx + R)[None, :]))
        tx = jnp.sum(wy[:, None, :] * Cx, axis=0)      # [cr, N]
        ty = jnp.sum(wy[:, None, :] * Cy, axis=0)
        bx = jnp.sum(tx * wx, axis=0) - c0x            # [N]
        by = jnp.sum(ty * wx, axis=0) - c0y
        sx = -(i00 * bx + i01 * by)
        sy = -(i01 * bx + i11 * by)
        sx = jnp.where(frozen, 0.0, sx)
        sy = jnp.where(frozen, 0.0, sy)
        dx = jnp.clip(dx + sx, -lim, lim)
        dy = jnp.clip(dy + sy, -lim, lim)
        frozen = frozen | (sx * sx + sy * sy < eps * eps)

    # ---- final window L1 error via tent contraction ----
    S = Jp.shape[0]
    iS = jax.lax.broadcasted_iota(jnp.int32, (S, n), 0).astype(jnp.float32)
    err_acc = jnp.zeros((n,), jnp.float32)
    for r_i in range(win):
        wyr = jnp.maximum(0.0, 1.0 - jnp.abs(iS - (dy + R + r_i)[None, :]))
        t1 = jnp.sum(Jp * wyr[:, None, :], axis=0)     # [S, N]
        for c_i in range(win):
            wxc = jnp.maximum(0.0, 1.0 - jnp.abs(
                iS - (dx + R + c_i)[None, :]))
            w_val = jnp.sum(t1 * wxc, axis=0)          # [N]
            err_acc = err_acc + jnp.abs(w_val - T[r_i, c_i, :])
    err = err_acc / float(win * win)

    at_edge = (jnp.abs(dx) >= lim - 1e-3) | (jnp.abs(dy) >= lim - 1e-3)
    out_ref[0, :] = dx
    out_ref[1, :] = dy
    out_ref[2, :] = err
    out_ref[3, :] = at_edge.astype(jnp.float32)
    out_ref[4, :] = trackable.astype(jnp.float32)
    out_ref[5, :] = jnp.zeros((n,), jnp.float32)
    out_ref[6, :] = jnp.zeros((n,), jnp.float32)
    out_ref[7, :] = jnp.zeros((n,), jnp.float32)


def _pad_to(x, size: int, axis: int):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("win", "search_r", "iters",
                                             "eps", "min_eig", "interpret"))
def lk_level_pallas(tp, Jp, cons, *, win: int, search_r: int, iters: int,
                    eps: float, min_eig: float = 1e-4,
                    interpret: bool = False):
    """Run the fused LK level pass.

    tp [tpl, tpl, N], Jp [S, S, N], cons [8, N] (see module doc).
    Returns [8, N]: dx, dy, err, at_edge, trackable, 0, 0, 0.

    Points are processed in lane-aligned chunks via the Pallas grid; N is
    padded to a multiple of the chunk internally.
    """
    n = tp.shape[-1]
    # chunk: multiple of 128 lanes; cap so VMEM stays comfortable
    # (Jp chunk + 2 volumes + template ≈ (S² + 2cr² + tpl²)·chunk·4B)
    chunk = min(512, -(-n // 128) * 128)
    n_pad = -(-n // chunk) * chunk
    tp = _pad_to(tp, n_pad, 2)
    Jp = _pad_to(Jp, n_pad, 2)
    cons = _pad_to(cons, n_pad, 1)
    # padded points: frozen (cons[4] defaults 0 → active but harmless:
    # zero patches give det=0 → untrackable → frozen in-kernel)
    tpl = tp.shape[0]
    S = Jp.shape[0]

    kernel = functools.partial(_kernel, win=win, search_r=search_r,
                               iters=iters, eps=eps, min_eig=min_eig)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // chunk,),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec((tpl, tpl, chunk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S, chunk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, chunk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tp, Jp, cons)
    return out[:, :n]
