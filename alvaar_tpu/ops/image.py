"""Image preprocessing ops: grayscale, separable blur, pyramid, CLAHE.

TPU-native equivalents of the reference's per-frame OpenCV preprocessing
(reference src/slam/src/system.cpp:111-112 cvtColor RGBA→GRAY;
visual_frontend.cpp:687-697 cv::buildOpticalFlowPyramid;
visual_frontend.cpp:678-685 optional CLAHE).

All ops are pure jnp/lax and fuse under jit; images are f32 [H, W] in the
0..255 range (keeping the reference's intensity scale so error gates like
``klt_err_max=30`` carry over unchanged).  Batched variants accept leading
batch dims via vmap at the call site.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rgba_to_gray(frame):
    """[H, W, 4] (or [H, W, 3]) uint8/float → [H, W] f32 luma in 0..255.

    BT.601 weights, matching cv::cvtColor COLOR_RGBA2GRAY
    (reference system.cpp:112)."""
    f = frame.astype(jnp.float32)
    return f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114


def _sep_conv(img, kernel_1d):
    """Separable 2D convolution with edge padding, [H, W] f32 (shift-adds)."""
    k = [float(v) for v in kernel_1d]
    r = len(k) // 2
    h, w = img.shape
    xp = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    x = sum(kk * xp[i:i + h, :] for i, kk in enumerate(k))
    xp = jnp.pad(x, ((0, 0), (r, r)), mode="edge")
    return sum(kk * xp[:, i:i + w] for i, kk in enumerate(k))


def gaussian_blur3(img):
    """3x3 Gaussian (sigma≈0.8), the detector's pre-blur
    (reference feature_extractor.cpp:59 GaussianBlur 3x3)."""
    return _sep_conv(img, [0.25, 0.5, 0.25])


def pyr_down(img):
    """One pyramid level down: 5-tap binomial blur + 2x decimation
    (cv::pyrDown kernel [1,4,6,4,1]/16)."""
    blurred = _sep_conv(img, np.array([1, 4, 6, 4, 1], np.float32) / 16.0)
    return blurred[::2, ::2]


def build_pyramid(img, levels: int) -> Tuple[jax.Array, ...]:
    """Image pyramid, level 0 = full res (reference
    cv::buildOpticalFlowPyramid at visual_frontend.cpp:696)."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return tuple(pyr)


def sobel_gradients(img):
    """Scharr-free 3x3 Sobel dx, dy (matches cv::cornerMinEigenVal's
    default sobel aperture, reference corner.cpp:550)."""
    smooth = jnp.asarray([1.0, 2.0, 1.0])
    diff = jnp.asarray([-1.0, 0.0, 1.0])

    def conv2(x, kr, kc):
        x = jnp.pad(x, 1, mode="edge")
        x = jax.lax.conv_general_dilated(
            x[None, None], (kr[:, None] * kc[None, :])[None, None], (1, 1),
            "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
        return x

    dx = conv2(img, smooth, diff)
    dy = conv2(img, diff, smooth)
    return dx, dy


def clahe(img, clip: float = 3.0, tiles: int = 8):
    """Contrast-limited adaptive histogram equalization, [H, W] f32 0..255.

    TPU-friendly reformulation of cv::CLAHE (reference clahe.cpp:315):
    per-tile 256-bin histogram as a one-hot matmul, clip+redistribute,
    per-tile CDF LUT, then bilinear interpolation between the 4 nearest
    tile LUTs.  H, W must be divisible by ``tiles`` (true for 640x480
    with the default 8).
    """
    h, w = img.shape
    th, tw = h // tiles, w // tiles
    x = img.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3)
    x = x.reshape(tiles * tiles, th * tw)  # [T, P]

    bins = jnp.arange(256, dtype=jnp.float32)
    q = jnp.clip(jnp.round(x), 0, 255)
    onehot = (q[..., None] == bins).astype(jnp.float32)  # [T, P, 256]
    hist = onehot.sum(axis=1)  # [T, 256]

    clip_limit = jnp.maximum(clip * (th * tw) / 256.0, 1.0)
    excess = jnp.maximum(hist - clip_limit, 0.0).sum(axis=-1, keepdims=True)
    hist = jnp.minimum(hist, clip_limit) + excess / 256.0

    cdf = jnp.cumsum(hist, axis=-1)
    cdf = (cdf - cdf[..., :1]) / (cdf[..., -1:] - cdf[..., :1]).clip(1.0) * 255.0
    lut = cdf.reshape(tiles, tiles, 256)

    # bilinear interpolation of LUT values at every pixel
    yy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / th - 0.5
    xx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy), 0, tiles - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xx), 0, tiles - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, tiles - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xx - x0, 0.0, 1.0)[None, :]

    qimg = jnp.clip(jnp.round(img), 0, 255).astype(jnp.int32)

    def sample(ty, tx):
        return lut[ty[:, None], tx[None, :], qimg]

    v00 = sample(y0, x0)
    v01 = sample(y0, x1)
    v10 = sample(y1, x0)
    v11 = sample(y1, x1)
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)


def extract_patches(img, base_xy, size: int, lo: int):
    """Extract [N, size, size] patches at integer bases:
    patch[n, p, q] = img[base_y + p - lo, base_x + q - lo].

    MXU formulation: rows are selected by a one-hot [N·size, H] matmul
    against the image, columns by a batched one-hot contraction — patch
    extraction becomes two matmuls and zero gathers/dynamic-slices.  A
    one-hot row has exactly one nonzero, so the result is EXACT in any
    matmul precision.  This beats both HLO gather (~1.4 ms flat inside
    loop bodies) and vmapped dynamic_slice (~0.5-0.8 ms, serializes per
    slice) and — critically — keeps scaling sublinearly under stream-batch
    vmap, where per-slice lowering is linear.

    base_xy int32 [N, 2] must be pre-clipped so patches stay in bounds."""
    h, w = img.shape
    n = base_xy.shape[0]
    s = jnp.arange(size, dtype=jnp.int32)
    ys = (base_xy[:, 1] - lo)[:, None] + s[None, :]        # [N, size]
    xs = (base_xy[:, 0] - lo)[:, None] + s[None, :]
    oy = (ys[:, :, None] == jnp.arange(h, dtype=jnp.int32)).astype(img.dtype)
    ox = (xs[:, :, None] == jnp.arange(w, dtype=jnp.int32)).astype(img.dtype)
    # HIGHEST precision: TPU f32 dots default to one bf16 pass, which
    # would corrupt the selected pixels by up to 0.5 intensity — KLT
    # subpixel accuracy depends on exact window values.
    rows = jax.lax.dot(oy.reshape(n * size, h), img,
                       precision=jax.lax.Precision.HIGHEST)  # [N·size, W]
    rows = rows.reshape(n, size, w)
    return jnp.einsum("npw,nqw->npq", rows, ox,
                      precision=jax.lax.Precision.HIGHEST)


def extract_patches_pl(img, base_xy, size: int, lo: int):
    """Point-LAST patch extraction: returns [size, size, N] with
    patch[p, q, n] = img[base_y_n + p - lo, base_x_n + q - lo].

    Same MXU one-hot formulation as ``extract_patches``, but the column
    contraction emits points on the minor (lane) axis so downstream
    elementwise work tiles as [size, size→8·k sublanes, N→128·k lanes]
    instead of padding every tiny [size, size] tile to (8, 128) — the
    point-major layout wastes >90% of the VPU for size ≲ 24."""
    h, w = img.shape
    n = base_xy.shape[0]
    s = jnp.arange(size, dtype=jnp.int32)
    ys = (base_xy[:, 1] - lo)[:, None] + s[None, :]        # [N, size]
    xs = (base_xy[:, 0] - lo)[:, None] + s[None, :]
    oy = (ys[:, :, None] == jnp.arange(h, dtype=jnp.int32)).astype(img.dtype)
    ox = (xs[:, :, None] == jnp.arange(w, dtype=jnp.int32)).astype(img.dtype)
    rows = jax.lax.dot(oy.reshape(n * size, h), img,
                       precision=jax.lax.Precision.HIGHEST)
    rows = rows.reshape(n, size, w)
    return jnp.einsum("npw,nqw->pqn", rows, ox,
                      precision=jax.lax.Precision.HIGHEST)


def extract_patches_slice(img, base_xy, size: int, lo: int):
    """Reference implementation via vmapped dynamic_slice (kept for tests
    and as a fallback comparison point)."""
    def one(bx, by):
        return jax.lax.dynamic_slice(img, (by - lo, bx - lo), (size, size))

    return jax.vmap(one)(base_xy[:, 0], base_xy[:, 1])


def bilinear_sample(img, xy):
    """Bilinear interpolation of [H, W] f32 at xy [..., 2] (x, y) coords.

    Out-of-bounds coordinates clamp to the border (matching OpenCV's
    BORDER_REPLICATE sampling inside calcOpticalFlowPyrLK windows)."""
    h, w = img.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    flat = img.reshape(-1)
    idx = y0 * w + x0
    v00 = flat[idx]
    v01 = flat[idx + 1]
    v10 = flat[idx + w]
    v11 = flat[idx + w + 1]
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)
