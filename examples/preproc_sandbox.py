"""Image-preprocessing sandbox: run + time the frontend kernels standalone.

The TPU counterpart of the reference's WebGL2 preprocessing sandbox
(reference examples/public/assets/webgl.js + examples/public/sandbox/
gpu.html: a scratchpad for GPU image ops, shipped unwired into the SLAM
path — README.md:153 roadmap).  Here the scratchpad drives the REAL
production kernels (ops/image.py, ops/detect.py) on any input — a video
file, a camera, or the synthetic scene — and prints per-kernel device
timings, so kernel experiments are measured in isolation before touching
the engine.

Usage:
  python examples/preproc_sandbox.py                       # synthetic 640x480
  python examples/preproc_sandbox.py --source video.mp4 --levels 4 --clahe
  python examples/preproc_sandbox.py --width 1920 --height 1080
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def get_frame(args) -> np.ndarray:
    if args.source == "synthetic":
        from render_scene import TwoPlaneScene, trajectory
        rng = np.random.default_rng(3)
        scene = TwoPlaneScene(rng, width=args.width, height=args.height,
                              fov=60.0, tex_scale=120.0)
        return scene.render(trajectory(1, step=0.04)[0])
    if args.source.startswith("/dev/video"):
        from alvaar_tpu.io.camera import CameraCapture
        with CameraCapture(args.source, args.width, args.height) as cam:
            gray, _ = cam.read(timeout=5.0)
            return gray
    from alvaar_tpu.io.video import VideoReader
    gray, _ = next(iter(VideoReader(args.source)))
    return gray


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="synthetic",
                    help="'synthetic' | video file | /dev/videoN")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--cell", type=int, default=40)
    ap.add_argument("--clahe", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the image's sitecustomize "
                         "registers the TPU platform; env alone won't)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from alvaar_tpu.ops import image as im
    from alvaar_tpu.ops.detect import detect_grid, shi_tomasi_response

    frame = np.asarray(get_frame(args), np.float32)
    h, w = frame.shape
    print(f"devices: {jax.devices()}\nframe: {w}x{h} ({args.source})")
    gray = jnp.asarray(frame)

    def bench(name, fn, *xs):
        fn = jax.jit(fn)
        out = jax.block_until_ready(fn(*xs))  # compile
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*xs))
            walls.append(time.perf_counter() - t0)
        ms = min(walls) * 1e3
        print(f"  {name:<28s} {ms:8.3f} ms")
        return out

    rgba = jnp.stack([gray, gray, gray, jnp.full_like(gray, 255.0)], -1)
    print(f"per-kernel device timings (best of {args.reps}):")
    bench("rgba_to_gray", im.rgba_to_gray, rgba)
    if args.clahe:
        gray = bench("clahe", im.clahe, gray)
    bench("gaussian_blur3", im.gaussian_blur3, gray)
    bench(f"build_pyramid(L={args.levels})",
          lambda g: im.build_pyramid(g, args.levels), gray)
    bench("sobel_gradients", im.sobel_gradients, gray)
    bench("shi_tomasi_response", shi_tomasi_response, gray)
    det = bench(
        f"detect_grid(cell={args.cell})",
        lambda g: detect_grid(g, jnp.zeros((1, 2)), jnp.zeros(1, bool),
                              cell=args.cell, border=20), gray)
    n = int(np.asarray(det.valid).sum())
    print(f"detections: {n} corners "
          f"(adapted quality -> {float(det.new_quality):.2e})")

    # fused end-to-end preprocessing (what the engine actually runs)
    def preproc(rgba):
        g = im.rgba_to_gray(rgba)
        pyr = im.build_pyramid(g, args.levels)
        d = detect_grid(g, jnp.zeros((1, 2)), jnp.zeros(1, bool),
                        cell=args.cell, border=20)
        return pyr[-1], d.xy
    bench("FUSED gray+pyramid+detect", preproc, rgba)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
