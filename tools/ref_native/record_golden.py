"""Record golden trajectories from the NATIVE reference engine.

Drives the natively-compiled reference AlvaAR engine (built by
tools/ref_native/build.sh from /root/reference/src/slam/src) over (a) the
exact synthetic sequence bench.py uses and (b) the reference's own demo
video, and stores its per-frame status + pose outputs in tests/golden/.

These are the parity targets for the BASELINE accuracy goal ("ATE RMSE
within 1% of the WASM reference"): the engine driven here is the same C++
the WASM bundle wraps (reference src/slam/src/system.cpp:106-121), built
for the host instead of emscripten.

The reference RANSAC is nondeterministic (std::random_device seeding,
reference system.cpp:210), so we record ``--reps`` independent runs per
sequence; parity metrics compare against the run set, not one sample
(SURVEY §4 nondeterminism note).

Usage: python tools/ref_native/record_golden.py [--reps 3] [--out tests/golden]
"""

import argparse
import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
RUNNER = os.environ.get("REFNATIVE_BUILD", "/tmp/refnative") + "/alva_ref_runner"
VIDEO = "/root/reference/examples/public/assets/video.mp4"

sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)


def gray_to_rgba(gray_frames):
    """[N, H, W] float/uint8 gray -> [N, H, W, 4] uint8 RGBA (the ABI of
    reference System::findCameraPose, which does cvtColor RGBA->GRAY,
    system.cpp:111-112; equal channels round-trip losslessly)."""
    g = np.clip(np.asarray(gray_frames), 0, 255).astype(np.uint8)
    rgba = np.repeat(g[..., None], 4, axis=-1)
    rgba[..., 3] = 255
    return rgba


def run_reference(rgba, fx, fy, cx, cy, dist=(0, 0, 0, 0)):
    """Feed [N, H, W, 4] uint8 frames through the native reference engine;
    returns (status [N] int, poses [N, 4, 4] float T_wc)."""
    n, h, w, _ = rgba.shape
    with tempfile.TemporaryDirectory() as td:
        fpath = os.path.join(td, "frames.rgba")
        opath = os.path.join(td, "out.txt")
        rgba.tofile(fpath)
        subprocess.run(
            [RUNNER, str(w), str(h), str(fx), str(fy), str(cx), str(cy),
             str(dist[0]), str(dist[1]), str(dist[2]), str(dist[3]),
             fpath, opath],
            check=True, capture_output=True)
        rows = np.loadtxt(opath).reshape(n, 17)
    status = rows[:, 0].astype(np.int32)
    # toPoseArray is column-major T_wc (reference utils.cpp:3-27)
    poses = rows[:, 1:].reshape(n, 4, 4).transpose(0, 2, 1).astype(np.float64)
    return status, poses


def record_synthetic(out_dir, reps):
    """The bench.py sequence: seed-42 TwoPlaneScene at 640x480, fov 60,
    trajectory step 0.04 — so bench can report ate_vs_reference on the
    very frames it measures."""
    from render_scene import TwoPlaneScene, trajectory

    n_frames = 120
    rng = np.random.default_rng(42)
    scene = TwoPlaneScene(rng, width=640, height=480, fov=60.0,
                          tex_scale=120.0)
    gt = trajectory(120 + 3 * 15, step=0.04)[:n_frames]
    print(f"rendering {n_frames} synthetic frames at 640x480...")
    gray = np.stack([scene.render(gt[i]) for i in range(n_frames)])
    rgba = gray_to_rgba(gray)
    runs_status, runs_poses = [], []
    for r in range(reps):
        status, poses = run_reference(rgba, scene.fx, scene.fy,
                                      scene.cx, scene.cy)
        tracked = int((status == 1).sum())
        print(f"  synthetic rep {r}: tracked {tracked}/{n_frames}")
        runs_status.append(status)
        runs_poses.append(poses)
    np.savez_compressed(
        os.path.join(out_dir, "ref_synthetic_640.npz"),
        status=np.stack(runs_status), poses=np.stack(runs_poses),
        gt=gt, fx=scene.fx, fy=scene.fy, cx=scene.cx, cy=scene.cy,
        seed=42, n_frames=n_frames)


def record_video(out_dir, reps, n_frames=300):
    """The reference's own demo input (examples/public/assets/video.mp4)
    with the JS default intrinsics (fov 45, min-axis rule,
    reference src/system.js:84-141)."""
    from alvaar_tpu.io.video import VideoReader

    v = VideoReader(VIDEO)
    w, h = v.width, v.height
    frames = []
    for i, (gray, _ts) in enumerate(v):
        if i >= n_frames:
            break
        frames.append(gray)
    gray = np.stack(frames)
    rgba = gray_to_rgba(gray)
    fov = np.deg2rad(45.0)
    f = min((w / 2.0) / np.tan(fov / 2), (h / 2.0) / np.tan(fov / 2))
    cx, cy = w / 2.0, h / 2.0
    runs_status, runs_poses = [], []
    for r in range(reps):
        status, poses = run_reference(rgba, f, f, cx, cy)
        tracked = int((status == 1).sum())
        print(f"  video rep {r}: tracked {tracked}/{len(gray)} ({w}x{h})")
        runs_status.append(status)
        runs_poses.append(poses)
    np.savez_compressed(
        os.path.join(out_dir, "ref_video.npz"),
        status=np.stack(runs_status), poses=np.stack(runs_poses),
        fx=f, fy=f, cx=cx, cy=cy, width=w, height=h,
        n_frames=len(gray))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "tests", "golden"))
    ap.add_argument("--skip-video", action="store_true")
    args = ap.parse_args()
    if not os.path.exists(RUNNER):
        sys.exit(f"native reference runner missing: {RUNNER} "
                 "(run tools/ref_native/build.sh first)")
    os.makedirs(args.out, exist_ok=True)
    record_synthetic(args.out, args.reps)
    if not args.skip_video and os.path.exists(VIDEO):
        record_video(args.out, args.reps)
    print("golden trajectories written to", args.out)


if __name__ == "__main__":
    main()
