"""Live/online-stream SLAM client: camera or video → SlamServer over TCP.

The reference's live path is examples/public/camera.html (getUserMedia →
per-frame findCameraPose in the browser); this is its serving-era
counterpart: any machine with a camera streams frames to the TPU serving
front door (alvaar_tpu.serving.server) and gets poses back at wire
latency.  Sources:

  --source /dev/video0      V4L2 camera (alvaar_tpu.io.camera, stdlib)
  --source path/to.mp4      video file, replayed at its native fps
  --source synthetic        rendered golden scene (no hardware needed)

With --serve the script also hosts a local SlamServer so the demo is
self-contained:  python examples/live_client.py --serve --source synthetic
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def frame_source(name: str, n_synthetic: int):
    """Yield (gray f32 [H, W], wall-paced) frames + declared geometry."""
    if name.startswith("/dev/video"):
        from alvaar_tpu.io.camera import CameraCapture
        cam = CameraCapture(name)
        print(f"camera {name}: {cam.width}x{cam.height} "
              f"fourcc=0x{cam.pixelformat:08x}")

        def gen():
            for gray, _ts in cam.frames():
                yield gray
        return gen(), cam.width, cam.height
    if name == "synthetic":
        from render_scene import TwoPlaneScene, trajectory
        rng = np.random.default_rng(7)
        scene = TwoPlaneScene(rng, width=640, height=480, fov=60.0,
                              tex_scale=120.0)
        gt = trajectory(n_synthetic, step=0.04)

        def gen():
            for i in range(len(gt)):
                yield scene.render(gt[i])
        return gen(), 640, 480
    # video file, paced at native fps
    from alvaar_tpu.io.video import VideoReader
    reader = VideoReader(name)
    spf = 1.0 / (reader.fps or 30.0)

    def gen():
        nxt = time.time()
        for gray, _ts in reader:
            nxt += spf
            delay = nxt - time.time()
            if delay > 0:
                time.sleep(delay)
            yield gray
    return gen(), reader.width, reader.height


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="synthetic",
                    help="/dev/videoN | video file | 'synthetic'")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7026)
    ap.add_argument("--fov", type=float, default=60.0)
    ap.add_argument("--frames", type=int, default=120,
                    help="frame cap (synthetic length)")
    ap.add_argument("--serve", action="store_true",
                    help="also run a local SlamServer (self-contained demo)")
    args = ap.parse_args()

    frames, w, h = frame_source(args.source, args.frames)

    from alvaar_tpu.serving.server import SlamClient, SlamServer
    srv = None
    if args.serve:
        srv = SlamServer(num_streams=4, width=w, height=h, fov=args.fov,
                         host=args.host, port=args.port).start()
        args.port = srv.port
        print(f"serving on {args.host}:{srv.port}")

    client = SlamClient(args.host, args.port, w, h, fov=args.fov,
                        want_points=True)
    n = tracked = 0
    t0 = time.time()
    try:
        for gray in frames:
            if n >= args.frames:
                break
            status, pose, pts = client.process(
                np.asarray(gray, np.float32).astype(np.uint8), timeout=600.0)
            n += 1
            if status == 1:
                tracked += 1
                t = pose[:3, 3]
                print(f"[{n:4d}] pose t=({t[0]:+.3f},{t[1]:+.3f},"
                      f"{t[2]:+.3f}) {len(pts)} pts")
            else:
                print(f"[{n:4d}] status={status}"
                      f" ({'lost' if status == 2 else 'initializing'})")
    finally:
        client.close()
        if srv is not None:
            srv.stop()
    dt = time.time() - t0
    print(f"{n} frames in {dt:.1f}s ({n / max(dt, 1e-9):.1f} fps wire), "
          f"{tracked} tracked")
    return 0 if tracked else 1


if __name__ == "__main__":
    raise SystemExit(main())
