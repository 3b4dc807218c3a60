"""Run the SLAM engine end-to-end on a real video file.

The TPU equivalent of the reference's video demo (reference
examples/public/video.html:148-195: decode frame → findCameraPose →
overlay).  Decodes with the native libav decoder (alvaar_tpu/io/video.py),
feeds grayscale frames + caller timestamps through ``AlvaAR``, and prints
tracking statistics and the trajectory extent.

Usage:
    python examples/video_demo.py [video_path] [--frames N] [--fov DEG]

Defaults to the reference's own demo input when available.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT_VIDEO = "/root/reference/examples/public/assets/video.mp4"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("video", nargs="?", default=DEFAULT_VIDEO)
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--fov", type=float, default=45.0)
    ap.add_argument("--save", type=str, default=None,
                    help="save trajectory .npz (poses, statuses, stamps)")
    args = ap.parse_args()

    from alvaar_tpu import AlvaAR
    from alvaar_tpu.io.video import VideoReader
    from alvaar_tpu.utils.stats import Stats

    v = VideoReader(args.video)
    print(f"video: {v.width}x{v.height} @ {v.fps:.1f} fps, "
          f"{v.nframes or '?'} frames")
    alva = AlvaAR(v.width, v.height, fov=args.fov)
    stats = Stats()

    poses, statuses, stamps = [], [], []
    n_tracked = 0
    t_start = time.time()
    for i, (gray, pts) in enumerate(v):
        if i >= args.frames:
            break
        with stats.timeit("slam"):
            pose = alva.find_camera_pose(gray, timestamp=pts)
        statuses.append(alva.last_status)
        stamps.append(pts)
        if pose is not None:
            n_tracked += 1
            poses.append(pose)
    wall = time.time() - t_start
    n = len(statuses)

    statuses = np.asarray(statuses)
    print(f"processed {n} frames in {wall:.1f}s "
          f"({n / wall:.1f} fps incl. decode+compile)")
    print(f"tracking: {n_tracked}/{n} frames "
          f"(init {np.sum(statuses == 3)}, reset {np.sum(statuses == 2)})")
    print(f"slam step: {stats.stages['slam'].avg_ms:.2f} ms avg")
    if poses:
        t = np.stack([p[:3, 3] for p in poses])
        ext = t.max(0) - t.min(0)
        print(f"trajectory extent (monocular scale): "
              f"[{ext[0]:.3f}, {ext[1]:.3f}, {ext[2]:.3f}]")
        finite = np.isfinite(np.stack(poses)).all()
        print(f"poses finite: {finite}")
    if args.save and poses:
        np.savez(args.save, poses=np.stack(poses), statuses=statuses,
                 stamps=np.asarray(stamps))
        print(f"saved {args.save}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
