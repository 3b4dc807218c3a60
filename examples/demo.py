"""End-to-end demo: the TPU equivalent of the reference's video.html loop
(reference examples/public/video.html:148-195) — feed frames, read poses
and tracked points, anchor a plane, print per-stage timing.

Run: python examples/demo.py [num_frames]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

import numpy as np

from alvaar_tpu import AlvaAR
from alvaar_tpu.system import pose_to_three
from alvaar_tpu.utils.stats import Stats
from render_scene import TwoPlaneScene, trajectory


def main(n_frames: int = 60) -> None:
    rng = np.random.default_rng(0)
    scene = TwoPlaneScene(rng, width=640, height=480, fov=60.0,
                          tex_scale=120.0)
    gt = trajectory(n_frames, step=0.04)

    slam = AlvaAR(640, 480, fov=60.0, enable_loop_closure=False)
    stats = Stats()

    for i in range(n_frames):
        with stats.timeit("video"):
            frame = scene.render(gt[i])
        with stats.timeit("slam"):
            pose = slam.find_camera_pose(frame)

        if pose is not None:
            quat, pos = pose_to_three(pose)
            pts = slam.get_frame_points()
            print(f"frame {i:3d}: status {slam.last_status}  "
                  f"pos [{pos[0]:+.3f} {pos[1]:+.3f} {pos[2]:+.3f}]  "
                  f"{len(pts)} pts")
        else:
            print(f"frame {i:3d}: status {slam.last_status} "
                  f"({'initializing' if slam.last_status == 3 else 'reset'})")

    plane = slam.find_plane(250)
    if plane is not None:
        print(f"plane anchored at {plane[:3, 3].round(3)}")
    print("timing:", stats.summary())


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60)
