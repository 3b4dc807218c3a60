"""alvaar_tpu — a TPU-native monocular visual-SLAM framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of AlvaAR
(reference: /root/reference, a C++→WASM SLAM engine of OV²SLAM/ORB-SLAM2
lineage).  Nothing here is a port: the entire SLAM state is a fixed-shape
pytree of device-resident arrays, every estimator is batched and
`vmap`-able, and the per-frame step compiles to a single XLA program.

Public surface (mirrors AlvaAR's JS API, reference src/system.js:47-236):

    from alvaar_tpu import AlvaAR
    slam = AlvaAR(width, height, fov=45.0)
    pose = slam.find_camera_pose(rgba_or_gray_frame)   # 4x4 or None
    pts  = slam.get_frame_points()
    plane = slam.find_plane()
    slam.reset()
"""

from alvaar_tpu.config import SlamConfig
from alvaar_tpu.system import AlvaAR

__version__ = "0.1.0"
__all__ = ["AlvaAR", "SlamConfig", "__version__"]
