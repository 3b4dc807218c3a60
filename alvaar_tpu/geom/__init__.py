from alvaar_tpu.geom.lie import (
    SE3,
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    matrix_to_quat,
    so3_exp,
    so3_log,
    so3_hat,
)
from alvaar_tpu.geom.camera import Camera
from alvaar_tpu.geom.triangulation import triangulate_midpoint

__all__ = [
    "SE3",
    "Camera",
    "quat_conj",
    "quat_mul",
    "quat_normalize",
    "quat_rotate",
    "quat_to_matrix",
    "matrix_to_quat",
    "so3_exp",
    "so3_log",
    "so3_hat",
    "triangulate_midpoint",
]
