from alvaar_tpu.io.frame_ring import FrameRing

__all__ = ["FrameRing"]
