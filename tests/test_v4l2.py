"""V4L2 camera ingest: ioctl/struct-layout pins + YUYV extraction.

The ioctl request numbers encode each struct's size, so pinning them to
the known kernel values (videodev2.h) transitively verifies the layouts
the capture path packs/unpacks.  The live-device path runs only where a
/dev/video* exists."""

import os

import numpy as np
import pytest

from alvaar_tpu.io import camera as cam


class TestIoctlNumbers:
    """Known-good values from the Linux UAPI (x86-64)."""

    def test_request_codes(self):
        assert cam.VIDIOC_QUERYCAP == 0x80685600
        assert cam.VIDIOC_S_FMT == 0xC0D05605
        assert cam.VIDIOC_REQBUFS == 0xC0145608
        assert cam.VIDIOC_QUERYBUF == 0xC0585609
        assert cam.VIDIOC_QBUF == 0xC058560F
        assert cam.VIDIOC_DQBUF == 0xC0585611
        assert cam.VIDIOC_STREAMON == 0x40045612
        assert cam.VIDIOC_STREAMOFF == 0x40045613

    def test_fourcc(self):
        assert cam.PIX_FMT_YUYV == 0x56595559
        assert cam.PIX_FMT_GREY == 0x59455247


class TestYuyvExtraction:
    def test_y_plane_every_other_byte(self):
        # YUYV = [Y0 U Y1 V] — gray is bytes 0,2,4,... per row
        h, w, stride = 4, 6, 16
        rows = np.zeros((h, stride), np.uint8)
        y = np.arange(h * w, dtype=np.uint8).reshape(h, w)
        rows[:, : w * 2 : 2] = y
        rows[:, 1 : w * 2 : 2] = 128  # chroma
        gray = rows[:, : w * 2 : 2]
        np.testing.assert_array_equal(gray, y)


@pytest.mark.skipif(not os.path.exists("/dev/video0"),
                    reason="no camera device")
def test_live_device_reads_frames():
    with cam.CameraCapture("/dev/video0") as c:
        out = c.read(timeout=5.0)
        assert out is not None
        gray, ts = out
        assert gray.shape == (c.height, c.width)
        assert gray.dtype == np.float32
