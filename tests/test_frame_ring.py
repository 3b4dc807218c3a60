"""Native frame-ring tests (build + ABI + conversion correctness)."""

import numpy as np
import pytest

from alvaar_tpu.io import FrameRing


@pytest.fixture(scope="module")
def ring():
    return FrameRing(64, 48, capacity=3)


class TestFrameRing:
    def test_rgba_to_gray_matches_numpy(self, ring, rng):
        rgba = rng.integers(0, 256, size=(48, 64, 4), dtype=np.uint8)
        assert ring.push_rgba(rgba, 1.5) == 0
        frame, ts = ring.front()
        expect = (rgba[..., 0] * 0.299 + rgba[..., 1] * 0.587
                  + rgba[..., 2] * 0.114).astype(np.float32)
        np.testing.assert_allclose(frame, expect, atol=1e-3)
        assert ts == 1.5
        assert ring.release()

    def test_gray_passthrough(self, ring, rng):
        g = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
        ring.push_gray(g, 2.0)
        frame, _ = ring.front()
        np.testing.assert_array_equal(frame, g.astype(np.float32))
        ring.release()

    def test_fifo_order_and_capacity(self, ring):
        for i in range(3):
            assert ring.push_gray(np.full((48, 64), i, np.uint8)) >= 0
        assert len(ring) == 3
        # full → reject
        assert ring.push_gray(np.zeros((48, 64), np.uint8)) == -1
        for i in range(3):
            frame, _ = ring.front()
            assert frame[0, 0] == float(i)
            ring.release()
        assert ring.front() is None

    def test_wraparound(self, ring):
        for i in range(7):
            assert ring.push_gray(np.full((48, 64), i % 250, np.uint8)) >= 0
            frame, _ = ring.front()
            assert frame[0, 0] == float(i % 250)
            ring.release()
