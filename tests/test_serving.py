"""Serving front door: TCP protocol + batched multi-client engine.

The reference's serving layer is examples/server.js (express static +
socket.io relay) in front of the per-frame system.js ABI; here the server
IS the engine front door (BASELINE config 5 is a serving workload), so
the test drives real SLAM sessions over the wire."""

import threading

import numpy as np
import pytest

from alvaar_tpu.config import SlamConfig
from alvaar_tpu.serving.server import SlamClient, SlamServer

CFG = SlamConfig(width=128, height=96, cell_size=32, window_size=4,
                 max_landmarks=64, ransac_iters=8, ba_iters=1,
                 pyramid_levels=2, klt_iters=3, min_init_keypoints=4,
                 use_five_point=False, use_homography_init=False)


@pytest.fixture(scope="module")
def server():
    srv = SlamServer(num_streams=3, width=128, height=96, config=CFG,
                     kf_slots=2).start()
    yield srv
    srv.stop()


def _frames(seed, n=6):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (96, 128)).astype(np.float32)
    out = []
    for i in range(n):
        f = np.roll(base, shift=i, axis=1)
        out.append(np.clip(f, 0, 255).astype(np.uint8))
    return out


class TestServing:
    def test_single_client_round_trip(self, server):
        c = SlamClient("127.0.0.1", server.port, 128, 96, want_points=True)
        try:
            statuses = []
            for f in _frames(0):
                status, pose, pts = c.process(f, timeout=600.0)
                statuses.append(status)
                assert status in (1, 2, 3)
                if status == 1:
                    assert pose.shape == (4, 4)
                    # bottom row of a rigid transform
                    np.testing.assert_allclose(pose[3], [0, 0, 0, 1],
                                               atol=1e-5)
            assert len(statuses) == 6
        finally:
            c.close()

    def test_concurrent_clients_independent(self, server):
        results = {}

        def run(cid):
            c = SlamClient("127.0.0.1", server.port, 128, 96)
            try:
                out = [c.process(f, timeout=600.0)[0]
                       for f in _frames(cid, n=5)]
                results[cid] = out
            finally:
                c.close()

        ts = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=900)
        assert set(results) == {0, 1, 2}
        for out in results.values():
            assert len(out) == 5

    def test_wrong_geometry_rejected(self, server):
        import socket
        from alvaar_tpu.serving.server import _HELLO, MAGIC, VERSION
        s = socket.create_connection(("127.0.0.1", server.port))
        s.sendall(_HELLO.pack(MAGIC, VERSION, 0, 64, 64, 45.0))
        s.settimeout(10.0)
        assert s.recv(1) == b""  # server closes on geometry mismatch
        s.close()

    def test_slot_recycled_after_disconnect(self, server):
        # 3 sequential connects beyond capacity would fail if slots leaked
        for seed in range(4):
            c = SlamClient("127.0.0.1", server.port, 128, 96)
            try:
                status, _, _ = c.process(_frames(seed, n=1)[0],
                                         timeout=600.0)
                assert status in (1, 2, 3)
            finally:
                c.close()
