import jax.numpy as jnp
import numpy as np

from alvaar_tpu.ops.detect import detect_grid, grid_argmax, shi_tomasi_response


def checkerboard(h, w, sq=24):
    y, x = np.mgrid[0:h, 0:w]
    return (((y // sq) + (x // sq)) % 2 * 200.0 + 20.0).astype(np.float32)


class TestDetect:
    def test_response_peaks_at_corners(self):
        img = jnp.asarray(checkerboard(96, 96))
        resp = shi_tomasi_response(img)
        # interior checkerboard crossings are strong corners
        assert float(resp[48, 48]) > 10 * float(resp[36, 36].clip(1e-3))

    def test_grid_argmax_positions(self):
        resp = jnp.zeros((80, 80)).at[10, 15].set(5.0).at[50, 70].set(3.0)
        xy, score = grid_argmax(resp, 40)
        assert xy.shape == (4, 2)
        got = {tuple(np.asarray(p)) for p, s in zip(xy, score) if float(s) > 0}
        assert (15, 10) in got and (70, 50) in got

    def test_detect_finds_corners(self):
        img = jnp.asarray(checkerboard(240, 320))
        empty = jnp.zeros((0, 2))
        det = detect_grid(img, empty, jnp.zeros(0, bool), cell=40, border=20)
        assert int(det.valid.sum()) >= 10
        # all detections near (within 3px of) a multiple-of-24 crossing
        xy = np.asarray(det.xy[np.asarray(det.valid)])
        res = np.abs((xy + 0.5) % 24 - 12)  # distance from crossing is ~12 off-phase
        d = np.minimum(np.abs(xy % 24), 24 - np.abs(xy % 24))
        assert np.median(d.max(axis=1)) < 3.0

    def test_occupancy_suppression(self):
        img = jnp.asarray(checkerboard(240, 320))
        det0 = detect_grid(img, jnp.zeros((0, 2)), jnp.zeros(0, bool),
                           cell=40, border=20)
        # feed its own detections back as existing keypoints → their cells
        # are skipped entirely: nothing new appears near an old detection
        det1 = detect_grid(img, det0.xy, det0.valid, cell=40, border=20)
        old = np.asarray(det0.xy[np.asarray(det0.valid)])
        new = np.asarray(det1.xy[np.asarray(det1.valid)])
        if len(old) and len(new):
            d = np.linalg.norm(new[:, None] - old[None, :], axis=-1).min(1)
            assert d.min() >= 10.0  # cell/4

    def test_flat_image_no_detections(self):
        img = jnp.full((240, 320), 128.0)
        det = detect_grid(img, jnp.zeros((0, 2)), jnp.zeros(0, bool),
                          cell=40, border=20)
        assert int(det.valid.sum()) == 0


class TestAdaptiveDetect:
    def test_second_candidates_fill_cells(self):
        # two strong corners in cell 0, cell 1 flat: the flat cell's
        # deficit is filled from cell 0's second-candidate list
        # (reference feature_extractor.cpp:90-105,118-133) — total stays
        # capped at the cell count
        img = np.full((40, 80), 20.0, np.float32)
        for cy, cx in [(10, 10), (30, 30)]:
            img[cy - 3:cy + 4, cx] = 220.0
            img[cy, cx - 3:cx + 4] = 220.0
        det = detect_grid(jnp.asarray(img), jnp.zeros((0, 2)),
                          jnp.zeros(0, bool), cell=40, border=2)
        xy = np.asarray(det.xy[np.asarray(det.valid)])
        assert len(xy) == 2
        d = np.linalg.norm(xy[:, None] - np.asarray([[10., 10.], [30., 30.]]),
                           axis=-1).min(axis=0)
        assert d.max() < 2.0

    def test_threshold_halves_when_starved(self):
        img = jnp.full((240, 320), 128.0)  # flat: nothing passes
        det = detect_grid(img, jnp.zeros((0, 2)), jnp.zeros(0, bool),
                          cell=40, border=20, quality=0.001)
        assert abs(float(det.new_quality) - 0.0005) < 1e-9

    def test_threshold_raises_when_saturated(self):
        img = jnp.asarray(checkerboard(240, 320, sq=12))  # corners everywhere
        det = detect_grid(img, jnp.zeros((0, 2)), jnp.zeros(0, bool),
                          cell=40, border=20, quality=0.001)
        assert abs(float(det.new_quality) - 0.0015) < 1e-9

    def test_adaptive_recovers_low_contrast(self):
        # a washed-out checkerboard (contrast 3 gray levels): the initial
        # 0.001 gate rejects everything, but halving converges to a
        # threshold that detects — the reference's low-light survival
        # (feature_extractor.cpp:136-145)
        img = jnp.asarray(checkerboard(240, 320) * 0.015 + 100.0)
        q = jnp.asarray(0.001, jnp.float32)
        for _ in range(12):
            det = detect_grid(img, jnp.zeros((0, 2)), jnp.zeros(0, bool),
                              cell=40, border=20, quality=q)
            q = det.new_quality
        assert int(det.valid.sum()) >= 8
