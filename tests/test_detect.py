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
        # feed its own detections back as existing keypoints → all suppressed
        det1 = detect_grid(img, det0.xy, det0.valid, cell=40, border=20)
        assert int((det1.valid & det0.valid).sum()) == 0

    def test_flat_image_no_detections(self):
        img = jnp.full((240, 320), 128.0)
        det = detect_grid(img, jnp.zeros((0, 2)), jnp.zeros(0, bool),
                          cell=40, border=20)
        assert int(det.valid.sum()) == 0
