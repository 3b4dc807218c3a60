import jax.numpy as jnp
import numpy as np

from alvaar_tpu.ops.hamming import (
    best_two,
    hamming_matrix_matmul,
    hamming_matrix_popcount,
    hamming_rowwise,
    unpack_pm1,
)
from alvaar_tpu.ops.image import bilinear_sample
from alvaar_tpu.ops.orb import describe, ic_angle
from tests.test_image_ops import smooth_noise


def rotated_image(img, angle, cx, cy):
    h, w = img.shape
    yy, xx = jnp.mgrid[0:h, 0:w]
    ca, sa = np.cos(angle), np.sin(angle)
    x = ca * (xx - cx) - sa * (yy - cy) + cx
    y = sa * (xx - cx) + ca * (yy - cy) + cy
    return bilinear_sample(img, jnp.stack([x, y], -1).reshape(-1, 2).astype(jnp.float32)).reshape(h, w)


class TestHamming:
    def test_popcount_vs_matmul(self, rng):
        a = jnp.asarray(rng.integers(0, 2**32, size=(37, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, size=(53, 8), dtype=np.uint32))
        np.testing.assert_array_equal(
            hamming_matrix_popcount(a, b), hamming_matrix_matmul(a, b)
        )

    def test_known_distance(self):
        a = jnp.zeros((1, 8), jnp.uint32)
        b = jnp.full((1, 8), 0xFFFFFFFF, jnp.uint32)
        assert int(hamming_rowwise(a, b)[0]) == 256
        assert int(hamming_rowwise(a, a)[0]) == 0

    def test_unpack(self):
        d = jnp.asarray([[1, 0, 0, 0, 0, 0, 0, 0]], jnp.uint32)
        u = unpack_pm1(d)
        assert float(u[0, 0]) == 1.0 and float(u[0, 1]) == -1.0
        assert float(u.sum()) == 1.0 - 255.0

    def test_best_two(self):
        dists = jnp.asarray([[5, 2, 9, 2]], jnp.int32)
        b, s, i = best_two(dists)
        assert int(b[0]) == 2 and int(s[0]) == 2
        b, s, i = best_two(dists, valid_cols=jnp.asarray([True, False, True, True]))
        assert int(b[0]) == 2 and int(i[0]) == 3 and int(s[0]) == 5


class TestORB:
    def test_self_match(self, rng):
        img = jnp.asarray(smooth_noise(rng, 240, 320))
        pts = jnp.asarray(rng.uniform([40, 40], [280, 200], size=(32, 2)),
                          jnp.float32)
        d, _ = describe(img, pts, jnp.ones(32, bool))
        dist = hamming_matrix_popcount(d, d)
        np.testing.assert_array_equal(jnp.diagonal(dist), 0)
        # distinct points should differ substantially (random texture)
        off = np.asarray(dist)[~np.eye(32, dtype=bool)]
        assert off.min() > 10 and off.mean() > 60

    def test_match_under_translation(self, rng):
        img = jnp.asarray(smooth_noise(rng, 240, 320))
        from tests.test_klt import shifted
        img2 = shifted(img, 3.2, -2.1)
        pts = jnp.asarray(rng.uniform([40, 40], [280, 200], size=(48, 2)),
                          jnp.float32)
        pts2 = pts - jnp.asarray([3.2, -2.1])
        d1, _ = describe(img, pts, jnp.ones(48, bool))
        d2, _ = describe(img2, pts2, jnp.ones(48, bool))
        dist = np.asarray(hamming_matrix_popcount(d1, d2))
        # nearest neighbour should be the corresponding point for most
        correct = (dist.argmin(axis=1) == np.arange(48)).mean()
        assert correct > 0.9

    def test_rotation_invariance(self, rng):
        img = jnp.asarray(smooth_noise(rng, 256, 256))
        ang = 0.6
        img_r = rotated_image(img, -ang, 128.0, 128.0)  # content rotated by +ang
        pts = jnp.asarray(rng.uniform([90, 90], [166, 166], size=(24, 2)),
                          jnp.float32)
        ca, sa = np.cos(ang), np.sin(ang)
        c = 128.0
        x2 = ca * (pts[:, 0] - c) - sa * (pts[:, 1] - c) + c
        y2 = sa * (pts[:, 0] - c) + ca * (pts[:, 1] - c) + c
        pts_r = jnp.stack([x2, y2], axis=-1)
        d1, a1 = describe(img, pts, jnp.ones(24, bool))
        d2, a2 = describe(img_r, pts_r, jnp.ones(24, bool))
        paired = np.asarray(hamming_rowwise(d1, d2))
        rand = np.asarray(hamming_matrix_popcount(d1, jnp.roll(d2, 7, axis=0)))
        # steered descriptors: paired distance well below random-pair distance
        assert paired.mean() < 60
        assert paired.mean() < 0.6 * rand.mean()

    def test_angle_consistency(self, rng):
        img = jnp.asarray(smooth_noise(rng, 256, 256))
        pts = jnp.asarray([[128.0, 128.0]], jnp.float32)
        a0 = float(ic_angle(img, pts)[0])
        ang = 0.8
        img_r = rotated_image(img, -ang, 128.0, 128.0)
        a1 = float(ic_angle(img_r, pts)[0])
        diff = (a1 - a0 - ang + np.pi) % (2 * np.pi) - np.pi
        assert abs(diff) < 0.15
