import jax.numpy as jnp
import numpy as np

from alvaar_tpu.ops.image import bilinear_sample, build_pyramid
from alvaar_tpu.ops.klt import fb_klt_track, klt_pyramidal
from tests.test_image_ops import smooth_noise


def shifted(img, dx, dy):
    """Translate image by (dx, dy) with bilinear sampling."""
    h, w = img.shape
    yy, xx = jnp.mgrid[0:h, 0:w]
    xy = jnp.stack([xx + dx, yy + dy], axis=-1).astype(jnp.float32)
    return bilinear_sample(jnp.asarray(img), xy.reshape(-1, 2)).reshape(h, w)


def make_pair(rng, dx, dy, h=240, w=320):
    img0 = jnp.asarray(smooth_noise(rng, h, w))
    img1 = shifted(img0, dx, dy)  # img1(p) = img0(p + d) → flow img0→img1 is -d
    return img0, img1


class TestKLT:
    def test_subpixel_translation(self, rng):
        img0, img1 = make_pair(rng, 2.3, -1.7)
        pyr0, pyr1 = build_pyramid(img0, 3), build_pyramid(img1, 3)
        pts = jnp.asarray(rng.uniform([30, 30], [290, 210], size=(64, 2)),
                          jnp.float32)
        res = klt_pyramidal(pyr0, pyr1, pts, pts, jnp.ones(64, bool), levels=3)
        assert int(res.status.sum()) > 50
        flow = np.asarray(res.xy - pts)[np.asarray(res.status)]
        np.testing.assert_allclose(flow.mean(axis=0), [-2.3, 1.7], atol=0.1)
        assert np.abs(flow - [-2.3, 1.7]).max() < 0.5

    def test_large_motion_needs_pyramid(self, rng):
        img0, img1 = make_pair(rng, 13.0, 6.0)
        pyr0, pyr1 = build_pyramid(img0, 3), build_pyramid(img1, 3)
        pts = jnp.asarray(rng.uniform([40, 40], [280, 200], size=(48, 2)),
                          jnp.float32)
        res3 = klt_pyramidal(pyr0, pyr1, pts, pts, jnp.ones(48, bool), levels=3)
        flow = np.asarray(res3.xy - pts)[np.asarray(res3.status)]
        assert int(res3.status.sum()) > 30
        np.testing.assert_allclose(np.median(flow, axis=0), [-13.0, -6.0], atol=0.3)

    def test_prior_single_level(self, rng):
        """With a good motion prior, 1 level suffices (the reference's
        3D-point pass, visual_frontend.cpp:162-171)."""
        img0, img1 = make_pair(rng, 13.0, 6.0)
        pyr0, pyr1 = build_pyramid(img0, 3), build_pyramid(img1, 3)
        pts = jnp.asarray(rng.uniform([40, 40], [280, 200], size=(48, 2)),
                          jnp.float32)
        prior = pts + jnp.asarray([-12.5, -6.4])
        res = klt_pyramidal(pyr0, pyr1, pts, prior, jnp.ones(48, bool), levels=1)
        flow = np.asarray(res.xy - pts)[np.asarray(res.status)]
        assert int(res.status.sum()) > 30
        np.testing.assert_allclose(np.median(flow, axis=0), [-13.0, -6.0], atol=0.3)

    def test_fb_gate_rejects_occluded(self, rng):
        """Covering a region makes forward-backward fail there."""
        img0, img1 = make_pair(rng, 1.0, 0.5)
        img1 = img1.at[100:140, 100:180].set(128.0)  # occlude a block
        pyr0, pyr1 = build_pyramid(img0, 3), build_pyramid(img1, 3)
        pts = jnp.asarray([[120.0, 110.0], [140.0, 120.0], [50.0, 50.0],
                           [250.0, 180.0]], jnp.float32)
        res = fb_klt_track(pyr0, pyr1, pts, pts, jnp.ones(4, bool), levels=3)
        st = np.asarray(res.status)
        assert not st[0] and not st[1]  # occluded
        assert st[2] and st[3]          # clean

    def test_invalid_slots_stay_invalid(self, rng):
        img0, img1 = make_pair(rng, 1.0, 0.0)
        pyr0, pyr1 = build_pyramid(img0, 3), build_pyramid(img1, 3)
        pts = jnp.asarray(rng.uniform([40, 40], [280, 200], size=(8, 2)),
                          jnp.float32)
        valid = jnp.asarray([True, False] * 4)
        res = fb_klt_track(pyr0, pyr1, pts, pts, valid, levels=3)
        assert not bool(jnp.any(res.status & ~valid))

    def test_flat_region_untrackable(self, rng):
        img0 = jnp.full((240, 320), 100.0)
        pyr = build_pyramid(img0, 3)
        pts = jnp.asarray([[100.0, 100.0]], jnp.float32)
        res = fb_klt_track(pyr, pyr, pts, pts, jnp.ones(1, bool), levels=3)
        assert not bool(res.status[0])
