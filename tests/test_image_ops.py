import jax.numpy as jnp
import numpy as np

from alvaar_tpu.ops.image import (
    bilinear_sample,
    build_pyramid,
    clahe,
    gaussian_blur3,
    pyr_down,
    rgba_to_gray,
)


def smooth_noise(rng, h, w, octaves=4):
    """Band-limited random texture (trackable, no aliasing)."""
    img = np.zeros((h, w), np.float32)
    for o in range(octaves):
        s = 2 ** (o + 2)
        small = rng.normal(size=(h // s + 2, w // s + 2)).astype(np.float32)
        ys = np.linspace(0, small.shape[0] - 1.001, h)
        xs = np.linspace(0, small.shape[1] - 1.001, w)
        y0, x0 = ys.astype(int), xs.astype(int)
        fy, fx = (ys - y0)[:, None], (xs - x0)[None, :]
        v = (small[y0][:, x0] * (1 - fy) * (1 - fx)
             + small[y0][:, x0 + 1] * (1 - fy) * fx
             + small[y0 + 1][:, x0] * fy * (1 - fx)
             + small[y0 + 1][:, x0 + 1] * fy * fx)
        img += v * (2.0 ** o)
    img -= img.min()
    img *= 255.0 / img.max()
    return img


class TestImageOps:
    def test_rgba_to_gray(self):
        frame = jnp.ones((4, 4, 4)) * 100.0
        g = rgba_to_gray(frame)
        np.testing.assert_allclose(g, 100.0, atol=0.1)
        assert g.shape == (4, 4)

    def test_blur_preserves_constant(self):
        img = jnp.full((32, 32), 7.0)
        np.testing.assert_allclose(gaussian_blur3(img), 7.0, atol=1e-5)

    def test_pyr_down_shape_and_mean(self, rng):
        img = jnp.asarray(smooth_noise(rng, 64, 96))
        d = pyr_down(img)
        assert d.shape == (32, 48)
        assert abs(float(d.mean()) - float(img.mean())) < 2.0

    def test_pyramid_levels(self, rng):
        img = jnp.asarray(smooth_noise(rng, 480, 640))
        pyr = build_pyramid(img, 3)
        assert [p.shape for p in pyr] == [(480, 640), (240, 320), (120, 160)]

    def test_bilinear_exact_on_grid(self, rng):
        img = jnp.asarray(rng.normal(size=(16, 16)), jnp.float32)
        xy = jnp.asarray([[3.0, 5.0], [0.0, 0.0], [14.0, 14.0]])
        v = bilinear_sample(img, xy)
        np.testing.assert_allclose(
            v, [img[5, 3], img[0, 0], img[14, 14]], atol=1e-5
        )

    def test_bilinear_interpolates(self):
        img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
        v = bilinear_sample(img, jnp.asarray([[1.5, 0.0]]))
        np.testing.assert_allclose(v, [1.5], atol=1e-5)

    def test_clahe_range_and_contrast(self, rng):
        img = jnp.asarray(smooth_noise(rng, 64, 64) * 0.2 + 100.0)  # low contrast
        out = clahe(img, clip=3.0, tiles=8)
        assert out.shape == img.shape
        assert float(out.min()) >= -1.0 and float(out.max()) <= 256.0
        assert float(jnp.std(out)) > float(jnp.std(img))  # contrast enhanced
