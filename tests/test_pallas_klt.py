"""Pallas LK kernel parity vs the XLA path (interpret mode on CPU;
the same comparison runs on real TPU in verification drives)."""

import jax
import jax.numpy as jnp
import numpy as np

from alvaar_tpu.ops.image import bilinear_sample
from alvaar_tpu.ops.klt import _lk_level
from alvaar_tpu.ops.pallas import lk_kernel
from tests.test_image_ops import smooth_noise


def test_pallas_kernel_matches_xla(rng, monkeypatch):
    img0 = jnp.asarray(smooth_noise(rng, 120, 160))
    yy, xx = jnp.mgrid[0:120, 0:160]
    xy = jnp.stack([xx + 1.3, yy - 0.8], -1).astype(jnp.float32)
    img1 = bilinear_sample(img0, xy.reshape(-1, 2)).reshape(120, 160)
    pts = jnp.asarray(rng.uniform([20, 20], [140, 100], (32, 2)), jnp.float32)
    v = jnp.ones(32, bool)

    # force interpret mode so the kernel runs on CPU
    orig = lk_kernel.lk_level_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(lk_kernel, "lk_level_pallas", interp)

    xy_p, ok_p, err_p = _lk_level(img0, img1, pts, pts, v, win=9, iters=20,
                                  eps=0.01, use_pallas=True)
    xy_x, ok_x, err_x = _lk_level(img0, img1, pts, pts, v, win=9, iters=20,
                                  eps=0.01, use_pallas=False)
    np.testing.assert_allclose(xy_p, xy_x, atol=1e-4)
    np.testing.assert_array_equal(ok_p, ok_x)
    np.testing.assert_allclose(err_p, err_x, atol=1e-4)
