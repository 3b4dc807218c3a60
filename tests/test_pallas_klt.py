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


def test_pallas_on_chip_parity_production_shapes():
    """Run tools/check_pallas_parity.py on the REAL TPU at 640x480 with
    the production config — the interpret-mode test above cannot catch
    Mosaic lowering bugs.  Skipped when no TPU is reachable."""
    import json
    import os
    import subprocess
    import sys

    import pytest

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools",
                                      "check_pallas_parity.py")],
        env=env, cwd=root, capture_output=True, text=True, timeout=1800)
    line = (r.stdout.strip().splitlines() or [""])[-1]
    try:
        res = json.loads(line)
    except json.JSONDecodeError:
        pytest.fail(f"no JSON from parity check: {r.stdout}\n{r.stderr}")
    if not res.get("ok") and res.get("reason") == "no TPU backend":
        pytest.skip("no TPU backend reachable")
    assert res["ok"], res
    assert res["n_tracked_pallas"] > 50, res
