"""On-chip Pallas-vs-XLA KLT parity check at production 640x480 shapes.

Runs the full forward-backward pyramidal KLT (ops/klt.fb_klt_track) on a
real rendered frame pair TWICE — fused Mosaic/Pallas kernel vs the pure
XLA correlation-volume path — and verifies the claim the production
default rides on (ops/klt.py:99-103 "bitwise-equivalent status
decisions"): identical status masks, sub-1e-3 px positions on surviving
tracks.  Intended to run on the real TPU (the interpret-mode equivalence
lives in tests/test_pallas_klt.py); invoked by tests/test_pallas_klt.py's
on-chip test and by /verify drives.

Prints one JSON line; exit 0 = parity holds.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from alvaar_tpu.config import SlamConfig
    from alvaar_tpu.ops.image import build_pyramid
    from alvaar_tpu.ops.klt import fb_klt_track, pallas_available
    from alvaar_tpu.ops.detect import detect_grid
    from render_scene import TwoPlaneScene, trajectory

    if not pallas_available():
        print(json.dumps({"ok": False, "reason": "no TPU backend"}))
        return 2

    cfg = SlamConfig()  # production 640x480
    rng = np.random.default_rng(5)
    scene = TwoPlaneScene(rng, width=cfg.width, height=cfg.height, fov=60.0)
    gt = trajectory(3, step=0.04)
    f0 = jnp.asarray(scene.render(gt[0]), jnp.float32)
    f1 = jnp.asarray(scene.render(gt[1]), jnp.float32)

    det = detect_grid(f0, jnp.zeros((0, 2)), jnp.zeros(0, bool),
                      cell=cfg.cell_size, border=cfg.image_border)
    pts, valid = det.xy, det.valid

    pyr0 = build_pyramid(f0, cfg.pyramid_levels)
    pyr1 = build_pyramid(f1, cfg.pyramid_levels)

    def run(use_pallas):
        fn = jax.jit(lambda p0, p1, pts, v: fb_klt_track(
            p0, p1, pts, pts, v, levels=cfg.pyramid_levels,
            win=cfg.klt_window, iters=cfg.klt_iters, eps=cfg.klt_eps,
            err_max=cfg.klt_err_max, fb_dist=cfg.klt_fb_dist,
            use_pallas=use_pallas))
        return jax.block_until_ready(fn(pyr0, pyr1, pts, valid))

    rp = run(True)
    rx = run(False)

    st_p = np.asarray(rp.status)
    st_x = np.asarray(rx.status)
    both = st_p & st_x
    dxy = np.abs(np.asarray(rp.xy) - np.asarray(rx.xy))[both]
    res = {
        "ok": bool((st_p == st_x).all()
                   and (dxy.max() if both.any() else 0.0) < 1e-3),
        "n_points": int(valid.sum()),
        "n_tracked_pallas": int(st_p.sum()),
        "n_tracked_xla": int(st_x.sum()),
        "status_mismatches": int((st_p != st_x).sum()),
        "max_px_delta": float(dxy.max()) if both.any() else 0.0,
    }
    print(json.dumps(res))
    return 0 if res["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
