"""Per-stage profiling of the SLAM step (tracing/observability, SURVEY §5).

The reference surfaces total/video/slam timings through its stats overlay
(reference examples/public/assets/stats.js:3-39); XLA fuses the per-frame
step into one program, so in-program stage timers do not exist.  This
module instead compiles each pipeline phase as its OWN program and
host-times steady-state executions — the honest way to attribute time on
an accelerator, and the same method used to drive the serving-design
decisions (docs/ROADMAP.md).
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp


def _bench(fn, *args, reps: int = 5) -> float:
    """Median-free min-of-reps wall time in ms, dispatch-pipelined."""
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def profile_step(state, gray, cam, cfg, *, reps: int = 5) -> Dict[str, float]:
    """Stage-by-stage timing of one SLAM frame on the current backend.

    Returns {stage: milliseconds}.  Stages mirror the phase split in
    frontend/step.py; keyframe stages are timed on a state that has
    keyframes to work with (the given one).
    """
    from alvaar_tpu.frontend.step import (finalize_phase, keyframe_phase,
                                          preprocess, track_phase)

    gray = jnp.asarray(gray, jnp.float32)
    out: Dict[str, float] = {}

    pp = jax.jit(lambda f: preprocess(f, cfg))
    out["preprocess"] = _bench(pp, gray, reps=reps)

    tp = jax.jit(lambda s, f: track_phase(s, f, cam, cfg))
    st2, _ = tp(state, gray)
    out["track"] = _bench(tp, state, gray, reps=reps)

    kf = jax.jit(lambda s: keyframe_phase(s, cam, cfg))
    out["keyframe_pipeline"] = _bench(kf, st2, reps=reps)

    fin = jax.jit(lambda s: finalize_phase(s, jnp.asarray(False), cfg))
    out["finalize"] = _bench(fin, st2, reps=reps)

    full = jax.jit(
        lambda s, f: __import__("alvaar_tpu.frontend.step",
                                fromlist=["slam_step"]).slam_step(
            s, f, cam, cfg))
    out["full_step"] = _bench(full, state, gray, reps=reps)
    return out
