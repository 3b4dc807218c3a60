"""Export/import glue for the Ceres BA oracle (ba_oracle.cpp).

Serializes a ``BAProblem`` (the exact inputs ``run_local_ba`` solves —
worldmap/keyframe.py:build_ba_problem) to the oracle's text format, runs
the natively-built oracle binary, and reads back the Ceres-optimized
poses/inverse depths, so tests can check the TPU LM/Schur solver and its
constant-pose gauge policy against the reference's actual optimizer
(reference src/slam/src/optimizer.cpp:20-262 uses Ceres with the same
anchored-inverse-depth parameterization)."""

from __future__ import annotations

import os
import subprocess
from pathlib import Path

import numpy as np

ORACLE_BIN = Path(os.environ.get("REFNATIVE_BUILD", "/tmp/refnative")) / "ba_oracle"


def oracle_available() -> bool:
    return ORACLE_BIN.exists()


def export_problem(prob, cam, huber_delta: float, max_iters: int,
                   path: str) -> None:
    """Write a BAProblem in the oracle's text format (see ba_oracle.cpp)."""
    poses_q = np.asarray(prob.poses.q, np.float64)   # [W, 4] (w,x,y,z)
    poses_t = np.asarray(prob.poses.t, np.float64)   # [W, 3]
    kf_valid = np.asarray(prob.kf_valid)
    constant = np.asarray(prob.constant)
    anchor_kf = np.asarray(prob.anchor_kf)
    mxy = np.asarray(prob.anchor_mxy, np.float64)
    invd = np.asarray(prob.invdepth, np.float64)
    obs_lm = np.asarray(prob.obs_lm)
    obs_px = np.asarray(prob.obs_px, np.float64)
    obs_valid = np.asarray(prob.obs_valid)
    lm_valid = np.asarray(prob.lm_valid)

    W = poses_q.shape[0]
    lines = [f"{float(cam.fx):.9e} {float(cam.fy):.9e} "
             f"{float(cam.cx):.9e} {float(cam.cy):.9e} "
             f"{huber_delta:.9e} {max_iters}", str(W)]
    for w in range(W):
        q, t = poses_q[w], poses_t[w]
        lines.append(
            f"{int(kf_valid[w])} {int(constant[w])} "
            f"{q[0]:.9e} {q[1]:.9e} {q[2]:.9e} {q[3]:.9e} "
            f"{t[0]:.9e} {t[1]:.9e} {t[2]:.9e}")

    rows = []
    for w in range(W):
        if not kf_valid[w]:
            continue
        for k in range(obs_lm.shape[1]):
            if not obs_valid[w, k]:
                continue
            lm = int(obs_lm[w, k])
            if not lm_valid[lm]:
                continue
            a = int(anchor_kf[lm])
            rows.append(
                f"{w} {a} {lm} {mxy[lm, 0]:.9e} {mxy[lm, 1]:.9e} "
                f"{invd[lm]:.9e} {obs_px[w, k, 0]:.9e} {obs_px[w, k, 1]:.9e}")
    lines.append(str(len(rows)))
    lines.extend(rows)
    Path(path).write_text("\n".join(lines) + "\n")


def run_oracle(path: str):
    """Run the oracle; returns (cost, poses_q [W,4] wxyz, poses_t [W,3],
    {lm_id: invdepth})."""
    out = subprocess.run([str(ORACLE_BIN), path], capture_output=True,
                         text=True, check=True, timeout=600)
    tok = out.stdout.split()
    cost = float(tok[0])
    W = (len(Path(path).read_text().splitlines()) and
         int(Path(path).read_text().splitlines()[1]))
    i = 2
    q, t = [], []
    for w in range(W):
        vals = [float(x) for x in tok[i:i + 7]]
        q.append(vals[:4])
        t.append(vals[4:])
        i += 7
    ilam = {}
    while i + 1 < len(tok) + 1 and i < len(tok):
        ilam[int(tok[i])] = float(tok[i + 1])
        i += 2
    return cost, np.array(q), np.array(t), ilam
