"""Network front door for the batched SLAM engine.

The reference ships a trivial serving layer (reference
examples/server.js:27-45: express static + socket.io relay) whose real
"protocol" is the per-frame JS↔WASM heap handshake (src/system.js:173-199:
one frame in, one status + pose out).  This module is the TPU-serving
counterpart for BASELINE config 5: many independent camera streams
multiplexed onto ONE batched device program
(parallel/multistream.multistream_step_local), each TCP client owning one
stream slot.

Design:
  * stdlib only (socket/threading/struct) — no framework dependency;
  * one engine thread runs the jitted batched step; client reader threads
    only move bytes.  Clients at different frame rates share a batch via
    the step's ``active`` mask — no lockstep barrier;
  * a slot's state is reset when its client disconnects, so slots recycle.

Wire protocol (little-endian), mirroring the reference ABI semantics:
  client hello:  magic b"ALVA", u16 version=1, u16 flags, u32 w, u32 h,
                 f32 fov_deg           (flags bit0: send tracked points)
  per frame  →:  u32 frame_id, u32 nbytes, gray u8[h*w] (nbytes = h*w)
  per frame  ←:  u32 frame_id, i32 status (1 tracking / 2 lost / 3 init —
                 system.cpp:164-174), f32[16] column-major T_wc
                 (Utils::toPoseArray layout), u32 n, f32[n*2] points
                 (status==1 and points requested, else n=0).
"""

from __future__ import annotations

import socket
import struct
import threading
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

MAGIC = b"ALVA"
VERSION = 1
FLAG_POINTS = 1

_HELLO = struct.Struct("<4sHHIIf")
_FRAME_HDR = struct.Struct("<II")
_REPLY_HDR = struct.Struct("<Ii16fI")


def _recv_exact(sock: socket.socket, n: int) -> Optional[bytes]:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return bytes(buf)


@dataclass
class _Slot:
    lock: threading.Lock
    sock: Optional[socket.socket] = None
    frame: Optional[np.ndarray] = None   # pending gray frame
    frame_id: int = 0
    want_points: bool = False
    needs_reset: bool = False


class SlamServer:
    """Serve ``num_streams`` concurrent SLAM sessions over TCP.

    Usage::

        srv = SlamServer(num_streams=8, width=640, height=480, fov=60.0)
        srv.start()          # returns immediately; srv.port is bound
        ...
        srv.stop()
    """

    def __init__(self, num_streams: int = 8, width: int = 640,
                 height: int = 480, fov: float = 60.0,
                 host: str = "127.0.0.1", port: int = 0,
                 config=None, kf_slots: int = 3):
        from alvaar_tpu.config import SlamConfig

        self.cfg = config or SlamConfig(width=width, height=height)
        self.num_streams = num_streams
        self.fov = fov
        self.host, self.port = host, port
        self.kf_slots = kf_slots
        self._slots = [_Slot(lock=threading.Lock())
                       for _ in range(num_streams)]
        self._stop = threading.Event()
        self._wake = threading.Event()
        self._threads: list[threading.Thread] = []
        self._lsock: Optional[socket.socket] = None
        self.frames_served = 0

    # ---- engine ---------------------------------------------------------

    def _build(self):
        import jax
        import jax.numpy as jnp
        from functools import partial

        from alvaar_tpu.geom.camera import Camera
        from alvaar_tpu.parallel.multistream import (
            init_multistream_state, multistream_step_local)

        cfg = self.cfg
        self._cam = Camera.from_fov(cfg.width, cfg.height, self.fov)
        self._states = init_multistream_state(cfg, self.num_streams)
        b = self.num_streams

        @partial(jax.jit, donate_argnums=(0,))
        def step(states, frames, active):
            return multistream_step_local(
                states, frames, jnp.ones((b,), jnp.float32), self._cam,
                cfg, self.kf_slots, active=active)

        self._step = step
        self._jnp = jnp

    def _engine_loop(self):
        self._build()
        jnp = self._jnp
        cfg = self.cfg
        h, w = cfg.height, cfg.width
        zero = np.zeros((h, w), np.float32)
        from alvaar_tpu.worldmap.state import init_map_state
        import jax

        while not self._stop.is_set():
            batch, active, meta = [], [], []
            for i, sl in enumerate(self._slots):
                with sl.lock:
                    if sl.needs_reset:
                        # recycle the slot: overwrite its state row
                        fresh = init_map_state(cfg)
                        self._states = jax.tree.map(
                            lambda full, f: full.at[i].set(f),
                            self._states, fresh)
                        sl.needs_reset = False
                    if sl.frame is not None:
                        batch.append(sl.frame)
                        active.append(True)
                        meta.append((i, sl.frame_id, sl.sock,
                                     sl.want_points))
                        sl.frame = None
                    else:
                        batch.append(zero)
                        active.append(False)
            if not any(active):
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            frames = jnp.asarray(np.stack(batch), jnp.float32)
            self._states, outs = self._step(
                self._states, frames, jnp.asarray(active))
            status = np.asarray(outs.status)
            poses = np.asarray(outs.pose_wc)
            pts = np.asarray(outs.points)
            pts_ok = np.asarray(outs.points_valid)
            for i, fid, sock, want_pts in meta:
                if sock is None:
                    continue
                pose = poses[i].T.reshape(-1)  # column-major 16 floats
                if want_pts and status[i] == 1:
                    p = pts[i][pts_ok[i]].astype(np.float32)
                else:
                    p = np.zeros((0, 2), np.float32)
                msg = _REPLY_HDR.pack(fid, int(status[i]), *pose.tolist(),
                                      len(p)) + p.tobytes()
                try:
                    sock.sendall(msg)
                except OSError:
                    pass
                self.frames_served += 1

    # ---- network --------------------------------------------------------

    def _client_loop(self, sock: socket.socket, slot_idx: int):
        sl = self._slots[slot_idx]
        cfg = self.cfg
        try:
            hello = _recv_exact(sock, _HELLO.size)
            if hello is None:
                return
            magic, ver, flags, w, h, _fov = _HELLO.unpack(hello)
            if magic != MAGIC or ver != VERSION or (w, h) != (
                    cfg.width, cfg.height):
                sock.close()
                return
            with sl.lock:
                sl.want_points = bool(flags & FLAG_POINTS)
            nbytes = cfg.width * cfg.height
            while not self._stop.is_set():
                hdr = _recv_exact(sock, _FRAME_HDR.size)
                if hdr is None:
                    break
                fid, n = _FRAME_HDR.unpack(hdr)
                if n != nbytes:
                    break
                payload = _recv_exact(sock, n)
                if payload is None:
                    break
                gray = np.frombuffer(payload, np.uint8).reshape(
                    cfg.height, cfg.width).astype(np.float32)
                # latest-frame-wins: a slow engine drops stale frames
                # rather than building a queue (the reference's 30 fps
                # demo loop likewise skips while busy, utils.js:4-29)
                with sl.lock:
                    sl.frame = gray
                    sl.frame_id = fid
                self._wake.set()
        finally:
            with sl.lock:
                sl.sock = None
                sl.frame = None
                sl.needs_reset = True
            try:
                sock.close()
            except OSError:
                pass

    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                sock, _ = self._lsock.accept()
            except OSError:
                return
            sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            idx = None
            for i, sl in enumerate(self._slots):
                with sl.lock:
                    if sl.sock is None:
                        sl.sock = sock
                        idx = i
                        break
            if idx is None:
                sock.close()     # at capacity
                continue
            t = threading.Thread(target=self._client_loop,
                                 args=(sock, idx), daemon=True)
            t.start()
            self._threads.append(t)

    def start(self):
        self._lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._lsock.bind((self.host, self.port))
        self.port = self._lsock.getsockname()[1]
        self._lsock.listen(self.num_streams)
        for target in (self._engine_loop, self._accept_loop):
            t = threading.Thread(target=target, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def stop(self):
        self._stop.set()
        self._wake.set()
        if self._lsock is not None:
            try:
                self._lsock.close()
            except OSError:
                pass


class SlamClient:
    """Minimal client for SlamServer (one stream)."""

    def __init__(self, host: str, port: int, width: int, height: int,
                 fov: float = 60.0, want_points: bool = False):
        self.sock = socket.create_connection((host, port))
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self.width, self.height = width, height
        flags = FLAG_POINTS if want_points else 0
        self.sock.sendall(_HELLO.pack(MAGIC, VERSION, flags, width, height,
                                      fov))
        self._fid = 0

    def process(self, gray: np.ndarray, timeout: float = 30.0):
        """Send one grayscale frame; returns (status, pose 4x4 T_wc or
        None, points [N,2])."""
        g = np.ascontiguousarray(gray, np.uint8)
        assert g.shape == (self.height, self.width)
        self._fid += 1
        self.sock.sendall(_FRAME_HDR.pack(self._fid, g.size) + g.tobytes())
        self.sock.settimeout(timeout)
        hdr = _recv_exact(self.sock, _REPLY_HDR.size)
        if hdr is None:
            raise ConnectionError("server closed")
        vals = _REPLY_HDR.unpack(hdr)
        fid, status, n = vals[0], vals[1], vals[-1]
        pose = None
        if status == 1:
            pose = np.asarray(vals[2:18], np.float32).reshape(4, 4).T
        pts = np.zeros((0, 2), np.float32)
        if n:
            raw = _recv_exact(self.sock, n * 8)
            pts = np.frombuffer(raw, np.float32).reshape(n, 2)
        return status, pose, pts

    def close(self):
        self.sock.close()
