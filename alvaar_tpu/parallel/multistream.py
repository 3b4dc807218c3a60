"""Batched multi-stream SLAM serving over a device mesh.

BASELINE.json config 5 — the capability the reference cannot have (it is a
single-threaded WASM engine; SURVEY §2.3 parallelism note): N independent
camera streams SLAM'd concurrently, sharded stream-wise across TPU chips.

Design: one SLAM state per stream, stacked into a leading [B] axis on every
leaf of the MapState pytree; the per-frame step is ``vmap(slam_step)``
inside ``shard_map`` over a 1-D mesh axis ("streams").  Streams are
independent — pure data parallelism, zero collectives, so scaling is linear
in chips and all communication stays host↔device (frame in, pose out).

Under vmap, the step's ``lax.cond`` branches (keyframe pipeline, P3P
recovery) lower to select-everything — each stream pays the worst-case
branch.  That is the correct batched-serving trade: the keyframe pipeline
cost is amortized across the batch and the program stays static.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from alvaar_tpu.config import SlamConfig
from alvaar_tpu.frontend.step import slam_step
from alvaar_tpu.geom.camera import Camera
from alvaar_tpu.worldmap.state import MapState, init_map_state


def init_multistream_state(cfg: SlamConfig, num_streams: int,
                           seed: int = 0) -> MapState:
    """Stacked MapState with a leading [num_streams] axis and distinct
    PRNG streams."""
    base = init_map_state(cfg)
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (num_streams,) + x.shape).copy(), base)
    keys = jax.random.split(jax.random.PRNGKey(seed), num_streams)
    return stacked._replace(rng_key=keys)


def make_multistream_step(cfg: SlamConfig, cam: Camera, mesh: Mesh,
                          axis: str = "streams"):
    """Build the sharded batched step: (states [B,...], frames [B,H,W]) →
    (states, outputs), with B sharded over ``axis`` of ``mesh``."""

    def batched(states: MapState, frames):
        return jax.vmap(lambda s, f: slam_step(s, f, cam, cfg))(states, frames)

    spec = P(axis)
    # check_vma off: the step's lax.cond branches mix replicated constants
    # (reset path) with stream-varying data, which the varying-axis checker
    # rejects; the map is embarrassingly parallel so the check buys nothing.
    step = jax.shard_map(batched, mesh=mesh, in_specs=(spec, spec),
                         out_specs=(spec, spec), check_vma=False)
    return jax.jit(step)


def shard_states(states: MapState, mesh: Mesh, axis: str = "streams"):
    """Place a stacked state onto the mesh, stream-sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), states)
