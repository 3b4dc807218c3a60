"""Map checkpoint: save/load the full SLAM state to/from a single file.

A capability the reference lacks entirely (SURVEY §5: AlvaAR keeps its map
only in WASM heap memory and loses it on page reload); because our map is
one fixed-shape pytree (worldmap/state.py MapState), (de)serialization is a
flat dict of arrays — no pointer graph to walk, no id re-mapping.

Format: NumPy ``.npz`` (zip of arrays), one entry per pytree leaf keyed by
its flattened index, plus a JSON header recording the SlamConfig fields the
shapes were derived from.  Loading validates the shape-determining config
fingerprint and restores a device-resident MapState.

Use cases: persistent maps across sessions (save → restart → relocalize),
crash recovery, and map distribution to other serving replicas.
"""

from __future__ import annotations

import dataclasses
import io
import json
import zipfile

import jax
import numpy as np

from alvaar_tpu.config import SlamConfig
from alvaar_tpu.worldmap.state import MapState, init_map_state

_FORMAT_VERSION = 1
_HEADER_KEY = "__alvaar_header__"


def _config_fingerprint(cfg: SlamConfig) -> dict:
    """The config fields that determine state shapes (config.py docstring)."""
    return {
        "width": cfg.width,
        "height": cfg.height,
        "cell_size": cfg.cell_size,
        "pyramid_levels": cfg.pyramid_levels,
        "window_size": cfg.window_size,
        "max_landmarks": cfg.max_landmarks,
        "desc_bag_size": cfg.desc_bag_size,
        "dtype": cfg.dtype,
    }


def save_map(path: str, state: MapState, cfg: SlamConfig) -> None:
    """Serialize a MapState (device or host) to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(state)
    header = {
        "format_version": _FORMAT_VERSION,
        "config": _config_fingerprint(cfg),
        "full_config": dataclasses.asdict(cfg),
        "num_leaves": len(leaves),
    }
    arrays = {f"leaf_{i:04d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays[_HEADER_KEY] = np.frombuffer(
        json.dumps(header).encode("utf-8"), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load_map(path: str, cfg: SlamConfig) -> MapState:
    """Restore a MapState saved by :func:`save_map`.

    Raises ValueError on format-version or shape-fingerprint mismatch
    (a map saved under a different geometry cannot be resumed).
    """
    with np.load(path) as data:
        header = json.loads(bytes(data[_HEADER_KEY]).decode("utf-8"))
        if header["format_version"] != _FORMAT_VERSION:
            raise ValueError(
                f"checkpoint format {header['format_version']} != "
                f"{_FORMAT_VERSION}")
        want = _config_fingerprint(cfg)
        have = header["config"]
        if have != want:
            diff = {k: (have.get(k), want[k]) for k in want
                    if have.get(k) != want[k]}
            raise ValueError(f"checkpoint/config shape mismatch: {diff}")
        leaves = [data[f"leaf_{i:04d}"] for i in range(header["num_leaves"])]

    template = init_map_state(cfg)
    treedef = jax.tree.structure(template)
    state = jax.tree.unflatten(treedef, leaves)
    # match the template's leaf dtypes exactly (np.load keeps them, but be
    # defensive about bool_/int casts across numpy versions)
    state = jax.tree.map(
        lambda leaf, ref: jax.numpy.asarray(leaf, ref.dtype), state, template)
    return state


def saved_config(path: str) -> SlamConfig:
    """Reconstruct the full SlamConfig a checkpoint was written under."""
    with np.load(path) as data:
        header = json.loads(bytes(data[_HEADER_KEY]).decode("utf-8"))
    return SlamConfig(**header["full_config"])
