"""Checkpoint save/load with full train-state resume.

The reference only persists weights (``{'state_dict': ...}``,
reference problems.py:140-151) with no optimizer state and no resume path
(SURVEY.md section 5). Here a checkpoint carries params, batch_stats,
optimizer state, step/epoch counters, the 8-channel normalization stats,
and the training config — so training resumes bit-exactly and inference
needs exactly one artifact.

Format: flax.serialization msgpack + a tiny JSON sidecar for
human-readable metadata. Best-train / best-val snapshots mirror the
reference's artifact names (reference problems.py:143,150).
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
from flax import serialization


def save_checkpoint(path: str, state: dict, metadata: dict | None = None):
    """Serialize a pytree-of-arrays state dict to ``path`` (.msgpack).

    Arbitrary pytrees (e.g. optax chain states with NamedTuples) are
    flattened via flax's to_state_dict before msgpack encoding.
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    state = serialization.to_state_dict(_to_numpy(state))
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(state))
    if metadata is not None:
        with open(path + ".json", "w") as f:
            json.dump(metadata, f, indent=2, default=float)


def load_checkpoint(path: str, template: Any | None = None):
    """Restore a checkpoint. With ``template`` (a pytree of the original
    structure), NamedTuple/tuple nodes — e.g. optax states — are rebuilt
    via from_state_dict; without it, nested dicts are returned."""
    with open(path, "rb") as f:
        restored = serialization.msgpack_restore(f.read())
    if template is not None:
        return serialization.from_state_dict(template, restored)
    return restored


def load_metadata(path: str) -> dict:
    meta_path = path + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def latest_checkpoint(outdir: str) -> str | None:
    """Most recent resume checkpoint in a training output dir."""
    path = os.path.join(outdir, "checkpoint_last.msgpack")
    return path if os.path.exists(path) else None


def _to_numpy(tree: Any):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)
