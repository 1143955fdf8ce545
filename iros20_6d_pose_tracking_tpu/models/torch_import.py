"""PyTorch -> Flax checkpoint conversion for Se3TrackNet.

The reference saves ``{'state_dict': model.state_dict()}`` tarballs
(reference problems.py:140-151) and loads them at inference
(reference predict.py:151-156). This module converts such a state_dict
into the Flax variables pytree of :class:`~..models.tracknet.Se3TrackNet`
so pretrained reference checkpoints can validate the whole TPU stack.

Layout conversions:
  - Conv weight (O, I, kH, kW) -> HWIO (kH, kW, I, O)
  - Linear weight (O, I) -> (I, O)
  - BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

# Sequential-module key prefixes in the reference model and our names.
_CONV_BN_BLOCKS = (
    "convA1",
    "convB1",
    "convAB1",
    "trans_conv1",
    "rot_conv1",
)
_RES_BLOCKS = (
    "convA2",
    "convB2",
    "convB3",
    "convAB2",
    "trans_conv2",
    "rot_conv2",
)
_DENSE_HEADS = ("trans_out", "rot_out")


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def state_dict_to_variables(state_dict: Mapping[str, Any]) -> dict:
    """Convert a reference-format state_dict (tensors or ndarrays) to Flax
    ``{'params': ..., 'batch_stats': ...}`` variables."""

    def arr(key):
        v = state_dict[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    params: dict = {}
    stats: dict = {}

    for blk in _CONV_BN_BLOCKS:
        params[blk] = {
            "conv": {
                "kernel": _conv_kernel(arr(f"{blk}.0.weight")),
                "bias": arr(f"{blk}.0.bias"),
            },
            "bn": {"scale": arr(f"{blk}.1.weight"), "bias": arr(f"{blk}.1.bias")},
        }
        stats[blk] = {
            "bn": {
                "mean": arr(f"{blk}.1.running_mean"),
                "var": arr(f"{blk}.1.running_var"),
            }
        }

    for blk in _RES_BLOCKS:
        p = {}
        s = {}
        for i in (1, 2):
            p[f"conv{i}"] = {"kernel": _conv_kernel(arr(f"{blk}.conv{i}.weight"))}
            if f"{blk}.conv{i}.bias" in state_dict:
                p[f"conv{i}"]["bias"] = arr(f"{blk}.conv{i}.bias")
            p[f"bn{i}"] = {
                "scale": arr(f"{blk}.bn{i}.weight"),
                "bias": arr(f"{blk}.bn{i}.bias"),
            }
            s[f"bn{i}"] = {
                "mean": arr(f"{blk}.bn{i}.running_mean"),
                "var": arr(f"{blk}.bn{i}.running_var"),
            }
        params[blk] = p
        stats[blk] = s

    for head in _DENSE_HEADS:
        params[head] = {
            "kernel": arr(f"{head}.0.weight").T,
            "bias": arr(f"{head}.0.bias"),
        }

    return {"params": params, "batch_stats": stats}


def load_reference_checkpoint(path: str) -> dict:
    """Load a reference ``model_best_*.pth.tar`` and convert to Flax variables.

    Requires torch (CPU) for unpickling, which is how the reference
    serializes (reference problems.py:142-144).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    return state_dict_to_variables(state_dict)


def variables_to_state_dict(variables: Mapping[str, Any]) -> dict:
    """Inverse conversion (Flax variables -> reference-format numpy
    state_dict), for exporting TPU-trained weights back to reference
    tooling."""
    params = variables["params"]
    stats = variables["batch_stats"]
    out: dict = {}

    for blk in _CONV_BN_BLOCKS:
        out[f"{blk}.0.weight"] = np.transpose(
            np.asarray(params[blk]["conv"]["kernel"]), (3, 2, 0, 1)
        )
        out[f"{blk}.0.bias"] = np.asarray(params[blk]["conv"]["bias"])
        out[f"{blk}.1.weight"] = np.asarray(params[blk]["bn"]["scale"])
        out[f"{blk}.1.bias"] = np.asarray(params[blk]["bn"]["bias"])
        out[f"{blk}.1.running_mean"] = np.asarray(stats[blk]["bn"]["mean"])
        out[f"{blk}.1.running_var"] = np.asarray(stats[blk]["bn"]["var"])

    for blk in _RES_BLOCKS:
        for i in (1, 2):
            out[f"{blk}.conv{i}.weight"] = np.transpose(
                np.asarray(params[blk][f"conv{i}"]["kernel"]), (3, 2, 0, 1)
            )
            if "bias" in params[blk][f"conv{i}"]:
                out[f"{blk}.conv{i}.bias"] = np.asarray(params[blk][f"conv{i}"]["bias"])
            out[f"{blk}.bn{i}.weight"] = np.asarray(params[blk][f"bn{i}"]["scale"])
            out[f"{blk}.bn{i}.bias"] = np.asarray(params[blk][f"bn{i}"]["bias"])
            out[f"{blk}.bn{i}.running_mean"] = np.asarray(stats[blk][f"bn{i}"]["mean"])
            out[f"{blk}.bn{i}.running_var"] = np.asarray(stats[blk][f"bn{i}"]["var"])

    for head in _DENSE_HEADS:
        out[f"{head}.0.weight"] = np.asarray(params[head]["kernel"]).T
        out[f"{head}.0.bias"] = np.asarray(params[head]["bias"])

    return out
