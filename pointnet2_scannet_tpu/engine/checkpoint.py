"""Checkpointing.

The reference saves bare state_dicts only — best model (keyed on mean val
voxel mIoU, lib/solver.py:307-325) and model_last.pth — and cannot resume
(optimizer/scheduler/epoch state are dropped, SURVEY.md §5). Here a
checkpoint is the FULL train state (params + batch_stats + optimizer state +
step) plus epoch/best metadata and the serialized RunConfig, so training is
resumable and eval never has to repeat model flags.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any

import flax.serialization
import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    directory: str | pathlib.Path,
    name: str,
    state,
    *,
    epoch: int,
    best: dict[str, Any] | None = None,
    config_json: str | None = None,
) -> pathlib.Path:
    """Serialize a TrainState (+ metadata) to `<dir>/<name>.msgpack`."""
    directory = pathlib.Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": flax.serialization.to_state_dict(_to_host(state.params)),
        "batch_stats": flax.serialization.to_state_dict(_to_host(state.batch_stats)),
        "opt_state": flax.serialization.to_state_dict(_to_host(state.opt_state)),
        "step": np.asarray(state.step),
    }
    path = directory / f"{name}.msgpack"
    path.write_bytes(flax.serialization.msgpack_serialize(payload))
    meta = {"epoch": epoch, "best": best or {}}
    (directory / f"{name}.meta.json").write_text(json.dumps(meta, indent=2))
    if config_json is not None:
        (directory / "config.json").write_text(config_json)
    return path


def restore_checkpoint(directory: str | pathlib.Path, name: str, state):
    """Load `<dir>/<name>.msgpack` into an existing TrainState template.

    Returns (state, meta) where meta has 'epoch' and 'best'.
    """
    directory = pathlib.Path(directory)
    raw = flax.serialization.msgpack_restore(
        (directory / f"{name}.msgpack").read_bytes()
    )
    state = state.replace(
        params=flax.serialization.from_state_dict(state.params, raw["params"]),
        batch_stats=flax.serialization.from_state_dict(
            state.batch_stats, raw["batch_stats"]
        ),
        opt_state=flax.serialization.from_state_dict(state.opt_state, raw["opt_state"]),
        step=int(raw["step"]),
    )
    meta_path = directory / f"{name}.meta.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return state, meta


def restore_params_only(directory: str | pathlib.Path, name: str):
    """Load just params + batch_stats (for eval/visualization)."""
    directory = pathlib.Path(directory)
    raw = flax.serialization.msgpack_restore(
        (directory / f"{name}.msgpack").read_bytes()
    )
    return {"params": raw["params"], "batch_stats": raw["batch_stats"]}
