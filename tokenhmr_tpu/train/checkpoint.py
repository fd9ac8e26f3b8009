"""Self-describing checkpoints (orbax) + preemption-safe resume.

The reference relies on Lightning ModelCheckpoint + SLURM requeue
(SURVEY.md §5); here: orbax save/restore of explicit pytrees, with the
architecture config embedded so checkpoints reconstruct their own model
(the `{'net', 'hparams'}` property of ref `eval_poseVQ.py:118-125` /
`vanilla_pose_vqvae.py:265-278`, generalized).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

import orbax.checkpoint as ocp


def _cfg_to_dict(cfg) -> Dict[str, Any]:
    if dataclasses.is_dataclass(cfg):
        out = {}
        for f in dataclasses.fields(cfg):
            v = getattr(cfg, f.name)
            if dataclasses.is_dataclass(v):
                out[f.name] = _cfg_to_dict(v)
            elif isinstance(v, (str, int, float, bool, type(None))):
                out[f.name] = v
            elif isinstance(v, (list, tuple)):
                out[f.name] = list(v)
            else:
                out[f.name] = str(v)
        return out
    return dict(cfg)


class CheckpointManager:
    """Thin orbax wrapper: step-numbered saves, keep-latest, auto-resume.

    async_save=True returns as soon as the device->host copy is enqueued
    (orbax persists in a background thread), so training never blocks on
    filesystem writes; `wait()` (called automatically before restore and
    at context exit) joins the in-flight save.
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = False):
        self.directory = os.path.abspath(directory)
        self.async_save = async_save
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Dict[str, Any],
             config: Optional[Any] = None) -> None:
        if config is not None:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                json.dump(_cfg_to_dict(config), f, indent=2, default=str)
        self.manager.save(step, args=ocp.args.StandardSave(state))
        if not self.async_save:
            self.manager.wait_until_finished()

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Dict[str, Any],
                step: Optional[int] = None) -> Dict[str, Any]:
        self.wait()  # join any in-flight async save first
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def load_config(self) -> Optional[Dict[str, Any]]:
        path = os.path.join(self.directory, "config.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return None


# ---------------------------------------------------------------------------
# Single-file npz checkpoints: params flattened by path + the architecture
# config as embedded json.  Used for the person detector and for the
# trained-flagship export consumed by bench.py (params-only, no optimizer
# state — small enough to ship/reload without an orbax template tree).
# ---------------------------------------------------------------------------

def save_params_npz(path: str, trees: Dict[str, Any],
                    config: Optional[Any] = None) -> None:
    """Flatten {name: pytree-of-arrays} into one npz (f32/actual dtypes)."""
    arrays = {}
    for name, tree in trees.items():
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for p, leaf in flat:
            key = name + "/" + "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in p)
            a = np.asarray(leaf)
            if a.dtype == np.dtype("bfloat16"):
                a = a.astype(np.float32)
            arrays[key] = a
    if config is not None:
        arrays["__config__"] = np.frombuffer(
            json.dumps(_cfg_to_dict(config)).encode(), np.uint8)
    np.savez(path, **arrays)


def load_params_npz(path: str):
    """-> ({name: nested-dict tree}, config-dict-or-None).  Keys with
    integer path components become dicts keyed by the int (flax param
    trees are pure string-keyed dicts, so this only affects tuples-of-
    arrays which callers re-assemble themselves)."""
    data = np.load(path, allow_pickle=False)
    trees: Dict[str, Any] = {}
    cfg = None
    for key in data.files:
        if key == "__config__":
            cfg = json.loads(bytes(data[key]).decode())
            continue
        parts = key.split("/")
        node = trees
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return trees, cfg

def save_detector_checkpoint(path: str, params: Any, cfg: Any) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for p, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in p)
        arrays[key] = np.asarray(leaf)
    arrays["__config__"] = np.frombuffer(
        json.dumps(_cfg_to_dict(cfg)).encode(), np.uint8)
    np.savez(path, **arrays)


def load_detector_checkpoint(path: str):
    from ..models.detector import DetectorConfig

    data = np.load(path, allow_pickle=False)
    cfg_d = json.loads(bytes(data["__config__"]).decode())
    cfg = DetectorConfig(**{k: v for k, v in cfg_d.items()
                            if k in {f.name for f in dataclasses.fields(DetectorConfig)}
                            and k != "dtype"})
    params: Dict[str, Any] = {}
    for key in data.files:
        if key == "__config__":
            continue
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return params, cfg
