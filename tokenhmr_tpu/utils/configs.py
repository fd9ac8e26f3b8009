"""Config registry for models and datasets.

Replaces the reference's yacs defaults (`tokenhmr/lib/configs/__init__.py`)
and dataset YAMLs (`datasets_eval.yaml`, `datasets_tar.yaml`) with plain
dataclass/dict configs.  Grid-search expansion over list-valued fields
(ref `misc.py:258-329`, `option_posevq.py:129-187`) is preserved as
`expand_grid`.
"""
from __future__ import annotations

import copy
import itertools
from typing import Any, Dict, List, Sequence, Tuple

# ---------------------------------------------------------------------------
# Eval dataset registry (ref lib/configs/datasets_eval.yaml)
# ---------------------------------------------------------------------------

EVAL_DATASETS: Dict[str, Dict[str, Any]] = {
    "3DPW-TEST": {
        "dataset_file": "3dpw_test.npz",
        "img_dir": "3DPW/",
        "keypoint_list": [25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 43],
        "pelvis_ind": 39,
        "protocol": "pelvis_idx",
    },
    "EMDB": {
        "dataset_file": "EMDB/emdb_for_hmr2.npz",
        "img_dir": "EMDB",
        "keypoint_list": list(range(24)),
        "protocol": "midhip_j24",
    },
    "H36M-VAL-P2": {
        "dataset_file": "h36m_val_p2.npz",
        "img_dir": "h36m/images/",
        "keypoint_list": [25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 43],
        "pelvis_ind": 39,
        "protocol": "pelvis_idx",
        "use_hips": True,
    },
    "COCO-VAL": {
        "dataset_file": "coco_val.npz",
        "img_dir": "coco/",
        "keypoint_list": [0],
        "protocol": "pelvis_idx",
        "pelvis_ind": 39,
    },
}

# Train tar-dataset mix (ref configs_hydra/datasets/mix_all.yaml weights)
TRAIN_DATASET_WEIGHTS: Dict[str, float] = {
    "BEDLAM": 0.2,
    "AIC-TRAIN": 0.1,
    "COCO-TRAIN-2014": 0.1,
    "MPII-TRAIN": 0.1,
    "H36M-TRAIN-WMASK": 0.1,
    "MPI-INF-TRAIN": 0.02,
    "AVA-TRAIN": 0.19,
    "INSTA-TRAIN": 0.18,
    "LSPET-TRAIN": 0.01,
}

# Release loss weights (ref tokenhmr_release.yaml LOSS_WEIGHTS)
RELEASE_LOSS_WEIGHTS: Dict[str, float] = {
    "KEYPOINTS_3D": 0.05,
    "KEYPOINTS_2D": 0.01,
    "GLOBAL_ORIENT": 0.001,
    "BODY_POSE": 0.001,
    "BETAS": 0.0005,
    "ADVERSARIAL": 0.0,
    "TOKEN_LOSS": 0.0,
}

# Release training hyperparameters (ref tokenhmr_release.yaml TRAIN/GENERAL)
RELEASE_TRAIN: Dict[str, Any] = {
    "lr": 5e-7,
    "weight_decay": 1e-4,
    "batch_size": 48,
    "total_steps": 350_000,
    "grad_clip": 1.0,
    "loose_sup": True,
    "loose_weight": 0.05,
    "checkpoint_steps": 2000,
    "log_steps": 1000,
    "val_steps": 2000,
}


# ---------------------------------------------------------------------------
# Grid search over list-valued fields (ref misc.py:258-329)
# ---------------------------------------------------------------------------

def _flatten(d: Dict, prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _set_path(d: Dict, path: str, value: Any) -> None:
    keys = path.split(".")
    for k in keys[:-1]:
        d = d[k]
    d[keys[-1]] = value


def expand_grid(cfg: Dict, grid_fields: Sequence[str] = ()) -> List[Dict]:
    """Cartesian-product expansion of list-valued config fields.

    If grid_fields is empty, every list-valued leaf is treated as a grid
    axis (the reference's convention).  Returns the list of concrete
    configs; index with cls_id/cfg_id.
    """
    flat = _flatten(cfg)
    axes: List[Tuple[str, List[Any]]] = []
    for k, v in flat.items():
        if isinstance(v, list) and (not grid_fields or k in grid_fields):
            axes.append((k, v))
    if not axes:
        return [copy.deepcopy(cfg)]
    configs = []
    for combo in itertools.product(*(v for _, v in axes)):
        c = copy.deepcopy(cfg)
        for (k, _), val in zip(axes, combo):
            _set_path(c, k, val)
        configs.append(c)
    return configs


# ---------------------------------------------------------------------------
# Config tree printing / export (ref lib/utils/rich_utils.py:18-76 —
# hydra+rich replaced by a dependency-free unicode tree, rank-zero guarded)
# ---------------------------------------------------------------------------

def _to_plain(cfg: Any) -> Any:
    """dataclass / dict / namespace -> plain nested dict (leaves repr'd)."""
    import dataclasses as _dc
    if isinstance(cfg, type):
        # class objects (e.g. jnp.bfloat16 dtype fields) are LEAVES —
        # vars() would dump class internals into the tree
        return cfg.__name__
    if _dc.is_dataclass(cfg):
        return {f.name: _to_plain(getattr(cfg, f.name)) for f in _dc.fields(cfg)}
    if isinstance(cfg, dict):
        return {str(k): _to_plain(v) for k, v in cfg.items()}
    if hasattr(cfg, "__dict__") and not isinstance(cfg, (list, tuple)):
        d = vars(cfg)
        if d:
            return {k: _to_plain(v) for k, v in d.items()}
    return cfg


def format_config_tree(cfg: Any, title: str = "CONFIG") -> str:
    """Render a config (dataclass tree, dict, argparse Namespace) as an
    indented unicode tree, like the reference's rich.tree dump."""
    lines = [title]

    def walk(d: Dict, indent: str) -> None:
        items = list(d.items())
        for i, (k, v) in enumerate(items):
            last = i == len(items) - 1
            branch = "└── " if last else "├── "
            cont = "    " if last else "│   "
            if isinstance(v, dict):
                lines.append(f"{indent}{branch}{k}")
                walk(v, indent + cont)
            else:
                lines.append(f"{indent}{branch}{k}: {v!r}")

    plain = _to_plain(cfg)
    if not isinstance(plain, dict):
        return f"{title}: {plain!r}"
    walk(plain, "")
    return "\n".join(lines)


def print_config_tree(cfg: Any, title: str = "CONFIG",
                      save_to_file: str | None = None) -> None:
    """Print (and optionally save) the config tree, on process 0 only
    (ref rich_utils.print_config_tree @rank_zero_only)."""
    import jax
    if jax.process_index() != 0:
        return
    text = format_config_tree(cfg, title)
    print(text)
    if save_to_file:
        with open(save_to_file, "w") as f:
            f.write(text + "\n")
