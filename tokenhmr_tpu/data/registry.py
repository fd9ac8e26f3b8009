"""Dataset registry + factory.

Capabilities of ref `tokenhmr/lib/datasets/dataset.py:5-27` (metaclass
auto-registry) and `datasets/__init__.py:17-42` (create_dataset /
create_webdataset / MixedWebDataset): name -> constructor dispatch so
configs can say `TYPE: ImageDataset` and get the right class.
"""
from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(ctor):
        _REGISTRY[name] = ctor
        return ctor
    return deco


def create_dataset(type_name: str, *args, **kwargs):
    """Instantiate a registered dataset (ref create_dataset :17-26)."""
    if type_name not in _REGISTRY:
        raise KeyError(
            f"unknown dataset type {type_name!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[type_name](*args, **kwargs)


def _register_builtins() -> None:
    from .mocap import MoCapDataset
    from .npz_dataset import NpzDataset
    from .pose_dataset import PoseDataset
    from .tar_dataset import BedlamTarDataset, TarPoseDataset

    _REGISTRY.setdefault("ImageDataset", NpzDataset)
    _REGISTRY.setdefault("EMDBDataset", NpzDataset)
    _REGISTRY.setdefault("TarDataset", TarPoseDataset)
    _REGISTRY.setdefault("BedlamDataset", BedlamTarDataset)
    _REGISTRY.setdefault("MoCapDataset", MoCapDataset)
    _REGISTRY.setdefault("PoseDataset", PoseDataset)


_register_builtins()
