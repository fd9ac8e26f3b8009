"""Device mesh construction + sharding rules.

The reference's only parallelism is NCCL data-parallel via Lightning DDP
(SURVEY.md §2.8).  TPU-native equivalent: a `jax.sharding.Mesh` with
  * `data`  — batch axis (DP); gradients all-reduced by XLA over ICI
  * `fsdp`  — optional parameter/optimizer sharding (ZeRO-style)
  * `model` — optional tensor sharding of ViT-H MLP/attention heads

At TokenHMR's scale (~760M params) a pure-data mesh is the workhorse; the
fsdp axis keeps HBM headroom for big batches, and the model axis exists for
latency-bound serving.  All three are expressed as NamedSharding rules, so
any (data, fsdp, model) factorization compiles without code changes.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_fsdp: int = 1,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, fsdp, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        if n_fsdp * n_model > n_total or n_total % (n_fsdp * n_model) != 0:
            raise ValueError(
                f"cannot factorize {n_total} device(s) as data x fsdp={n_fsdp} "
                f"x model={n_model}; pick axis sizes whose product divides "
                f"{n_total} (e.g. fsdp=1 model=1 for single-device)"
            )
        n_data = n_total // (n_fsdp * n_model)
    if n_data * n_fsdp * n_model != n_total:
        raise ValueError(
            f"mesh {n_data}x{n_fsdp}x{n_model} != {n_total} devices"
        )
    dev_array = np.asarray(devices).reshape(n_data, n_fsdp, n_model)
    return Mesh(dev_array, ("data", "fsdp", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over data (and fsdp, which acts as extra
    DP for activations)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_batch(x):
    """Pin an activation's leading dim to the batch axes, rest replicated.

    Used inside model code (token-head decoder) to stop XLA's sharding
    propagation from inventing a feature-dim sharding for the small head
    activations: without this, the backward of the qkv split emits a
    concatenate whose operand/result shardings disagree, and the SPMD
    partitioner falls back to "involuntary full rematerialization"
    (replicate-then-repartition; MULTICHIP_r04 tail).  No-op when traced
    without an ambient mesh (single-chip bench/demo) or when the mesh
    lacks the (data, fsdp) axes this module defines.
    """
    m = jax.sharding.get_abstract_mesh()
    if m is None or getattr(m, "empty", True):
        return x
    axes = set(m.axis_names or ())
    if not {"data", "fsdp"} <= axes:
        return x
    spec = P(("data", "fsdp"), *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, spec)


def _param_spec(path: Tuple, leaf, mesh: Mesh, shard_params: bool) -> P:
    """Sharding rule for one parameter.

    fsdp: shard the LARGEST axis that divides the fsdp size (ZeRO-3 style).
    model: shard ViT MLP hidden + attention qkv output features.
    """
    n_fsdp = mesh.shape["fsdp"]
    n_model = mesh.shape["model"]
    shape = leaf.shape
    if leaf.ndim == 0 or (n_fsdp == 1 and n_model == 1):
        return P()

    names = [None] * leaf.ndim

    if n_model > 1:
        # tensor-parallel rules keyed on parameter path; restricted to the
        # ViT backbone blocks — the head's per-layer matmuls are too small
        # for TP to pay for its collectives (and trigger inefficient
        # reshards in the backward pass)
        pathstr = "/".join(str(getattr(p, "key", p)) for p in path)
        if "block" in pathstr:
            if any(s in pathstr for s in ("mlp/fc1", "attn/qkv")):
                names[-1] = "model"          # column-parallel
            elif any(s in pathstr for s in ("mlp/fc2", "attn/proj")):
                names[-2 if leaf.ndim >= 2 else -1] = "model"  # row-parallel
    pathstr = "/".join(str(getattr(p, "key", p)) for p in path)
    if shard_params and n_fsdp > 1 and leaf.size >= 65536 \
            and "backbone" in pathstr:
        # small tensors stay replicated: the all-gather cost of sharding
        # them exceeds the memory saved.  fsdp is also restricted to the
        # ViT backbone (~95% of params): sharding the token head's small
        # matrices on their feature dim forces feature-dim shardings onto
        # its tiny activation cotangents, and the SPMD partitioner can
        # only resolve the resulting batch->feature reshard of the qkv
        # concatenate by full rematerialization (MULTICHIP_r04 tail).
        # choose largest unsharded axis divisible by n_fsdp
        cand = sorted(
            (i for i in range(leaf.ndim)
             if names[i] is None and shape[i] % n_fsdp == 0),
            key=lambda i: -shape[i],
        )
        if cand:
            names[cand[0]] = "fsdp"
    return P(*names)


def _spec_axes(spec: P):
    """Flatten a PartitionSpec's mesh-axis names (entries may be tuples)."""
    for entry in spec:
        if entry is None:
            continue
        if isinstance(entry, (tuple, list)):
            yield from entry
        else:
            yield entry


def param_shardings(params: Any, mesh: Mesh, shard_params: bool = True) -> Any:
    """NamedSharding tree for a param pytree under the mesh's rules.

    When a non-trivial axis is requested, asserts the rules actually matched
    something — a silent all-replicated tree (e.g. after a module rename that
    breaks the path-fragment rules) would otherwise masquerade as TP/FSDP.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    raw = [_param_spec(path, leaf, mesh, shard_params) for path, leaf in flat]
    if flat and mesh.shape["model"] > 1:
        hit = sum(1 for s in raw if "model" in set(_spec_axes(s)))
        if hit == 0:
            raise ValueError(
                f"mesh axis 'model' has size {mesh.shape['model']} but the "
                f"TP rules matched 0 of {len(flat)} params — check the "
                f"parameter path fragments in parallel/mesh.py:_param_spec "
                f"against the model's actual module names"
            )
    if flat and shard_params and mesh.shape["fsdp"] > 1:
        hit = sum(1 for s in raw if "fsdp" in set(_spec_axes(s)))
        if hit == 0:
            # legitimate for tiny models (everything below the 65536 size
            # floor stays replicated) — warn, don't fail
            import logging
            logging.getLogger(__name__).warning(
                "fsdp axis size %d but 0/%d params sharded (all below the "
                "size floor or indivisible)", mesh.shape["fsdp"], len(flat)
            )
    specs = [NamedSharding(mesh, s) for s in raw]
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params: Any, mesh: Mesh, shard: bool = True) -> Any:
    """Place a param tree onto the mesh according to the rules."""
    shardings = param_shardings(params, mesh, shard)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )
