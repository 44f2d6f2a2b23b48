"""Device mesh + sharding utilities — the distributed backbone.

The reference's entire communication layer is HuggingFace accelerate DDP over
NCCL (trainer.py:26-27,100-201; SURVEY.md §5.8). The TPU-native equivalent is
one ``jax.sharding.Mesh`` over ICI with the batch sharded on a ``'data'`` axis:
gradients come out of ``jax.grad`` already averaged via an XLA-inserted
``psum`` riding ICI; barriers are implicit in SPMD; ``no_sync``/grad-accum
micro-batching needs no communication suppression because the collective only
materializes where XLA schedules it (after the scan).

Multi-slice: pass ``dcn_axis`` to split data-parallelism across slices over
DCN while keeping model axes inside a slice. For reference parity only the
data axis is required (the reference has DP only); the mesh helpers accept
extra model axes (``tensor``) for the scale-out path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    tensor: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1- or 2-axis mesh ('data'[, 'tensor']) over the available devices.
    Defaults to pure data parallelism over every device."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // tensor
    assert data * tensor == n, (
        f'mesh {data}x{tensor} does not cover {n} devices')
    arr = np.asarray(devices).reshape(data, tensor)
    return Mesh(arr, axis_names=('data', 'tensor'))


def data_sharding(mesh: Mesh, *, leading_none: int = 0) -> NamedSharding:
    """Shard the batch axis over 'data' (optionally after ``leading_none``
    unsharded leading axes, e.g. a grad-accum axis)."""
    spec = P(*([None] * leading_none), 'data')
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, leading_none: int = 0):
    return jax.device_put(batch, data_sharding(mesh, leading_none=leading_none))


def replicate(tree, mesh: Mesh):
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)


def is_main_process() -> bool:
    return jax.process_index() == 0


def tensor_parallel_shardings(params, mesh: Mesh,
                              min_elements: int = 1 << 14):
    """Channel-parallel param placement over the 'tensor' mesh axis: large
    float leaves whose trailing (output-channel) dim divides the axis get
    sharded there; everything else is replicated. XLA GSPMD then partitions
    the matmuls/convs and inserts the boundary all-gathers over ICI — the
    'pick a mesh, annotate shardings, let XLA insert collectives' recipe.

    Conservative by design: correctness is XLA's job; this only declares
    placement. (The reference has no TP at all — SURVEY.md §2.9.)"""
    tp = mesh.shape['tensor']

    def spec_for(leaf):
        if (tp > 1 and hasattr(leaf, 'ndim') and leaf.ndim >= 2
                and leaf.size >= min_elements
                and leaf.shape[-1] % tp == 0):
            return NamedSharding(
                mesh, P(*([None] * (leaf.ndim - 1)), 'tensor'))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)


def shard_params_tensor_parallel(params, mesh: Mesh,
                                 min_elements: int = 1 << 14):
    shardings = tensor_parallel_shardings(params, mesh, min_elements)
    return jax.tree.map(jax.device_put, params, shardings)
