"""Device mesh + sharding utilities — the distributed backbone.

The reference's entire communication layer is HuggingFace accelerate DDP over
NCCL (trainer.py:26-27,100-201; SURVEY.md §5.8). The TPU-native equivalent is
one ``jax.sharding.Mesh`` over ICI with the batch sharded on a ``'data'`` axis:
gradients come out of ``jax.grad`` already averaged via an XLA-inserted
``psum`` riding ICI; barriers are implicit in SPMD; ``no_sync``/grad-accum
micro-batching needs no communication suppression because the collective only
materializes where XLA schedules it (after the scan).

Multi-slice / multi-host: pass ``dcn`` to :func:`make_mesh` to add a leading
``'dcn'`` mesh axis that splits data-parallelism across slices (or hosts) over
DCN while the ``'data'``/``'tensor'`` axes stay inside a slice on ICI. Batch
sharding then spans ``('dcn', 'data')`` so gradient psums decompose into a
cheap intra-slice ICI reduce plus one small cross-slice DCN reduce — XLA
derives that decomposition from the mesh axis order. Process bring-up lives in
:mod:`magvit2_pytorch_tpu.parallel.distributed`. For reference parity only the
data axis is required (the reference has DP only).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    tensor: int = 1,
    dcn: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'tensor') mesh, or ('dcn', 'data', 'tensor') when ``dcn > 1``,
    over the available devices. Defaults to pure data parallelism.

    ``jax.devices()`` orders devices process-major, so reshaping with ``dcn``
    slowest puts each slice/host in its own 'dcn' row: 'data'/'tensor'
    collectives ride ICI inside a slice, only the 'dcn' reduction crosses DCN.
    ``dcn`` therefore should equal the slice (or process) count."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // (tensor * dcn)
    assert data * tensor * dcn == n, (
        f'mesh {dcn}x{data}x{tensor} does not cover {n} devices')
    if dcn > 1:
        arr = np.asarray(devices).reshape(dcn, data, tensor)
        return Mesh(arr, axis_names=('dcn', 'data', 'tensor'))
    arr = np.asarray(devices).reshape(data, tensor)
    return Mesh(arr, axis_names=('data', 'tensor'))


def batch_axes(mesh: Mesh):
    """Mesh axes the batch dim is sharded over (dcn-first when present)."""
    return tuple(a for a in ('dcn', 'data') if a in mesh.axis_names)


def data_parallel_extent(mesh: Mesh) -> int:
    """Total number of ways the batch is split (product over batch axes)."""
    n = 1
    for a in batch_axes(mesh):
        n *= mesh.shape[a]
    return n


def data_sharding(mesh: Mesh, *, leading_none: int = 0) -> NamedSharding:
    """Shard the batch axis over ('dcn','data') — or just 'data' on a
    single-slice mesh — optionally after ``leading_none`` unsharded leading
    axes, e.g. a grad-accum axis."""
    spec = P(*([None] * leading_none), batch_axes(mesh))
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
    placement. (The reference has no TP at all — SURVEY.md §2.9.)

    Audited on the virtual mesh (tests/test_trainer.py::
    test_tensor_parallel_matches_data_parallel): a dp2xtp2 generator step
    produces the SAME parameter update as plain dp4 from identical state,
    params really partition over 'tensor', and the compiled HLO carries the
    extra collectives TP implies. NOT yet measured: step time on real
    multi-chip hardware (this environment has one chip) — treat the
    speed/placement quality, not the correctness, as experimental."""
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
