"""Multi-process (multi-host / multi-slice) bring-up.

The reference gets multi-node training from HuggingFace accelerate's
``torchrun`` launch + NCCL process groups (reference trainer.py:100-201). The
JAX equivalent is one ``jax.distributed.initialize`` call per process, after
which ``jax.devices()`` is the GLOBAL device list and every jitted SPMD
program spans it — there are no explicit process groups to manage.

Typical TPU pod-slice usage (args auto-detected from the TPU metadata)::

    from magvit2_pytorch_tpu.parallel import initialize_distributed, make_mesh
    initialize_distributed()                  # no-op on a single process
    mesh = make_mesh(dcn=jax.process_count()) # slice-major data parallelism

CPU/testing usage (e.g. a 2-process integration test)::

    initialize_distributed(coordinator_address='localhost:1234',
                           num_processes=2, process_id=rank,
                           cpu_devices_per_process=2)

The CPU path flips JAX to the 'cpu' platform with N virtual devices and the
bundled gloo cross-process collectives — this is how ``tests/test_multiprocess.py``
exercises the multi-host trainer without a pod.
"""

from __future__ import annotations

import glob
import os
import warnings
from typing import Optional

import jax

_initialized = False


def _tpu_chips_visible() -> bool:
    """Best-effort TPU presence probe that does NOT initialize any XLA
    backend (``jax.default_backend()`` would, after which
    ``jax.distributed.initialize`` permanently refuses to run — it must be
    the first JAX runtime call in the process)."""
    platforms = os.environ.get('JAX_PLATFORMS', '')
    if platforms and 'tpu' not in platforms:
        return False
    # direct-attached TPU device nodes (GCE TPU VMs expose one per chip)
    if glob.glob('/dev/accel*') or glob.glob('/dev/vfio/*'):
        return True
    # pod-slice runtime environment markers set by the TPU runtime / GKE
    tpu_env_markers = ('TPU_WORKER_HOSTNAMES', 'TPU_SKIP_MDS_QUERY',
                       'CLOUD_TPU_TASK_ID', 'TPU_NAME')
    return any(m in os.environ for m in tpu_env_markers)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    *,
    cpu_devices_per_process: Optional[int] = None,
    **kwargs,
) -> None:
    """Idempotent wrapper around ``jax.distributed.initialize``.

    With no arguments on a single-process launch this is a no-op (nothing to
    coordinate); on TPU pod slices the runtime auto-detects every argument
    from the environment, so bare ``initialize_distributed()`` is always safe
    to call at program start.

    ``cpu_devices_per_process`` forces the CPU platform with that many virtual
    devices per process and gloo collectives — must run before any JAX backend
    use (for tests / local simulation of a pod).
    """
    global _initialized
    if _initialized:
        return

    if cpu_devices_per_process is not None:
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_num_cpu_devices', cpu_devices_per_process)
        jax.config.update('jax_cpu_collectives_implementation', 'gloo')

    if coordinator_address is None and num_processes is None:
        # single process or TPU auto-detection; only call into the runtime
        # when it can actually auto-detect (TPU) — otherwise stay local.
        # The probe must not initialize an XLA backend (that would make
        # jax.distributed.initialize raise unconditionally), so it reads
        # device nodes / env markers instead of jax.default_backend().
        if not _tpu_chips_visible():
            return
        try:
            jax.distributed.initialize(**kwargs)
        except (RuntimeError, ValueError) as e:
            # single-chip / single-process TPU environments have no
            # coordinator to auto-detect — stay local rather than crash the
            # common one-host case. A genuinely-multi-host launch that lands
            # here is misconfigured; surface the reason.
            warnings.warn(
                f'initialize_distributed(): auto-detection failed ({e}); '
                'continuing single-process. On a pod slice, pass '
                'coordinator_address/num_processes/process_id explicitly.',
                stacklevel=2)
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    _initialized = True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()
