"""Multi-host runtime: process initialization and DCN x ICI hybrid meshes.

The reference is strictly single-process (SURVEY.md section 2.3: no
torch.distributed, no NCCL/MPI anywhere); its only multi-GPU story is
accelerate layer placement. The TPU build targets pods: one JAX process per
host, `jax.distributed.initialize` for the runtime, and a hybrid mesh whose
inner axes (tensor/expert parallel) stay inside a slice on ICI while the
outer axis (data parallel / request routing for the serving engine) spans
slices over DCN.

On a single host everything degrades gracefully: `initialize_runtime` is a
no-op and `create_hybrid_mesh` builds an ICI-only mesh, so the same launch
script runs from one chip to a pod.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_runtime(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-process JAX runtime (no-op when single-process).

    Returns True if distributed mode was initialized. On Cloud TPU the
    arguments are auto-detected from the metadata server; elsewhere pass
    them explicitly or via JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return False  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def create_hybrid_mesh(
    tp: int,
    dp: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(data, model) mesh with the model axis on the fastest links.

    Multi-slice/multi-host: uses mesh_utils.create_hybrid_device_mesh so
    the data axis maps to DCN (across slices/hosts) and the model axis to
    ICI within a slice. Single-slice: plain contiguous mesh."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % tp:
            raise ValueError(f"tp={tp} does not divide device count {n}")
        dp = n // tp
    if tp * dp > n:
        raise ValueError(f"need {tp * dp} devices, have {n}")

    n_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if n_slices > 1:
        from jax.experimental import mesh_utils

        if dp % n_slices:
            raise ValueError(
                f"dp={dp} must be a multiple of slice count {n_slices} "
                "(data parallel rides DCN across slices)"
            )
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp // n_slices, tp),
            dcn_mesh_shape=(n_slices, 1),
            devices=devices[: tp * dp],
        )
    else:
        arr = np.asarray(devices[: tp * dp]).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def process_local_batch(
    global_batch: int,
) -> Tuple[int, int]:
    """(local_batch, process_index): how a global batch splits across the
    processes of a multi-host serving deployment — each host's engine
    admits its own requests (continuous batching is per-host; only model
    shards communicate)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n}")
    return global_batch // n, jax.process_index()
