"""Multi-host distributed initialization + DCN x ICI mesh construction.

TPU-native replacement for the reference's TCP offload backend
(/root/reference/ggml/src/ggml-rpc/ggml-rpc.cpp:84-96: a client ships tensors
to a remote ggml server over a socket).  On TPU pods the equivalent is
jax.distributed: every host runs the same program, discovers its slice
through the coordinator, and jax.devices() returns the GLOBAL device list;
GSPMD then partitions one program over the whole pod, with collectives riding
ICI within a slice and DCN across slices.

Recommended axis layout (scaling-book recipe): put data-parallelism on the
slowest network tier (DCN, across hosts/slices) and model parallelism inside
a slice (ICI) — `make_pod_mesh(hosts=..., model=...)`.

Single-process callers (tests, the one-chip dev box) can exercise the mesh
logic without a coordinator: `make_pod_mesh` only needs a device list.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"     # across hosts / DCN
MODEL_AXIS = "model"   # within a slice / ICI


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Bring up jax.distributed for a multi-host run; no-op when single-host.

    Arguments default to the standard environment variables
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; on Cloud
    TPU jax.distributed.initialize() can auto-discover all three).  Returns
    True when a multi-process runtime was initialized.  Must be called
    before any backend use on every host.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        n = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        p = os.environ.get("JAX_PROCESS_ID")
        process_id = int(p) if p else None

    if coordinator_address is None and num_processes in (None, 1):
        return False  # single-process: nothing to initialize

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def pod_device_grid(devices: Sequence, hosts: int) -> np.ndarray:
    """Arrange a global device list as a (hosts, per_host) grid.

    With jax.distributed live, jax.devices() interleaves all hosts' devices;
    grouping by process_index keeps each row's collectives on one host's ICI.
    Falls back to a contiguous split when process indices are uniform (the
    virtual CPU mesh case).
    """
    n = len(devices)
    if n % hosts != 0:
        raise ValueError(f"{n} devices not divisible by hosts={hosts}")
    per_host = n // hosts
    by_proc = {}
    for d in devices:
        by_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    if len(by_proc) == hosts:
        rows = [by_proc[k] for k in sorted(by_proc)]
        if any(len(r) != per_host for r in rows):
            # a contiguous reshape of an interleaved list would silently put
            # devices from different hosts in one row, breaking the
            # "model-axis groups stay on one host" guarantee
            raise ValueError(
                "uneven devices per process: "
                f"{[len(r) for r in rows]} (expected {per_host} x {hosts})")
        return np.asarray(rows, dtype=object)
    if len(by_proc) == 1:
        # single process / virtual devices: contiguous split is exact
        return np.asarray(list(devices), dtype=object).reshape(hosts, per_host)
    raise ValueError(
        f"device list spans {len(by_proc)} processes but hosts={hosts}; "
        "hosts must equal the number of processes for a multi-process mesh")


def make_pod_mesh(hosts: int, model: int = 1,
                  devices: Optional[Sequence] = None) -> Mesh:
    """(data, model) mesh for a pod: data spans hosts (DCN-friendly), model
    stays within a host's devices (ICI-only collectives).

    The returned mesh has shape (hosts * per_host_data, model) with the
    device order chosen so every model-axis group lives on one host.
    """
    if devices is None:
        devices = jax.devices()
    grid = pod_device_grid(devices, hosts)         # (hosts, per_host)
    per_host = grid.shape[1]
    if per_host % model != 0:
        raise ValueError(
            f"{per_host} devices per host not divisible by model={model}")
    # (hosts, per_host_data, model) -> (hosts*per_host_data, model)
    arr = grid.reshape(hosts, per_host // model, model).reshape(-1, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
