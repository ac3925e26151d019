"""Multi-host bootstrap + DCN-aware pod meshes.

The reference has no multi-node compute at all (SURVEY.md §2.3: its only
collective is an mpi4py stdin broadcast in the chat plugin,
plugin/chatcli/chatio.py:60-112). Here multi-host is first-class:

  * ``initialize_distributed()`` wraps ``jax.distributed.initialize`` —
    on Cloud TPU pods the coordinator/process count auto-detect from the
    TPU metadata; explicit args serve manual launches (GPU/CPU fleets or
    tests).
  * ``make_pod_mesh(dp_hosts, tp)`` builds a 2D (dp, tp) mesh where the
    **dp axis spans hosts (DCN) and the tp axis stays inside each
    host's ICI domain** — row/col-parallel psums (2 per layer, every
    token) ride ICI; only per-batch activations ever cross DCN, which is
    what the ≥85% 2-host scaling target requires (BASELINE.md).

Mesh construction uses ``jax.experimental.mesh_utils.
create_hybrid_device_mesh`` so device order respects physical ICI
topology inside each host.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["initialize_distributed", "make_pod_mesh", "is_multihost"]

_INITIALIZED = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> int:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments, auto-detects from the environment (TPU pod
    metadata, or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID for manual launches). Returns the process index.
    Single-process environments (no coordinator info at all) are a
    no-op so the same entrypoint runs everywhere.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_index()
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    on_tpu_pod = bool(
        os.environ.get("TPU_WORKER_HOSTNAMES")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if coordinator_address or on_tpu_pod:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
        _INITIALIZED = True
    return jax.process_index()


def is_multihost() -> bool:
    return jax.process_count() > 1


def make_pod_mesh(
    dp: Optional[int] = None, tp: Optional[int] = None
) -> Mesh:
    """(dp, tp) mesh over all processes: dp across hosts (DCN), tp
    within each host's local devices (ICI).

    Defaults: dp = number of hosts, tp = local device count — the
    layout that keeps every per-token collective on ICI. Single-host
    falls back to a plain reshape mesh (everything is ICI there).
    """
    n_hosts = jax.process_count()
    n_local = jax.local_device_count()
    n_total = n_hosts * n_local
    if dp is None and tp is None:
        dp, tp = n_hosts, n_local
    elif dp is None:
        dp = n_total // tp
    elif tp is None:
        tp = n_total // dp
    if dp * tp != n_total:
        raise ValueError(
            f"dp*tp={dp}*{tp} != total devices {n_total} "
            f"({n_hosts} hosts x {n_local})"
        )
    if n_hosts > 1:
        if tp > n_local and tp % n_local:
            raise ValueError(
                f"tp={tp} must divide into whole hosts (local={n_local})"
            )
        # ici (per-host) shape x dcn (cross-host) shape, axes (dp, tp)
        ici_dp = max(1, n_local // tp)
        dcn_dp = dp // ici_dp
        slices = {getattr(d, "slice_index", None) for d in jax.devices()}
        if len(slices) == dcn_dp * max(1, tp // n_local) and None not in (
            slices
        ):
            # true multislice: respect physical ICI topology per slice
            from jax.experimental import mesh_utils

            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(ici_dp, min(tp, n_local)),
                dcn_mesh_shape=(dcn_dp, max(1, tp // n_local)),
                devices=jax.devices(),
            )
            return Mesh(devices, ("dp", "tp"))
        # single slice spanning hosts (slice_index uniform/absent — also
        # CPU/GPU process fleets): group by process so each host's
        # devices stay contiguous along tp; dp walks hosts first, so
        # cross-host traffic is dp-only (batch activations)
        devs = sorted(
            jax.devices(), key=lambda d: (d.process_index, d.id)
        )
        grid = np.asarray(devs).reshape(n_hosts * ici_dp, min(tp, n_local))
        return Mesh(grid.reshape(dp, tp), ("dp", "tp"))
    arr = np.asarray(jax.devices()[:n_total]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))
