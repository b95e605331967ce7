"""Multi-host (multi-process) entry: jax.distributed launcher + DCN x ICI
hybrid mesh construction.

The reference has no distributed backend at all (SURVEY.md §2.4 — its only
multi-device mode is accelerate's sequential layer placement within one
host). TPU-native replacement: every host runs the same program,
`initialize()` wires the processes into one JAX runtime, and
`make_hybrid_mesh` lays the global device set out as a
(dcn, ici...) mesh so that

  * the "dp" (data/replica) axis maps across SLICES — its collectives ride
    the slower DCN links and are amortized (gradient/metric reductions);
  * the "tp" (and optional "ep") axes map WITHIN a slice — their
    per-token collectives ride ICI.

Axis names match parallel/sharding.py ("dp", ["ep",] "tp"), so
`param_specs`/`shard_params` work unchanged on the hybrid mesh.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> int:
    """Join the multi-process JAX runtime; returns this process' index.

    Arguments fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) and to
    cloud-TPU auto-detection when none are set. Safe to call in
    single-process runs: with no coordinator configured it is a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # single-process (or TPU-pod auto-detect explicitly not requested)
        return jax.process_index()

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    logger.info("joined distributed runtime: process %d/%d, %d local / %d "
                "global devices", jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return jax.process_index()


def make_hybrid_mesh(dcn_dp: Optional[int] = None,
                     ici_tp: Optional[int] = None,
                     ici_ep: int = 1,
                     devices=None) -> Mesh:
    """("dp", ["ep",] "tp") mesh with dp across DCN (one group per slice /
    host) and ep,tp within a slice over ICI.

    On real multi-slice TPU topologies this uses
    mesh_utils.create_hybrid_device_mesh (which orders devices so the
    outer axis crosses slice boundaries). Anywhere else — single slice,
    CPU simulation with forced host device count — devices are grouped by
    process index so the outer axis still crosses hosts.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if dcn_dp is None:
        dcn_dp = max(1, getattr(jax, "process_count", lambda: 1)())
    if ici_tp is None:
        ici_tp = n // (dcn_dp * ici_ep)
    assert dcn_dp * ici_tp * ici_ep == n, (dcn_dp, ici_ep, ici_tp, n)

    ici_shape = (ici_ep, ici_tp) if ici_ep > 1 else (ici_tp,)
    axis_names = ("dp", "ep", "tp") if ici_ep > 1 else ("dp", "tp")
    try:
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1,) + ici_shape,
            dcn_mesh_shape=(dcn_dp,) + (1,) * len(ici_shape),
            devices=devs)
    except Exception:
        # single-slice / CPU-sim fallback: sort by (process, local order)
        # so the leading axis groups whole "hosts" (DCN boundaries)
        devs = sorted(devs, key=lambda d: (d.process_index, d.id))
        arr = np.array(devs).reshape((dcn_dp,) + ici_shape)
    return Mesh(np.asarray(arr).reshape((dcn_dp,) + ici_shape), axis_names)


def mesh_topology(mesh: Mesh) -> str:
    """Human-readable 'dcn x ici' labeling of a hybrid mesh."""
    shape = dict(mesh.shape)
    dcn = shape.get("dp", 1)
    ici = " x ".join(f"{k}={v}" for k, v in shape.items() if k != "dp")
    return f"dcn[dp={dcn}] x ici[{ici}]"
