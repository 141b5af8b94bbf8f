"""Multi-host (multi-process) plumbing for distributed reconstruction.

reference behavior: the reference scales across machines only by manual
dataset splitting (hierarchical mapper leaves run as separate processes);
its solver parallelism is single-machine (SURVEY §2.9 P7). TPU-native
design: one SPMD program over a global mesh spanning (hosts × chips) via
``jax.distributed``. The sharded packed BA program
(parallel/sharded_ba.py) runs unchanged on such a mesh — point shards map
to chips, the per-PCG-matvec psum of the camera system rides ICI within a
host and DCN across hosts; because the reduced camera system is a few KB,
DCN latency, not bandwidth, is the cost, exactly like data-parallel
gradient sync.

Env-untestable beyond process_count==1 here (single host); everything
below degrades to the single-process path and is exercised that way by
tests/test_multihost.py on the 8-device virtual CPU mesh.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join (or form) a multi-host JAX cluster.

    With no arguments in a single-process environment this is a no-op, so
    every entry point can call it unconditionally. Joining a cluster is an
    explicit opt-in: set ``COLMAP_TPU_MULTIHOST=1`` (or pass coordinator
    arguments). Generic launcher markers alone (SLURM_JOB_ID etc.) do NOT
    trigger a join — independent commands launched as tasks of one srun
    step must not silently form a shared coordinator (they would block
    until all tasks connect and then stride-slice unrelated work).
    """
    global _initialized
    if _initialized:
        return
    if coordinator_address is None and num_processes is None:
        import os

        if os.environ.get("COLMAP_TPU_MULTIHOST", "") not in ("1", "true"):
            _initialized = True
            return
        # Opted in: jax.distributed.initialize() auto-detects the cluster
        # from the launcher environment; probe for one first since calling
        # it outside a launcher raises.
        markers = ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                   "SLURM_JOB_ID", "TPU_WORKER_HOSTNAMES")
        if not any(m in os.environ for m in markers):
            _initialized = True
            return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except (ValueError, RuntimeError) as exc:
        # Launcher markers present but no usable cluster config (e.g. a
        # single-chip environment exporting TPU vars): run single-process.
        if coordinator_address is not None or num_processes is not None:
            raise
        import logging

        logging.debug("multihost: single-process fallback (%s)", exc)
    _initialized = True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def global_mesh(axis_name: str = "obs", devices=None) -> Mesh:
    """A 1-D mesh over every device in the cluster.

    Multi-host: ``create_hybrid_device_mesh`` orders devices so that
    consecutive mesh positions are ICI neighbours and the host boundary is
    crossed as few times as possible — the psum tree then does intra-host
    reduction over ICI first and only the host-partials over DCN.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if jax.process_count() > 1:
        per_host = n // jax.process_count()
        dm = mesh_utils.create_hybrid_device_mesh(
            (per_host,), (jax.process_count(),), devices=devices
        )
        return Mesh(dm.reshape(-1), (axis_name,))
    return Mesh(np.asarray(devices), (axis_name,))


def global_mesh_2d(
    point_axis: str = "point", frame_axis: str = "frame", devices=None
) -> Mesh:
    """A 2-D (hosts × chips) mesh for DCN-aware BA sharding.

    Points shard over the chip axis (ICI collectives inside a host);
    frames/cameras shard over the host axis, so the only DCN traffic is
    the per-iteration reduce-scatter of the reduced camera system.
    Single-host: degrades to (1, n_chips).
    """
    if devices is None:
        devices = jax.devices()
    n_hosts = max(jax.process_count(), 1)
    per_host = len(devices) // n_hosts
    if n_hosts > 1:
        dm = mesh_utils.create_hybrid_device_mesh(
            (per_host,), (n_hosts,), devices=devices
        )
        dm = dm.reshape(n_hosts, per_host)
    else:
        dm = np.asarray(devices).reshape(1, per_host)
    return Mesh(dm, (frame_axis, point_axis))


def local_work_slice(items: Sequence, process_id: Optional[int] = None,
                     n_processes: Optional[int] = None) -> List:
    """Strided partition of a host-side work list across processes.

    Used by the hierarchical mapper to dispatch one scene cluster per host
    (cluster-per-host: each leaf reconstruction is an independent
    single-host job; only the final Sim3 merge needs the results).
    Strided (not blocked) so heterogeneous cluster sizes balance.
    """
    pid = jax.process_index() if process_id is None else process_id
    np_ = jax.process_count() if n_processes is None else n_processes
    return list(items)[pid::np_]


def all_gather_bytes(payload: bytes) -> List[bytes]:
    """Exchange one opaque byte blob per process; returns the blobs of all
    processes ordered by process index.

    Used by the hierarchical mapper to ship serialized leaf reconstructions
    to every host before the Sim3 merge (the reference's equivalent exchange
    is filesystem-mediated between pipeline stages; on a pod the blobs ride
    DCN via ``process_allgather`` on padded uint8 arrays).
    """
    if jax.process_count() == 1:
        return [payload]
    import numpy as np
    from jax.experimental import multihost_utils

    n = np.asarray([len(payload)], dtype=np.int64)
    lens = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    cap = max(int(lens.max()), 1)
    buf = np.zeros(cap, dtype=np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    gathered = gathered.reshape(len(lens), cap)
    return [gathered[i, : int(lens[i])].tobytes() for i in range(len(lens))]


def all_gather_host_objects(obj, axis_name: str = "mh"):
    """Exchange small host-side pytrees between processes (e.g. per-host
    leaf reconstruction summaries before the merge).

    Single-process: returns [obj]. Multi-process: uses
    ``jax.experimental.multihost_utils.process_allgather`` on the packed
    representation; callers pass arrays/pytrees of arrays only.
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(obj)
