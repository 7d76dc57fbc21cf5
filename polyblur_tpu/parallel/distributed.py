"""Multi-host initialization and topology-aware meshes.

The reference is strictly single-device (SURVEY.md §2.6); this module is
the scale-OUT half of the distributed story (parallel/sharding.py is the
single-host multi-chip half): bring up `jax.distributed` across processes
and lay out the ('data', 'tile') mesh so the data axis rides DCN across
hosts while the tile axis stays on ICI within each host — the standard
batch-outer/model-inner layout (collectives between tile shards never
cross hosts).

Single-process runs (including the CPU test environment's virtual
8-device mesh) need no initialization and get the same mesh layout from
the flat device list.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["initialize_distributed", "make_multihost_mesh",
           "process_topology"]


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids=None) -> bool:
    """Bring up the JAX distributed runtime if this is a multi-process job.

    Arguments default to the standard environment variables
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``), matching ``jax.distributed.initialize``'s own
    auto-detection on cloud TPU pods (where all three may be omitted).

    Returns True if the distributed runtime was (or already is) live,
    False for an ordinary single-process run. Safe to call repeatedly.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if jax.distributed.is_initialized():
        return True  # already live; initialize() again would raise
    if coordinator_address is None and num_processes is None:
        # plain single-process run (or TPU-pod auto-detection unavailable).
        # NOTE: jax.process_count() is only safe here because no
        # initialize() follows — it forces backend initialization, after
        # which jax.distributed.initialize() raises.
        return jax.process_count() > 1
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    return True


def process_topology():
    """(num_processes, devices sorted process-major).

    ``jax.devices()`` already orders devices process-major, but sort
    explicitly so the mesh layout is deterministic regardless of backend.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return jax.process_count(), devs


def make_multihost_mesh(data_axis: int | None = None,
                        allow_tile_across_hosts: bool = False) -> Mesh:
    """('data', 'tile') mesh with the data axis spanning processes.

    With P processes x L local devices, the default mesh is (P, L): every
    tile-axis collective (the overlap-add reassembly / seam exchange) runs
    between devices of ONE host over ICI; only the batch axis — which the
    pipeline never communicates on except gradient psums in training —
    crosses DCN. ``data_axis`` overrides the data extent; it must be a
    multiple of the process count so no data shard straddles hosts.

    ``allow_tile_across_hosts=True`` relaxes that rule for the
    tile-dominant layout (e.g. ONE giant image spread over a whole pod's
    devices, data_axis=1): the reassembly seam ppermute then crosses DCN
    at host boundaries — one (tail x W) strip per host pair per image,
    the layout a multi-host single-image job actually wants. Keep the
    default strict: with batch parallelism available, tile shards
    straddling hosts is a layout bug.
    """
    n_proc, devs = process_topology()
    n = len(devs)
    if data_axis is None:
        data_axis = n_proc
    if data_axis % n_proc != 0 and not allow_tile_across_hosts:
        raise ValueError(
            f"data_axis={data_axis} incompatible with {n_proc} processes: "
            "a data shard would straddle hosts (pass "
            "allow_tile_across_hosts=True for the tile-dominant layout)")
    if n % data_axis != 0:
        raise ValueError(f"{n} devices not divisible by data_axis={data_axis}")
    dev_array = np.asarray(devs).reshape(data_axis, n // data_axis)
    return Mesh(dev_array, axis_names=("data", "tile"))
