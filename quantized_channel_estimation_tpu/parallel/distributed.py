"""Multi-host initialization and mesh construction.

The reference has no multi-node anything (SURVEY §2.4); this is the
jax.distributed-based runtime for N>=2 hosts per the BASELINE north star.
On a pod slice, every host runs the same program; `initialize()` wires the
hosts together and `global_mesh()` builds the (data, component) mesh over
all chips. Collectives ride ICI within a slice and DCN across slices —
XLA picks the transport from the mesh's device order.

Single-host multi-chip (or the CPU fake cluster via
--xla_force_host_platform_device_count) needs no initialize() call.
"""
from __future__ import annotations

from typing import Optional

import jax

from quantized_channel_estimation_tpu.parallel.mesh import (
    COMPONENT_AXIS, DATA_AXIS, make_mesh)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for a multi-host run.

    On cloud TPU pods all arguments are auto-detected from the environment;
    pass them explicitly for manual clusters
    (coordinator 'host:port', process count, this process's id).
    """
    args = (coordinator_address, num_processes, process_id)
    if any(a is not None for a in args) and any(a is None for a in args):
        # silently dropping a partial manual config would hang the process
        # on auto-detection with the wrong cluster shape
        raise ValueError(
            "manual cluster config needs ALL of coordinator_address, "
            f"num_processes, process_id (got {args}); pass none of them "
            "for cloud auto-detection")
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(n_component_shards: int = 1):
    """(data, component) mesh over every chip of every host.

    The data axis spans hosts (each host feeds its local shard of samples);
    the component axis should stay within a host's chips so the component
    all-gathers of estimation ride ICI.
    """
    devices = jax.devices()
    if len(devices) % n_component_shards:
        raise ValueError(
            f"{len(devices)} devices not divisible by "
            f"{n_component_shards} component shards")
    return make_mesh(len(devices) // n_component_shards, n_component_shards,
                     devices)


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a global sample batch owned by this process (uniform
    split by process index)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
