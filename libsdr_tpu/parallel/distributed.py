"""Multi-host (DCN) initialization hooks.

The reference is strictly single-process (SURVEY.md section 2.9).  For
multi-host TPU slices the recipe is standard JAX: ``jax.distributed`` +
a global mesh; channel shards ride DCN between hosts while halos stay on
ICI within a slice.  Actual multi-host hardware is not available in this
environment, so this module provides the initialization path and documents
the deployment contract; the sharded pipelines in
:mod:`libsdr_tpu.parallel` are host-count agnostic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op for single-process runs).

    On GKE/GCE TPU pods the arguments come from the environment and may all
    be omitted (jax auto-detects); pass them explicitly elsewhere.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def global_mesh(axis_names: Sequence[str] = ("ch", "time"),
                time_parallel: int = 1) -> Mesh:
    """Mesh over ALL devices (across hosts after init_multihost): channels
    on the first axis (DCN-friendly — no per-block communication between
    channel shards), time-block parallelism on the second (halos should stay
    within a host's ICI domain, so keep ``time_parallel`` <= devices/host)."""
    devs = np.asarray(jax.devices())
    n = devs.size
    t = max(1, time_parallel)
    return Mesh(devs[: (n // t) * t].reshape(n // t, t), tuple(axis_names))


def place_global(x, mesh: Mesh, spec) -> jax.Array:
    """Place host data as a global array over ``mesh`` with PartitionSpec
    ``spec`` — works in BOTH single- and multi-process runs.

    Single-process: plain ``jax.device_put``.  Multi-process: each process
    materializes only the shards on ITS OWN devices
    (``jax.make_array_from_callback`` asks for addressable shards only) —
    this IS the host-sharded ingest contract: with channels/time sharded
    across hosts, each host reads only its own capture range
    (:func:`process_local_batch`), never the full stream."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x_np = np.asarray(x)
    return jax.make_array_from_callback(x_np.shape, sharding,
                                        lambda idx: x_np[idx])


def process_local_batch(global_channels: int) -> slice:
    """The channel range this host should feed (host-sharded ingest: each
    host reads only its own capture segment — the multi-host replacement for
    the reference's single RTL ingest thread)."""
    p = jax.process_index()
    n = jax.process_count()
    per = global_channels // n
    return slice(p * per, (p + 1) * per)
