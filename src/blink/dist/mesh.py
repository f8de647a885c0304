"""Device mesh construction (SURVEY.md §2 "Distributed comm backend";
L7). The TPU-native communication backend is XLA collectives over ICI/DCN
reached via jax.shard_map on a jax.sharding.Mesh — there is no NCCL/MPI
here by design (SURVEY.md §5).

Multi-host: call init_distributed() first (jax.distributed.initialize over
the axon pool when PALLAS_AXON_POOL_IPS provides one); the mesh then spans
all processes' devices.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, PartitionSpec as P

AXIS = "d"


def init_distributed(coordinator: str | None = None) -> None:
    """Multi-host process-group init (no-op when single-process)."""
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator:
        jax.distributed.initialize(coordinator_address=coordinator)


def make_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    """1-D ray/tile data-parallel mesh over the first n devices."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)} "
                "(for tests: jax.config.update('jax_num_cpu_devices', n))"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


__all__ = ["AXIS", "Mesh", "P", "init_distributed", "make_mesh"]
