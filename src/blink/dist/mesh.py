"""Device mesh construction (SURVEY.md §2 "Distributed comm backend";
L7). The TPU-native communication backend is XLA collectives over ICI/DCN
reached via jax.shard_map on a jax.sharding.Mesh — there is no NCCL/MPI
here by design (SURVEY.md §5).

Multi-host: call init_distributed() first (jax.distributed.initialize over
the axon pool when PALLAS_AXON_POOL_IPS provides one); the mesh then spans
all processes' devices.
"""
from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh, PartitionSpec as P

AXIS = "d"

#: Default coordinator port when autodetecting from PALLAS_AXON_POOL_IPS.
COORD_PORT = 8476


def _local_ips() -> set[str]:
    """Best-effort set of this host's IP addresses (no external traffic:
    connect() on a UDP socket only selects a route)."""
    import socket

    ips = {"127.0.0.1"}
    try:
        ips.update(
            i[4][0] for i in socket.getaddrinfo(socket.gethostname(), None)
        )
    except OSError:
        pass
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            s.connect(("10.255.255.255", 1))
            ips.add(s.getsockname()[0])
        finally:
            s.close()
    except OSError:
        pass
    return ips


def pool_env() -> dict | None:
    """Parse the axon pool env (SURVEY.md §0.3/§5): PALLAS_AXON_POOL_IPS
    is a comma/space-separated host-IP list. Returns {coordinator,
    num_processes, process_id} or None when no pool is configured.

    process_id resolution: PALLAS_AXON_PROCESS_ID env if set, else this
    host's position in the IP list (matched against local interfaces)."""
    raw = os.environ.get("PALLAS_AXON_POOL_IPS", "").strip()
    if not raw:
        return None
    ips = [h.strip() for h in raw.replace(",", " ").split() if h.strip()]
    if len(ips) < 2:
        return None  # a 1-host pool is the single-process default
    port = int(os.environ.get("PALLAS_AXON_COORD_PORT", str(COORD_PORT)))
    pid_env = os.environ.get("PALLAS_AXON_PROCESS_ID", "")
    if pid_env:
        pid = int(pid_env)
    else:
        local = _local_ips()
        matches = [k for k, ip in enumerate(ips) if ip in local]
        if not matches:
            raise ValueError(
                f"PALLAS_AXON_POOL_IPS={raw!r} contains no local address "
                f"(local: {sorted(local)}); set PALLAS_AXON_PROCESS_ID"
            )
        pid = matches[0]
    return {
        "coordinator": f"{ips[0]}:{port}",
        "num_processes": len(ips),
        "process_id": pid,
    }


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host process-group init; one command on an axon pool.

    Resolution order (VERDICT r2 #6):
      1. already multi-process -> no-op (returns True);
      2. explicit coordinator (plus num_processes/process_id when the
         coordinator cannot infer them);
      3. autodetect from PALLAS_AXON_POOL_IPS / PALLAS_AXON_COORD_PORT /
         PALLAS_AXON_PROCESS_ID (see pool_env);
      4. no pool configured -> no-op (returns False).
    """
    if coordinator is None:
        # Consult the env BEFORE any jax.* call: jax.process_count()
        # initializes the accelerator backend, and on a hung axon relay
        # that blocks forever inside a C call (the r3 bench rc=124 —
        # VERDICT r3 weak #2). With no pool configured we must return
        # without touching the backend at all.
        env = pool_env()
        if env is None:
            return False
        if jax.process_count() > 1:
            return True  # already initialized
        coordinator = env["coordinator"]
        num_processes = env["num_processes"]
        process_id = env["process_id"]
    elif jax.process_count() > 1:
        return True  # already initialized
    kw = {}
    if num_processes is not None:
        kw = {"num_processes": num_processes, "process_id": process_id}
    jax.distributed.initialize(coordinator_address=coordinator, **kw)
    return True


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


__all__ = ["AXIS", "Mesh", "P", "init_distributed", "make_mesh", "pool_env"]
