"""Multi-host runtime — the ``jax.distributed`` layer (net-new vs the
single-process reference; SURVEY §5.8).

Responsibilities:
- :func:`initialize` — process-group bring-up (coordinator discovery via
  env/args), idempotent, single-host no-op.
- :func:`global_mesh` — build a (data, model) mesh spanning all hosts'
  devices; DP rides DCN across hosts, TP stays intra-host so its
  all-gathers ride ICI (the sharding-layout rule from the scaling book:
  put the fast-collective axis on the fast interconnect).
- :func:`host_local_batch` — per-host input feeding: each host supplies its
  local shard of the global batch (``jax.make_array_from_process_local_data``),
  the serving pattern for the pod-level batcher.

Fault model: fail-fast (a dead host fails the collective; the serving layer
restarts the batcher) — matching the reference's capability level, with
elasticity an explicit non-goal (SURVEY §5.3).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent ``jax.distributed.initialize`` (env-var driven when args
    are omitted: JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID)."""
    if jax.process_count() > 1:
        return  # already initialized
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        return  # single-host
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes or int(os.environ["NUM_PROCESSES"]),
        process_id=process_id or int(os.environ["PROCESS_ID"]),
    )


def global_mesh(tp: int = 1, axis_names=("data", "model")) -> Mesh:
    """All-host mesh: TP axis packed within each host's devices (ICI),
    DP axis across the rest (+DCN across hosts)."""
    devs = np.asarray(jax.devices())
    n = devs.size
    if n % tp != 0:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    local = jax.local_device_count()
    if tp > local:
        raise ValueError(
            f"tp={tp} exceeds local device count {local}: TP collectives "
            "must stay on ICI (intra-host)")
    return Mesh(devs.reshape(n // tp, tp), axis_names)


def host_local_batch(
    mesh: Mesh,
    inputs: Dict[str, np.ndarray],
    batch_axis: str = "data",
) -> Dict[str, jax.Array]:
    """Assemble a global batch from per-host local arrays.

    Each process passes its LOCAL shard (global_batch / process_count rows);
    returns global jax.Arrays sharded over the mesh's batch axis.
    """
    out = {}
    for name, local in inputs.items():
        spec = P(batch_axis, *([None] * (np.ndim(local) - 1)))
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            out[name] = jax.device_put(local, sharding)
        else:
            out[name] = jax.make_array_from_process_local_data(
                sharding, np.asarray(local))
    return out


def is_primary() -> bool:
    return jax.process_index() == 0
