"""Multi-host initialisation.

The reference has no multi-node story (single-process ``nn.DataParallel``
only, solver.py:34-36). Here multi-host is the same mesh code path
(parallel/mesh.py) over globally-visible devices: call
``initialize_distributed()`` once per host before building the mesh, and
XLA routes collectives over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    With no arguments, relies on the TPU environment's automatic discovery;
    explicit values (or JAX_COORDINATOR_ADDRESS etc.) override. Safe to call
    in single-process runs — it no-ops unless a multi-process environment is
    detected or configured.

    NOTE: must run before anything touches a device. In particular this
    function must NOT query jax.process_count()/jax.devices() up front —
    those initialise the backend, after which jax.distributed.initialize
    is a silent no-op for the already-created client (caught by
    tests/test_multiprocess.py).
    """
    if jax.distributed.is_initialized():
        return
    explicit = (
        coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        # partial explicit config (num_processes/process_id without an
        # address) must ALSO surface jax's own error rather than silently
        # running single-process with the caller believing otherwise
        or num_processes is not None
        or process_id is not None
    )
    # a single-entry worker list (e.g. TPU_WORKER_HOSTNAMES=localhost on a
    # one-host TPU VM) is a single-process run, not a pod
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    auto_tpu = ("," in workers) or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    )
    if not explicit and not auto_tpu:
        return
    # Never swallow failures here: both branches mean a multi-process
    # cluster WAS configured/detected, and proceeding single-process after
    # a failed initialize is split-brain — every host would see
    # process_index()==0, write to the same checkpoint paths, and train
    # independently on the full batch. Loud failure is the only safe mode.
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    """True on the host that should write checkpoints/metrics."""
    return jax.process_index() == 0


def host_fetch(x: jax.Array):
    """Fetch a (possibly process-sharded) device array to every host.

    Single process: a plain device→host copy. Multi-process: the array's
    shards live on other hosts' devices and ``np.asarray`` would raise on
    the non-addressable ones, so gather it to every host first. Used by
    the full-eval host-side metrics (train/solver.py val): the per-batch
    cost is one [B] int vector over ICI/DCN — negligible next to the eval
    step that produced it, and it makes the official consensus /
    per-type / submission metrics identical on every host (the host-side
    batch fields already are: every host assembles the same global batch,
    parallel/sharding.py shard_batch).
    """
    import numpy as np

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
