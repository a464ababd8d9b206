"""Multi-host (multi-process) runtime helpers.

The reference's only input parallelism is torch DataLoader workers inside
one process (train.py:63-77). On TPU pods each *host* owns a slice of the
chips and runs its own Python process, so the generalization is:

  1. every process calls :func:`initialize_distributed` once, before any
     device use — on Cloud TPU the coordinator/process_id arguments are
     discovered automatically from the TPU metadata;
  2. the global ``jax.sharding.Mesh`` is built from ``jax.devices()``
     (ALL chips, every process sees the same list) exactly as on a single
     host — ``parallel/mesh.py`` needs no changes;
  3. each process feeds only the batch rows that live on ITS chips:
     the dataset is sharded at the model-list level with
     :func:`process_shard` (``data.shard_by_process: true``), and
     ``jax.make_array_from_process_local_data`` assembles the global
     batch (per-process locals stay host-local; XLA collectives do the
     rest).

Step 3's disjoint-cover property (every model in exactly one process's
shard) is what keeps an epoch a true epoch; tests/test_data.py proves it.
"""

from __future__ import annotations

import jax


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, **kw):
    """Idempotent ``jax.distributed.initialize`` wrapper.

    Call once per process before first device use. All arguments are
    optional on Cloud TPU (auto-discovered from metadata); on CPU/GPU
    fleets pass ``coordinator_address='host0:port'``, ``num_processes``
    and ``process_id`` explicitly. A single-process run (or an already
    initialized runtime) is a no-op, so CLIs can call it unconditionally.
    """
    if jax.process_count() > 1:
        return  # already initialized by a prior call / test harness
    if num_processes is not None and int(num_processes) <= 1:
        return
    if coordinator_address is None and num_processes is None:
        # single-host default: nothing to coordinate. (On Cloud TPU pods,
        # jax.distributed.initialize() with no args is required and
        # auto-discovers — callers there pass num_processes=0 sentinel or
        # use the explicit args.)
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id, **kw,
    )


def process_shard():
    """This process's ``(shard_index, num_shards)`` for input sharding."""
    return jax.process_index(), jax.process_count()
