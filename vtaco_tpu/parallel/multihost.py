"""Multi-host (multi-process) runtime helpers.

The reference's only input parallelism is torch DataLoader workers inside
one process (train.py:63-77). On TPU pods each *host* owns a slice of the
chips and runs its own Python process, so the generalization is:

  1. every process calls :func:`initialize_distributed` once, before any
     device use — on Cloud TPU the coordinator/process_id arguments are
     discovered automatically from the TPU metadata (set
     ``VTACO_DISTRIBUTED=1`` or pass ``auto=True`` to opt in);
  2. the global ``jax.sharding.Mesh`` is built from ``jax.devices()``
     (ALL chips, every process sees the same list) exactly as on a single
     host — ``parallel/mesh.py`` needs no changes;
  3. each process feeds only the batch rows that live on ITS chips:
     the dataset is sharded at the model-list level with
     :func:`process_shard` (``data.shard_by_process: true``), and
     ``parallel.mesh.shard_batch`` assembles the global batch via
     ``jax.make_array_from_process_local_data`` whenever
     ``jax.process_count() > 1`` (per-process locals stay host-local;
     XLA collectives do the rest). The global batch is therefore
     ``process_count × per-process rows``.

Step 3's disjoint-cover property (every model in exactly one process's
shard) is what keeps an epoch a true epoch; tests/test_data.py proves it.
"""

from __future__ import annotations

import os

import jax


def _already_initialized() -> bool:
    """True iff jax.distributed.initialize already ran in this process.

    Deliberately avoids ``jax.process_count()``: that call initializes the
    XLA backends as a side effect, after which ``jax.distributed.initialize``
    permanently raises — the one thing an idempotence probe must not do.
    ``global_state.client`` is private API, so fall back to assuming
    "not initialized" if it moves (the worst case is then JAX's own clear
    RuntimeError on a genuine double call).
    """
    try:
        from jax._src import distributed
        return distributed.global_state.client is not None
    except Exception:
        return False


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, auto=None, **kw):
    """Idempotent ``jax.distributed.initialize`` wrapper.

    Call once per process before first device use. Three modes:

    * explicit (CPU/GPU fleets): pass ``coordinator_address='host0:port'``,
      ``num_processes`` (>1) and ``process_id``;
    * auto-discovery (Cloud TPU pods): pass ``auto=True`` or set
      ``VTACO_DISTRIBUTED=1`` — calls ``jax.distributed.initialize()``
      with no arguments, which discovers everything from TPU metadata;
    * single host (default): a no-op, so CLIs can call this
      unconditionally.
    """
    if _already_initialized():
        return
    if auto is None:
        auto = os.environ.get("VTACO_DISTRIBUTED", "0") not in ("", "0")
    if coordinator_address is None and not auto:
        return  # single-host default: nothing to coordinate
    if num_processes is not None and int(num_processes) <= 1:
        return
    if coordinator_address is None:
        jax.distributed.initialize(**kw)  # Cloud TPU auto-discovery
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id, **kw,
    )


def process_shard():
    """This process's ``(shard_index, num_shards)`` for input sharding."""
    return jax.process_index(), jax.process_count()
