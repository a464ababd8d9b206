"""Tensor parallelism over the mesh's ``model`` axis.

The reference is strictly single-GPU (SURVEY.md §2.8) — TP is new
capability here. Design: GSPMD-style. Parameters are *committed* to a
``NamedSharding`` that partitions the widest weight axis (conv output
channels / dense output features) over ``model``; XLA's SPMD partitioner
propagates the layout through the forward/backward program and inserts
the all-gathers / reduce-scatters itself — no hand-written collectives.

What gets sharded (shape-driven rule, no name matching):

  * rank ≥ 2 kernels — last axis (Flax puts output channels/features
    last for both ``nn.Conv`` NDHWC kernels ``(k,k,k,Cin,Cout)`` and
    ``nn.Dense`` ``(in,out)``), when it divides the ``model`` size with
    ≥ MIN_SHARD elements per chip. In the flagship VTacO model this
    covers the UNet3D convs (the measured train-step hot spot — 1.3M of
    4.2M pointcloud-path params in dec0 alone) and every dense layer
    wide enough to matter.
  * rank-1 vectors (bias / norm scale / batch_stats moments) under the
    same divisibility rule, so they co-locate with the kernels that
    produce their channel axis.
  * everything else (scalars, RNG keys, odd-sized leaves) — replicated.

Optimizer state needs no special casing: Adam's ``mu``/``nu`` mirror the
param shapes, so the same leaf-wise rule gives them the matching layout.

Use :func:`shard_state` to place a ``TrainState`` (params + batch_stats +
opt_state) for a ``model>1`` mesh; the batch stays sharded on ``data``
(trainer.prepare_batch), giving combined DP×TP on a 2D mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Minimum elements per chip on the sharded axis. 16 keeps the smallest
# UNet3D level (C=32, model=2) shardable; below that the padding cost on
# the 128-wide lane dimension outweighs any memory win.
MIN_SHARD = 16


def tp_spec(shape, model_size: int, min_shard: int = MIN_SHARD) -> P:
    """PartitionSpec for one array: last axis over ``model`` if it
    divides evenly with ≥ ``min_shard`` elements per chip, else
    replicated."""
    if model_size <= 1 or not shape:
        return P()
    last = shape[-1]
    if last % model_size == 0 and last // model_size >= min_shard:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def tp_sharding(mesh: Mesh, tree, min_shard: int = MIN_SHARD):
    """NamedSharding pytree for any params-like tree under ``mesh``."""
    model_size = mesh.shape.get("model", 1)
    return jax.tree.map(
        lambda x: NamedSharding(
            mesh, tp_spec(getattr(x, "shape", ()), model_size, min_shard)
        ),
        tree,
    )


def shard_state(mesh: Mesh, state, min_shard: int = MIN_SHARD):
    """Place a TrainState on the mesh with TP param sharding.

    With ``model == 1`` this degenerates to full replication (the same
    placement :func:`vtaco_tpu.parallel.mesh.replicate` gives).
    """
    return jax.device_put(state, tp_sharding(mesh, state, min_shard))
