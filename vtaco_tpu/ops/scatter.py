"""Point→cell scatter pooling (replaces the reference's torch_scatter CUDA
dependency, src/encoder/pointnet.py:5,93,108,124-127).

On TPU these are XLA segment reductions over a flattened (batch*cells)
segment space — no atomics, fully fused by XLA, differentiable.

Layout: per-point features are (B, N, C) channel-last; pooled cell features
are (B, S, C) with S = reso**2 (planes) or reso**3 (grids).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flat_segments(index, num_cells):
    """(B, N) int cell ids → (B*N,) global segment ids."""
    B, N = index.shape
    offs = (jnp.arange(B, dtype=index.dtype) * num_cells)[:, None]
    return (index + offs).reshape(-1)


def scatter_mean(src, index, num_cells: int):
    """Mean-pool per-point features into cells; empty cells are zero.

    Matches torch_scatter.scatter_mean with a zero-initialized ``out``
    (src/encoder/pointnet.py:91-93).

    Args:
      src:   (B, N, C) per-point features.
      index: (B, N) int32 cell ids in [0, num_cells).
    Returns:
      (B, num_cells, C)
    """
    B, N, C = src.shape
    seg = _flat_segments(index, num_cells)
    sums = jax.ops.segment_sum(src.reshape(B * N, C), seg, num_segments=B * num_cells)
    counts = jax.ops.segment_sum(
        jnp.ones((B * N, 1), src.dtype), seg, num_segments=B * num_cells
    )
    out = sums / jnp.maximum(counts, 1.0)
    return out.reshape(B, num_cells, C)


def scatter_max(src, index, num_cells: int):
    """Max-pool per-point features into cells; empty cells are zero.

    Matches torch_scatter.scatter_max (value output only) as used in
    LocalPoolPointnet.pool_local (src/encoder/pointnet.py:124-131) — there
    the result is only gathered back at occupied cells, so the empty-cell
    fill value is unobservable.
    """
    B, N, C = src.shape
    seg = _flat_segments(index, num_cells)
    out = jax.ops.segment_max(src.reshape(B * N, C), seg, num_segments=B * num_cells)
    out = jnp.where(jnp.isfinite(out), out, 0.0)
    return out.reshape(B, num_cells, C)


def gather_cells(cells, index):
    """Gather pooled cell features back to points.

    Equivalent of ``fea.gather(dim=2, index=index.expand(...))`` at
    src/encoder/pointnet.py:130.

    Args:
      cells: (B, S, C) pooled features.
      index: (B, N) int32 cell ids.
    Returns:
      (B, N, C)
    """
    return jnp.take_along_axis(cells, index[..., None], axis=1)
