"""Iso-band sparse transfer for dense occupancy grids.

The dense-decode → marching-cubes path (reference
src/conv_onet/generation.py:268-272) only *interpolates* grid values at
corners of iso-crossing cells; every other vertex contributes nothing but
its sign. Shipping the full nx³ logit volume through a thin host link is
therefore almost entirely wasted payload (~8 MB f32 at 128³ vs ~0.8 MB of
band data for a typical object).

Device side (``band_extract``, traced inside the generator's dense-decode
program): compute the iso level in-program, classify every vertex
(1 bit each, packed little-endian), find iso-crossing cells, dilate to
their corner vertices ("active" set), and compact the active vertices'
exact f32 logits in flat scan order into a fixed-size buffer.

Host side (``band_reconstruct``): rebuild a full f32 grid — exact values
at active vertices, ``level ± 1`` elsewhere (only the sign vs ``level``
is ever consumed) — and hand it to the unchanged marching-cubes
implementation. The mesh is bit-identical to the full-transfer path
because every value marching cubes reads for interpolation is the exact
f32, and every sign test agrees with the shipped bit mask.

Fixed-size compaction caps keep shapes static for XLA; an overflow
(count > cap) is reported so callers can fall back to the full transfer.
"""

from __future__ import annotations

import numpy as np

_CORNER_OFFSETS = [
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
    (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1),
]


def default_cap(nx: int) -> int:
    """Active-vertex buffer size: 1/16 of the grid, at least 64k.

    Surface-area scaling: a closed surface at nx³ crosses O(nx²) cells
    (measured: ~20k crossing cells → ~60k active vertices for the
    synthetic objects at 128³), so nx³/16 (131072 at 128³) has several-x
    headroom while keeping the f32 payload to nx³/4 bytes.
    """
    return max(1 << 16, nx * nx * nx // 16)


def band_extract(logits_flat, nx: int, cap: int, level_mode,
                 level_const=0.0):
    """Trace-time band extraction (call inside a jitted program).

    Args:
      logits_flat: (nx³,) f32, flattened x-slowest (C-order of the
        (nx, nx, nx) grid the host will reconstruct).
      nx: grid resolution (static).
      cap: active-vertex buffer size (static).
      level_mode: 'midpoint' ((min+max)/2 — the skimage default the
        reference inherits), 'mean', or 'const' (use ``level_const``).
      level_const: traced scalar iso level for 'const' mode.
    Returns:
      count (int32 scalar) — true number of active vertices (may exceed
        ``cap``: overflow signal), level (f32 scalar), packed occupancy
        bits (uint8, ceil(nx³/8)), vals (f32, (cap,)) — active-vertex
        logits in flat scan order.
    """
    import jax.numpy as jnp

    n = nx * nx * nx
    logits_flat = logits_flat.astype(jnp.float32)
    if level_mode == "midpoint":
        level = (jnp.min(logits_flat) + jnp.max(logits_flat)) * 0.5
    elif level_mode == "mean":
        level = jnp.mean(logits_flat)
    elif level_mode == "const":
        level = jnp.asarray(level_const, jnp.float32)
    else:  # pragma: no cover - caller validates
        raise ValueError(f"bad level_mode {level_mode!r}")

    g = logits_flat.reshape(nx, nx, nx)
    occ = g > level  # identical comparison to marching_cubes

    m = nx - 1
    corners = [occ[dx:m + dx, dy:m + dy, dz:m + dz]
               for dx, dy, dz in _CORNER_OFFSETS]
    all8 = corners[0]
    any8 = corners[0]
    for cnr in corners[1:]:
        all8 = all8 & cnr
        any8 = any8 | cnr
    cross = any8 & ~all8  # (m, m, m) iso-crossing cells

    act = None
    for dx, dy, dz in _CORNER_OFFSETS:
        shifted = jnp.pad(cross, ((dx, 1 - dx), (dy, 1 - dy), (dz, 1 - dz)))
        act = shifted if act is None else act | shifted
    af = act.reshape(-1)

    idx = jnp.cumsum(af.astype(jnp.int32))
    count = idx[-1]
    pos = jnp.where(af & (idx <= cap), idx - 1, cap)
    vals = jnp.zeros((cap + 1,), jnp.float32).at[pos].set(logits_flat)[:cap]

    occf = occ.reshape(-1)
    if n % 8:
        occf = jnp.pad(occf, (0, 8 - n % 8))
    bits = occf.reshape(-1, 8).astype(jnp.uint8)
    packed = bits[:, 0]
    for i in range(1, 8):
        packed = packed | (bits[:, i] << i)
    return count, level, packed, vals


def band_marching_cubes(nx: int, level: float, count: int, packed, vals,
                        gradient: str = "ascent"):
    """Marching cubes straight from the band payload.

    Uses the native fused extractor (no intermediate grid) when
    available; falls back to reconstruct + scan. Output is identical
    either way (same classification bits, same exact corner values,
    same scan order).
    """
    packed = np.ascontiguousarray(packed, np.uint8)
    vals = np.ascontiguousarray(vals, np.float32)
    try:
        from vtaco_tpu import native

        verts, faces = native.mc.marching_cubes_band(nx, float(level),
                                                     int(count), packed,
                                                     vals)
        if gradient == "ascent":
            faces = faces[:, ::-1]
        return verts, faces
    except Exception:
        from vtaco_tpu.generate.marching_cubes import marching_cubes

        grid = band_reconstruct(nx, level, count, packed, vals)
        return marching_cubes(grid, level=level, gradient=gradient)


def band_reconstruct(nx: int, level: float, count: int, packed, vals):
    """Host: full (nx, nx, nx) f32 grid from the band payload.

    Exact f32 at active vertices; ``level ± 1`` elsewhere (sign-correct
    filler — marching cubes never interpolates those). Native C++ pass
    when available (one scan over cells), numpy fallback otherwise.
    """
    packed = np.ascontiguousarray(packed, np.uint8)
    vals = np.ascontiguousarray(vals, np.float32)
    try:
        from vtaco_tpu import native

        return native.mc.band_reconstruct(nx, float(level), int(count),
                                          packed, vals)
    except Exception:
        return _band_reconstruct_numpy(nx, float(level), int(count),
                                       packed, vals)


def _band_reconstruct_numpy(nx, level, count, packed, vals):
    n = nx * nx * nx
    occ = np.unpackbits(packed, bitorder="little")[:n].astype(bool)
    occ3 = occ.reshape(nx, nx, nx)

    m = nx - 1
    corners = [occ3[dx:m + dx, dy:m + dy, dz:m + dz]
               for dx, dy, dz in _CORNER_OFFSETS]
    all8 = corners[0].copy()
    any8 = corners[0].copy()
    for c in corners[1:]:
        all8 &= c
        any8 |= c
    cross = any8 & ~all8

    act = np.zeros((nx, nx, nx), bool)
    for dx, dy, dz in _CORNER_OFFSETS:
        act[dx:m + dx, dy:m + dy, dz:m + dz] |= cross

    grid = np.where(occ3, np.float32(level + 1.0), np.float32(level - 1.0))
    flat_idx = np.flatnonzero(act.reshape(-1))
    if flat_idx.size != count:
        raise ValueError(
            f"band payload inconsistent: mask implies {flat_idx.size} "
            f"active vertices, device counted {count}"
        )
    grid.reshape(-1)[flat_idx] = vals[:count]
    return grid
