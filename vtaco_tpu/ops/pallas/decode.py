"""Pallas fused occupancy-decode trunk.

One kernel evaluates the whole conditioned ResNet-FC decoder for a tile of
query points: features, coordinates and (optional) per-point tactile
features stream through VMEM once; all twelve small matmuls and the
residual/ReLU chain happen on-chip without materializing a single
intermediate in HBM. This is the fusion XLA cannot be relied on to do for
a 17-layer chain (each (C, N) intermediate is ~134 MB at n=2M).

Layout contract: channels-first (C, N) activations — points ride the
128-wide lane dimension (see ops.fast_trunk). Weights are packed once per
parameter set with ``pack_trunk_params``:

  w_in  (32, in_dim)    input projection, pre-transposed
  b_in  (32, 1)
  wc/w0/w1 (5, 32, 32)  per-block conditioning / fc_0 / fc_1, pre-transposed
  bc/b0/b1 (5, 32, 1)
  w_out (1, 32), b_out (1, 1)

Matmuls accumulate in f32 (preferred_element_type); compute dtype of the
streamed tensors is the caller's choice (bf16 halves HBM traffic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_trunk_params(tp, with_img: bool, dtype=jnp.float32):
    """ops.fast_trunk.extract_trunk_params output → packed kernel arrays."""
    n_blocks = len(tp["blocks"])
    k_in, b_in = tp["fc_p_img"] if with_img else tp["fc_p"]
    packed = {
        "w_in": jnp.asarray(k_in.T, dtype),               # (32, in)
        "b_in": jnp.asarray(b_in.reshape(-1, 1), dtype),
        "wc": jnp.stack([jnp.asarray(k.T, dtype) for k, _ in tp["fc_c"]]),
        "bc": jnp.stack(
            [jnp.asarray(b.reshape(-1, 1), dtype) for _, b in tp["fc_c"]]
        ),
        "w0": jnp.stack(
            [jnp.asarray(w0.T, dtype) for w0, _, _, _ in tp["blocks"]]
        ),
        "b0": jnp.stack(
            [jnp.asarray(b0.reshape(-1, 1), dtype) for _, b0, _, _ in tp["blocks"]]
        ),
        "w1": jnp.stack(
            [jnp.asarray(w1.T, dtype) for _, _, w1, _ in tp["blocks"]]
        ),
        "b1": jnp.stack(
            [jnp.asarray(b1.reshape(-1, 1), dtype) for _, _, _, b1 in tp["blocks"]]
        ),
        "w_out": jnp.asarray(tp["fc_out"][0].T, dtype),   # (1, 32)
        "b_out": jnp.asarray(tp["fc_out"][1].reshape(-1, 1), dtype),
    }
    return packed


def _dot(w, x):
    return jax.lax.dot_general(
        w, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mlp_chain(n_blocks, dtype, wcp, bcp, w0, b0, w1, b1, w_out, b_out,
               feats, net):
    """The conditioned ResNet-FC chain, given the post-input-projection
    activations `net` (h, T) and interpolated features `feats` (C, T),
    both already in registers/VMEM values.

    The n_blocks conditioning projections all consume the same `feats`,
    so they run as ONE (n_blocks·h, C) @ (C, T) dot up front — a 5×
    taller matmul uses the 128-row MXU far better than five 32-row dots
    (the per-block h=32 is only a quarter of the systolic array), and
    the f32 `cond` rows are then added into the residual chain by static
    slicing."""
    h_dim = net.shape[0]
    cond = _dot(wcp[:], feats) + bcp[:]                  # (n_blocks·h, T)
    for i in range(n_blocks):
        net = net + cond[i * h_dim:(i + 1) * h_dim]
        h = _dot(w0[i], jnp.maximum(net, 0.0).astype(dtype)) + b0[i]
        dx = _dot(w1[i], jnp.maximum(h, 0.0).astype(dtype)) + b1[i]
        net = net + dx
    return _dot(w_out[:], jnp.maximum(net, 0.0).astype(dtype)) + b_out[:]


def _trunk_kernel(n_blocks, dtype,
                  w_in, b_in, wcp, bcp, w0, b0, w1, b1, w_out, b_out,
                  x_ref, feats_ref, out_ref):
    """x_ref: (in_dim, T) input projection operand (coords [+ c_img]);
    feats_ref: (C, T) interpolated features; out_ref: (1, T) logits."""
    # feats may be stored narrower (bf16) than the compute dtype: the
    # cast happens in VMEM, the MXU dots stay `dtype` (f32 — this Mosaic
    # toolchain rejects bf16 MXU dots).
    feats = feats_ref[:].astype(dtype)
    net = _dot(w_in[:], x_ref[:].astype(dtype)) + b_in[:]
    out = _mlp_chain(n_blocks, dtype, wcp, bcp, w0, b0, w1, b1, w_out,
                     b_out, feats, net)
    out_ref[:] = out.astype(out_ref.dtype)


def _trunk_gated_kernel(n_blocks, n_fingers, dtype, r2,
                        active_ref,
                        w_in, b_in, wcp, bcp, w0, b0, w1, b1, w_out, b_out,
                        q, q2, gfeat_t, x_ref, feats_ref, out_ref,
                        c_img_ref):
    """Contact-gated trunk: the gating distance field never leaves VMEM.

    The XLA composition materializes a (5K, N) squared-distance matrix in
    HBM (≥5 GB at 128³) plus the gathered (C, N) per-point tactile
    features; here each tile computes its (K, T) distances per finger as
    one small MXU dot, reduces them to a hit mask on the VPU, selects the
    finger feature column in a VMEM scratch and feeds the input
    projection directly — HBM sees only coords + interpolated feats.

    ``active_ref`` (n_tiles, n_fingers) is a scalar-prefetched
    conservative tile×finger activity mask (host-computed from the tile
    bounding boxes — a finger whose every valid contact point is farther
    than `radius` from the tile's AABB cannot gate any of its points):
    inactive fingers skip their distance dot entirely via pl.when.
    Contacts cover a tiny fraction of the query box in real captures, so
    most tiles skip all five dots and run at ungated speed.

    q (5K, 3) contact points; q2 (5K, 1) their squared norms with invalid
    rows poisoned to 1e30 (so they can never pass the radius test — this
    replaces the boolean validity mask); gfeat_t (C, 5) per-finger
    features. Reference semantics (fast_trunk.gate_contact_cn /
    generation.py:248-255): within-radius test per contact point, any()
    per finger, the LAST touching finger wins, untouched points get zero
    features. x_ref holds coords only (3, T); w_in is the (h, 3+C)
    forward_img projection, split statically into its coord and c_img
    halves."""
    i = pl.program_id(0)
    K = q.shape[0] // n_fingers
    p = x_ref[:].astype(dtype)                           # (3, T)
    feats = feats_ref[:].astype(dtype)
    c_img_ref[:] = jnp.zeros_like(c_img_ref)
    # scalar-prefetch refs live in SMEM: only scalar loads are legal, so
    # the gate is one pl.when per finger (no vector any-active row load).
    # active_ref is a per-tile finger BITMASK (n_tiles,) int32 — a 2D
    # (n_tiles, n_fingers) array would be lane-padded to 128 in SMEM
    # (n_tiles × 512 B), which overflows the 1 MB SMEM budget beyond
    # ~2000 tiles; the packed form costs 4 B/tile.
    p2 = jnp.sum(p * p, axis=0, keepdims=True)           # (1, T)
    for f in range(n_fingers):
        @pl.when(((active_ref[i] >> f) & 1) != 0)
        def _finger(f=f):
            qf = q[f * K:(f + 1) * K, :]                 # (K, 3)
            q2f = q2[f * K:(f + 1) * K, :]               # (K, 1)
            d2 = q2f + p2 - 2.0 * _dot(qf, p)            # (K, T)
            hit = jnp.max(
                jnp.where(d2 < r2, 1.0, 0.0), axis=0, keepdims=True
            )                                            # (1, T)
            c_img_ref[:] = jnp.where(
                hit > 0.0, gfeat_t[:, f:f + 1], c_img_ref[:]
            )

    net = (
        _dot(w_in[:, :3], p)
        + _dot(w_in[:, 3:], c_img_ref[:].astype(dtype))
        + b_in[:]
    )
    out = _mlp_chain(n_blocks, dtype, wcp, bcp, w0, b0, w1, b1, w_out,
                     b_out, feats, net)
    out_ref[:] = out.astype(out_ref.dtype)


def _hat(v):
    """Linear hat kernel max(0, 1-|v|) — trilinear weight of a node at
    integer offset t for in-super position g is _hat(g - t)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(v))


def _window_interp(reso, n1, S, L, padding, base_col, vol_a, vol_b, p):
    """In-kernel trilinear interpolation from a VMEM window of the
    super-cell-packed volume (ops.dense_decode.supercell_packed_volume).

    ``p`` (3, T) f32 world coords whose super-cell ids all lie in
    ``[base_col, base_col + 2S)`` (the caller's sort + window-base
    contract; out-of-window points clamp to the window edge and return
    garbage — the XLA wrapper counts them so the caller can fall back).
    Selection is one MXU pass: block ((L+1)³C, 2S) @ one-hot (2S, T) —
    split into (L+1) z-grouped dots with the z-axis hat weight riding
    the one-hot columns (column scaling commutes with the dot) — then
    per-axis hat weights reduce to (C, T) on the VPU. At L=1 the
    payload is the 2×2×2 corner block (8C) and the dots are two
    (4C, 2S) @ (2S, T) — MXU-shaped at C=32/S=128. The coordinate math
    replicates scattered_grid_features_cn exactly.
    """
    W = reso
    P = L + 1
    u = p / (1 + padding + 10e-4) + 0.5
    u = jnp.where(u >= 1.0, 1 - 10e-4, jnp.maximum(u, 0.0))
    x = jnp.clip(u[0] * (W - 1), 0.0, W - 1)
    y = jnp.clip(u[1] * (W - 1), 0.0, W - 1)
    z = jnp.clip(u[2] * (W - 1), 0.0, W - 1)
    x0 = jnp.minimum(jnp.floor(x), W - 2).astype(jnp.int32)
    y0 = jnp.minimum(jnp.floor(y), W - 2).astype(jnp.int32)
    z0 = jnp.minimum(jnp.floor(z), W - 2).astype(jnp.int32)
    sx, sy, sz = x0 // L, y0 // L, z0 // L
    s = sx + n1 * (sy + n1 * sz)
    T = p.shape[1]
    local = jnp.clip(s - base_col, 0, 2 * S - 1)
    block = jnp.concatenate([vol_a[:], vol_b[:]], axis=1)   # (P³C, 2S)
    C = block.shape[0] // P ** 3
    # in-super node positions g ∈ [0, L+1); weight of offset t = hat(g-t)
    gx = x - float(L) * sx.astype(jnp.float32)
    gy = y - float(L) * sy.astype(jnp.float32)
    gz = z - float(L) * sz.astype(jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (2 * S, T), 0)
    eq = iota == local[None, :]
    PC = P * C
    fz = sum(
        jax.lax.dot_general(
            block[t * P * PC:(t + 1) * P * PC],
            jnp.where(eq, _hat(gz - t)[None, :], 0.0),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for t in range(P)
    )                                                       # (P²C, T)
    fy = sum(_hat(gy - t)[None, :] * fz[t * PC:(t + 1) * PC]
             for t in range(P))                             # (PC, T)
    return sum(_hat(gx - t)[None, :] * fy[t * C:(t + 1) * C]
               for t in range(P))                           # (C, T)


def _trunk_window_kernel(n_blocks, reso, n1, S, L, padding, in_dim, dtype,
                         kblk_ref,
                         w_in, b_in, wcp, bcp, w0, b0, w1, b1, w_out, b_out,
                         vol_a, vol_b, x_ref, out_ref):
    """Sorted windowed decode: interpolation AND trunk in one kernel —
    the gather never exists. x_ref (in_dim, T): rows 0-2 are world
    coords, optional extra rows (e.g. a precomputed 'tips' c_img) join
    the input projection only."""
    i = pl.program_id(0)
    xin = x_ref[:].astype(dtype)
    p = xin[:3]
    feats = _window_interp(reso, n1, S, L, padding, kblk_ref[i] * S,
                           vol_a, vol_b, p)
    net = _dot(w_in[:], xin) + b_in[:]
    out = _mlp_chain(n_blocks, dtype, wcp, bcp, w0, b0, w1, b1, w_out,
                     b_out, feats.astype(dtype), net)
    out_ref[:] = out.astype(out_ref.dtype)


def _trunk_window_gated_kernel(n_blocks, n_fingers, reso, n1, S, L, padding,
                               dtype, r2,
                               kblk_ref, active_ref,
                               w_in, b_in, wcp, bcp, w0, b0, w1, b1,
                               w_out, b_out,
                               q, q2, gfeat_t, vol_a, vol_b, x_ref, out_ref,
                               c_img_ref):
    """Windowed decode with contact gating fused in (same gating
    semantics as _trunk_gated_kernel)."""
    i = pl.program_id(0)
    K = q.shape[0] // n_fingers
    p = x_ref[:].astype(dtype)                               # (3, T)
    feats = _window_interp(reso, n1, S, L, padding, kblk_ref[i] * S,
                           vol_a, vol_b, p)
    c_img_ref[:] = jnp.zeros_like(c_img_ref)
    p2 = jnp.sum(p * p, axis=0, keepdims=True)
    # active_ref: per-tile finger bitmask (see _trunk_gated_kernel — the
    # 2D mask form lane-pads to 1 MB of SMEM at 2048 tiles)
    for f in range(n_fingers):
        @pl.when(((active_ref[i] >> f) & 1) != 0)
        def _finger(f=f):
            qf = q[f * K:(f + 1) * K, :]
            q2f = q2[f * K:(f + 1) * K, :]
            d2 = q2f + p2 - 2.0 * _dot(qf, p)
            hit = jnp.max(
                jnp.where(d2 < r2, 1.0, 0.0), axis=0, keepdims=True
            )
            c_img_ref[:] = jnp.where(
                hit > 0.0, gfeat_t[:, f:f + 1], c_img_ref[:]
            )

    net = (
        _dot(w_in[:, :3], p)
        + _dot(w_in[:, 3:], c_img_ref[:].astype(dtype))
        + b_in[:]
    )
    out = _mlp_chain(n_blocks, dtype, wcp, bcp, w0, b0, w1, b1, w_out,
                     b_out, feats.astype(dtype), net)
    out_ref[:] = out.astype(out_ref.dtype)


def fused_trunk_window_cn(packed, vol, p_cn, *, reso, n1, padding, L=1,
                          c_img_cn=None, gate_pts=None, gate_feat=None,
                          gate_valid=None, radius=0.015,
                          S=128, tile=1024, dtype=jnp.float32,
                          interpret=False):
    """Sorted windowed decode trunk: NO per-point gather anywhere.

    The scattered-decode device floor was the 2M-row corner-packed take
    (~49 ms at 2.1M points — TPU gathers are row-issue-bound, DESIGN.md
    §Scattered decode). Here the caller sorts queries by super-cell id
    (ops.dense_decode.supercell_keys — device lax.sort costs ~2.5 ms at
    2.1M, or free if the host pre-sorts) and each tile of `tile`
    consecutive points reads a 2S-super window of the packed `vol`
    (supercell_packed_volume) into VMEM via two scalar-prefetch-indexed
    blocks; per-point selection is one (27C, 2S) @ one-hot MXU dot and
    hat-weight reduction (_window_interp), feeding the same fused MLP.

    Args:
      packed: pack_trunk_params output (with_img=True when gating).
      vol: (27C, n_cols) from supercell_packed_volume (n_cols % S == 0).
      p_cn: (3, N) f32 world coords, SORTED by supercell_keys, N % tile
        == 0 (pad with copies of a real point).
      c_img_cn: optional (Ci, N) extra input-projection rows (tips
        gating), sorted with the points.
      gate_pts/gate_feat/gate_valid: contact gating (fused, same
        semantics as fused_trunk_gated_cn); mutually exclusive with
        c_img_cn.
    Returns (logits (N,) f32, n_overflow int32) — n_overflow counts
    points whose super-cell fell outside their tile's window (possible
    only for pathologically sparse/adversarial sorts given S·tile
    budgets); their logits are garbage and the caller must fall back.
    """
    from vtaco_tpu.ops.dense_decode import supercell_keys

    C27, n_cols = vol.shape
    C = C27 // (L + 1) ** 3
    _, N = p_cn.shape
    if N % tile:
        raise ValueError(f"N={N} must be a multiple of tile={tile}")
    if n_cols % S:
        raise ValueError(f"vol cols {n_cols} not a multiple of S={S}")
    n_tiles = N // tile
    n_blk = n_cols // S
    n_blocks = packed["wc"].shape[0]
    h_dim = packed["w_in"].shape[0]

    keys = supercell_keys(p_cn, reso, padding, L)            # (N,) int32
    kblk = jnp.clip(keys[::tile] // S, 0, n_blk - 2)         # (n_tiles,)
    local = keys.reshape(n_tiles, tile) - (kblk * S)[:, None]
    n_overflow = jnp.sum((local < 0) | (local >= 2 * S)).astype(jnp.int32)

    wcp = packed["wc"].reshape(n_blocks * h_dim, -1)
    bcp = packed["bc"].reshape(n_blocks * h_dim, 1)
    vol_specs = [
        pl.BlockSpec((C27, S), lambda i, s: (0, s[i]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C27, S), lambda i, s: (0, s[i] + 1),
                     memory_space=pltpu.VMEM),
    ]

    if gate_pts is not None:
        n_fingers, K, _ = gate_pts.shape
        q = gate_pts.reshape(n_fingers * K, 3).astype(jnp.float32)
        valid_col = gate_valid.reshape(n_fingers * K, 1)
        q2 = jnp.where(
            valid_col, jnp.sum(q * q, axis=1, keepdims=True),
            jnp.float32(1e30),
        )
        # conservative tile×finger activity mask over tile AABBs (same
        # construction as fused_trunk_gated_cn; sorted tiles are spatially
        # tighter, so the skip mask only gets better)
        pt = p_cn.astype(jnp.float32).reshape(3, n_tiles, tile)
        lo = jnp.min(pt, axis=2)
        hi = jnp.max(pt, axis=2)
        clamped = jnp.clip(q.T[:, :, None], lo[:, None, :], hi[:, None, :])
        d2_box = jnp.sum((clamped - q.T[:, :, None]) ** 2, axis=0)
        within = (d2_box <= radius * radius) & valid_col
        if n_fingers > 31:
            raise ValueError(f"n_fingers={n_fingers} > 31 (bitmask)")
        active = jnp.any(
            within.reshape(n_fingers, K, n_tiles), axis=1
        ).T.astype(jnp.int32)
        # pack to a per-tile bitmask: SMEM stores scalar-prefetch arrays
        # lane-padded, so (n_tiles, 5) int32 costs 512 B/tile — 1 MB (the
        # whole SMEM budget) at the 2048 tiles of a 2.1M-point decode
        active = jnp.sum(
            active << jnp.arange(n_fingers, dtype=jnp.int32)[None, :],
            axis=1, dtype=jnp.int32,
        )

        kernel = functools.partial(
            _trunk_window_gated_kernel, n_blocks, n_fingers, reso, n1, S,
            L, padding, dtype, float(radius) * float(radius),
        )
        const_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(13)
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=const_specs + [
                pl.BlockSpec((C27, S), lambda i, s, a: (0, s[i]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C27, S), lambda i, s, a: (0, s[i] + 1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, tile), lambda i, s, a: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile), lambda i, s, a: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((C, tile), jnp.float32)],
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(
            kblk, active,
            packed["w_in"], packed["b_in"], wcp, bcp,
            packed["w0"], packed["b0"], packed["w1"], packed["b1"],
            packed["w_out"], packed["b_out"],
            q, q2, gate_feat.T.astype(jnp.float32),
            vol, vol, p_cn.astype(jnp.float32),
        )
        return out[0], n_overflow

    x = p_cn.astype(jnp.float32)
    if c_img_cn is not None:
        x = jnp.concatenate([x, c_img_cn.astype(jnp.float32)], axis=0)
    in_dim = x.shape[0]
    kernel = functools.partial(
        _trunk_window_kernel, n_blocks, reso, n1, S, L, padding, in_dim,
        dtype,
    )
    weight_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(10)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=weight_specs + vol_specs + [
            pl.BlockSpec((in_dim, tile), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i, s: (0, i),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        kblk,
        packed["w_in"], packed["b_in"], wcp, bcp,
        packed["w0"], packed["b0"], packed["w1"], packed["b1"],
        packed["w_out"], packed["b_out"],
        vol, vol, x,
    )
    return out[0], n_overflow


def fused_trunk_cn(packed, p_cn, feats_cn, c_img_cn=None, *,
                   tile=None, dtype=jnp.float32, store_dtype=None,
                   interpret=False):
    """Fused decoder trunk over (C, N) activations.

    Args:
      packed: pack_trunk_params output.
      p_cn: (3, N) coordinates; feats_cn: (C, N); c_img_cn optional (C, N).
      tile: points per kernel instance. None picks the v5e-measured
        optimum: 2048 for ≤2²²-point f32 grids (88.5 M pts/s at 128³),
        4096 above (68.6 M at 256³) and for bf16 storage (90.9 M at
        128³). 8192 exceeds VMEM with the f32 packed-cond buffers, and
        vmapped (batched) callers crash the Mosaic compile below 4096 —
        they must pass tile=4096 explicitly (see
        Generator3D.decode_dense_batched).
      store_dtype: HBM storage dtype for the streamed per-point tensors
        (feats/coords/c_img). bf16 halves the kernel's HBM read traffic
        (measured +11% at 256³); the in-kernel cast restores `dtype`
        before any MXU dot, so the matmul math is unaffected (only the
        streamed operands are rounded). None = store in `dtype`.
    Returns (N,) float32 logits. Any N: inputs are zero-padded up to a
    multiple of `tile` (never shrink the tile — odd N, e.g. the MISE
    coarse grid's (reso+1)³, would collapse it to 1 lane, and Mosaic
    rejects tiny tiles in vmapped callers).
    """
    C, N = feats_cn.shape
    if store_dtype is None:
        store_dtype = dtype
    if tile is None:
        if jnp.dtype(store_dtype).itemsize < 4:
            tile = 4096
        else:
            tile = 2048 if N <= 2 ** 22 else 4096
    if N < tile:
        # single instance; keep the lane width register-aligned
        tile = min(tile, max(128, -(-N // 128) * 128))
    n_blocks = packed["wc"].shape[0]

    x = p_cn.astype(store_dtype)
    if c_img_cn is not None:
        x = jnp.concatenate([x, c_img_cn.astype(store_dtype)], axis=0)
    n_pad = (-N) % tile
    if n_pad:
        x = jnp.pad(x, ((0, 0), (0, n_pad)))
        feats_cn = jnp.pad(feats_cn, ((0, 0), (0, n_pad)))
    np_total = N + n_pad
    in_dim = x.shape[0]

    kernel = functools.partial(_trunk_kernel, n_blocks, dtype)

    weight_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(10)
    ]
    grid_spec = pl.GridSpec(
        grid=(np_total // tile,),
        in_specs=weight_specs + [
            pl.BlockSpec((in_dim, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )
    h_dim = packed["w_in"].shape[0]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, np_total), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        packed["w_in"], packed["b_in"],
        packed["wc"].reshape(n_blocks * h_dim, -1),
        packed["bc"].reshape(n_blocks * h_dim, 1),
        packed["w0"], packed["b0"], packed["w1"], packed["b1"],
        packed["w_out"], packed["b_out"],
        x, feats_cn.astype(store_dtype),
    )
    return out[0, :N]


def fused_trunk_gated_cn(packed, p_cn, feats_cn, gate_pts, gate_feat,
                         gate_valid, *, radius=0.015, tile=None,
                         dtype=jnp.float32, store_dtype=None,
                         interpret=False):
    """Contact-gated fused trunk: gating + decoder in one kernel.

    Equivalent to ``fast_trunk.gate_contact_cn`` feeding
    :func:`fused_trunk_cn`, but the (5K, N) distance field and the (C, N)
    gated feature matrix are never materialized in HBM — each tile
    recomputes its gating from the (5K, 3) contact points resident in
    VMEM (a few KB). ``packed`` must be the ``with_img=True`` packing
    (w_in is the (h, 3+C) forward_img projection).

    Args:
      gate_pts: (5, K, 3) per-finger contact points.
      gate_feat: (5, C) per-finger tactile features.
      gate_valid: (5, K) bool validity (padding mask).
      radius: contact-assignment radius (generation.py:251).
    Returns (N,) float32 logits.
    """
    C, N = feats_cn.shape
    if store_dtype is None:
        store_dtype = dtype
    if tile is None:
        if jnp.dtype(store_dtype).itemsize < 4:
            tile = 4096
        else:
            tile = 2048 if N <= 2 ** 22 else 4096
    if N < tile:
        tile = min(tile, max(128, -(-N // 128) * 128))
    n_blocks = packed["wc"].shape[0]
    n_fingers, K, _ = gate_pts.shape

    # invalid contact rows: poison the |q|² term so the radius test can
    # never pass (replaces the boolean mask inside the kernel)
    q = gate_pts.reshape(n_fingers * K, 3).astype(jnp.float32)
    valid_col = gate_valid.reshape(n_fingers * K, 1)
    q2 = jnp.where(
        valid_col,
        jnp.sum(q * q, axis=1, keepdims=True),
        jnp.float32(1e30),
    )

    x = p_cn.astype(store_dtype)
    # the activity mask must bound the coords the KERNEL sees — i.e. the
    # store_dtype-rounded values, not the f32 originals (a bf16-rounded
    # point can drift ~1e-3 past an f32 bounding box)
    p32 = x.astype(jnp.float32)
    n_pad = (-N) % tile
    if n_pad:
        # pad coords with a far-away sentinel so padding can't activate a
        # tile's gating (the padded logits are sliced off anyway)
        x = jnp.pad(x, ((0, 0), (0, n_pad)))
        p32 = jnp.pad(p32, ((0, 0), (0, n_pad)), constant_values=1e3)
        feats_cn = jnp.pad(feats_cn, ((0, 0), (0, n_pad)))
    np_total = N + n_pad
    n_tiles = np_total // tile

    # conservative tile×finger activity mask (scalar-prefetched): a finger
    # is active for a tile iff some VALID contact point is within `radius`
    # of the tile's axis-aligned bounding box — tiles far from every
    # contact then skip all distance dots inside the kernel. Exactness is
    # preserved: any point that could pass the radius test keeps its
    # finger active.
    pt = p32.reshape(3, n_tiles, tile)
    lo = jnp.min(pt, axis=2)                              # (3, n_tiles)
    hi = jnp.max(pt, axis=2)
    clamped = jnp.clip(q.T[:, :, None], lo[:, None, :], hi[:, None, :])
    d2_box = jnp.sum((clamped - q.T[:, :, None]) ** 2, axis=0)  # (5K, n_tiles)
    within = (d2_box <= radius * radius) & valid_col      # (5K, n_tiles)
    if n_fingers > 31:
        raise ValueError(f"n_fingers={n_fingers} > 31 (bitmask)")
    active = jnp.any(
        within.reshape(n_fingers, K, n_tiles), axis=1
    ).T.astype(jnp.int32)                                 # (n_tiles, 5)
    # per-tile finger BITMASK: the 2D form lane-pads to 512 B/tile in
    # SMEM and overflows the 1 MB budget at ~2000 tiles (256³ decodes)
    active = jnp.sum(
        active << jnp.arange(n_fingers, dtype=jnp.int32)[None, :],
        axis=1, dtype=jnp.int32,
    )

    kernel = functools.partial(
        _trunk_gated_kernel, n_blocks, n_fingers, dtype,
        float(radius) * float(radius),
    )
    const_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(13)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=const_specs + [
            pl.BlockSpec((3, tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((C, tile), jnp.float32)],
    )
    h_dim = packed["w_in"].shape[0]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, np_total), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        active,
        packed["w_in"], packed["b_in"],
        packed["wc"].reshape(n_blocks * h_dim, -1),
        packed["bc"].reshape(n_blocks * h_dim, 1),
        packed["w0"], packed["b0"], packed["w1"], packed["b1"],
        packed["w_out"], packed["b_out"],
        q, q2, gate_feat.T.astype(jnp.float32),
        x, feats_cn.astype(store_dtype),
    )
    return out[0, :N]
