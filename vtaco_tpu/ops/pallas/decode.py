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


def _trunk_kernel(n_blocks, dtype,
                  w_in, b_in, wcp, bcp, w0, b0, w1, b1, w_out, b_out,
                  x_ref, feats_ref, out_ref):
    """x_ref: (in_dim, T) input projection operand (coords [+ c_img]);
    feats_ref: (C, T) interpolated features; out_ref: (1, T) logits.

    The n_blocks conditioning projections all consume the same `feats`,
    so they run as ONE (n_blocks·h, C) @ (C, T) dot up front — a 5×
    taller matmul uses the 128-row MXU far better than five 32-row dots
    (the per-block h=32 is only a quarter of the systolic array), and
    the f32 `cond` rows are then added into the residual chain by static
    slicing."""

    def dot(w, x):
        return jax.lax.dot_general(
            w[:], x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # feats may be stored narrower (bf16) than the compute dtype: the
    # cast happens in VMEM, the MXU dots stay `dtype` (f32 — this Mosaic
    # toolchain rejects bf16 MXU dots).
    feats = feats_ref[:].astype(dtype)
    h_dim = w_in.shape[0]
    cond = dot(wcp, feats) + bcp[:]                      # (n_blocks·h, T)
    net = dot(w_in, x_ref[:].astype(dtype)) + b_in[:]
    for i in range(n_blocks):
        net = net + cond[i * h_dim:(i + 1) * h_dim]
        h = dot(w0[i], jnp.maximum(net, 0.0).astype(dtype)) + b0[i]
        dx = dot(w1[i], jnp.maximum(h, 0.0).astype(dtype)) + b1[i]
        net = net + dx
    out = dot(w_out, jnp.maximum(net, 0.0).astype(dtype)) + b_out[:]
    out_ref[:] = out.astype(out_ref.dtype)


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
