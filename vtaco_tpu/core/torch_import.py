"""Import reference PyTorch checkpoints into the flax parameter tree.

The reference saves ``{'model': state_dict, 'optimizer': ..., scalars...}``
(src/checkpoints.py:28-40). This module translates its parameter names and
tensor layouts into our module tree so models trained with the original
code run here for parity testing.

Name translation (flax path → torch name), by module family:
  blocks       block3            → blocks.3
  cond layers  fc_c2             → fc_c.2
  pointnet     unet_mod / unet3d_mod → unet / unet3d
  UNet2D       down1/conv2       → down_convs.1.conv2
               up0/upconv        → up_convs.0.upconv
  UNet3D       enc2/SingleConv1/conv1      → encoders.2.basic_module.SingleConv1.conv
               dec0/SingleConv2/groupnorm0 → decoders.0.basic_module.SingleConv2.groupnorm
  ResNet       layer3_1/conv2    → layer3.1.conv2
               layer2_0/down_conv→ layer2.0.downsample.0 (down_bn → .1)
Tensor layouts: Linear weights transpose; Conv (O,I,*k) → (*k,I,O);
ConvTranspose (I,O,*k) → spatially-flipped (*k,I,O); BatchNorm weight/bias
→ scale/bias with running stats into batch_stats.
"""

from __future__ import annotations

import re
from typing import Tuple

import numpy as np


def _translate_path(path: Tuple[str, ...]) -> str:
    """Our param-tree path → torch dotted name prefix."""
    out = []
    for i, comp in enumerate(path):
        # TransformerFusion (fuser): the reference weight-ties all layer
        # clones (_get_clones shares one module), so layers.0 is the
        # canonical copy of every tensor; our single shared modules map
        # onto it (TransformerFusion.py:244-310)
        if comp == "self_attn":
            out.append("encoder.layers.0.self_attn")
            continue
        if comp == "cross_attn":
            out.append("decoder.layers.0.cross_attn")
            continue
        if comp == "encoder_pos_embed":
            out.append("encoder.layers.0.self_posembed.position_embedding_head")
            continue
        if comp == "decoder_pos_embed":
            out.append("decoder.layers.0.self_posembed.position_embedding_head")
            continue
        m = re.fullmatch(r"head(\d+)", comp)
        if m:
            out.append(f"head.{m.group(1)}")
            continue
        m = re.fullmatch(r"extra_nonlinear(\d+)", comp)
        if m:
            out.append(f"extra_nonlinear.{m.group(1)}")
            continue
        if i > 0 and path[i - 1].endswith("_pos_embed"):
            # PositionEmbeddingLearned Sequential: Conv1d, BatchNorm1d,
            # ReLU, Conv1d → indices 0, 1, 3
            out.append({"conv1": "0", "bn": "1", "conv2": "3"}[comp])
            continue
        if comp == "embedding":
            # IndexEncoder: our nn.Embed submodule vs the reference's bare
            # nn.Embedding (conv_onet/config.py:87-88) — drop the level
            continue
        m = re.fullmatch(r"block(\d+)", comp)
        if m:
            out.append(f"blocks.{m.group(1)}")
            continue
        m = re.fullmatch(r"fc_c(\d+)", comp)
        if m:
            out.append(f"fc_c.{m.group(1)}")
            continue
        if comp == "unet_mod":
            out.append("unet")
            continue
        if comp == "unet3d_mod":
            out.append("unet3d")
            continue
        m = re.fullmatch(r"down(\d+)", comp)
        if m:
            out.append(f"down_convs.{m.group(1)}")
            continue
        m = re.fullmatch(r"up(\d+)", comp)
        if m:
            out.append(f"up_convs.{m.group(1)}")
            continue
        m = re.fullmatch(r"enc(\d+)", comp)
        if m:
            out.append(f"encoders.{m.group(1)}.basic_module")
            continue
        m = re.fullmatch(r"dec(\d+)", comp)
        if m:
            out.append(f"decoders.{m.group(1)}.basic_module")
            continue
        m = re.fullmatch(r"layer(\d+)_(\d+)", comp)
        if m:
            out.append(f"layer{m.group(1)}.{m.group(2)}")
            continue
        if comp == "down_conv":
            out.append("downsample.0")
            continue
        if comp == "down_bn":
            out.append("downsample.1")
            continue
        m = re.fullmatch(r"(conv|groupnorm|batchnorm)(\d+)", comp)
        in_single_conv = i > 0 and bool(
            re.fullmatch(r"SingleConv\d", path[i - 1])
        )
        if m and (in_single_conv or comp not in ("conv1", "conv2", "conv3")):
            # UNet3D SingleConv sub-layers carry an order-string index we
            # drop (the reference names them plain 'conv'/'groupnorm' —
            # src/encoder/unet3d.py create_conv); outside SingleConv the
            # numbered convs (UNet2D down_convs conv1/conv2, ResNet convs)
            # keep their index
            out.append(m.group(1))
            continue
        out.append(comp)
    return ".".join(out)


def _to_flax_leaf(tname, tval, leaf_name, flax_shape):
    """Convert one torch tensor to the flax layout for `leaf_name`."""
    v = np.asarray(tval)
    if leaf_name == "kernel":
        if v.ndim == 2:
            out = v.T
        elif v.ndim == 3 and v.shape[2] == 1 and len(flax_shape) == 2:
            # pointwise Conv1d (O, I, 1) realized as a Dense here
            out = v[:, :, 0].T
        elif v.ndim in (4, 5):
            dims = v.ndim - 2
            if tuple(flax_shape) == tuple(
                v.transpose(tuple(range(2, 2 + dims)) + (1, 0)).shape
            ) and v.shape[0] != v.shape[1]:
                # regular conv: (O, I, *k) → (*k, I, O)
                out = v.transpose(tuple(range(2, 2 + dims)) + (1, 0))
            else:
                # ambiguous (square) or transpose conv — decide by name
                if "upconv" in tname or "upsample" in tname:
                    out = v.transpose(tuple(range(2, 2 + dims)) + (0, 1))
                    out = out[tuple(slice(None, None, -1) for _ in range(dims))]
                else:
                    out = v.transpose(tuple(range(2, 2 + dims)) + (1, 0))
        else:
            raise ValueError(f"unexpected kernel ndim {v.ndim} for {tname}")
    elif leaf_name in ("scale",):
        out = v
    else:  # bias, embeddings, etc.
        out = v
    if tuple(out.shape) != tuple(flax_shape):
        raise ValueError(
            f"shape mismatch for {tname}: torch→{out.shape} vs flax {flax_shape}"
        )
    return out.astype(np.float32)


_LEAF_TO_TORCH = {
    "kernel": "weight",
    "bias": "bias",
    "scale": "weight",
    "embedding": "weight",
}


def import_state_dict(state_dict, params, batch_stats):
    """Fill our (params, batch_stats) trees from a torch state_dict.

    Returns (params, batch_stats, report) where report lists unmatched
    names on both sides.
    """
    import jax

    flat_params = _flatten(params)
    flat_stats = _flatten(batch_stats)
    used = set()
    missing = []

    new_params = {}
    for path, leaf in flat_params.items():
        prefix = _translate_path(path[:-1])
        leaf_name = path[-1]
        tname = f"{prefix}.{_LEAF_TO_TORCH.get(leaf_name, leaf_name)}"
        if tname in state_dict:
            new_params[path] = _to_flax_leaf(
                tname, state_dict[tname], leaf_name, np.shape(leaf)
            )
            used.add(tname)
        else:
            missing.append(tname)
            new_params[path] = leaf

    new_stats = {}
    stat_map = {"mean": "running_mean", "var": "running_var"}
    for path, leaf in flat_stats.items():
        prefix = _translate_path(path[:-1])
        tname = f"{prefix}.{stat_map.get(path[-1], path[-1])}"
        if tname in state_dict:
            v = np.asarray(state_dict[tname]).astype(np.float32)
            new_stats[path] = v
            used.add(tname)
        else:
            missing.append(tname)
            new_stats[path] = leaf

    def _expected_unused(k):
        if k.endswith("num_batches_tracked"):
            return True
        if ".mano_layer." in k:  # fixed MANO buffers, not learnable
            return True
        if ".after_norm." in k:
            # RelationUnit.after_norm is created but never used in the
            # reference forward (TransformerFusion.py:71,90-113)
            return True
        # weight-tied fusion clones: layers.N and the decoder's self_attn
        # alias the canonical encoder.layers.0 tensors we imported
        canon = re.sub(r"\.layers\.\d+\.", ".layers.0.", k)
        canon = canon.replace("decoder.layers.0.self_attn.",
                              "encoder.layers.0.self_attn.")
        return canon != k and canon in used

    unused = [k for k in state_dict if k not in used and not _expected_unused(k)]
    report = {"missing": missing, "unused": unused}
    return _unflatten(new_params), _unflatten(new_stats), report


def load_reference_checkpoint(path, params, batch_stats, module_key="model"):
    """Load a reference .pt file (torch serialization) and import it."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload[module_key] if module_key in payload else payload
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return import_state_dict(sd, params, batch_stats)


def _flatten(tree, prefix=()):
    out = {}
    if hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat):
    tree = {}
    for path, leaf in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return tree


def export_state_dict(params, batch_stats):
    """Inverse mapping: our trees → a torch-style state_dict (numpy).

    Used for round-trip testing and for handing weights back to the
    reference implementation.
    """
    sd = {}
    for path, leaf in _flatten(params).items():
        prefix = _translate_path(path[:-1])
        leaf_name = path[-1]
        tname = f"{prefix}.{_LEAF_TO_TORCH.get(leaf_name, leaf_name)}"
        v = np.asarray(leaf)
        if leaf_name == "kernel":
            if v.ndim == 2:
                v = v.T
                if "position_embedding_head" in tname:
                    v = v[:, :, None]  # back to torch's pointwise Conv1d
            elif v.ndim in (4, 5):
                dims = v.ndim - 2
                if "upconv" in tname or "upsample" in tname:
                    v = v[tuple(slice(None, None, -1) for _ in range(dims))]
                    v = v.transpose((dims, dims + 1) + tuple(range(dims)))
                else:
                    v = v.transpose((dims + 1, dims) + tuple(range(dims)))
        sd[tname] = v
    stat_map = {"mean": "running_mean", "var": "running_var"}
    for path, leaf in _flatten(batch_stats).items():
        prefix = _translate_path(path[:-1])
        tname = f"{prefix}.{stat_map.get(path[-1], path[-1])}"
        sd[tname] = np.asarray(leaf)
    return sd
