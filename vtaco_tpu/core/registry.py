"""Encoder/decoder registries (name → constructor).

Counterparts of src/encoder/__init__.py:11-20 and
src/conv_onet/models/__init__.py:7-12. New modules register by name so
configs can select them without code changes.
"""

from __future__ import annotations

from typing import Callable, Dict

encoder_dict: Dict[str, Callable] = {}
decoder_dict: Dict[str, Callable] = {}


def register_encoder(name: str):
    def deco(fn):
        encoder_dict[name] = fn
        return fn

    return deco


def register_decoder(name: str):
    def deco(fn):
        decoder_dict[name] = fn
        return fn

    return deco


def _populate():
    from vtaco_tpu.models import decoder as dec
    from vtaco_tpu.models import pointnet, layers
    from vtaco_tpu.models import pointnetpp, voxels

    encoder_dict.update(
        {
            "pointnet_local_pool": pointnet.LocalPoolPointnet,
            "pointnet_crop_local_pool": pointnet.PatchLocalPoolPointnet,
            "pointnet_plus_plus": pointnetpp.PointNetPlusPlus,
            "voxel_simple_local": voxels.LocalVoxelEncoder,
            "Resnet18": layers.Resnet18,
            "Resnet34": layers.Resnet34,
            "Resnet50": layers.Resnet50,
            "UNet": layers.TactileUNet,
        }
    )
    decoder_dict.update(
        {
            "simple_local": dec.LocalDecoder,
            "attention_local": dec.AttentionDecoder,
            "simple_local_crop": dec.PatchLocalDecoder,
            "simple_local_point": dec.LocalPointDecoder,
        }
    )


_populate()
