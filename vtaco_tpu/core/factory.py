"""Method factory: build models (and later trainers/generators) from a
config dict.

Counterpart of src/conv_onet/config.py:16-143 (get_model): constructs the
decoder and up to four encoders from the registries, including the nested
pretrained tactile→depth+pose (t2d) sub-model. Returns the linen module
definition; parameter initialization/loading is the caller's job (see
vtaco_tpu.core.checkpoint).
"""

from __future__ import annotations

import inspect
from typing import Any, Optional

from vtaco_tpu.core.registry import decoder_dict, encoder_dict
from vtaco_tpu.models.conv_onet import ConvOccupancyNetwork
from vtaco_tpu.models.mano import ManoLayer


def _filter_kwargs(cls, kwargs: dict) -> dict:
    """Drop config keys the module doesn't declare (the reference's torch
    modules swallow extras via **kwargs; linen dataclasses are strict).
    Handles the reference configs' known typos ('in_channel',
    'start_flits')."""
    kwargs = dict(kwargs)
    if "start_flits" in kwargs:
        kwargs.setdefault("start_filts", kwargs.pop("start_flits"))
    kwargs.pop("in_channel", None)

    target = cls
    if not inspect.isclass(cls):  # factory functions like Resnet18
        sig = inspect.signature(cls)
        return {k: v for k, v in kwargs.items() if k in sig.parameters}
    fields = {f for f in getattr(cls, "__dataclass_fields__", {})}
    return {k: v for k, v in kwargs.items() if k in fields}


def _build_encoder(name, kwargs):
    cls = encoder_dict[name]
    return cls(**_filter_kwargs(cls, kwargs))


def get_model(cfg, dataset=None):
    """Build the ConvOccupancyNetwork module tree from cfg.

    Mirrors src/conv_onet/config.py:16-143. Returns (model, aux) where aux
    carries build info the trainer needs (e.g. whether t2d must load a
    pretrained checkpoint and from where).
    """
    mcfg = cfg["model"]
    dim = cfg["data"]["dim"]
    c_dim = mcfg["c_dim"]
    padding = cfg["data"]["padding"]
    with_img = mcfg["with_img"]
    with_contact = mcfg["with_contact"]

    # crop-mode coordinate settings propagate from the data/model level
    # into every submodule's kwargs (src/conv_onet/config.py:45-59);
    # without this, configs that set them there silently build the
    # Patch* modules with default local_coord/unit_size.
    _prop = {}
    if "unit_size" in cfg["data"]:
        _prop["unit_size"] = cfg["data"]["unit_size"]
    for _k in ("local_coord", "pos_encoding"):
        if _k in mcfg:
            _prop[_k] = mcfg[_k]
    if _prop:
        for _kwname in ("encoder_kwargs", "encoder_hand_kwargs",
                        "decoder_kwargs"):
            if isinstance(mcfg.get(_kwname), dict):
                # reference semantics: the top-level value overwrites any
                # per-module entry
                mcfg[_kwname].update(_prop)

    # crop mode: feature resolution follows the crop volume
    # (src/conv_onet/config.py:62-76)
    if cfg["data"].get("input_type") == "pointcloud_crop" and dataset is not None:
        from vtaco_tpu.ops.geometry import update_reso

        enc_kw = mcfg["encoder_kwargs"]
        fea_type = enc_kw["plane_type"]
        if getattr(dataset, "split", None) == "train" or cfg["generation"].get(
            "sliding_window"
        ):
            recep_field = 2 ** (enc_kw["unet3d_kwargs"]["num_levels"] + 2)
            reso = cfg["data"]["query_vol_size"] + recep_field - 1
            reso = update_reso(reso, dataset.depth)
        else:
            reso = dataset.total_reso
        if "grid" in fea_type:
            enc_kw["grid_resolution"] = reso
        if set(fea_type) & {"xz", "xy", "yz"}:
            enc_kw["plane_resolution"] = reso

    decoder_name = mcfg["decoder"]
    decoder = None
    if decoder_name not in (False, None):
        cls = decoder_dict[decoder_name]
        kw = dict(mcfg.get("decoder_kwargs") or {})
        kw.update(dim=dim, c_dim=c_dim, padding=padding, with_contact=with_contact)
        decoder = cls(**_filter_kwargs(cls, kw))

    encoder_name = mcfg.get("encoder")
    encoder = None
    if encoder_name == "idx":
        from vtaco_tpu.models.pointnet import IndexEncoder

        encoder = IndexEncoder(
            num_embeddings=len(dataset) if dataset is not None else 1,
            c_dim=c_dim,
        )
    elif encoder_name not in (False, None):
        kw = dict(mcfg.get("encoder_kwargs") or {})
        kw.update(dim=dim, c_dim=c_dim, padding=padding)
        encoder = _build_encoder(encoder_name, kw)

    hand_out_dim = 0
    mano_layer = None
    encoder_hand_name = mcfg.get("encoder_hand")
    encoder_hand = None
    if encoder_hand_name not in (False, None):
        kw = dict(mcfg.get("encoder_hand_kwargs") or {})
        hand_out_dim = int(kw.get("out_dim") or 0)
        mano_kwargs = kw.get("manolayer_kwargs")
        kw.update(dim=dim, padding=padding)
        kw.setdefault("c_dim", c_dim)
        encoder_hand = _build_encoder(encoder_hand_name, kw)
        if mano_kwargs:
            mk = {k: v for k, v in mano_kwargs.items() if k != "mano_root"}
            mano_layer = ManoLayer(**mk)

    encoder_img = None
    if with_img and mcfg.get("encoder_img") not in (False, None):
        encoder_img = _build_encoder(
            mcfg["encoder_img"], dict(mcfg.get("encoder_img_kwargs") or {})
        )

    encoder_t2d = None
    t2d_pretrained_file = None
    if mcfg.get("encoder_t2d") not in (False, None):
        tkw = mcfg["encoder_t2d_kwargs"]
        img_enc = _build_encoder(
            tkw["encoder_img"], dict(tkw.get("encoder_img_kwargs") or {})
        )
        hkw = dict(tkw.get("encoder_hand_kwargs") or {})
        t2d_out_dim = int(hkw.get("out_dim") or 0)
        hkw.update(dim=dim, padding=padding)
        hand_enc = _build_encoder(tkw["encoder_hand"], hkw)
        encoder_t2d = ConvOccupancyNetwork(
            decoder=None,
            encoder=None,
            encoder_hand=hand_enc,
            encoder_img=img_enc,
            encoder_t2d=None,
            hand_out_dim=t2d_out_dim,
        )
        if tkw.get("pretrained"):
            t2d_pretrained_file = tkw.get("model_file")

    model = ConvOccupancyNetwork(
        decoder=decoder,
        encoder=encoder,
        encoder_hand=encoder_hand,
        encoder_img=encoder_img,
        encoder_t2d=encoder_t2d,
        mano_layer=mano_layer,
        hand_out_dim=hand_out_dim,
    )
    aux = {"t2d_pretrained_file": t2d_pretrained_file}
    return model, aux


def get_trainer(model, cfg, **kwargs):
    from vtaco_tpu.train.trainer import Trainer

    return Trainer.from_config(model, cfg, **kwargs)


def get_generator(model, cfg, **kwargs):
    from vtaco_tpu.generate.generator import Generator3D

    return Generator3D.from_config(model, cfg, **kwargs)


def get_inferencer(model, generator, cfg, **kwargs):
    from vtaco_tpu.generate.inferencer import Inferencer

    return Inferencer.from_config(model, generator, cfg, **kwargs)


def get_data_fields(mode, cfg):
    from vtaco_tpu.data import fields as F
    from vtaco_tpu.data.transforms import SubsamplePoints

    points_transform = SubsamplePoints(cfg["data"]["points_subsample"])
    input_type = cfg["data"]["input_type"]
    flds = {}
    if cfg["data"].get("points_file") is not None:
        field_cls = (
            F.PatchPointsField if input_type == "pointcloud_crop" else F.PointsField
        )
        flds["points"] = field_cls(
            cfg["data"]["points_file"],
            points_transform,
            unpackbits=cfg["data"]["points_unpackbits"],
            multi_files=cfg["data"].get("multi_files"),
        )
    if mode in ("val", "test", "vis"):
        if cfg["data"].get("points_iou_file") is not None:
            flds["points_iou"] = F.PointsField(
                cfg["data"]["points_iou_file"],
                unpackbits=cfg["data"]["points_unpackbits"],
                multi_files=cfg["data"].get("multi_files"),
            )
        if cfg["data"].get("voxels_file") is not None:
            flds["voxels"] = F.VoxelsField(cfg["data"]["voxels_file"])
    return flds
