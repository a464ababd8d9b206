"""Config system: YAML with recursive ``inherit_from`` chaining and deep
merge onto a default config.

Identical semantics to src/config.py:13-57 so the reference's configs work
unchanged (paths aside). Also hosts the top-level factory surface
(get_model / get_trainer / get_generator / get_dataset), dispatching by
``cfg['method']`` through a method registry as the reference does
(src/config.py:7-9, method_dict = {'vtaco': conv_onet}).
"""

from __future__ import annotations

import os
from typing import Optional

import yaml

DEFAULT_CONFIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "configs",
    "default.yaml",
)


def load_config(path: str, default_path: Optional[str] = None) -> dict:
    """Load a YAML config, following ``inherit_from`` chains.

    Matches src/config.py:13-40.
    """
    with open(path, "r") as f:
        cfg_special = yaml.safe_load(f)

    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None:
        # resolve relative to cwd (reference behavior) or, failing that,
        # relative to the repo root implied by the including file's location
        # (…/configs/<exp>/x.yaml → repo root two levels up), so configs
        # work from any working directory.
        if not os.path.exists(inherit_from) and not os.path.isabs(inherit_from):
            base = os.path.dirname(os.path.abspath(path))
            for up in (base, os.path.dirname(base), os.path.dirname(os.path.dirname(base))):
                cand = os.path.join(up, inherit_from)
                if os.path.exists(cand):
                    inherit_from = cand
                    break
        cfg = load_config(inherit_from, default_path)
    elif default_path is not None:
        with open(default_path, "r") as f:
            cfg = yaml.safe_load(f)
    else:
        cfg = dict()

    update_recursive(cfg, cfg_special)
    return cfg


def update_recursive(dict1: dict, dict2: dict) -> None:
    """Deep-merge dict2 into dict1. Matches src/config.py:43-57."""
    for k, v in dict2.items():
        if k not in dict1:
            dict1[k] = dict()
        if isinstance(v, dict):
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


# --- top-level factory dispatch (src/config.py:61-166) ---------------------


def _method(cfg):
    from vtaco_tpu.core import factory as vtaco_factory

    method_dict = {"vtaco": vtaco_factory}
    return method_dict[cfg["method"]]


def get_model(cfg, dataset=None):
    """Build the (module, params-less) model definition for cfg['method']."""
    return _method(cfg).get_model(cfg, dataset=dataset)


def get_trainer(model, cfg, **kwargs):
    return _method(cfg).get_trainer(model, cfg, **kwargs)


def get_generator(model, cfg, **kwargs):
    return _method(cfg).get_generator(model, cfg, **kwargs)


def get_inferencer(model, generator, cfg, **kwargs):
    return _method(cfg).get_inferencer(model, generator, cfg, **kwargs)


def get_dataset(mode, cfg, return_idx=False):
    from vtaco_tpu.data import core as data_mod

    return data_mod.get_dataset(mode, cfg, return_idx=return_idx)
