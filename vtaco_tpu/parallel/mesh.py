"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY.md §2.8): no DP/TP/PP/SP and
no communication backend. Here parallelism is first-class and rides XLA
collectives over ICI:

  * ``data`` axis — batch (DP) sharding of the train step; XLA inserts the
    gradient psum.
  * ``data`` axis again for the occupancy-decode *query-point* axis at
    generation time — the natural "sequence parallelism" of an occupancy
    network (each chip decodes a slab of the dense grid; the host gathers
    logits for marching cubes).
  * a ``model`` axis for tensor parallelism (``parallel/tp.py``): conv
    output channels / dense output features are partitioned over it and
    GSPMD inserts the collectives. Functional at any ``training.mesh.model``
    that divides the channel widths; at this model scale (~11M params,
    UNet3D channels 32-384) DP is the recommended axis — see
    docs/DESIGN.md "model-axis study" for the measured numbers.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. data=-1 → all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    dev = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev, axis_names=("data", "model"))


def mesh_from_config(cfg, batch_size: Optional[int] = None) -> Optional[Mesh]:
    """Build the training mesh from ``training.mesh`` config keys.

    data == -1 means "all devices", clamped to the largest count that
    divides the batch size (a 2-sample batch on an 8-device host runs
    2-way, not broken).
    """
    mcfg = (cfg.get("training") or {}).get("mesh")
    if not mcfg:
        return None
    data = mcfg.get("data", -1)
    model = mcfg.get("model", 1) or 1
    if data == -1:
        data = len(jax.devices()) // model
        if batch_size is not None:
            while data > 1 and batch_size % data:
                data -= 1
    if (data or 1) <= 1 and model <= 1:
        return None  # single chip: plain jit, no sharding overhead
    return make_mesh(data=data, model=model)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch / query-point) sharding over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(tree, sharding: NamedSharding):
    """device_put, or per-process assembly when the mesh spans hosts.

    In a multi-process runtime ``jax.device_put`` cannot address other
    hosts' chips; ``make_array_from_process_local_data`` stitches each
    process's local rows into the global array (the loader feeds each
    process only its shard — parallel/multihost.py step 3).
    """
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            tree)
    return jax.device_put(tree, sharding)


_put = put_global  # back-compat alias


def shard_batch(mesh: Mesh, tree):
    return put_global(tree, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return put_global(tree, replicated(mesh))
