"""Checkpoint IO.

Counterpart of src/checkpoints.py:9-113 with the same three-cadence policy
driven by the train loop (model_best on metric improvement, rolling
model.ckpt, numbered backups — train.py:220-236). State is a flax pytree
serialized with msgpack (flax.serialization); scalar metadata rides along.

Also provides a torch→flax weight importer so checkpoints trained with the
original PyTorch implementation can be loaded for parity testing.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


class CheckpointIO:
    """save/load a dict of registered pytrees + scalars.

    Relative filenames resolve against checkpoint_dir
    (src/checkpoints.py:34-35, 60-61).
    """

    def __init__(self, checkpoint_dir="./chkpts", **kwargs):
        self.module_dict: Dict[str, Any] = kwargs
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)

    def register_modules(self, **kwargs):
        self.module_dict.update(kwargs)

    def _path(self, filename):
        if not os.path.isabs(filename):
            return os.path.join(self.checkpoint_dir, filename)
        return filename

    def save(self, filename, **scalars):
        payload = {"_scalars": dict(scalars)}
        for k, v in self.module_dict.items():
            payload[k] = serialization.to_state_dict(v)
        blob = serialization.msgpack_serialize(
            jax.tree.map(np.asarray, payload)
        )
        path = self._path(filename)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)

    def save_async(self, filename, **scalars):
        """Non-blocking save: device arrays are snapshotted to host
        synchronously (cheap), serialization + disk IO run on a background
        thread so the train loop isn't stalled by checkpoint cadences.
        Returns a Future; pending saves are serialized per CheckpointIO."""
        import concurrent.futures
        import threading

        if not hasattr(self, "_pool"):
            self._pool = concurrent.futures.ThreadPoolExecutor(
                1, thread_name_prefix="ckpt"
            )
            self._save_lock = threading.Lock()
        # host snapshot now — the caller may mutate state afterwards
        payload = {"_scalars": dict(scalars)}
        for k, v in self.module_dict.items():
            payload[k] = jax.tree.map(np.asarray, serialization.to_state_dict(v))
        path = self._path(filename)

        def write():
            with self._save_lock:
                blob = serialization.msgpack_serialize(payload)
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)

        return self._pool.submit(write)

    def wait(self):
        """Block until pending async saves complete."""
        if hasattr(self, "_pool"):
            self._pool.shutdown(wait=True)
            del self._pool

    def _download(self, url: str) -> str:
        """Fetch a checkpoint URL into the checkpoint dir, once
        (src/checkpoints.py:72-82 — torch model_zoo.load_url semantics:
        cached by basename, then loaded like a local file). In a
        zero-egress environment the fetch raises URLError with a clear
        message rather than hanging."""
        import urllib.error
        import urllib.request

        name = os.path.basename(url.split("?", 1)[0]) or "model.ckpt"
        dest = self._path(name)
        if not os.path.exists(dest):
            tmp = dest + ".tmp"
            try:
                with urllib.request.urlopen(url, timeout=60) as r, open(
                    tmp, "wb"
                ) as f:
                    while chunk := r.read(1 << 20):
                        f.write(chunk)
            except OSError as e:
                raise urllib.error.URLError(
                    f"checkpoint download failed for {url!r} (no network "
                    f"egress here? download it yourself and pass a path): {e}"
                ) from e
            os.replace(tmp, dest)
        return name

    def load(self, filename, **restore_targets):
        """Restore registered pytrees in place-of (returns scalars dict).

        Missing files raise FileNotFoundError (caller tolerates, as
        train.py:134-137 does).
        """
        if filename.startswith(("http://", "https://")):
            filename = self._download(filename)
        path = self._path(filename)
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        out = {}
        targets = dict(self.module_dict)
        targets.update(restore_targets)
        for k, target in targets.items():
            if k in payload:
                out[k] = serialization.from_state_dict(target, payload[k])
            else:
                print(f"Warning: could not find {k} in checkpoint!")
        scalars = payload.get("_scalars", {})
        return out, {k: _to_py(v) for k, v in scalars.items()}

    def load_raw(self, filename):
        """Restore the raw payload (nested dicts of np arrays) without a
        structure target — for partial restores like the pretrained-t2d
        graft, where the checkpoint's model differs from the live one.
        Returns (payload, scalars)."""
        path = self._path(filename)
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        scalars = payload.pop("_scalars", {})
        return payload, {k: _to_py(v) for k, v in scalars.items()}


def _to_py(v):
    if isinstance(v, np.ndarray) and v.ndim == 0:
        return v.item()
    return v


def load_partial_params(params, sub_path: tuple, ckpt_params):
    """Graft a loaded params subtree (e.g. a pretrained t2d model) into the
    full parameter tree at ``sub_path``.

    Counterpart of the reference loading its pretrained tactile model into
    the nested encoder_t2d at build time (src/conv_onet/config.py:131-133).
    """
    import flax

    params = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
    node = params
    for key in sub_path[:-1]:
        node = node[key]
    node[sub_path[-1]] = ckpt_params
    return params


# ---------------------------------------------------------------------------
# torch → flax importer
# ---------------------------------------------------------------------------


def _t(w):
    return np.asarray(w).T


def import_torch_linear(sd, prefix, use_bias=True):
    out = {"kernel": _t(sd[prefix + ".weight"])}
    if use_bias and prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def import_torch_conv(sd, prefix, dims=2, use_bias=True):
    # torch conv weight (out, in, *k) → flax (*k, in, out)
    w = np.asarray(sd[prefix + ".weight"])
    perm = tuple(range(2, 2 + dims)) + (1, 0)
    out = {"kernel": w.transpose(perm)}
    if use_bias and prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def import_torch_convtranspose(sd, prefix, dims=2, use_bias=True):
    # torch convT weight (in, out, *k) → flax (*k, in, out), kernel flipped
    w = np.asarray(sd[prefix + ".weight"])
    perm = tuple(range(2, 2 + dims)) + (0, 1)
    w = w.transpose(perm)
    w = w[tuple(slice(None, None, -1) for _ in range(dims))]
    out = {"kernel": w}
    if use_bias and prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def import_torch_bn(sd, prefix):
    params = {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }
    stats = {
        "mean": np.asarray(sd[prefix + ".running_mean"]),
        "var": np.asarray(sd[prefix + ".running_var"]),
    }
    return params, stats
