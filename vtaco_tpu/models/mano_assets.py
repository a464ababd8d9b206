"""MANO model asset loading — chumpy-free.

The official MANO_RIGHT.pkl stores numpy arrays, a scipy sparse J_regressor
and (for shapedirs) a chumpy array object. The reference loads it through a
chumpy-based deserializer at import time
(src/encoder/mano/webuser/smpl_handpca_wrapper_HAND_only.py:22-67); here we
unpickle with a shim class instead and convert once to a plain ``.npz``
shipped inside the package, so the runtime never touches pickle/chumpy.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")
DEFAULT_NPZ = os.path.abspath(os.path.join(ASSET_DIR, "mano_right.npz"))


class _ChShim:
    """Stand-in for chumpy array objects: keeps the pickled state dict."""

    def __setstate__(self, state):
        self.__dict__.update(state)


class _ShimUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if "chumpy" in module:
            return _ChShim
        return super().find_class(module, name)


def _unwrap(x):
    if isinstance(x, _ChShim):
        for key in ("x", "a", "v", "r"):
            if key in x.__dict__:
                return _unwrap(x.__dict__[key])
        raise ValueError(f"cannot extract array from chumpy state: {list(x.__dict__)}")
    return x


def convert_mano_pkl(pkl_path: str, out_npz: str = DEFAULT_NPZ) -> str:
    """Extract the arrays the MANO layer needs into a float32 npz.

    Keys follow the reference's buffer names (src/encoder/manolayer.py:125-141).
    ``betas`` is the zero shape vector ready_arguments would create
    (smpl_handpca_wrapper_HAND_only.py:45-46).
    """
    with open(pkl_path, "rb") as f:
        dd = _ShimUnpickler(f, encoding="latin1").load()

    shapedirs = np.asarray(_unwrap(dd["shapedirs"]), np.float32)
    J_regressor = dd["J_regressor"]
    if hasattr(J_regressor, "toarray"):
        J_regressor = J_regressor.toarray()

    out = dict(
        betas=np.zeros(shapedirs.shape[-1], np.float32),
        shapedirs=shapedirs,
        posedirs=np.asarray(_unwrap(dd["posedirs"]), np.float32),
        v_template=np.asarray(_unwrap(dd["v_template"]), np.float32),
        J_regressor=np.asarray(J_regressor, np.float32),
        weights=np.asarray(_unwrap(dd["weights"]), np.float32),
        faces=np.asarray(dd["f"], np.int32),
        hands_components=np.asarray(dd["hands_components"], np.float32),
        hands_mean=np.asarray(dd["hands_mean"], np.float32),
        kintree_parents=np.asarray(dd["kintree_table"][0], np.int64),
    )
    os.makedirs(os.path.dirname(out_npz), exist_ok=True)
    np.savez_compressed(out_npz, **out)
    return out_npz


def load_mano_assets(npz_path: str | None = None) -> dict:
    """Load converted MANO arrays; convert from a pkl on first use if the
    npz is missing and a source pkl can be found."""
    path = npz_path or DEFAULT_NPZ
    if not os.path.exists(path):
        for cand in (
            os.environ.get("MANO_PKL", ""),
            "/root/reference/src/encoder/assets/mano/MANO_RIGHT.pkl",
        ):
            if cand and os.path.exists(cand):
                convert_mano_pkl(cand, path)
                break
        else:
            raise FileNotFoundError(
                f"MANO assets not found at {path}; set MANO_PKL to a MANO_RIGHT.pkl"
            )
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


if __name__ == "__main__":
    import sys

    src = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/src/encoder/assets/mano/MANO_RIGHT.pkl"
    )
    dst = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_NPZ
    print(convert_mano_pkl(src, dst))
