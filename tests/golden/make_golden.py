"""Regenerate tests/golden/vtaco_golden.npz (requires torch + /root/reference).

Builds the tiny-width flagship (tests/test_golden_parity.py:golden_cfg) in
BOTH stacks, imports the reference state_dict through the production
checkpoint importer (core/torch_import.py), captures the reference's
outputs on seeded inputs, and writes everything — inputs are NOT stored
(both sides derive them from the same seeded Generator), parameters and
reference activations are.

Usage:  python tests/golden/make_golden.py
"""

import copy
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
os.chdir(REPO)

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flax import traverse_util  # noqa: E402

from vtaco_tpu.core import torch_import as TI  # noqa: E402
from vtaco_tpu.core.config import get_model  # noqa: E402

from tests.reference_shim import build_reference_model  # noqa: E402
from tests.test_golden_parity import (  # noqa: E402
    GOLDEN_WIDTHS,
    _golden_path,
    golden_cfg,
    golden_inputs,
)


def make_one(width):
    cfg = golden_cfg(width)
    torch.manual_seed(0)
    ref = build_reference_model(copy.deepcopy(cfg))

    model, _ = get_model(cfg)
    pts, imgs, p, c_img = golden_inputs(np.random.default_rng(1), width)

    def init_fn(mm):
        c = mm.encode_inputs(jnp.asarray(pts), train=False)
        mm.encode_hand_inputs(jnp.asarray(pts), train=False)
        mm.encode_t2d(jnp.asarray(pts), jnp.asarray(imgs), train=False)
        mm.decode(jnp.asarray(p), c)
        mm.decode_img(jnp.asarray(p), c, jnp.asarray(c_img))

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), method=init_fn)
    )
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)

    GOLDEN = _golden_path(width)
    ckpt = "/tmp/golden_ref_ckpt.pt"
    torch.save({"model": ref.state_dict(), "epoch_it": 0, "it": 0,
                "loss_val_best": 0.0}, ckpt)
    params, stats, report = TI.load_reference_checkpoint(
        ckpt, zeros["params"], zeros.get("batch_stats", {})
    )
    assert not report["missing"], report["missing"][:8]
    assert not report["unused"], report["unused"][:8]

    def t(a):
        return torch.from_numpy(np.asarray(a))

    out = {}
    with torch.no_grad():
        c_ref = ref.encode_inputs(t(pts))
        out["ref/grid"] = c_ref["grid"].numpy().transpose(0, 2, 3, 4, 1)
        hand = ref.encode_hand_inputs(t(pts))
        for k in ("mano_param", "mano_verts", "mano_joints"):
            out["ref/" + k] = hand[k].numpy()
        depth, pose = ref.encode_t2d(t(pts), t(imgs.transpose(0, 1, 4, 2, 3)))
        out["ref/t2d_depth"] = depth.numpy()
        out["ref/t2d_pose"] = pose["mano_param"].numpy()
        out["ref/logits"] = ref.decode(t(p), c_ref).logits.numpy()
        out["ref/logits_img"] = ref.decode_img(
            t(p), c_ref, t(c_img)).logits.numpy()

    for k, v in traverse_util.flatten_dict(params).items():
        out["param/" + "/".join(k)] = np.asarray(v)
    for k, v in traverse_util.flatten_dict(stats).items():
        out["stat/" + "/".join(k)] = np.asarray(v)

    np.savez_compressed(GOLDEN, **out)
    n_par = sum(v.size for k, v in out.items() if k.startswith("param/"))
    print(f"wrote {GOLDEN}: {len(out)} arrays, {n_par:,} params, "
          f"{os.path.getsize(GOLDEN) / 1e6:.2f} MB")


def main():
    for width in GOLDEN_WIDTHS:
        make_one(width)


if __name__ == "__main__":
    main()
