"""Inferencer: sequential + pipelined batched reconstruction (CPU)."""

import os

import numpy as np
import pytest

from vtaco_tpu.core.config import get_dataset, get_model
from vtaco_tpu.data import BatchLoader
from vtaco_tpu.data.synthetic import generate
from vtaco_tpu.generate.generator import Generator3D
from vtaco_tpu.generate.inferencer import Inferencer
from vtaco_tpu.train.loop import build_mesh_bank
from vtaco_tpu.train.trainer import Trainer

from test_trainer import _small_cfg  # noqa: F401


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_inf")
    root, mesh_root = generate(
        str(out), n_models=5, n_query=500, n_surface=1000,
        img_h=16, img_w=12, seed=11, splits=(("train", 1.0),),
    )
    cfg = _small_cfg("configs/VTacO/VTacO_YCB.yaml", root, mesh_root)
    cfg["generation"]["resolution_0"] = 8  # nx = 32
    model, _ = get_model(cfg)
    ds = get_dataset("train", cfg)
    bank = build_mesh_bank(cfg)
    tr = Trainer.from_config(model, cfg, mesh_bank=bank, contact_per_finger=16)
    batch = next(iter(BatchLoader(ds, 1, num_workers=1, seed=0)))
    state = tr.init_state(batch)
    gen = Generator3D.from_config(model, cfg, contact_per_finger=16)
    inf = Inferencer.from_config(model, gen, cfg)
    return cfg, ds, state, inf


def test_run_batched_pipelined(setup, tmp_path):
    """5 models, batch 2 → 3 flights (2+2+1): exercises the dispatch/
    consume overlap, the remainder flush, and ordered results."""
    cfg, ds, state, inf = setup
    # the field transforms draw from global np.random: pin it so the
    # band-vs-full comparison below consumes IDENTICAL rows
    np.random.seed(1234)
    loader = BatchLoader(ds, 1, shuffle=False, num_workers=1)
    out = inf.run_batched(state, loader, batch_size=2,
                          out_dir=str(tmp_path / "gen"))
    assert len(out["names"]) == 5 and len(out["cd"]) == 5
    assert all(np.isfinite(c) for c in out["cd"])
    # results stay aligned with the loader order
    expected = [b["points.name"][0]
                for b in BatchLoader(ds, 1, shuffle=False, num_workers=1)]
    assert out["names"] == expected
    for name in out["names"]:
        assert os.path.exists(str(tmp_path / "gen" / f"{name}_obj.off"))

    # iso-band transfer variant (the TPU serving default): same flight
    # structure, same chamfer results up to the band's exactness
    from vtaco_tpu.generate.inferencer import Inferencer

    gen_b = Generator3D.from_config(inf.generator.model, cfg,
                                    contact_per_finger=16,
                                    band_transfer=True,
                                    transfer_dtype="float32")
    inf_b = Inferencer.from_config(inf.generator.model, gen_b, cfg)
    np.random.seed(1234)
    out_b = inf_b.run_batched(
        state, BatchLoader(ds, 1, shuffle=False, num_workers=1),
        batch_size=2, out_dir=str(tmp_path / "gen_band"),
    )
    assert out_b["names"] == expected
    assert gen_b.band_overflows == 0
    # the full-volume flight ships bf16 logits (decode_dense_batched's
    # transfer default) while the band ships exact f32 — meshes differ at
    # bf16 rounding, so chamfer agrees to ~percent, not bitwise (the
    # band's bit-exactness vs an f32 fetch is proven in tests/test_band.py)
    for a, b in zip(out["cd"], out_b["cd"]):
        assert b == pytest.approx(a, rel=0.05, abs=1e-4), (a, b)


def test_inference_step(setup):
    cfg, ds, state, inf = setup
    loader = BatchLoader(ds, 1, shuffle=False, num_workers=1)
    staged = [{"data": b, "name": b["points.name"][0]}
              for i, b in enumerate(loader) if i < 2]
    objs, hands, stats = inf.inference_step(state, staged)
    assert len(objs) == 2 and len(hands) == 2
    assert np.isfinite(stats["cd_mean"])
