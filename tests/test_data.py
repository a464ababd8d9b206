"""Dataset/loader tests: multi-host input sharding (disjoint cover).

The reference's input parallelism is single-process DataLoader workers
(train.py:63-77); the multi-host generalization shards the model list by
process (vtaco_tpu/parallel/multihost.py). These tests prove the
contract that makes a sharded epoch a true epoch: every model lands in
exactly one shard, shards cover the full list, and the stride keeps each
shard spanning all categories.
"""

import os
from unittest import mock

import pytest

from vtaco_tpu.data.core import Shapes3dDataset, get_dataset


@pytest.fixture(scope="module")
def lst_root(tmp_path_factory):
    """Bare category/model tree with train.lst files (no field payloads —
    sharding happens at the model-list level)."""
    root = tmp_path_factory.mktemp("lst")
    for cat, n in (("02876657", 11), ("03593526", 7)):
        d = root / cat
        d.mkdir()
        names = [f"m{cat[-2:]}_{i:03d}" for i in range(n)]
        for m in names:
            (d / m).mkdir()
        (d / "train.lst").write_text("\n".join(names) + "\n")
    return str(root)


def _keys(ds):
    return [(m["category"], m["model"]) for m in ds.models]


def test_shard_disjoint_cover(lst_root):
    full = _keys(Shapes3dDataset(lst_root, {}, split="train"))
    assert len(full) == 18
    for num_shards in (1, 2, 3, 5):
        shards = [
            _keys(Shapes3dDataset(lst_root, {}, split="train",
                                  shard=(i, num_shards)))
            for i in range(num_shards)
        ]
        seen = [k for s in shards for k in s]
        assert len(seen) == len(set(seen)) == len(full)  # disjoint
        assert sorted(seen) == sorted(full)              # cover
        sizes = [len(s) for s in shards]
        assert max(sizes) - min(sizes) <= 1              # balanced
        if num_shards <= 3:
            # strided slicing keeps every shard multi-category
            for s in shards:
                assert len({c for c, _ in s}) == 2


def test_shard_validates(lst_root):
    with pytest.raises(ValueError):
        Shapes3dDataset(lst_root, {}, split="train", shard=(3, 3))


def test_get_dataset_shard_by_process(lst_root, tmp_path):
    """data.shard_by_process derives the TRAIN shard from the jax process
    topology; val stays unsharded (metrics comparable to single-host)."""
    from vtaco_tpu.core.config import load_config

    cfg = load_config("configs/VTacO/VTacO_YCB.yaml", "configs/default.yaml")
    cfg["data"].update(path=lst_root, shard_by_process=True,
                       val_split="train", test_split="train")
    with mock.patch("jax.process_count", return_value=3), \
         mock.patch("jax.process_index", return_value=1):
        tr = get_dataset("train", cfg)
        val = get_dataset("val", cfg)
    assert tr.shard == (1, 3) and len(tr) == 6
    assert val.shard is None and len(val) == 18
    # single-process: flag is a no-op
    tr1 = get_dataset("train", cfg)
    assert tr1.shard is None and len(tr1) == 18


def test_initialize_distributed_modes(monkeypatch):
    """initialize_distributed mode matrix (review r4): the idempotence
    probe must not boot the XLA backends (jax.process_count does — after
    which jax.distributed.initialize permanently raises), auto-discovery
    must reach the no-arg call, and single-host stays a no-op."""
    from vtaco_tpu.parallel import multihost

    calls = []
    monkeypatch.setattr(multihost.jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, dict(k))))
    monkeypatch.setattr(multihost, "_already_initialized", lambda: False)
    monkeypatch.delenv("VTACO_DISTRIBUTED", raising=False)

    multihost.initialize_distributed()                       # single host
    multihost.initialize_distributed(coordinator_address="h:1",
                                     num_processes=1)        # 1 process
    assert calls == []

    multihost.initialize_distributed(auto=True)              # Cloud TPU
    assert calls[-1] == ((), {})

    monkeypatch.setenv("VTACO_DISTRIBUTED", "1")             # env opt-in
    multihost.initialize_distributed()
    assert len(calls) == 2 and calls[-1] == ((), {})
    monkeypatch.delenv("VTACO_DISTRIBUTED")

    multihost.initialize_distributed(coordinator_address="h:1",
                                     num_processes=4, process_id=2)
    assert calls[-1][1]["num_processes"] == 4

    # initialized runtime: no further calls, probe-only
    monkeypatch.setattr(multihost, "_already_initialized", lambda: True)
    multihost.initialize_distributed(auto=True)
    assert len(calls) == 3

    # the probe itself must not be jax.process_count in disguise
    import inspect
    assert "process_count" not in inspect.getsource(
        multihost.initialize_distributed)
