"""Preprocessed-tensor cache: cache hit must be indistinguishable from a
fresh load (VERDICT r3 #2 — kills the per-phase dataloading tax the
reference pays in every process, reference dataloading.py:398-533)."""

import os

import numpy as np
import pytest

from evfly_tpu.data.dataloading import dataloader, write_h5_dataset
from tests.test_data import _make_traj


@pytest.fixture
def h5_path(tmp_path, rng):
    trajs = [_make_traj(rng, f"traj_{i:03d}", T=15 + i) for i in range(6)]
    path = str(tmp_path / "cache_forest")
    write_h5_dataset(path + ".h5", trajs)
    return path


KW = dict(
    val_split=0.3,
    seed=7,
    events="evs_frames",
    resize_input=[20, 28],
    rescale_depth=1.0,
    rescale_evs=-1.0,
    evs_min_cutoff=0.01,
)


def _assert_split_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a.meta), np.asarray(b.meta))
    np.testing.assert_array_equal(np.asarray(a.ims), np.asarray(b.ims))
    np.testing.assert_array_equal(np.asarray(a.depths), np.asarray(b.depths))
    np.testing.assert_array_equal(a.trajlength, b.trajlength)
    np.testing.assert_array_equal(np.asarray(a.desvel), np.asarray(b.desvel))
    assert (a.evs is None) == (b.evs is None)
    if a.evs is not None:
        assert len(a.evs) == len(b.evs)
        for ea, eb in zip(a.evs, b.evs):
            np.testing.assert_array_equal(np.asarray(ea), np.asarray(eb))
    assert list(map(str, a.dirs)) == list(map(str, b.dirs))
    assert list(a.dirs_ids) == list(b.dirs_ids)


def test_cache_hit_equals_fresh_load(h5_path):
    logs = []
    tr1, va1, p1 = dataloader(h5_path, logger=logs.append, **KW)
    assert any("Cached preprocessed tensors" in m for m in logs)

    logs2 = []
    tr2, va2, p2 = dataloader(h5_path, logger=logs2.append, **KW)
    assert any("Cache hit" in m for m in logs2), logs2
    assert p1 == p2
    _assert_split_equal(tr1, tr2)
    _assert_split_equal(va1, va2)

    # the learner's velcmd view works on the mmap-backed arrays
    np.testing.assert_array_equal(np.asarray(tr1.velcmd), np.asarray(tr2.velcmd))


def test_cache_keyed_on_args_and_mtime(h5_path):
    logs = []
    dataloader(h5_path, logger=logs.append, **KW)

    # different preprocessing args -> full load, not a stale hit
    logs2 = []
    kw = dict(KW, evs_min_cutoff=0.5)
    tr, _, _ = dataloader(h5_path, logger=logs2.append, **kw)
    assert not any("Cache hit" in m for m in logs2)
    assert all(np.abs(np.asarray(ev)[np.asarray(ev) != 0]).min() >= 0.5
               for ev in tr.evs if np.any(np.asarray(ev)))

    # touching the source h5 invalidates
    os.utime(h5_path + ".h5")
    logs3 = []
    dataloader(h5_path, logger=logs3.append, **KW)
    assert not any("Cache hit" in m for m in logs3)


def test_cache_opt_out(h5_path, monkeypatch):
    monkeypatch.setenv("EVFLY_DATA_CACHE", "0")
    logs = []
    dataloader(h5_path, logger=logs.append, **KW)
    dataloader(h5_path, logger=logs.append, **KW)
    assert not any("Cache" in m for m in logs)


def test_cache_hits_after_source_h5_deleted(h5_path):
    """Disk is the scarce resource: once the preprocessed cache exists the
    multi-GB source h5 can be deleted; a .stat.json stamp written at probe
    time preserves the cache key (same mtime/size -> same hash)."""
    logs = []
    tr1, va1, _ = dataloader(h5_path, logger=logs.append, **KW)
    assert os.path.exists(h5_path + ".h5.stat.json")

    os.remove(h5_path + ".h5")
    logs2 = []
    tr2, va2, _ = dataloader(h5_path, logger=logs2.append, **KW)
    assert any("Cache hit" in m for m in logs2), logs2
    _assert_split_equal(tr1, tr2)
    _assert_split_equal(va1, va2)

    # different args after deletion -> no cache entry, clear error
    with pytest.raises(FileNotFoundError, match="stat.json stamp exists"):
        dataloader(h5_path, logger=logs2.append, **dict(KW, evs_min_cutoff=0.5))


def test_stamp_tool_refuses_stale_cache(h5_path):
    """tools/stamp_and_rm_h5.py must not delete an h5 whose cache entries
    were built from an OLDER generation of the file (advisor r4: the stale
    caches never hit again, losing the dataset)."""
    import importlib.util
    import time as _time

    spec = importlib.util.spec_from_file_location(
        "stamp_and_rm_h5",
        os.path.join(os.path.dirname(__file__), "..", "tools", "stamp_and_rm_h5.py"),
    )
    stamp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(stamp)

    logs = []
    dataloader(h5_path, logger=logs.append, **KW)
    # current h5 matches its cache entry: delete allowed
    assert stamp.stamp_and_rm(h5_path)
    assert not os.path.exists(h5_path + ".h5")

    # regenerate the h5 (new identity), caches now stale: refuse
    from tests.test_data import _make_traj

    rng2 = np.random.default_rng(99)
    trajs = [_make_traj(rng2, f"traj_{i:03d}", T=15 + i) for i in range(6)]
    write_h5_dataset(h5_path + ".h5", trajs)
    now = _time.time() + 5
    os.utime(h5_path + ".h5", (now, now))  # force a distinct mtime_ns
    assert not stamp.stamp_and_rm(h5_path)
    assert os.path.exists(h5_path + ".h5")  # still there
    # --force overrides (operator accepts responsibility)
    assert stamp.stamp_and_rm(h5_path, force=True)
    assert not os.path.exists(h5_path + ".h5")
