"""Lazy multi-dataset concatenation (ConcatFrames) + blockwise device
staging: the round-4e joint_dagger2 OOM fix.  np.concatenate over the
per-dataset mmap'd cache arrays materialized ~60 GB of f32 frames in
anonymous host RAM before training started (reference analog: the torch
loader holds one dataset's tensors, reference dataloading.py:398-533; our
multi-dataset mixes have no reference counterpart).  The contract tested
here: lazy concat + blockwise staging is BIT-IDENTICAL to the eager path.
"""

import numpy as np
import pytest

from evfly_tpu.configs import EvflyConfig
from evfly_tpu.data.dataloading import ConcatFrames, concat_frames
from evfly_tpu.train.learner import Learner

from tests.test_learner import _base_config, _toy_dataset


@pytest.fixture
def parts(rng):
    return [
        rng.random((n, 6, 7)).astype(np.float32) for n in (5, 1, 9, 3)
    ]


def test_concat_frames_indexing_oracle(parts, rng):
    cf = ConcatFrames(parts)
    ref = np.concatenate(parts)

    assert cf.shape == ref.shape
    assert cf.dtype == ref.dtype
    assert cf.size == ref.size
    assert cf.nbytes == ref.nbytes
    assert cf.ndim == ref.ndim
    assert len(cf) == len(ref)

    for i in (0, 4, 5, 17, -1, -18):
        np.testing.assert_array_equal(cf[i], ref[i])
    for sl in (slice(None), slice(2, 11), slice(4, 6), slice(0, 0), slice(15, 99)):
        np.testing.assert_array_equal(cf[sl], ref[sl])
    ids = rng.integers(0, len(ref), size=40)
    np.testing.assert_array_equal(cf[ids], ref[ids])
    # tuple indexing (row selector + trailing dims), as run_model uses
    np.testing.assert_array_equal(cf[ids, 2:4, 1], ref[ids, 2:4, 1])
    np.testing.assert_array_equal(cf[3, 1:, :2], ref[3, 1:, :2])
    # negative fancy indices
    np.testing.assert_array_equal(cf[np.array([-1, 0, -5])], ref[np.array([-1, 0, -5])])
    with pytest.raises(IndexError):
        cf[len(ref)]
    with pytest.raises(IndexError):
        cf[np.array([0, len(ref)])]
    # materialization escape hatch
    np.testing.assert_array_equal(np.asarray(cf), ref)


def test_concat_frames_bool_mask(parts, rng):
    """Boolean masks select rows like ndarray (advisor r4: they were being
    treated as integer indices 0/1)."""
    cf = ConcatFrames(parts)
    ref = np.concatenate(parts)
    mask = rng.random(len(ref)) < 0.4
    np.testing.assert_array_equal(cf[mask], ref[mask])
    np.testing.assert_array_equal(cf[mask, 2:4], ref[mask, 2:4])
    np.testing.assert_array_equal(cf[np.zeros(len(ref), bool)], ref[np.zeros(len(ref), bool)])
    with pytest.raises(IndexError):
        cf[np.ones(len(ref) + 1, bool)]


def test_concat_frames_rest_applied_per_part(parts):
    """cf[:, 0] must materialize only the rest-indexed result, never the
    full row gather (advisor r4: the full-mix f32 OOM reintroduced)."""
    cf = ConcatFrames(parts)
    ref = np.concatenate(parts)
    np.testing.assert_array_equal(cf[:, 0], ref[:, 0])
    np.testing.assert_array_equal(cf[:, 1:3, 2], ref[:, 1:3, 2])
    np.testing.assert_array_equal(cf[2:15, -1], ref[2:15, -1])

    # the per-part path must not allocate rows x full-tail: patch np.empty
    # to fail on any full-tail allocation during a rest-indexed full gather
    import evfly_tpu.data.dataloading as dl

    real_empty = np.empty
    full_tail = ref.shape[1:]

    def guarded(shape, *a, **k):
        assert tuple(shape[1:]) != full_tail or shape[0] < len(ref), (
            "rest-indexed gather materialized the full concatenated rows"
        )
        return real_empty(shape, *a, **k)

    dl.np.empty = guarded
    try:
        np.testing.assert_array_equal(cf[:, 0], ref[:, 0])
    finally:
        dl.np.empty = real_empty

    # array-valued rest falls back to gather-then-index but stays correct
    sub = np.array([0, 2])
    np.testing.assert_array_equal(cf[1:7, sub], ref[1:7, sub])


def test_concat_frames_iter_blocks(parts):
    cf = ConcatFrames(parts)
    ref = np.concatenate(parts)
    out = np.zeros_like(ref)
    seen = 0
    for off, blk in cf.iter_blocks(4):
        out[off : off + blk.shape[0]] = blk
        seen += blk.shape[0]
    assert seen == len(ref)
    np.testing.assert_array_equal(out, ref)


def test_concat_frames_threshold(parts, monkeypatch):
    monkeypatch.delenv("EVFLY_LAZY_CONCAT_BYTES", raising=False)
    # small inputs stay eager ndarrays
    out = concat_frames(parts)
    assert isinstance(out, np.ndarray)
    # a single part passes through without copying (mmap stays mmap)
    assert concat_frames([parts[0]]) is parts[0]
    # forced lazy via env
    monkeypatch.setenv("EVFLY_LAZY_CONCAT_BYTES", "0")
    out = concat_frames(parts)
    assert isinstance(out, ConcatFrames)
    np.testing.assert_array_equal(np.asarray(out), np.concatenate(parts))


def _staged_host(learner, mode, B):
    dd = learner._get_device_data(mode, B)
    assert dd is not None
    dev, ev_offsets = dd
    return {k: np.asarray(v) for k, v in dev.items()}, np.asarray(ev_offsets)


@pytest.mark.parametrize("quantized", [True, False])
def test_lazy_staging_bitwise_equals_eager(tmp_path, rng, monkeypatch, quantized):
    """_get_device_data over ConcatFrames splits == over eager ndarrays."""
    (tmp_path / "b").mkdir()
    d1 = _toy_dataset(tmp_path, rng, n_traj=3, T=10)
    d2 = _toy_dataset(tmp_path / "b", rng, n_traj=2, T=14)

    def build(lazy):
        (tmp_path / ("lazy" if lazy else "eager")).mkdir(exist_ok=True)
        monkeypatch.setenv("EVFLY_LAZY_CONCAT_BYTES", "0" if lazy else str(1 << 40))
        cfg = _base_config(
            tmp_path / ("lazy" if lazy else "eager"),
            d1,
            dataset=[d1, d2],
            device_data_quantized=quantized,
        )
        return Learner(cfg)

    lazy, eager = build(True), build(False)
    assert isinstance(lazy.train.ims, ConcatFrames)
    assert isinstance(eager.train.ims, np.ndarray)

    for mode in ("train", "val"):
        host_l, evo_l = _staged_host(lazy, mode, B=8)
        host_e, evo_e = _staged_host(eager, mode, B=8)
        np.testing.assert_array_equal(evo_l, evo_e)
        assert set(host_l) == set(host_e)
        for k in host_l:
            assert host_l[k].dtype == host_e[k].dtype, k
            np.testing.assert_array_equal(host_l[k], host_e[k], err_msg=k)

    # and the staged dtypes are the residency dtypes, never f32 frames
    host, _ = _staged_host(lazy, "train", B=8)
    if quantized:
        assert host["depths"].dtype == np.uint8 and host["evs"].dtype == np.int8
    else:
        assert host["depths"].dtype.itemsize == 2 and host["evs"].dtype.itemsize == 2


def test_lazy_validation_epoch_runs(tmp_path, rng, monkeypatch):
    """The host-side val/run_model path (fancy indexing into the splits)
    works unchanged on ConcatFrames-backed splits."""
    (tmp_path / "b").mkdir()
    d1 = _toy_dataset(tmp_path, rng, n_traj=3, T=10)
    d2 = _toy_dataset(tmp_path / "b", rng, n_traj=2, T=14)
    monkeypatch.setenv("EVFLY_LAZY_CONCAT_BYTES", "0")
    cfg = _base_config(tmp_path, d1, dataset=[d1, d2])
    learner = Learner(cfg)
    assert isinstance(learner.val.depths, ConcatFrames)
    learner.validation(0)  # must not raise
