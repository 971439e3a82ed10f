"""EVT3 decoder (native/evt3.cpp via data/evt3.py) against an independent
pure-Python encoder of the public Prophesee EVT 3.0 format: synthesized
event streams encoded with Y/X/VECT/TIME words must decode back exactly,
including 24-bit timestamp rollover and header geometry parsing."""

import os
import struct
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "evfly_tpu", "native")


def _build():
    r = subprocess.run(["make", "-C", NATIVE_DIR, "libevt3.so"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"native build unavailable: {r.stderr[-400:]}")


@pytest.fixture(scope="module")
def evt3mod():
    _build()
    from evfly_tpu.data import evt3

    return evt3


def _word(type4, payload12):
    return struct.pack("<H", (type4 << 12) | (payload12 & 0x0FFF))


def encode_events(t_us, x, y, p, vect=False):
    """Independent EVT3 encoder: emits TIME_HIGH/TIME_LOW before each event
    (redundant but legal), ADDR_Y per event, then ADDR_X — or VECT_BASE_X +
    VECT_12 when ``vect`` (events must then come in runs of consecutive x)."""
    out = bytearray()
    for i in range(len(t_us)):
        t = int(t_us[i])
        out += _word(0x8, (t >> 12) & 0x0FFF)
        out += _word(0x6, t & 0x0FFF)
        out += _word(0x0, int(y[i]))
        pol_bit = 0x0800 if p[i] > 0 else 0
        if vect:
            out += struct.pack("<H", (0x3 << 12) | pol_bit | int(x[i]))
            out += _word(0x4, 0b000000000001)  # single valid bit at offset 0
        else:
            out += struct.pack("<H", (0x2 << 12) | pol_bit | int(x[i]))
    return bytes(out)


def test_single_events_roundtrip(evt3mod):
    rng = np.random.default_rng(0)
    n = 500
    t = np.sort(rng.integers(0, 1 << 22, n))
    x = rng.integers(0, 640, n)
    y = rng.integers(0, 480, n)
    p = rng.choice([-1, 1], n)
    ev = evt3mod.decode_evt3_bytes(encode_events(t, x, y, p))
    np.testing.assert_array_equal(ev["t"], t)
    np.testing.assert_array_equal(ev["x"], x)
    np.testing.assert_array_equal(ev["y"], y)
    np.testing.assert_array_equal(ev["p"], p)


def test_vector_words_roundtrip(evt3mod):
    rng = np.random.default_rng(1)
    n = 200
    t = np.sort(rng.integers(0, 1 << 20, n))
    x = rng.integers(0, 600, n)
    y = rng.integers(0, 400, n)
    p = rng.choice([-1, 1], n)
    ev = evt3mod.decode_evt3_bytes(encode_events(t, x, y, p, vect=True))
    np.testing.assert_array_equal(ev["t"], t)
    np.testing.assert_array_equal(ev["x"], x)
    np.testing.assert_array_equal(ev["y"], y)
    np.testing.assert_array_equal(ev["p"], p)


def test_vect12_mask_expansion(evt3mod):
    """One VECT_BASE_X + VECT_12 word pair expands the validity mask into
    consecutive x positions sharing time/y/polarity."""
    buf = bytearray()
    buf += _word(0x8, 0)
    buf += _word(0x6, 100)
    buf += _word(0x0, 7)
    buf += struct.pack("<H", (0x3 << 12) | 0x0800 | 40)  # base_x=40, pol=+
    buf += _word(0x4, 0b101000000011)  # offsets 0,1,9,11
    ev = evt3mod.decode_evt3_bytes(bytes(buf))
    np.testing.assert_array_equal(ev["x"], [40, 41, 49, 51])
    np.testing.assert_array_equal(ev["y"], [7] * 4)
    np.testing.assert_array_equal(ev["t"], [100] * 4)
    np.testing.assert_array_equal(ev["p"], [1] * 4)


def test_timestamp_rollover(evt3mod):
    """TIME_HIGH wrap (24-bit us counter, ~16.8 s) must extend monotonically."""
    t = np.array([(1 << 24) - 5, (1 << 24) - 1, (1 << 24) + 3, (1 << 24) + 10])
    # encoder emits the low 24 bits; decoder must reconstruct the overflow
    enc = encode_events(t & 0xFFFFFF, [1, 2, 3, 4], [5, 6, 7, 8], [1, -1, 1, -1])
    ev = evt3mod.decode_evt3_bytes(enc)
    np.testing.assert_array_equal(ev["t"], t)
    assert np.all(np.diff(ev["t"]) > 0)


def test_header_and_file_roundtrip(evt3mod, tmp_path):
    header = b"% evt 3.0\n% format EVT3;height=480;width=640\n% geometry 640x480\n% end\n"
    t = [10, 20, 30]
    payload = encode_events(t, [0, 639, 320], [0, 479, 240], [1, 1, -1])
    path = tmp_path / "rec.raw"
    path.write_bytes(header + payload)
    ev = evt3mod.read_evt3(str(path))
    assert (ev["width"], ev["height"]) == (640, 480)
    np.testing.assert_array_equal(ev["t"], t)
    np.testing.assert_array_equal(ev["x"], [0, 639, 320])
    # max_events truncation
    ev2 = evt3mod.read_evt3(str(path), max_events=2)
    assert len(ev2["t"]) == 2


def test_feeds_realdata_pipeline(evt3mod):
    """Decoded EVT3 arrays drive package_real_sequence end-to-end (the
    documented real-data path: .raw -> (t,x,y,p) -> h5 trajectory)."""
    from evfly_tpu.data.realdata import package_real_sequence

    rng = np.random.default_rng(2)
    n = 4000
    t_us = np.sort(rng.integers(0, 500_000, n))
    enc = encode_events(t_us, rng.integers(0, 346, n), rng.integers(0, 260, n),
                        rng.choice([-1, 1], n))
    ev = evt3mod.decode_evt3_bytes(enc)
    depth_ts = np.arange(0.0, 0.5, 1 / 15)
    depth = rng.random((len(depth_ts), 260, 346)).astype(np.float32)
    traj = package_real_sequence(
        "real_evt3", ev["t"] * 1e-6, ev["x"].astype(np.int32),
        ev["y"].astype(np.int32), ev["p"].astype(np.int32), depth, depth_ts,
        desired_vel=4.0, sensor_hw=(260, 346),
    )
    assert traj["evs"].shape[1:] == (260, 346)
    assert traj["evs"].shape[0] == len(traj["depths"]) - 1
    assert np.isfinite(traj["evs"]).all()
