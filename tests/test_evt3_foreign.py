"""EVT3 decoder vs a FOREIGN word stream (VERDICT r2 item #7).

`tests/test_evt3.py` round-trips the decoder against a per-event encoder
written alongside it (same hand, single-bit VECT masks only).  This file
stresses the decoder with streams it did not grow up with:

* a second, independently structured encoder that emits words the way a
  sensor back-end does — TIME_HIGH only on change, row-grouped events,
  multi-bit VECT_12/VECT_8 validity masks, CONTINUED/EXT_TRIGGER/OTHERS
  padding words interleaved;
* hand-assembled word sequences with full VECT masks, base_x advancement
  across chained vector words, TIME_HIGH-only gaps, backward TIME_HIGH
  jitter (must NOT count as 24-bit rollover);
* pathological headers (no trailing newline, bare '%', data-first files,
  width=/height= split across lines);
* the max_events cap crossing inside a vector word (advisor r2: the cap
  must hold mid-expansion, not only at word boundaries).

Format reference: public Prophesee "EVT 3.0" 16-bit word encoding (see
native/evt3.cpp header comment); reference consumer analog:
/root/reference/evfly_dv_ros/src/node.cpp:33-41.

Runnable standalone (no jax / pytest fixtures): python tests/test_evt3_foreign.py
"""

import os
import struct
import subprocess
import sys

import numpy as np

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "evfly_tpu", "native")


def _evt3mod():
    r = subprocess.run(
        ["make", "-C", NATIVE_DIR, "libevt3.so"], capture_output=True, text=True
    )
    if r.returncode != 0:
        import pytest

        pytest.skip(f"native build unavailable: {r.stderr[-400:]}")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from evfly_tpu.data import evt3

    return evt3


def W(type4, payload12):
    return struct.pack("<H", (type4 << 12) | (payload12 & 0x0FFF))


# ---------------------------------------------------------------------------
# Foreign encoder: a stateful sensor-back-end-style emitter.  Deliberately a
# different design from tests/test_evt3.py::encode_events — it batches events
# by (timestamp, row), emits time words only when the time fields CHANGE,
# compresses each row run into VECT_12/VECT_8 words with dense validity
# masks, and sprinkles non-CD words through the stream.
# ---------------------------------------------------------------------------


def sensor_emit(t_us, x, y, p, pad_every=7):
    """Encode events (already sorted by t) as a sensor would.

    Events sharing (t, y, p) are encoded as VECT_BASE_X + VECT_12/VECT_8
    words with multi-bit masks; singletons as EVT_ADDR_X.  Returns bytes.
    """
    out = bytearray()
    last_hi = None
    last_lo = None
    last_y = None
    nwords = 0

    def emit(b):
        nonlocal nwords
        out.extend(b)
        nwords += 1
        # interleave words that carry no CD events — decoders must skip them
        if pad_every and nwords % pad_every == 0:
            k = nwords // pad_every
            if k % 4 == 0:
                out.extend(W(0xA, 0x001))  # EXT_TRIGGER
            elif k % 4 == 1:
                out.extend(W(0xE, 0xABC))  # OTHERS
            elif k % 4 == 2:
                out.extend(W(0x7, 0x123))  # CONTINUED_4
            else:
                out.extend(W(0xF, 0xFFF))  # CONTINUED_12

    i = 0
    n = len(t_us)
    while i < n:
        t = int(t_us[i])
        hi, lo = (t >> 12) & 0xFFF, t & 0xFFF
        if hi != last_hi:
            emit(W(0x8, hi))
            last_hi = hi
        if lo != last_lo:
            emit(W(0x6, lo))
            last_lo = lo
        yy = int(y[i])
        if yy != last_y:
            emit(W(0x0, yy))
            last_y = yy
        # gather the run sharing (t, y, p)
        j = i
        while (
            j < n
            and int(t_us[j]) == t
            and int(y[j]) == yy
            and int(p[j]) == int(p[i])
        ):
            j += 1
        xs = sorted(int(v) for v in x[i:j])
        pol_bit = 0x0800 if p[i] > 0 else 0
        if j - i == 1:
            emit(struct.pack("<H", (0x2 << 12) | pol_bit | xs[0]))
        else:
            base = xs[0]
            emit(struct.pack("<H", (0x3 << 12) | pol_bit | base))
            k = 0
            while k < len(xs):
                span = [v - base for v in xs[k:] if v - base < 12]
                if len(span) <= 8 and all(v < 8 for v in span):
                    mask = 0
                    for v in span:
                        mask |= 1 << v
                    emit(W(0x5, mask))
                    base += 8
                else:
                    mask = 0
                    for v in span:
                        mask |= 1 << v
                    emit(W(0x4, mask))
                    base += 12
                k += len(span)
        i = j
    return bytes(out)


def make_row_events(rng, n_rows=60, w=640, h=480, t0=0):
    """Bursty row-structured events: each row fires a cluster of nearby x
    at one timestamp — the shape VECT words exist for."""
    ts, xs, ys, ps = [], [], [], []
    t = t0
    for _ in range(n_rows):
        t += int(rng.integers(1, 4000))
        yy = int(rng.integers(0, h))
        pol = int(rng.choice([-1, 1]))
        x0 = int(rng.integers(0, w - 24))
        offs = np.unique(rng.integers(0, 20, rng.integers(2, 12)))
        for o in offs:
            ts.append(t)
            xs.append(x0 + int(o))
            ys.append(yy)
            ps.append(pol)
    return (np.array(ts), np.array(xs), np.array(ys), np.array(ps))


def _sorted_tuples(ev):
    return sorted(zip(ev["t"].tolist(), ev["x"].tolist(), ev["y"].tolist(), ev["p"].tolist()))


def test_foreign_sensor_stream_roundtrip(evt3mod=None):
    evt3mod = evt3mod or _evt3mod()
    rng = np.random.default_rng(42)
    t, x, y, p = make_row_events(rng)
    dec = evt3mod.decode_evt3_bytes(sensor_emit(t, x, y, p))
    # the emitter reorders within a (t,y,p) run (sorted x); compare as sets
    want = sorted(zip(t.tolist(), x.tolist(), y.tolist(), p.tolist()))
    assert _sorted_tuples(dec) == want
    assert len(dec["t"]) == len(t)


def test_full_mask_vect12_and_chained_vectors(evt3mod=None):
    evt3mod = evt3mod or _evt3mod()
    buf = bytearray()
    buf += W(0x8, 1) + W(0x6, 0x234) + W(0x0, 33)
    buf += struct.pack("<H", (0x3 << 12) | 0x0800 | 100)  # base=100 pol=+
    buf += W(0x4, 0xFFF)          # all 12 valid -> x 100..111, base->112
    buf += W(0x4, 0b100000000001)  # x 112 and 123, base->124
    buf += W(0x5, 0b10010001)      # x 124, 128, 131, base->132
    buf += W(0x5, 0x00)            # empty mask: no events, base->140
    buf += struct.pack("<H", (0x2 << 12) | 0 | 140)  # single, pol=-
    dec = evt3mod.decode_evt3_bytes(bytes(buf))
    want_x = list(range(100, 112)) + [112, 123, 124, 128, 131, 140]
    np.testing.assert_array_equal(dec["x"], want_x)
    t_want = (1 << 12) | 0x234
    np.testing.assert_array_equal(dec["t"], [t_want] * len(want_x))
    np.testing.assert_array_equal(dec["y"], [33] * len(want_x))
    np.testing.assert_array_equal(dec["p"], [1] * (len(want_x) - 1) + [-1])


def test_time_high_only_gaps_and_jitter(evt3mod=None):
    evt3mod = evt3mod or _evt3mod()
    buf = bytearray()
    buf += W(0x8, 5) + W(0x6, 7) + W(0x0, 1)
    buf += struct.pack("<H", (0x2 << 12) | 0x0800 | 10)
    # TIME_HIGH advances several times with NO TIME_LOW in between
    buf += W(0x8, 6) + W(0x8, 7) + W(0x8, 9)
    buf += struct.pack("<H", (0x2 << 12) | 0x0800 | 11)
    # small backward TIME_HIGH jitter (<=2048): NOT a 24-bit rollover
    buf += W(0x8, 8)
    buf += struct.pack("<H", (0x2 << 12) | 0 | 12)
    dec = evt3mod.decode_evt3_bytes(bytes(buf))
    np.testing.assert_array_equal(
        dec["t"], [(5 << 12) | 7, (9 << 12) | 7, (8 << 12) | 7]
    )
    assert dec["t"][2] < 1 << 24  # no spurious rollover


def test_genuine_rollover_via_sensor_emitter(evt3mod=None):
    evt3mod = evt3mod or _evt3mod()
    rng = np.random.default_rng(3)
    # cluster just below and above the 24-bit wrap
    t1, x1, y1, p1 = make_row_events(rng, n_rows=10, t0=(1 << 24) - 30000)
    t1 = np.minimum(t1, (1 << 24) - 1)
    t2, x2, y2, p2 = make_row_events(rng, n_rows=10, t0=5)
    t = np.concatenate([t1, t2])
    enc = sensor_emit(
        t & 0xFFFFFF,
        np.concatenate([x1, x2]),
        np.concatenate([y1, y2]),
        np.concatenate([p1, p2]),
        pad_every=5,
    )
    dec = evt3mod.decode_evt3_bytes(enc)
    true_t = np.concatenate([t1, t2 + (1 << 24)])
    assert sorted(dec["t"].tolist()) == sorted(true_t.tolist())
    assert dec["t"].max() == true_t.max()


def test_max_events_cap_inside_vector(evt3mod=None):
    evt3mod = evt3mod or _evt3mod()
    buf = bytearray()
    buf += W(0x8, 0) + W(0x6, 50) + W(0x0, 2)
    buf += struct.pack("<H", (0x3 << 12) | 0x0800 | 0)
    buf += W(0x4, 0xFFF)  # expands to 12 events
    dec = evt3mod.decode_evt3_bytes(bytes(buf), max_events=5)
    assert len(dec["t"]) == 5
    np.testing.assert_array_equal(dec["x"], [0, 1, 2, 3, 4])


def test_pathological_headers(evt3mod=None):
    evt3mod = evt3mod or _evt3mod()
    body = W(0x8, 0) + W(0x6, 9) + W(0x0, 4) + struct.pack(
        "<H", (0x2 << 12) | 0x0800 | 123
    )

    # no header at all: data starts at byte 0
    dec = evt3mod.decode_evt3_bytes(bytes(body))
    np.testing.assert_array_equal(dec["x"], [123])
    assert (dec["width"], dec["height"]) == (0, 0)

    # bare '%' lines, split width=/height= lines, junk keys, no trailing
    # newline on the last header line
    hdr = (
        b"%\n"
        b"% camera_integrator_name Prophesee\n"
        b"% format EVT3;width=1280\n"
        b"% height=720\n"
        b"% date 2024-01-01\n"
    )
    dec = evt3mod.decode_evt3_bytes(bytes(hdr + body))
    assert (dec["width"], dec["height"]) == (1280, 720)
    np.testing.assert_array_equal(dec["x"], [123])

    # geometry line wins regardless of order; header longer than data
    hdr2 = b"% geometry 640x480\n" + b"% " + b"z" * 4096 + b"\n"
    dec = evt3mod.decode_evt3_bytes(bytes(hdr2 + body))
    assert (dec["width"], dec["height"]) == (640, 480)
    np.testing.assert_array_equal(dec["t"], [9])


def test_truncated_and_empty_streams(evt3mod=None):
    evt3mod = evt3mod or _evt3mod()
    # odd trailing byte must be ignored, not crash
    body = W(0x8, 0) + W(0x6, 1) + W(0x0, 0) + struct.pack(
        "<H", (0x2 << 12) | 200
    )
    dec = evt3mod.decode_evt3_bytes(bytes(body) + b"\x7f")
    np.testing.assert_array_equal(dec["x"], [200])
    np.testing.assert_array_equal(dec["p"], [-1])
    # header-only file decodes to zero events
    dec = evt3mod.decode_evt3_bytes(b"% geometry 640x480\n")
    assert len(dec["t"]) == 0 and dec["width"] == 640


if __name__ == "__main__":
    mod = _evt3mod()
    for name, fn in sorted(globals().items()):
        if name.startswith("test_"):
            fn(mod)
            print(f"{name}: ok")
    print("all foreign EVT3 tests passed")
