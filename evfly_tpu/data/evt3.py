"""Prophesee EVT3 raw-recording reader (ctypes over native/evt3.cpp).

Entry point for real recorded event data without ROS: the reference ingests
camera streams through driver nodes into rosbags
(data_gather/depth_and_events.py); the cameras' native on-disk format is
EVT3 (.raw), which this reads into flat (t_us, x, y, p) arrays ready for
``evfly_tpu.data.realdata.package_real_sequence`` (voxelize → h5 trajectory
schema) or the streaming accumulator.

    ev = read_evt3("recording.raw")
    traj = package_real_sequence("real_000", ev["t"] * 1e-6, ev["x"], ev["y"],
                                 ev["p"], depth_frames, depth_ts, ...)

Build: ``make -C evfly_tpu/native`` (libevt3.so).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Dict, Optional

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()


def _load():
    global _LIB
    with _LIB_LOCK:
        if _LIB is None:
            so = os.path.join(os.path.dirname(__file__), "..", "native", "libevt3.so")
            if not os.path.exists(so):
                raise RuntimeError(
                    "native libevt3.so not built — run `make -C evfly_tpu/native`"
                )
            lib = ctypes.CDLL(so)
            lib.evt3_decode_file.restype = ctypes.c_void_p
            lib.evt3_decode_file.argtypes = [ctypes.c_char_p, ctypes.c_longlong]
            lib.evt3_decode_buffer.restype = ctypes.c_void_p
            lib.evt3_decode_buffer.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong, ctypes.c_longlong,
            ]
            lib.evt3_count.restype = ctypes.c_longlong
            lib.evt3_count.argtypes = [ctypes.c_void_p]
            lib.evt3_geometry.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.evt3_copy.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint16),
                ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_int8),
            ]
            lib.evt3_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
    return _LIB


def _extract(lib, handle) -> Dict[str, np.ndarray]:
    try:
        n = lib.evt3_count(handle)
        w = ctypes.c_int(0)
        h = ctypes.c_int(0)
        lib.evt3_geometry(handle, ctypes.byref(w), ctypes.byref(h))
        t = np.empty(n, np.int64)
        x = np.empty(n, np.uint16)
        y = np.empty(n, np.uint16)
        p = np.empty(n, np.int8)
        if n:
            lib.evt3_copy(
                handle,
                t.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                p.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            )
        return {"t": t, "x": x, "y": y, "p": p,
                "width": int(w.value), "height": int(h.value)}
    finally:
        lib.evt3_free(handle)


def read_evt3(path: str, max_events: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Decode an EVT3 .raw file.  Returns {"t" (us, int64), "x", "y"
    (uint16), "p" (int8 ±1), "width", "height"} (geometry 0 if the header
    carries none)."""
    lib = _load()
    handle = lib.evt3_decode_file(
        os.fspath(path).encode(), -1 if max_events is None else int(max_events)
    )
    if not handle:
        raise IOError(f"cannot read EVT3 file: {path}")
    return _extract(lib, handle)


def decode_evt3_bytes(buf: bytes, max_events: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Decode EVT3 from an in-memory buffer (header optional)."""
    lib = _load()
    arr = np.frombuffer(buf, np.uint8)
    handle = lib.evt3_decode_buffer(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(arr),
        -1 if max_events is None else int(max_events),
    )
    if not handle:
        raise IOError("EVT3 buffer decode failed")
    return _extract(lib, handle)
