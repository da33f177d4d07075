"""ctypes bindings for the native event loader (native/event_loader.cpp).

Builds the shared library on demand (g++, cached next to the source) and
falls back to the pure-Python path in esvo_tpu.io.events when no compiler
is available. Use `load_events_native` / `frame_events_native` as drop-in
fast replacements for `load_events_txt` / `frame_events`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from esvo_tpu.io.events import EventArray

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "event_loader.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libevent_loader.so")

_lib = None
_probed = False


def _build() -> str | None:
    """Compile the shared library. Returns None only when no compiler
    exists; a *failed* compile with a present toolchain raises — a silent
    fallback would hide a broken native path behind the Python one."""
    if os.path.exists(_LIB):
        # a prebuilt .so without the source alongside is fine
        if not os.path.exists(_SRC) or \
                os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
    if not os.path.exists(_SRC):
        return None  # neither artifact nor source: Python fallback
    try:
        proc = subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
             "-o", _LIB],
            capture_output=True, text=True)
    except OSError:
        return None  # no g++ on PATH
    if proc.returncode != 0:
        raise RuntimeError(
            f"native event_loader build failed:\n{proc.stderr}")
    return _LIB


def get_lib():
    """The loaded ctypes library, or None when unavailable (the probe
    result — including failure — is cached, so a g++-less machine does
    not re-spawn a compiler per call)."""
    global _lib, _probed
    if _lib is not None or _probed:
        return _lib
    _probed = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.el_load_txt.restype = ctypes.c_void_p
    lib.el_load_txt.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_int64)]
    lib.el_from_arrays.restype = ctypes.c_void_p
    lib.el_from_arrays.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64]
    lib.el_size.restype = ctypes.c_int64
    lib.el_size.argtypes = [ctypes.c_void_p]
    lib.el_read.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8)]
    lib.el_frame.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32)]
    lib.el_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def load_events_native(path: str,
                       max_events: int | None = None) -> EventArray:
    """Fast events.txt loader; falls back to the Python parser."""
    lib = get_lib()
    if lib is None:
        from esvo_tpu.io.events import load_events_txt
        return load_events_txt(path, max_events)
    n = ctypes.c_int64(0)
    h = lib.el_load_txt(path.encode(), max_events or 0, ctypes.byref(n))
    if not h:
        raise FileNotFoundError(path)
    try:
        N = n.value
        t = np.empty(N, np.float64)
        x = np.empty(N, np.int32)
        y = np.empty(N, np.int32)
        p = np.empty(N, np.uint8)
        lib.el_read(h, _ptr(t, ctypes.c_double), _ptr(x, ctypes.c_int32),
                    _ptr(y, ctypes.c_int32), _ptr(p, ctypes.c_uint8))
    finally:
        lib.el_free(h)
    return EventArray(t=t, x=x, y=y, p=p.astype(bool))


def frame_events_native(ev: EventArray, sync_times: np.ndarray,
                        capacity: int):
    """Native framing: identical output contract to io.events.frame_events."""
    # same absolute-timestamp guard as the Python path: el_frame casts t
    # to float32, whose resolution at epoch scale (~1.4e9 s) is ~128 s —
    # silently collapsing time-surface decay
    if len(ev.t) and abs(float(ev.t[0])) >= 1e6:
        raise ValueError(
            "frame_events_native: timestamps look absolute (t[0]="
            f"{float(ev.t[0]):.3e}); rebase first (EventArray.rebased()).")
    lib = get_lib()
    if lib is None:
        from esvo_tpu.io.events import frame_events
        return frame_events(ev, sync_times, capacity)
    t64 = np.ascontiguousarray(ev.t, np.float64)
    x32 = np.ascontiguousarray(ev.x, np.int32)
    y32 = np.ascontiguousarray(ev.y, np.int32)
    p8 = np.ascontiguousarray(ev.p, np.uint8)
    h = lib.el_from_arrays(_ptr(t64, ctypes.c_double),
                           _ptr(x32, ctypes.c_int32),
                           _ptr(y32, ctypes.c_int32),
                           _ptr(p8, ctypes.c_uint8), len(ev))
    try:
        sync = np.ascontiguousarray(sync_times, np.float64)
        K = len(sync)
        x = np.zeros((K, capacity), np.int32)
        y = np.zeros((K, capacity), np.int32)
        t = np.zeros((K, capacity), np.float32)
        p = np.zeros((K, capacity), np.uint8)
        valid = np.zeros((K, capacity), np.uint8)
        dropped = np.zeros(K, np.int32)
        lib.el_frame(h, _ptr(sync, ctypes.c_double), K, capacity,
                     _ptr(x, ctypes.c_int32), _ptr(y, ctypes.c_int32),
                     _ptr(t, ctypes.c_float), _ptr(p, ctypes.c_uint8),
                     _ptr(valid, ctypes.c_uint8),
                     _ptr(dropped, ctypes.c_int32))
    finally:
        lib.el_free(h)
    return dict(x=x, y=y, t=t, p=p.astype(bool), valid=valid.astype(bool),
                dropped=dropped)
