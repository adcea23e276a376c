"""Native (C++) runtime components, loaded via ctypes.

Currently: the type-scheduling beam search (``scheduler.cpp``), compiled
lazily on first use with the system toolchain.  All native components
have pure-Python fallbacks — the package works without a compiler.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libscheduler.so")
_SRC = os.path.join(_DIR, "scheduler.cpp")

_lib = None
_build_failed = False


def _load():
    """Compile (if needed) and load the native scheduler; returns the
    ctypes library or ``None`` when unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    _SRC, "-o", _SO,
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.grafx_beam_search.restype = ctypes.c_int
        lib.grafx_beam_search.argtypes = [
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib
    except OSError:
        _build_failed = True
        return None


def native_available():
    return _load() is not None


def beam_search_native(node_types, edge_indices, width=64, depth=1):
    """Run the native beam search.

    Args:
        node_types: ``(N,)`` int array.
        edge_indices: ``(2, E)`` int array.

    Returns:
        ``(type_sequence, render_order)`` numpy arrays, or ``None`` when
        the native library is unavailable or the search fails.
    """
    lib = _load()
    if lib is None:
        return None
    node_types = np.ascontiguousarray(node_types, dtype=np.int32)
    src = np.ascontiguousarray(edge_indices[0], dtype=np.int32)
    dst = np.ascontiguousarray(edge_indices[1], dtype=np.int32)
    N, E = len(node_types), len(src)
    max_seq = N + 2
    out_order = np.empty(N, dtype=np.int32)
    out_seq = np.empty(max_seq, dtype=np.int32)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    seq_len = lib.grafx_beam_search(
        N, E, ptr(src), ptr(dst), ptr(node_types),
        int(width), int(depth), ptr(out_order), ptr(out_seq), max_seq
    )
    if seq_len < 0:
        return None
    return (
        out_seq[:seq_len].astype(np.int64),
        out_order.astype(np.int64),
    )
