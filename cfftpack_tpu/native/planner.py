"""ctypes loader for the native C++ planner (libplancore.so).

Build with ``python -m cfftpack_tpu.native.build`` (see build.py).  All
entry points have pure-Python fallbacks in cfftpack_tpu.plan; this module
merely reports availability and wraps the C ABI.
"""
from __future__ import annotations

import ctypes
import os

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libplancore.so")
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.cft_factor.restype = ctypes.c_int
            lib.cft_factor.argtypes = [ctypes.c_long,
                                       ctypes.POINTER(ctypes.c_long),
                                       ctypes.c_int]
            lib.cft_next_fast_size.restype = ctypes.c_long
            lib.cft_next_fast_size.argtypes = [ctypes.c_long]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def factor(n: int) -> list[int]:
    lib = _load()
    buf = (ctypes.c_long * 64)()
    cnt = lib.cft_factor(n, buf, 64)
    if cnt < 0:
        raise ValueError(f"native factor failed for n={n}")
    return [buf[i] for i in range(cnt)]


def next_fast_size(n: int) -> int:
    lib = _load()
    return int(lib.cft_next_fast_size(n))
