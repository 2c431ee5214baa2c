"""ctypes loader for the native host runtime (native/fgdp_native.cc).

Compiles on first use (g++ -O3 -shared) into native/; every consumer has
a pure-Python fallback, so a missing toolchain degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.join(_DIR, "fgdp_native.cc")
_SO = os.path.join(_DIR, "fgdp_native.so")

_lib = None
_tried = False


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
        check=True, capture_output=True)


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.parse_fastq_chunk.restype = ctypes.c_long
        lib.parse_sam_numeric.restype = ctypes.c_long
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib = None
    return _lib


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def parse_fastq_chunk(data: bytes, max_reads: int, max_len: int,
                      name_cap: int = 128):
    """Returns (names, codes u8[B,L], quals u8[B,L], lens i32[B],
    consumed) or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    codes = np.empty((max_reads, max_len), np.uint8)
    quals = np.empty((max_reads, max_len), np.uint8)
    lens = np.zeros(max_reads, np.int32)
    names = np.zeros((max_reads, name_cap), np.uint8)
    consumed = ctypes.c_long(0)
    n = lib.parse_fastq_chunk(
        data, ctypes.c_long(len(data)), ctypes.c_long(max_reads),
        ctypes.c_long(max_len), _ptr(codes, ctypes.c_ubyte),
        _ptr(quals, ctypes.c_ubyte), _ptr(lens, ctypes.c_int32),
        _ptr(names, ctypes.c_char), ctypes.c_long(name_cap),
        ctypes.byref(consumed))
    name_list = [bytes(names[i]).rstrip(b"\0").decode()
                 for i in range(n)]
    return (name_list, codes[:n], quals[:n], lens[:n], consumed.value)


def parse_sam_numeric(data: bytes, max_recs: int):
    """Returns dict of numeric per-record arrays + line offsets, or None."""
    lib = get_lib()
    if lib is None:
        return None
    i32 = lambda: np.zeros(max_recs, np.int32)
    i64 = lambda: np.zeros(max_recs, np.int64)
    out = dict(flag=i32(), pos=i64(), mapq=i32(), lead_clip=i32(),
               tail_clip=i32(), ref_len=i32(), score=i32(), tile=i32(),
               tx=i32(), ty=i32(), line_start=i64(), line_end=i64())
    n = lib.parse_sam_numeric(
        data, ctypes.c_long(len(data)), ctypes.c_long(max_recs),
        _ptr(out["flag"], ctypes.c_int32), _ptr(out["pos"], ctypes.c_int64),
        _ptr(out["mapq"], ctypes.c_int32),
        _ptr(out["lead_clip"], ctypes.c_int32),
        _ptr(out["tail_clip"], ctypes.c_int32),
        _ptr(out["ref_len"], ctypes.c_int32),
        _ptr(out["score"], ctypes.c_int32),
        _ptr(out["tile"], ctypes.c_int32), _ptr(out["tx"], ctypes.c_int32),
        _ptr(out["ty"], ctypes.c_int32),
        _ptr(out["line_start"], ctypes.c_int64),
        _ptr(out["line_end"], ctypes.c_int64))
    return {k: v[:n] for k, v in out.items()}
