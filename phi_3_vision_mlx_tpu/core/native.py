"""ctypes binding for the native zero-copy safetensors reader.

Builds ``native/st_mmap.cpp`` with g++ on first use (cached as
``native/libst_mmap.so``) and exposes :func:`load_file_mmap`, returning numpy
views that alias the mmap — no payload copy until the consumer touches the
pages (jax device_put streams directly from the page cache).

Falls back silently to the pure-Python ``safetensors`` package when no
compiler is available; ``core.weights.load_safetensors_dir`` prefers this
path when it imports cleanly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "st_mmap.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libst_mmap.so")

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def _bf16():
    import ml_dtypes

    return ml_dtypes.bfloat16


_lib = None


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
        check=True,
        capture_output=True,
    )
    return _SO


def get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        lib.st_open.restype = ctypes.c_void_p
        lib.st_open.argtypes = [ctypes.c_char_p]
        lib.st_error.restype = ctypes.c_char_p
        lib.st_count.restype = ctypes.c_int64
        lib.st_count.argtypes = [ctypes.c_void_p]
        lib.st_name.restype = ctypes.c_char_p
        lib.st_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.st_dtype.restype = ctypes.c_char_p
        lib.st_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.st_ndim.restype = ctypes.c_int64
        lib.st_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.st_shape.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.st_data.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.st_data.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.st_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class _MappedFile:
    """Keeps the mapping alive as long as any tensor view references it."""

    def __init__(self, path: str):
        self.lib = get_lib()
        self.handle = self.lib.st_open(path.encode())
        if not self.handle:
            raise OSError(
                f"st_mmap failed on {path}: {self.lib.st_error().decode()}"
            )

    def __del__(self):
        if getattr(self, "handle", None):
            self.lib.st_close(self.handle)
            self.handle = None


# Mappings referenced by returned arrays; ndarray instances can't carry
# attributes, so keep maps alive for the process lifetime (a handful of
# checkpoint files; each costs a file descriptor + page-table entries only).
_LIVE_MAPPINGS = []


def load_file_mmap(path: str) -> Dict[str, np.ndarray]:
    """Safetensors file -> {name: zero-copy numpy view}."""
    mf = _MappedFile(path)
    _LIVE_MAPPINGS.append(mf)
    lib = mf.lib
    out: Dict[str, np.ndarray] = {}
    n = lib.st_count(mf.handle)
    shape_buf = (ctypes.c_int64 * 8)()
    for i in range(n):
        name = lib.st_name(mf.handle, i).decode()
        dt = lib.st_dtype(mf.handle, i).decode()
        ndim = lib.st_ndim(mf.handle, i)
        lib.st_shape(mf.handle, i, shape_buf)
        shape = tuple(shape_buf[d] for d in range(ndim))
        nbytes = ctypes.c_int64()
        ptr = lib.st_data(mf.handle, i, ctypes.byref(nbytes))
        np_dtype = np.dtype(_bf16()) if dt == "BF16" else np.dtype(_DTYPES[dt])
        buf = (ctypes.c_uint8 * nbytes.value).from_address(
            ctypes.addressof(ptr.contents)
        )
        arr = np.frombuffer(buf, dtype=np_dtype).reshape(shape)
        out[name] = arr
    return out


def available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False
