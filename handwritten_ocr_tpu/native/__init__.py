"""Native C++ text-metric kernels (ctypes bindings, lazy g++ build).

Provides ``edit_distance_u32`` and ``lcs_align`` backed by
``fasttext.cpp``. The library is compiled on first import into a cache
directory; any failure (no compiler, sandboxed build) silently falls back
to the NumPy engines — results are bit-identical either way (contract
tests in tests/test_native.py).

Set ``HOCR_TPU_NO_NATIVE=1`` to force the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

__all__ = ["edit_distance_u32", "lcs_align", "available"]

_SRC = Path(__file__).parent / "fasttext.cpp"
_lib: ctypes.CDLL | None = None


def _build_library() -> ctypes.CDLL | None:
    if os.environ.get("HOCR_TPU_NO_NATIVE"):
        return None
    cache_dir = Path(os.environ.get("XDG_CACHE_HOME",
                                    Path.home() / ".cache")) / "hocr_tpu"
    cache_dir.mkdir(parents=True, exist_ok=True)
    lib_path = cache_dir / "libfasttext.so"
    if not lib_path.exists() or lib_path.stat().st_mtime < _SRC.stat().st_mtime:
        with tempfile.NamedTemporaryFile(suffix=".so", dir=cache_dir,
                                         delete=False) as tmp:
            tmp_path = Path(tmp.name)
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               str(_SRC), "-o", str(tmp_path)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            tmp_path.replace(lib_path)
        except Exception:
            tmp_path.unlink(missing_ok=True)
            return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError:
        return None
    lib.edit_distance_u32.restype = ctypes.c_int64
    lib.edit_distance_u32.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
    ]
    lib.lcs_align_i64.restype = None
    lib.lcs_align_i64.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


def _get_lib() -> ctypes.CDLL | None:
    global _lib
    if _lib is None:
        _lib = _build_library() or False  # type: ignore[assignment]
    return _lib or None


def available() -> bool:
    return _get_lib() is not None


def edit_distance_u32(a: np.ndarray, b: np.ndarray) -> int:
    """Unit-cost edit distance between two uint32 code vectors."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    a = np.ascontiguousarray(a, dtype=np.uint32)
    b = np.ascontiguousarray(b, dtype=np.uint32)
    ptr = ctypes.POINTER(ctypes.c_uint32)
    return int(lib.edit_distance_u32(a.ctypes.data_as(ptr), len(a),
                                     b.ctypes.data_as(ptr), len(b)))


def lcs_align(backbone: np.ndarray, words: np.ndarray) -> np.ndarray:
    """Aligned word index (or -1) per backbone position; see fasttext.cpp."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    backbone = np.ascontiguousarray(backbone, dtype=np.int64)
    words = np.ascontiguousarray(words, dtype=np.int64)
    out = np.empty(len(backbone), dtype=np.int64)
    ptr = ctypes.POINTER(ctypes.c_int64)
    lib.lcs_align_i64(backbone.ctypes.data_as(ptr), len(backbone),
                      words.ctypes.data_as(ptr), len(words),
                      out.ctypes.data_as(ptr))
    return out
