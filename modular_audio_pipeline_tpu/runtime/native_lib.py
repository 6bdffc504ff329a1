"""ctypes loader for the native host runtime (auto-built with g++).

The C++ sources live in ``runtime/native/``; the shared library is built
on first use into the user cache (no pip/apt involved) and every entry
point has a NumPy fallback, so environments without a toolchain lose only
speed, never functionality.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["load_native", "native_dtw_path", "have_native"]

_SRC = Path(__file__).parent / "native" / "map_audio.cc"
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _lib_path() -> Path:
    cache = os.environ.get(
        "MAP_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "map_tpu"),
    )
    return Path(cache) / "libmap_audio.so"


def _build() -> Optional[Path]:
    out = _lib_path()
    out.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        str(_SRC), "-o", str(out),
    ]
    try:
        result = subprocess.run(cmd, capture_output=True, timeout=120)
        if result.returncode != 0:
            logger.warning(
                "native build failed: %s", result.stderr.decode(errors="replace")[-400:]
            )
            return None
        return out
    except (subprocess.SubprocessError, FileNotFoundError) as exc:
        logger.info("native toolchain unavailable (%s); using NumPy fallbacks", exc)
        return None


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True

    path = _lib_path()
    if not path.exists() or path.stat().st_mtime < _SRC.stat().st_mtime:
        built = _build()
        if built is None:
            return None
        path = built

    try:
        lib = ctypes.CDLL(str(path))
        lib.dtw_path.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.dtw_path.restype = None
        lib.pcm16_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.pcm16_to_f32.restype = None
        lib.f32_to_pcm16.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int16),
            ctypes.c_int64,
        ]
        lib.f32_to_pcm16.restype = None
        lib.crossfade_concat.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.crossfade_concat.restype = ctypes.c_int64
        _lib = lib
        logger.debug("Loaded native runtime from %s", path)
    except OSError as exc:
        logger.warning("Failed to load native runtime: %s", exc)
        _lib = None
    return _lib


def have_native() -> bool:
    return load_native() is not None


def native_dtw_path(cost: np.ndarray) -> Optional[np.ndarray]:
    """C++ DTW backtrace; None when the native library is unavailable."""
    lib = load_native()
    if lib is None:
        return None
    cost64 = np.ascontiguousarray(cost, dtype=np.float64)
    s_len, t_len = cost64.shape
    cols = np.zeros(s_len, dtype=np.int64)
    lib.dtw_path(
        cost64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(s_len),
        ctypes.c_int32(t_len),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return cols


def native_pcm16_to_f32(pcm: np.ndarray) -> Optional[np.ndarray]:
    lib = load_native()
    if lib is None:
        return None
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    out = np.empty(pcm.shape, dtype=np.float32)
    lib.pcm16_to_f32(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pcm.size),
    )
    return out


def native_f32_to_pcm16(x: np.ndarray) -> Optional[np.ndarray]:
    lib = load_native()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(x.shape, dtype=np.int16)
    lib.f32_to_pcm16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.c_int64(x.size),
    )
    return out


def native_crossfade_concat(chunks, crossfades_ms, sr: int) -> Optional[np.ndarray]:
    """C++ crossfaded concatenation; None when the native lib is missing."""
    lib = load_native()
    if lib is None or not chunks:
        return None
    spms = sr // 1000
    arrs = [np.ascontiguousarray(c, dtype=np.float32) for c in chunks]
    n = len(arrs)
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arrs]
    )
    lens = np.asarray([len(a) for a in arrs], dtype=np.int64)
    xfs = np.zeros(n, dtype=np.int32)
    xfs[1:] = np.asarray([int(x) * spms for x in crossfades_ms], dtype=np.int32)
    out = np.empty(int(lens.sum()), dtype=np.float32)
    written = lib.crossfade_concat(
        ptrs,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        xfs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out[:written]
