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

__all__ = [
    "load_native", "native_dtw_path", "have_native", "native_flac_decode",
    "load_native_av", "have_native_av", "native_av_decode",
    "native_av_probe", "native_av_encode",
]

_SRC_DIR = Path(__file__).parent / "native"
_SOURCES = sorted(_SRC_DIR.glob("*.cc"))
_AV_SOURCES = sorted((_SRC_DIR / "av").glob("*.cc"))
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False
_av_lib: Optional[ctypes.CDLL] = None
_av_load_attempted = False


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
        *[str(s) for s in _SOURCES], "-o", str(out),
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
    # headers too: the generated table headers change independently
    newest_src = max(
        s.stat().st_mtime for s in (*_SOURCES, *_SRC_DIR.glob("*.h"))
    )
    if not path.exists() or path.stat().st_mtime < newest_src:
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
        lib.flac_probe.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.flac_probe.restype = ctypes.c_int64
        lib.flac_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.flac_decode.restype = ctypes.c_int64
        lib.mp3_probe.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mp3_probe.restype = ctypes.c_int64
        lib.mp3_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mp3_decode.restype = ctypes.c_int64
        _lib = lib
        logger.debug("Loaded native runtime from %s", path)
    except OSError as exc:
        logger.warning("Failed to load native runtime: %s", exc)
        _lib = None
    return _lib


def have_native() -> bool:
    return load_native() is not None


# -- libav container shim (separate .so: needs system libavformat/-codec) ------


def _av_lib_path() -> Path:
    return _lib_path().parent / "libmap_av.so"


def _build_av() -> Optional[Path]:
    out = _av_lib_path()
    out.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        *[str(s) for s in _AV_SOURCES], "-o", str(out),
        "-lavformat", "-lavcodec", "-lswresample", "-lavutil",
    ]
    try:
        result = subprocess.run(cmd, capture_output=True, timeout=120)
        if result.returncode != 0:
            logger.info(
                "libav shim build failed (system libav dev files absent?): %s",
                result.stderr.decode(errors="replace")[-300:],
            )
            return None
        return out
    except (subprocess.SubprocessError, FileNotFoundError) as exc:
        logger.info("native toolchain unavailable for libav shim (%s)", exc)
        return None


def load_native_av() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the libav container shim; None on failure.

    Optional by design: it links the SYSTEM libavformat/libavcodec shared
    libraries, which may be absent. Core native runtime (libmap_audio.so)
    never depends on it.
    """
    global _av_lib, _av_load_attempted
    if _av_lib is not None or _av_load_attempted:
        return _av_lib
    _av_load_attempted = True
    if not _AV_SOURCES:
        return None

    path = _av_lib_path()
    newest_src = max(s.stat().st_mtime for s in _AV_SOURCES)
    if not path.exists() or path.stat().st_mtime < newest_src:
        built = _build_av()
        if built is None:
            return None
        path = built

    try:
        lib = ctypes.CDLL(str(path))
        lib.av_shim_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.av_shim_decode.restype = ctypes.c_int64
        lib.av_shim_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.av_shim_free.restype = None
        lib.av_shim_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_char_p, ctypes.c_int32,
        ]
        lib.av_shim_probe.restype = ctypes.c_int32
        lib.av_shim_encode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_char_p,
        ]
        lib.av_shim_encode.restype = ctypes.c_int32
        lib.av_shim_have_encoder.argtypes = [ctypes.c_char_p]
        lib.av_shim_have_encoder.restype = ctypes.c_int32
        _av_lib = lib
        logger.debug("Loaded libav container shim from %s", path)
    except OSError as exc:
        logger.info("libav container shim unavailable: %s", exc)
        _av_lib = None
    return _av_lib


def have_native_av() -> bool:
    return load_native_av() is not None


_AV_DECODE_ERRORS = {
    -1: "container open/probe failed",
    -2: "no audio stream in container",
    -3: "no decoder for this codec",
    -4: "decode error",
}


def native_av_decode(path: str):
    """In-process libav decode of any supported container.

    Returns ``(samples [n, channels] float32, sample_rate)``; None when the
    shim is unavailable; ValueError when libav cannot decode the file.
    """
    lib = load_native_av()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    sr = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    n = lib.av_shim_decode(
        str(path).encode(), ctypes.byref(out), ctypes.byref(sr), ctypes.byref(ch)
    )
    if n < 0:
        raise ValueError(_AV_DECODE_ERRORS.get(int(n), f"libav error {n}"))
    try:
        flat = np.ctypeslib.as_array(out, shape=(int(n) * int(ch.value),))
        samples = flat.reshape(-1, int(ch.value)).copy()
    finally:
        lib.av_shim_free(out)
    return samples, int(sr.value)


def native_av_probe(path: str) -> Optional[dict]:
    """Container metadata (duration/rate/channels/codec/bit_rate) via libav."""
    lib = load_native_av()
    if lib is None:
        return None
    duration = ctypes.c_double(0.0)
    sr = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    bit_rate = ctypes.c_int64(0)
    name = ctypes.create_string_buffer(64)
    rc = lib.av_shim_probe(
        str(path).encode(), ctypes.byref(duration), ctypes.byref(sr),
        ctypes.byref(ch), ctypes.byref(bit_rate), name, 64,
    )
    if rc < 0:
        return None
    return {
        "duration": float(duration.value),
        "sample_rate": int(sr.value),
        "channels": int(ch.value),
        "codec": name.value.decode(errors="replace"),
        "bit_rate": int(bit_rate.value),
    }


def native_av_encode(
    path: str, samples: np.ndarray, sr: int, codec: str = ""
) -> bool:
    """Encode float32 PCM into the container implied by ``path``.

    Fixture generation for the ingest tests (the pipeline itself only
    decodes). ``samples`` is [n] mono or [n, ch] interleaved float32.
    """
    lib = load_native_av()
    if lib is None:
        return False
    x = np.ascontiguousarray(samples, dtype=np.float32)
    ch = 1 if x.ndim == 1 else x.shape[1]
    rc = lib.av_shim_encode(
        str(path).encode(),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(x.shape[0]), ctypes.c_int32(sr), ctypes.c_int32(ch),
        codec.encode(),
    )
    return rc == 0


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


_FLAC_ERRORS = {
    -1: "not a FLAC stream",
    -2: "truncated FLAC stream",
    -3: "malformed FLAC stream",
    -4: "decoder capacity exceeded",
    -5: "FLAC frame CRC mismatch",
}

_MP3_ERRORS = {
    -1: "not an MPEG-1 Layer III stream",
    -2: "truncated MP3 stream",
    -3: "malformed MP3 stream",
    -4: "decoder capacity exceeded",
    -6: "unsupported MP3 feature (MPEG-2/2.5 or intensity stereo)",
}


def native_mp3_decode(data: bytes):
    """Decode an MPEG-1 Layer III byte stream with the C++ decoder.

    Returns ``(samples [n, channels] float32, sample_rate)``. Returns
    None when the native library is unavailable; raises ValueError on
    malformed/unsupported input (callers may then fall back to FFmpeg).
    """
    lib = load_native()
    if lib is None or not hasattr(lib, "mp3_decode"):
        return None

    buf = np.frombuffer(data, dtype=np.uint8)
    sr = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    approx = ctypes.c_int64(0)
    rc = lib.mp3_probe(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(buf.size),
        ctypes.byref(sr), ctypes.byref(ch), ctypes.byref(approx),
    )
    if rc < 0:
        raise ValueError(_MP3_ERRORS.get(int(rc), f"MP3 error {rc}"))

    capacity = (int(approx.value) + 4 * 1152) * int(ch.value)
    out = np.empty(capacity, dtype=np.float32)
    written = lib.mp3_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(buf.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(capacity),
        ctypes.byref(sr), ctypes.byref(ch),
    )
    if written < 0:
        raise ValueError(_MP3_ERRORS.get(int(written), f"MP3 error {written}"))
    samples = out[: int(written) * int(ch.value)].reshape(-1, int(ch.value))
    return samples, int(sr.value)


def native_flac_decode(data: bytes):
    """Decode a FLAC byte stream with the C++ decoder.

    Returns ``(samples [n, channels] float32 in [-1, 1], sample_rate)``.
    Returns None when the native library is unavailable; raises
    ValueError on malformed input.
    """
    lib = load_native()
    if lib is None:
        return None

    buf = np.frombuffer(data, dtype=np.uint8)
    sr = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    bps = ctypes.c_int32(0)
    total = ctypes.c_int64(0)
    rc = lib.flac_probe(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(buf.size),
        ctypes.byref(sr), ctypes.byref(ch), ctypes.byref(bps),
        ctypes.byref(total),
    )
    if rc < 0:
        raise ValueError(_FLAC_ERRORS.get(int(rc), f"FLAC error {rc}"))

    # capacity: STREAMINFO total when known, else a safe upper bound
    # (compressed FLAC is never smaller than ~1 bit/sample => 8x bytes)
    per_ch = int(total.value) or (buf.size * 8 // max(int(bps.value), 1) + 65536)
    capacity = (per_ch + 65536) * int(ch.value)
    out = np.empty(capacity, dtype=np.int32)
    written = lib.flac_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(buf.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(capacity),
        ctypes.byref(sr), ctypes.byref(ch), ctypes.byref(bps),
    )
    if written < 0:
        raise ValueError(_FLAC_ERRORS.get(int(written), f"FLAC error {written}"))

    samples = out[: int(written)].reshape(-1, int(ch.value))
    scale = 1.0 / float(1 << (int(bps.value) - 1))
    return samples.astype(np.float32) * scale, int(sr.value)
