"""In-process libav container ingest: OGG / M4A / MP4 / Opus without FFmpeg.

The reference converts every non-WAV container by shelling out to an
FFmpeg binary (``/root/reference/audio_pipeline/media_handler.py:219-233``).
Here the long tail of lossy containers decodes in-process against the
system libavformat/libavcodec shared libraries via the C++ shim
(``runtime/native/av/av_shim.cc``) — no subprocess, no binary on PATH.
These tests encode fixtures with the same shim (encoder availability is
probed per codec) and assert (a) MediaHandler ingests each container with
FFmpeg absent, (b) decoded audio matches the source PCM to lossy-codec
tolerance with zero priming-delay offset, and (c) metadata probing works.
"""

from __future__ import annotations

import os
from pathlib import Path
from unittest import mock

import numpy as np
import pytest

from modular_audio_pipeline_tpu.runtime import native_lib
from modular_audio_pipeline_tpu.runtime.native_lib import (
    have_native_av,
    native_av_decode,
    native_av_encode,
    native_av_probe,
)

pytestmark = pytest.mark.skipif(
    not have_native_av(), reason="libav shim unavailable (no system libav)"
)

SR = 16000


def _have_encoder(name: str) -> bool:
    lib = native_lib.load_native_av()
    return bool(lib and lib.av_shim_have_encoder(name.encode()))


def _chirp(seconds: float = 3.0) -> np.ndarray:
    """Non-periodic test signal so cross-correlation pins true delay."""
    t = np.arange(int(seconds * SR)) / SR
    f = 200 + 150 * t  # linear 200->650 Hz sweep
    x = 0.4 * np.sin(2 * np.pi * f * t)
    return x.astype(np.float32)


def _snr_db(ref: np.ndarray, hyp: np.ndarray) -> float:
    m = min(len(ref), len(hyp))
    ref, hyp = ref[:m], hyp[:m]
    noise = float(np.sum((ref - hyp) ** 2))
    return 10.0 * np.log10(float(np.sum(ref**2)) / max(noise, 1e-12))


def _resample(y: np.ndarray, fr: int, to: int) -> np.ndarray:
    if fr == to:
        return y
    n = int(len(y) * to / fr)
    return np.interp(
        np.arange(n) * fr / to, np.arange(len(y)), y
    ).astype(np.float32)


FORMATS = [
    ("ogg", "libvorbis", 18.0),
    ("m4a", "aac", 25.0),
    ("mp4", "aac", 25.0),
    ("opus", "libopus", 18.0),
]


@pytest.mark.parametrize("ext,codec,min_snr", FORMATS)
def test_roundtrip_snr_and_zero_delay(tmp_path, ext, codec, min_snr):
    if not _have_encoder(codec):
        pytest.skip(f"{codec} encoder not in this libavcodec build")
    x = _chirp()
    path = str(tmp_path / f"fixture.{ext}")
    assert native_av_encode(path, x, SR, codec)
    assert os.path.getsize(path) > 100

    decoded = native_av_decode(path)
    assert decoded is not None
    samples, sr = decoded
    y = _resample(samples.mean(axis=1), sr, SR)

    # priming/padding must be trimmed by the decoder: peak of the
    # cross-correlation sits at lag 0 (no constant timestamp shift)
    probe = x[SR : 2 * SR]  # one mid-signal second
    corr = np.correlate(y[: 2 * SR + len(probe)], probe, mode="valid")
    delay = int(np.argmax(np.abs(corr))) - SR
    assert abs(delay) <= SR // 100, f"{ext}: {delay / SR * 1000:.1f} ms offset"

    assert _snr_db(x, y) > min_snr


def test_media_handler_converts_ogg_without_ffmpeg(tmp_path):
    if not _have_encoder("libvorbis"):
        pytest.skip("libvorbis encoder not in this libavcodec build")
    from modular_audio_pipeline_tpu.audio_io import read_wav
    from modular_audio_pipeline_tpu.media_handler import MediaHandler

    x = _chirp()
    media = tmp_path / "media"
    media.mkdir()
    src = str(media / "recording.ogg")
    assert native_av_encode(src, x, SR, "libvorbis")

    handler = MediaHandler(str(media), str(tmp_path / "tmp"), sample_rate=SR)
    with mock.patch.object(MediaHandler, "_check_ffmpeg", return_value=False):
        out = handler.convert_to_wav(src)
    assert out.endswith(".wav")
    y, sr = read_wav(out)
    assert sr == SR
    assert _snr_db(x, y) > 15.0


def test_media_handler_converts_mp4_video_container(tmp_path):
    if not _have_encoder("aac"):
        pytest.skip("aac encoder not in this libavcodec build")
    from modular_audio_pipeline_tpu.audio_io import read_wav
    from modular_audio_pipeline_tpu.media_handler import MediaHandler

    x = _chirp()
    media = tmp_path / "media"
    media.mkdir()
    src = str(media / "clip.mp4")
    assert native_av_encode(src, x, SR, "aac")

    handler = MediaHandler(str(media), str(tmp_path / "tmp"), sample_rate=SR)
    with mock.patch.object(MediaHandler, "_check_ffmpeg", return_value=False):
        out = handler.convert_to_wav(src)
    y, sr = read_wav(out)
    assert sr == SR
    assert _snr_db(x, y) > 20.0


def test_probe_metadata(tmp_path):
    if not _have_encoder("libvorbis"):
        pytest.skip("libvorbis encoder not in this libavcodec build")
    x = _chirp(4.0)
    path = str(tmp_path / "meta.ogg")
    assert native_av_encode(path, x, SR, "libvorbis")

    info = native_av_probe(path)
    assert info is not None
    assert info["codec"] == "vorbis"
    assert info["sample_rate"] == SR
    assert info["channels"] == 1
    assert abs(info["duration"] - 4.0) < 0.3

    from modular_audio_pipeline_tpu.media_handler import MediaHandler

    media = Path(path).parent
    handler = MediaHandler(str(media), str(media / "tmp"), sample_rate=SR)
    got = handler.get_media_info(path)
    assert got["codec"] == "vorbis"
    assert abs(got["duration"] - 4.0) < 0.3


def test_corrupt_container_raises(tmp_path):
    from modular_audio_pipeline_tpu.exceptions import MediaConversionError
    from modular_audio_pipeline_tpu.media_handler import MediaHandler

    media = tmp_path / "media"
    media.mkdir()
    bad = media / "broken.ogg"
    bad.write_bytes(b"OggS" + os.urandom(4096))

    handler = MediaHandler(str(media), str(tmp_path / "tmp"), sample_rate=SR)
    with mock.patch.object(MediaHandler, "_check_ffmpeg", return_value=False):
        with pytest.raises(MediaConversionError):
            handler.convert_to_wav(str(bad))


def test_flac_trailing_garbage_falls_back_to_libav(tmp_path):
    """A FLAC stream the strict first-party decoder rejects (trailing
    ID3v1-style tag bytes after the last frame) must still ingest through
    the libav shim instead of failing outright (ADVICE r2)."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from flac_ref import encode_flac

    from modular_audio_pipeline_tpu.audio_io import read_wav
    from modular_audio_pipeline_tpu.media_handler import MediaHandler
    from modular_audio_pipeline_tpu.runtime.native_lib import (
        have_native,
        native_flac_decode,
    )

    if not have_native():
        pytest.skip("core native lib unavailable")

    x = _chirp(1.0)
    pcm = np.clip(x * 32767.0, -32768, 32767).astype(np.int16)
    blob = encode_flac(pcm, SR) + b"TAG" + bytes(125)  # ID3v1 trailer

    with pytest.raises(ValueError):
        native_flac_decode(blob)

    media = tmp_path / "media"
    media.mkdir()
    src = media / "tagged.flac"
    src.write_bytes(blob)

    handler = MediaHandler(str(media), str(tmp_path / "tmp"), sample_rate=SR)
    with mock.patch.object(MediaHandler, "_check_ffmpeg", return_value=False):
        out = handler.convert_to_wav(str(src))
    y, sr = read_wav(out)
    assert sr == SR
    assert _snr_db(x, y) > 30.0  # lossless apart from int16 quantisation


def test_stereo_fold(tmp_path):
    if not _have_encoder("libvorbis"):
        pytest.skip("libvorbis encoder not in this libavcodec build")
    from modular_audio_pipeline_tpu.audio_io import read_wav
    from modular_audio_pipeline_tpu.media_handler import MediaHandler

    x = _chirp()
    stereo = np.stack([x, -0.5 * x], axis=1)  # distinct channels
    media = tmp_path / "media"
    media.mkdir()
    src = str(media / "stereo.ogg")
    assert native_av_encode(src, stereo, SR, "libvorbis")

    decoded = native_av_decode(src)
    assert decoded is not None
    samples, sr = decoded
    assert samples.shape[1] == 2

    handler = MediaHandler(str(media), str(tmp_path / "tmp"), sample_rate=SR)
    with mock.patch.object(MediaHandler, "_check_ffmpeg", return_value=False):
        out = handler.convert_to_wav(src)
    y, _ = read_wav(out)
    # mono fold = mean of channels = 0.25 * x
    assert _snr_db(0.25 * x, y) > 15.0
