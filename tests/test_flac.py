"""Native C++ FLAC decoder vs the Python reference encoder (flac_ref)."""

import numpy as np
import pytest

from modular_audio_pipeline_tpu.runtime.native_lib import (
    have_native,
    native_flac_decode,
)

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from flac_ref import encode_flac  # noqa: E402

pytestmark = pytest.mark.skipif(
    not have_native(), reason="native toolchain unavailable"
)

SR = 16000


def make_pcm(n=10000, channels=1, seed=0, smooth=True):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    sig = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 517 * t)
    if smooth:
        sig += 0.01 * rng.standard_normal(n)
    else:
        sig = 0.5 * rng.standard_normal(n)
    pcm = np.clip(sig * 32767, -32768, 32767).astype(np.int64)
    if channels == 2:
        pcm = np.stack([pcm, np.roll(pcm, 7) // 2], axis=1)
    return pcm


def roundtrip(pcm, sr=SR, **kw):
    blob = encode_flac(pcm, sr, **kw)
    out = native_flac_decode(blob)
    assert out is not None
    decoded, got_sr = out
    assert got_sr == sr
    want = pcm if pcm.ndim == 2 else pcm[:, None]
    got = np.round(decoded * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(got, want)
    return blob


class TestSubframes:
    @pytest.mark.parametrize("sub", ["verbatim", "fixed0", "fixed1", "fixed2",
                                     "fixed3", "fixed4", "lpc4", "lpc8"])
    def test_mono_roundtrip(self, sub):
        roundtrip(make_pcm(), subframe=sub)

    def test_constant(self):
        pcm = np.full(9000, -1234, dtype=np.int64)
        roundtrip(pcm, subframe="constant")

    def test_silence_constant_zero(self):
        roundtrip(np.zeros(5000, dtype=np.int64), subframe="constant")

    def test_noise_verbatim(self):
        roundtrip(make_pcm(smooth=False), subframe="verbatim")

    def test_wasted_bits(self):
        pcm = make_pcm() & ~np.int64(0x0F)  # low 4 bits zero
        roundtrip(pcm, subframe="fixed2", wasted=4)


class TestResidualCoding:
    @pytest.mark.parametrize("po", [0, 1, 2, 4])
    def test_partition_orders(self, po):
        roundtrip(make_pcm(n=16384), subframe="fixed2", partition_order=po)

    def test_rice2(self):
        roundtrip(make_pcm(), subframe="fixed2", rice_method=1)

    def test_escape_partitions(self):
        roundtrip(make_pcm(), subframe="fixed1", force_escape=True)


class TestStereo:
    @pytest.mark.parametrize(
        "mode", ["independent", "left_side", "right_side", "mid_side"]
    )
    def test_stereo_modes(self, mode):
        roundtrip(make_pcm(channels=2), subframe="fixed2", stereo=mode)

    def test_mid_side_odd_sums(self):
        # exercise the lost-LSB reconstruction: force odd left+right
        pcm = make_pcm(channels=2)
        pcm[:, 1] = pcm[:, 0] + 1
        roundtrip(pcm, subframe="fixed1", stereo="mid_side")


class TestContainer:
    def test_multiple_frames_small_blocksize(self):
        roundtrip(make_pcm(n=10000), blocksize=1024, subframe="lpc4")

    def test_partial_final_block(self):
        roundtrip(make_pcm(n=5000), blocksize=4096, subframe="fixed2")

    def test_id3_prefix_skipped(self):
        roundtrip(make_pcm(n=3000), subframe="fixed2", id3_prefix=True)

    def test_not_flac_rejected(self):
        with pytest.raises(ValueError, match="not a FLAC"):
            native_flac_decode(b"RIFF" + b"\x00" * 100)

    def test_corrupt_crc_rejected(self):
        blob = bytearray(encode_flac(make_pcm(n=3000), SR))
        blob[-1] ^= 0xFF  # last frame's CRC-16
        with pytest.raises(ValueError, match="CRC|malformed|truncated"):
            native_flac_decode(bytes(blob))

    def test_truncated_rejected(self):
        blob = encode_flac(make_pcm(n=6000), SR)
        with pytest.raises(ValueError, match="truncated|malformed|CRC"):
            native_flac_decode(blob[: len(blob) - 40])


class TestMediaHandlerIntegration:
    def test_convert_flac_to_wav(self, tmp_path):
        from modular_audio_pipeline_tpu.audio_io import read_wav
        from modular_audio_pipeline_tpu.config import PipelineConfig
        from modular_audio_pipeline_tpu.media_handler import MediaHandler

        pcm = make_pcm(n=32000, channels=2)
        flac_path = tmp_path / "rec.flac"
        flac_path.write_bytes(encode_flac(pcm, SR, subframe="lpc4"))

        cfg = PipelineConfig(media_dir=str(tmp_path))
        handler = MediaHandler.from_config(cfg)
        wav = handler.convert_to_wav(str(flac_path))
        audio, sr = read_wav(wav)
        assert sr == cfg.audio.sample_rate
        # mono fold of the stereo signal, 16-bit quantized
        want = (pcm[:, 0] + pcm[:, 1]) / 2.0 / 32768.0
        assert np.abs(audio - want).max() < 2e-4
