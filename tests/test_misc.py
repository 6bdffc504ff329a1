"""Coverage for small corners: bucketing, audio_io formats, CLI parsing."""

import numpy as np
import pytest

from modular_audio_pipeline_tpu.audio_io import read_wav, to_float32, to_int16, write_wav
from modular_audio_pipeline_tpu.ops.bucketing import (
    bucket_length,
    pad_to_bucket,
    tile_to_length,
)

SR = 16000


class TestBucketing:
    def test_ladder(self):
        assert bucket_length(1, SR) == 30 * SR
        assert bucket_length(30 * SR, SR) == 30 * SR
        assert bucket_length(30 * SR + 1, SR) == 60 * SR
        assert bucket_length(3601 * SR, SR) == 7200 * SR  # beyond ladder: multiples

    def test_pad_to_bucket(self):
        x = np.ones(100, np.float32)
        padded, n = pad_to_bucket(x, SR)
        assert n == 100 and len(padded) == 30 * SR
        assert padded[100:].sum() == 0

    def test_tile(self):
        clip = np.asarray([1.0, 2.0, 3.0], np.float32)
        np.testing.assert_array_equal(
            tile_to_length(clip, 7), [1, 2, 3, 1, 2, 3, 1]
        )
        np.testing.assert_array_equal(tile_to_length(clip, 2), [1, 2])
        assert len(tile_to_length(np.zeros(0, np.float32), 5)) == 5


class TestAudioIO:
    def test_pcm_conversions(self):
        f = to_float32(np.asarray([-32768, 0, 32767], np.int16))
        np.testing.assert_allclose(f, [-1.0, 0.0, 32767 / 32768], atol=1e-6)
        i = to_int16(np.asarray([-2.0, 0.0, 0.5, 2.0], np.float32))
        np.testing.assert_array_equal(i, [-32768, 0, 16384, 32767])

    def test_float32_wav(self, tmp_path):
        """IEEE-float WAVs decode through the RIFF parser."""
        import struct

        samples = (0.25 * np.sin(np.arange(1000) / 9)).astype(np.float32)
        data = samples.tobytes()
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, SR, SR * 4, 4, 32)
            + b"data" + struct.pack("<I", len(data))
        )
        path = tmp_path / "f32.wav"
        path.write_bytes(hdr + data)
        audio, sr = read_wav(str(path))
        assert sr == SR
        np.testing.assert_allclose(audio, samples, atol=1e-7)

    def test_wav_roundtrip(self, tmp_path, rng):
        x = np.clip(0.5 * rng.standard_normal(SR), -0.99, 0.99).astype(np.float32)
        p = str(tmp_path / "rt.wav")
        write_wav(p, x, SR)
        back, sr = read_wav(p)
        assert sr == SR
        np.testing.assert_allclose(back, x, atol=1 / 32768 + 1e-6)

    def test_corrupt_file_raises(self, tmp_path):
        from modular_audio_pipeline_tpu.exceptions import AudioProcessingError

        p = tmp_path / "bad.wav"
        p.write_bytes(b"not a wav at all, definitely not enough header")
        with pytest.raises(AudioProcessingError):
            read_wav(str(p))


class TestCLIParsing:
    def test_build_config_overrides(self, tmp_path):
        import main as cli

        args = cli.parse_args(
            [
                "--media-dir", str(tmp_path), "--model", "base",
                "--language", "en", "--no-vad", "--min-speakers", "2",
                "--weights-dir", "random:3", "--batch-size", "4",
            ]
        )
        cfg = cli.build_config(args)
        assert cfg.transcription.model == "base"
        assert cfg.vad.enabled is False
        assert cfg.diarization.min_speakers == 2
        assert cfg.transcription.weights_path == "random:3"
        assert cfg.transcription.batch_size == 4
        # temp/results re-derived under the new media dir
        assert cfg.temp_dir.startswith(str(tmp_path))

    def test_prompt_preset(self, tmp_path):
        import main as cli

        from modular_audio_pipeline_tpu.config import DEFAULT_PROMPTS

        args = cli.parse_args(
            ["--media-dir", str(tmp_path), "--prompt-preset", "en_technical"]
        )
        cfg = cli.build_config(args)
        assert cfg.transcription.prompt == DEFAULT_PROMPTS["en_technical"]


class TestExceptionMetadata:
    def test_to_dict_and_flags(self):
        from modular_audio_pipeline_tpu.exceptions import (
            ConfigurationError,
            TranscriptionError,
        )

        err = TranscriptionError("boom", details="ctx")
        d = err.to_dict()
        assert d["stage"] == "transcribe" and d["retryable"] is True
        assert ConfigurationError("x").retryable is False


class TestLazyCheckpoints:
    """checkpoint_enabled=False defers temp-dir stage WAVs until read
    (audio_io lazy mode): the D2H download for a stage checkpoint shares
    one serial host<->device link with the compute stream, so skipping
    unread scratch files removes real critical-path cost while keeping
    the path-in/path-out stage protocol intact."""

    def test_lazy_publish_materialises_on_read(self, tmp_path):
        import numpy as np

        from modular_audio_pipeline_tpu.audio_io import (
            AudioBuffer, begin_async_run, clear_buffers, end_async_run,
            publish_buffer, read_wav,
        )

        clear_buffers()
        begin_async_run(lazy_prefix=str(tmp_path))
        try:
            wav = (0.1 * np.sin(np.arange(1600) / 20)).astype(np.float32)
            p = tmp_path / "stage_denoised.wav"
            publish_buffer(str(p), AudioBuffer(sr=16000, n_valid=len(wav), host=wav))
            assert not p.exists()  # deferred
            got, sr = read_wav(str(p))  # on-demand materialisation
            assert p.exists() and sr == 16000 and len(got) == len(wav)
        finally:
            end_async_run()
            clear_buffers()

    def test_full_flush_keeps_lazy_deferred(self, tmp_path):
        import numpy as np

        from modular_audio_pipeline_tpu.audio_io import (
            AudioBuffer, begin_async_run, clear_buffers, end_async_run,
            flush_writes, publish_buffer,
        )

        clear_buffers()
        begin_async_run(lazy_prefix=str(tmp_path / "tmp"))
        try:
            (tmp_path / "tmp").mkdir()
            wav = np.zeros(800, np.float32)
            lazy = tmp_path / "tmp" / "stage.wav"
            eager = tmp_path / "voice.wav"  # outside the lazy prefix
            publish_buffer(str(lazy), AudioBuffer(sr=16000, n_valid=800, host=wav))
            publish_buffer(str(eager), AudioBuffer(sr=16000, n_valid=800, host=wav))
            flush_writes()  # run-end barrier
            assert eager.exists()  # async write completed
            assert not lazy.exists()  # stays deferred: checkpoints are off
        finally:
            end_async_run()
            clear_buffers()
