"""Unit tests for config / exceptions / utils / protocols (layer L1)."""

import json
import os
import time

import pytest

from modular_audio_pipeline_tpu.config import (
    DEFAULT_PROMPTS,
    PipelineConfig,
    RetryConfig,
    get_default_config,
)
from modular_audio_pipeline_tpu.exceptions import (
    AudioPipelineError,
    ConfigurationError,
    FileValidationError,
)
from modular_audio_pipeline_tpu.protocols import (
    DiarizationSegment,
    TimestampMapping,
    TranscriptionSegment,
)
from modular_audio_pipeline_tpu.utils import (
    CheckpointManager,
    format_timestamp,
    get_file_hash,
    parse_timestamp,
    retry_with_backoff,
    validate_file,
)


class TestExceptions:
    def test_details_appended(self):
        err = AudioPipelineError("boom", details="ctx")
        assert str(err) == "boom\nDetails: ctx"

    def test_plain_message(self):
        assert str(AudioPipelineError("boom")) == "boom"


class TestConfig:
    def test_defaults_derive_paths(self, tmp_path):
        cfg = PipelineConfig(media_dir=str(tmp_path))
        assert cfg.temp_dir == str(tmp_path / "temp")
        assert cfg.results_dir == str(tmp_path / "results")

    def test_validation_aggregates_errors(self):
        cfg = PipelineConfig()
        cfg.audio.sample_rate = 12345
        cfg.vad.mode = 9
        cfg.diarization.min_speakers = 10
        with pytest.raises(ConfigurationError) as e:
            cfg.validate()
        assert "sample rate" in str(e.value)
        assert "VAD mode" in str(e.value)
        assert "min_speakers" in str(e.value)

    def test_from_dict_ignores_comment_keys(self):
        cfg = PipelineConfig.from_dict(
            {
                "media_dir": "/tmp/x",
                "vad": {"_comment": "ignored", "enabled": False, "provider": "webrtc"},
                "transcription": {"model": "tiny"},
            }
        )
        assert cfg.vad.enabled is False
        assert cfg.vad.provider == "webrtc"
        assert cfg.transcription.model == "tiny"

    def test_json_roundtrip(self, tmp_path):
        cfg = get_default_config()
        cfg.transcription.model = "base"
        path = str(tmp_path / "cfg.json")
        cfg.to_json(path)
        loaded = PipelineConfig.from_json(path)
        assert loaded.transcription.model == "base"
        assert loaded.transcription.prompt == DEFAULT_PROMPTS["en_general"]

    def test_from_env(self, monkeypatch, tmp_path):
        monkeypatch.setenv("AUDIO_PIPELINE_MODEL", "small")
        monkeypatch.setenv("AUDIO_PIPELINE_LANGUAGE", "en")
        cfg = PipelineConfig.from_env()
        assert cfg.transcription.model == "small"
        assert cfg.transcription.language == "en"

    def test_tpu_config_validation(self):
        cfg = PipelineConfig()
        cfg.tpu.mesh_shape = {"data": 0}
        with pytest.raises(ConfigurationError):
            cfg.validate()


class TestRetry:
    def test_retries_then_succeeds(self):
        calls = []

        @retry_with_backoff(
            config=RetryConfig(max_attempts=3, initial_delay_s=0.001),
            exceptions=(ValueError,),
        )
        def flaky():
            calls.append(1)
            if len(calls) < 3:
                raise ValueError("nope")
            return "ok"

        assert flaky() == "ok"
        assert len(calls) == 3

    def test_raises_after_max_attempts(self):
        @retry_with_backoff(
            config=RetryConfig(max_attempts=2, initial_delay_s=0.001),
            exceptions=(ValueError,),
        )
        def always_fails():
            raise ValueError("nope")

        with pytest.raises(ValueError):
            always_fails()

    def test_unlisted_exception_not_retried(self):
        calls = []

        @retry_with_backoff(
            config=RetryConfig(max_attempts=3, initial_delay_s=0.001),
            exceptions=(ValueError,),
        )
        def fails_differently():
            calls.append(1)
            raise KeyError("other")

        with pytest.raises(KeyError):
            fails_differently()
        assert len(calls) == 1


class TestValidateFile:
    def test_missing_file(self):
        with pytest.raises(FileValidationError):
            validate_file("/nonexistent/file.wav")

    def test_extension_check(self, tmp_path):
        p = tmp_path / "x.txt"
        p.write_text("hello")
        with pytest.raises(FileValidationError):
            validate_file(str(p), allowed_extensions=[".wav"])
        assert validate_file(str(p), allowed_extensions=[".txt", ".WAV"])

    def test_size_bounds(self, tmp_path):
        p = tmp_path / "x.wav"
        p.write_bytes(b"ab")
        with pytest.raises(FileValidationError):
            validate_file(str(p), min_size_bytes=100)


class TestCheckpointManager:
    def test_roundtrip_and_invalidation(self, tmp_path):
        inp = tmp_path / "in.bin"
        out = tmp_path / "out.bin"
        inp.write_bytes(b"input-v1")
        out.write_bytes(b"output")

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        assert not mgr.has_valid_checkpoint("stage", str(inp))
        mgr.save_checkpoint("stage", str(inp), str(out), metadata={"k": 1})
        assert mgr.has_valid_checkpoint("stage", str(inp))

        # Reload from disk in a new manager.
        mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
        ckpt = mgr2.get_checkpoint("stage", str(inp))
        assert ckpt is not None and ckpt.metadata == {"k": 1}

        # Input change invalidates.
        inp.write_bytes(b"input-v2")
        assert not mgr2.has_valid_checkpoint("stage", str(inp))

        # Output removal invalidates.
        inp.write_bytes(b"input-v1")
        os.remove(out)
        assert not mgr2.has_valid_checkpoint("stage", str(inp))

    def test_clear(self, tmp_path):
        inp = tmp_path / "in.bin"
        inp.write_bytes(b"x")
        mgr = CheckpointManager(str(tmp_path))
        mgr.save_checkpoint("s", str(inp), str(inp))
        mgr.clear()
        assert not mgr.has_valid_checkpoint("s", str(inp))
        assert not (tmp_path / "checkpoints.json").exists()


class TestTimestamps:
    @pytest.mark.parametrize(
        "seconds,expected",
        [(0.0, "00:00:00.000"), (3661.5, "01:01:01.500"), (59.999, "00:00:59.999")],
    )
    def test_format(self, seconds, expected):
        assert format_timestamp(seconds) == expected

    @pytest.mark.parametrize(
        "ts,expected", [("01:01:01.500", 3661.5), ("02:30", 150.0), ("7.25", 7.25)]
    )
    def test_parse(self, ts, expected):
        assert parse_timestamp(ts) == pytest.approx(expected)

    def test_roundtrip(self):
        for s in [0.0, 1.5, 3600.25, 86399.999]:
            assert parse_timestamp(format_timestamp(s)) == pytest.approx(s, abs=1e-3)


class TestDataclasses:
    def test_fields_match_reference_contract(self):
        seg = TranscriptionSegment(text="hi", start=0.0, end=1.0)
        assert seg.speaker == "Unknown" and seg.confidence == 1.0
        assert seg.original_start is None

        d = DiarizationSegment(speaker="SPEAKER_00", start=0.0, end=2.0)
        assert d.track == ""

        m = TimestampMapping(0.0, 1.0, 5.0, 6.0)
        assert (m.processed_start, m.original_end) == (0.0, 6.0)
