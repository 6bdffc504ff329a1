"""End-to-end pipeline tests on synthesized WAVs.

The transcriber runs the real JAX Whisper stack with the test-tiny config
and random weights (garbage text, real mechanics); all orchestration,
mapping, alignment, JSON-schema and DI behaviours are asserted for real.
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from modular_audio_pipeline_tpu import (
    AudioPipeline,
    DiarizationSegment,
    NoOpDiarizer,
    PipelineConfig,
    TimestampMapping,
)
from modular_audio_pipeline_tpu.audio_io import write_wav


SR = 16000


def make_speechy_wav(path: str, seconds: float = 8.0, seed: int = 0) -> np.ndarray:
    """Synthetic 'speech': AM-modulated harmonics + pauses + hiss floor."""
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    f0 = 140 + 30 * np.sin(2 * np.pi * 0.7 * t)
    sig = sum(
        (0.3 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / SR) for k in range(1, 5)
    )
    envelope = (np.sin(2 * np.pi * 1.1 * t) > -0.4).astype(np.float32)
    sig = sig * envelope * 0.3
    # leading/trailing quiet hiss
    sig[: SR] = 0.0008 * rng.standard_normal(SR)
    sig[-SR:] = 0.0008 * rng.standard_normal(SR)
    sig = sig.astype(np.float32)
    write_wav(path, sig, SR)
    return sig


@pytest.fixture
def media_dir(tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    make_speechy_wav(str(d / "recording.wav"))
    return d


def fast_config(media_dir, **overrides) -> PipelineConfig:
    cfg = PipelineConfig(media_dir=str(media_dir))
    cfg.transcription.model = "test-tiny"
    cfg.transcription.weights_path = "random:0"
    cfg.transcription.beam_size = 1
    cfg.transcription.batch_size = 2
    cfg.transcription.max_decode_tokens = 224
    cfg.transcription.language = "en"
    for key, val in overrides.items():
        node = cfg
        *parents, leaf = key.split(".")
        for p in parents:
            node = getattr(node, p)
        setattr(node, leaf, val)
    return cfg


class TestFullPipeline:
    def test_run_produces_schema_compliant_json(self, media_dir):
        cfg = fast_config(media_dir)
        pipeline = AudioPipeline(cfg)
        result = pipeline.run()

        assert result.success, result.error
        assert result.output_file and os.path.exists(result.output_file)

        with open(result.output_file, encoding="utf-8") as f:
            data = json.load(f)

        # JSON schema parity with reference pipeline.py:437-456
        assert set(data["metadata"].keys()) >= {"source_file", "config"}
        cfg_meta = data["metadata"]["config"]
        assert set(cfg_meta.keys()) == {
            "model", "language", "vad_provider", "transcription_backend",
        }
        assert cfg_meta["model"] == "test-tiny"
        assert isinstance(data["segments"], list)
        for seg in data["segments"]:
            assert {"speaker", "start", "end", "text"} <= set(seg.keys())

        # TPU additions: per-stage timings recorded
        assert "stage_timings" in result.metadata
        assert "transcribe" in result.metadata["stage_timings"]

    def test_timestamp_mappings_applied(self, media_dir):
        cfg = fast_config(media_dir)
        pipeline = AudioPipeline(cfg)
        result = pipeline.run()
        assert result.success, result.error
        for seg in result.segments:
            if "original_start" in seg:
                assert seg["original_start"] >= 0
                # silence/VAD only remove audio, so original >= processed
                assert seg["original_start"] >= seg["start"] - 0.5

    def test_disabled_stages_use_noops(self, media_dir):
        cfg = fast_config(
            media_dir,
            **{
                "vad.enabled": False,
                "noise_reduction.enabled": False,
                "diarization.enabled": False,
                "redundancy.enabled": False,
            },
        )
        pipeline = AudioPipeline(cfg)
        from modular_audio_pipeline_tpu import (
            NoOpRedundancyRemover,
            NoOpVADFilter,
        )

        assert isinstance(pipeline.vad, NoOpVADFilter)
        assert isinstance(pipeline.diarizer, NoOpDiarizer)
        assert isinstance(pipeline.redundancy, NoOpRedundancyRemover)
        result = pipeline.run()
        assert result.success, result.error

    def test_missing_media_returns_failure_result(self, tmp_path):
        empty = tmp_path / "empty"
        empty.mkdir()
        cfg = fast_config(empty)
        result = AudioPipeline(cfg).run()
        assert not result.success
        assert "No valid media file" in result.error

    def test_specific_missing_file(self, media_dir):
        cfg = fast_config(media_dir)
        result = AudioPipeline(cfg).run(input_file="nope.wav")
        assert not result.success and "not found" in result.error.lower()

    def test_dependency_injection(self, media_dir):
        """Custom protocol implementations are honoured (reference README
        DI contract)."""

        class FakeTranscriber:
            calls = []

            def transcribe(self, input_wav):
                self.calls.append(input_wav)
                return {
                    "text": "hello world",
                    "segments": [
                        {"start": 0.0, "end": 2.0, "text": "hello world",
                         "confidence": -0.1},
                    ],
                    "language": "en",
                    "duration": 2.0,
                }

            def is_loaded(self):
                return True

            def load_model(self):
                pass

        class FakeDiarizer:
            def diarize(self, audio_path, min_speakers=2, max_speakers=5):
                return [DiarizationSegment("SPEAKER_07", 0.0, 5.0)]

            def is_loaded(self):
                return True

            def load_model(self):
                pass

        cfg = fast_config(media_dir)
        pipeline = AudioPipeline(cfg, transcriber=FakeTranscriber(), diarizer=FakeDiarizer())
        result = pipeline.run()
        assert result.success, result.error
        assert result.segments[0]["speaker"] == "SPEAKER_07"
        assert result.segments[0]["text"] == "hello world"

    def test_cleanup_removes_temp(self, media_dir):
        cfg = fast_config(media_dir)
        pipeline = AudioPipeline(cfg)
        result = pipeline.run()
        assert result.success
        assert os.path.exists(cfg.temp_dir)
        pipeline.cleanup()
        assert not os.path.exists(cfg.temp_dir)

    def test_run_transcription_only(self, media_dir):
        cfg = fast_config(media_dir)
        pipeline = AudioPipeline(cfg)
        result = pipeline.run_transcription_only(str(media_dir / "recording.wav"))
        assert result.success
        assert result.output_file is None


class TestMappingMath:
    def test_identity_without_mappings(self):
        assert AudioPipeline._map_timestamp_to_original(3.2, []) == 3.2

    def test_linear_interpolation(self):
        mappings = [TimestampMapping(0.0, 10.0, 5.0, 25.0)]
        assert AudioPipeline._map_timestamp_to_original(0.0, mappings) == pytest.approx(5.0)
        assert AudioPipeline._map_timestamp_to_original(5.0, mappings) == pytest.approx(15.0, abs=1e-6)
        assert AudioPipeline._map_timestamp_to_original(10.0, mappings) == pytest.approx(25.0, abs=1e-6)

    def test_outside_any_mapping_passthrough(self):
        mappings = [TimestampMapping(0.0, 1.0, 0.0, 1.0)]
        assert AudioPipeline._map_timestamp_to_original(7.0, mappings) == 7.0

    def test_alignment_max_overlap(self):
        trans = [
            {"start": 0.0, "end": 4.0, "text": "first"},
            {"start": 4.0, "end": 8.0, "text": "second"},
            {"start": 8.0, "end": 9.0, "text": "  "},  # blank -> dropped
        ]
        diar = [
            DiarizationSegment("SPEAKER_00", 0.0, 3.0),
            DiarizationSegment("SPEAKER_01", 3.0, 8.0),
        ]
        aligned = AudioPipeline._align_transcription_with_speakers(trans, diar)
        assert [s["speaker"] for s in aligned] == ["SPEAKER_00", "SPEAKER_01"]
        assert len(aligned) == 2  # blank removed

    def test_alignment_no_diarization(self):
        trans = [{"start": 0.0, "end": 1.0, "text": "x"}]
        aligned = AudioPipeline._align_transcription_with_speakers(trans, [])
        assert aligned[0]["speaker"] == "Unknown"


class TestBatchDriver:
    def test_batch_resume(self, tmp_path):
        d = tmp_path / "media"
        d.mkdir()
        for i in range(3):
            make_speechy_wav(str(d / f"file_{i}.wav"), seconds=4.0, seed=i)

        from modular_audio_pipeline_tpu.parallel.batch import BatchDriver

        cfg = fast_config(d, **{"diarization.enabled": False})
        driver = BatchDriver(cfg)
        summary = driver.run()
        assert summary["succeeded"] == 3 and summary["failed"] == 0

        # second run skips everything
        driver2 = BatchDriver(cfg)
        summary2 = driver2.run()
        assert summary2["skipped"] == 3 and summary2["succeeded"] == 0
