"""Quality self-consistency: synthetic ground truth through the full stack.

With no pretrained weights available, text quality can't be measured —
but diarization and the timestamp machinery operate on signal structure,
so DER against synthetic ground truth is a real end-to-end quality check.
"""

import numpy as np
import pytest

from modular_audio_pipeline_tpu import SpeakerDiarizer
from modular_audio_pipeline_tpu.audio_io import read_wav, write_wav
from modular_audio_pipeline_tpu.evaluation import der

SR = 16000


def synth_conversation(turns, seed=0):
    """turns: [(speaker_id, seconds)] -> (audio, ground truth turn list)."""
    rng = np.random.default_rng(seed)
    voices = {
        0: dict(f0=105, brightness=0.8),
        1: dict(f0=235, brightness=1.8),
        2: dict(f0=160, brightness=1.2),
    }
    audio = []
    truth = []
    t_cursor = 0.0
    for spk, sec in turns:
        n = int(sec * SR)
        t = np.arange(n) / SR
        v = voices[spk]
        sig = sum(
            (0.4 / k ** v["brightness"]) * np.sin(2 * np.pi * k * v["f0"] * t)
            for k in range(1, 8)
        )
        env = (np.sin(2 * np.pi * 1.4 * t + rng.uniform(0, 6)) > -0.6).astype(np.float32)
        audio.append((sig * env * 0.25).astype(np.float32))
        truth.append((f"S{spk}", t_cursor, t_cursor + sec))
        t_cursor += sec
    return np.concatenate(audio), truth


class TestDiarizationDER:
    def test_two_speaker_der_reasonable(self, tmp_path):
        turns = [(0, 4.0), (1, 4.0), (0, 4.0), (1, 4.0), (0, 4.0), (1, 4.0)]
        audio, truth = synth_conversation(turns)
        path = str(tmp_path / "conv.wav")
        write_wav(path, audio, SR)

        diar = SpeakerDiarizer()
        hyp = [(s.speaker, s.start, s.end) for s in diar.diarize(path, 1, 4)]
        assert hyp, "expected diarization output"

        result = der(truth, hyp)
        # weight-free embeddings on clean synthetic voices: DER well under
        # 50% means the speakers genuinely separate (random ~= 60-100%)
        assert result["der"] < 0.5, f"DER too high: {result}"

    def test_single_speaker_low_der(self, tmp_path):
        turns = [(0, 5.0), (0, 5.0), (0, 5.0)]
        audio, truth = synth_conversation(turns)
        path = str(tmp_path / "mono.wav")
        write_wav(path, audio, SR)

        diar = SpeakerDiarizer()
        hyp = [(s.speaker, s.start, s.end) for s in diar.diarize(path, 1, 2)]
        result = der(truth, hyp)
        assert result["der"] < 0.35, f"DER too high for single speaker: {result}"


class TestEdgeCases:
    def test_stereo_wav_folds_to_mono(self, tmp_path):
        # hand-build a stereo WAV (our writer is mono-only)
        import struct
        import wave

        n = SR
        left = (0.3 * np.sin(2 * np.pi * 220 * np.arange(n) / SR) * 32767).astype(np.int16)
        right = np.zeros(n, np.int16)
        interleaved = np.empty(2 * n, np.int16)
        interleaved[0::2] = left
        interleaved[1::2] = right
        path = str(tmp_path / "stereo.wav")
        with wave.open(path, "wb") as wf:
            wf.setnchannels(2)
            wf.setsampwidth(2)
            wf.setframerate(SR)
            wf.writeframes(interleaved.tobytes())

        audio, sr = read_wav(path)
        assert audio.ndim == 1 and len(audio) == n
        # mono fold halves the amplitude of the left-only tone
        assert 0.12 < np.abs(audio).max() < 0.2

    def test_very_short_audio_through_serving(self):
        from modular_audio_pipeline_tpu.config import PipelineConfig
        from modular_audio_pipeline_tpu.serving import ServingPipeline

        cfg = PipelineConfig(media_dir="/tmp")
        cfg.transcription.model = "test-tiny"
        cfg.transcription.weights_path = "random:0"
        cfg.transcription.beam_size = 1
        cfg.transcription.max_decode_tokens = 8
        cfg.transcription.language = "en"
        serving = ServingPipeline(cfg)
        result = serving.process(
            (0.2 * np.sin(np.arange(SR // 2) / 5)).astype(np.float32), SR
        )
        assert result["duration"] == pytest.approx(0.5, abs=0.01)

    def test_8k_input_resampled_by_transcriber(self, rng):
        from modular_audio_pipeline_tpu.transcriber import JaxWhisperBackend

        b = JaxWhisperBackend(
            "test-tiny", language="en", beam_size=1,
            weights_path="random:0", batch_size=1, max_decode_tokens=8,
        )
        audio8k = (0.1 * rng.standard_normal(8000 * 3)).astype(np.float32)
        result = b.transcribe_array(audio8k, 8000)
        assert result["duration"] == pytest.approx(3.0, abs=0.01)

    def test_24bit_wav_roundtrip(self, tmp_path):
        # hand-build a 24-bit WAV and decode it
        import wave

        n = 1000
        vals = (np.sin(np.arange(n) / 7) * (2**23 - 1)).astype(np.int32)
        b = np.zeros((n, 3), dtype=np.uint8)
        b[:, 0] = vals & 0xFF
        b[:, 1] = (vals >> 8) & 0xFF
        b[:, 2] = (vals >> 16) & 0xFF
        path = str(tmp_path / "x24.wav")
        with wave.open(path, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(3)
            wf.setframerate(SR)
            wf.writeframes(b.tobytes())

        audio, sr = read_wav(path)
        expected = vals.astype(np.float64) / (2**23)
        np.testing.assert_allclose(audio, expected, atol=1e-4)


class TestSpeakerIdentification:
    def test_diarize_with_embedding_returns_voiceprints(self, tmp_path):
        turns = [(0, 4.0), (1, 4.0), (0, 4.0), (1, 4.0)]
        audio, _ = synth_conversation(turns)
        path = str(tmp_path / "conv.wav")
        write_wav(path, audio, SR)

        diar = SpeakerDiarizer()
        segments, prints = diar.diarize_with_embedding(path, 1, 4)
        assert segments
        labels = {s.speaker for s in segments}
        assert set(prints.keys()) == labels
        for v in prints.values():
            assert np.isfinite(v).all()
            assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-4  # unit norm

    def test_identify_speakers_across_files(self, tmp_path):
        """Enroll each voice from a solo file; the 2-speaker conversation's
        anonymous labels must map back to the right identities."""
        from modular_audio_pipeline_tpu.diarizer import identify_speakers

        diar = SpeakerDiarizer()

        refs = {}
        for spk, name in [(0, "ana"), (1, "bruno")]:
            audio, _ = synth_conversation([(spk, 5.0), (spk, 5.0)], seed=spk + 7)
            p = str(tmp_path / f"enroll_{name}.wav")
            write_wav(p, audio, SR)
            _, prints = diar.diarize_with_embedding(p, 1, 2)
            assert prints
            # solo recording: take the dominant (first) voiceprint
            refs[name] = next(iter(prints.values()))

        conv, truth = synth_conversation(
            [(0, 4.0), (1, 4.0), (0, 4.0), (1, 4.0)], seed=3
        )
        p = str(tmp_path / "conv.wav")
        write_wav(p, conv, SR)
        segments, prints = diar.diarize_with_embedding(p, 2, 2)
        mapping = identify_speakers(prints, refs, threshold=0.2)
        assert set(mapping.values()) == {"ana", "bruno"}

        # the label covering speaker-0's turns must map to ana
        from collections import defaultdict

        overlap = defaultdict(float)
        for s in segments:
            for name, t0, t1 in truth:
                ov = max(0.0, min(s.end, t1) - max(s.start, t0))
                overlap[(s.speaker, name)] += ov
        # dominant alignment label for S0
        s0_label = max(
            ((lab, ov) for (lab, name), ov in overlap.items() if name == "S0"),
            key=lambda x: x[1],
        )[0]
        assert mapping.get(s0_label) == "ana"
