"""Component-level tests: VAD filters, diarizer, separator, merger,
redundancy, media handler, preprocessor adapters."""

import os
from pathlib import Path

import numpy as np
import pytest

from modular_audio_pipeline_tpu import (
    DiarizationSegment,
    MediaHandler,
    NoOpDiarizer,
    NoOpVADFilter,
    PipelineConfig,
    RedundancyRemover,
    SegmentMerger,
    SileroVADFilter,
    SpeakerDiarizer,
    VADFilter,
    VocalSeparator,
)
from modular_audio_pipeline_tpu.audio_io import read_wav, write_wav
from modular_audio_pipeline_tpu.exceptions import (
    FileValidationError,
    MediaNotFoundError,
    VADError,
)
from modular_audio_pipeline_tpu.preprocessor import AudioPreprocessor

SR = 16000


def two_speaker_wav(path: str, seconds_each: float = 4.0):
    """Alternating 'speakers': different pitch + formant structure."""
    n = int(seconds_each * SR)
    t = np.arange(n) / SR

    def voice(f0, brightness):
        sig = sum(
            (0.4 / k**brightness) * np.sin(2 * np.pi * k * f0 * t) for k in range(1, 8)
        )
        env = (np.sin(2 * np.pi * 1.3 * t) > -0.6).astype(np.float32)
        return (sig * env * 0.25).astype(np.float32)

    a = voice(110, 1.0)   # low voice, bright
    b = voice(260, 2.0)   # high voice, dark
    audio = np.concatenate([a, b, a, b])
    write_wav(path, audio, SR)
    return audio


@pytest.fixture
def speech_wav(tmp_path, tone_plus_silence):
    x, sr = tone_plus_silence
    path = str(tmp_path / "speech.wav")
    write_wav(path, x, sr)
    return path


class TestVADFilter:
    def test_filter_voice_keeps_speech(self, speech_wav, tmp_path):
        vad = VADFilter(sample_rate=SR, vad_mode=1)
        out_path, mappings = vad.filter_voice(speech_wav, str(tmp_path))
        assert os.path.exists(out_path)
        assert mappings
        out, sr = read_wav(out_path)
        orig, _ = read_wav(speech_wav)
        assert len(out) < len(orig)
        # kept audio should cover the burst (3s..7s)
        total_kept = sum(m.processed_end - m.processed_start for m in mappings)
        assert 2.0 < total_kept < 8.0
        for m in mappings:
            assert 0 <= m.original_start < m.original_end <= 10.5

    def test_detect_segments(self, speech_wav):
        vad = VADFilter(sample_rate=SR)
        segs = vad.detect_speech_segments(speech_wav)
        assert segs
        assert any(s < 4.0 < e or s < 6.0 < e for s, e in segs)

    def test_invalid_params_raise(self):
        with pytest.raises(VADError):
            VADFilter(sample_rate=11025)
        with pytest.raises(VADError):
            VADFilter(frame_duration_ms=25)
        with pytest.raises(VADError):
            VADFilter(vad_mode=7)

    def test_noop_identity_mapping(self, speech_wav, tmp_path):
        out, mappings = NoOpVADFilter().filter_voice(speech_wav, str(tmp_path))
        assert out == speech_wav
        assert len(mappings) == 1
        assert mappings[0].original_end == pytest.approx(10.0, abs=0.1)


class TestSileroVAD:
    def test_energy_fallback_filters(self, speech_wav, tmp_path):
        vad = SileroVADFilter(threshold=0.5, sampling_rate=SR)
        out_path, mappings = vad.filter_voice(speech_wav, str(tmp_path))
        assert mappings, "expected voiced segments"
        assert os.path.exists(out_path)
        # all speech comes from the 2.9..7.1s burst region
        for m in mappings:
            assert m.original_start > 2.0
            assert m.original_end < 8.0

    def test_detect_segments_seconds(self, speech_wav):
        vad = SileroVADFilter(sampling_rate=SR)
        segs = vad.detect_speech_segments(speech_wav)
        assert segs and all(e > s for s, e in segs)


class TestDiarizer:
    def test_two_speakers_separated(self, tmp_path):
        path = str(tmp_path / "two.wav")
        two_speaker_wav(path)
        diar = SpeakerDiarizer(lazy_load=True)
        segments = diar.diarize(path, min_speakers=1, max_speakers=4)
        assert segments
        speakers = {s.speaker for s in segments}
        assert len(speakers) >= 2, f"expected >=2 speakers, got {speakers}"
        # First speaker label is SPEAKER_00 (first-appearance ordering)
        assert segments[0].speaker == "SPEAKER_00"

    def test_min_max_constraints(self, tmp_path):
        path = str(tmp_path / "two.wav")
        two_speaker_wav(path)
        diar = SpeakerDiarizer()
        segs = diar.diarize(path, min_speakers=1, max_speakers=1)
        assert {s.speaker for s in segs} == {"SPEAKER_00"}

    def test_noop_single_speaker(self, speech_wav):
        segs = NoOpDiarizer().diarize(speech_wav)
        assert len(segs) == 1
        assert segs[0].speaker == "SPEAKER_00"
        assert segs[0].end == pytest.approx(10.0, abs=0.1)


class TestSeparator:
    def test_auto_detect_skips_speech(self, tmp_path, speech_wav):
        sep = VocalSeparator(sample_rate=SR, temp_dir=str(tmp_path / "t"))
        assert not sep.is_separation_needed(speech_wav)
        # extract_vocals without force returns input unchanged
        assert sep.extract_vocals(speech_wav) == speech_wav

    def test_separates_steady_music_mix(self, tmp_path, monkeypatch):
        # Pin the weight-free REPET backend: this test checks the
        # repeating-pattern heuristic's band behaviour on pure tones,
        # which is out-of-distribution for a trained MaskUNet bundle.
        monkeypatch.setenv("MAP_TPU_WEIGHTS", str(tmp_path / "no_weights"))
        # vocals-ish: AM-modulated midband; music: steady repeating loop
        n = int(6 * SR)
        t = np.arange(n) / SR
        loop = 0.3 * np.sin(2 * np.pi * 98 * t) + 0.2 * np.sin(2 * np.pi * 196.5 * t)
        vox_env = (np.sin(2 * np.pi * 0.9 * t) > 0).astype(np.float32)
        vox = 0.25 * np.sin(2 * np.pi * 440 * t + 3 * np.sin(2 * np.pi * 5 * t)) * vox_env
        mix = (loop + vox).astype(np.float32)
        path = str(tmp_path / "mix.wav")
        write_wav(path, mix / np.abs(mix).max() * 0.8, SR)

        sep = VocalSeparator(sample_rate=SR, temp_dir=str(tmp_path / "t"))
        out_path = sep.extract_vocals(path, force=True)
        assert out_path != path
        vocals, _ = read_wav(out_path)
        # low-frequency loop energy should drop in the vocal stem
        spec_in = np.abs(np.fft.rfft(read_wav(path)[0]))
        spec_out = np.abs(np.fft.rfft(vocals[: len(spec_in) * 2 - 2]))
        freqs = np.fft.rfftfreq(len(read_wav(path)[0]), 1 / SR)
        low = (freqs > 80) & (freqs < 220)
        mid = (freqs > 400) & (freqs < 480)
        low_ratio = spec_out[low].sum() / spec_in[low].sum()
        mid_ratio = spec_out[mid].sum() / spec_in[mid].sum()
        assert low_ratio < 0.5, "music band should be suppressed"
        assert mid_ratio > low_ratio, "vocal band should survive better"

    def test_checkpoint_resume(self, tmp_path):
        from modular_audio_pipeline_tpu.utils import CheckpointManager

        n = int(3 * SR)
        t = np.arange(n) / SR
        audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        path = str(tmp_path / "m.wav")
        write_wav(path, audio, SR)

        mgr = CheckpointManager(str(tmp_path / "ck"))
        sep = VocalSeparator(
            sample_rate=SR, temp_dir=str(tmp_path / "t"), checkpoint_manager=mgr
        )
        out1 = sep.extract_vocals(path, force=True)
        mtime = os.path.getmtime(out1)
        out2 = sep.extract_vocals(path, force=True)  # from checkpoint
        assert out2 == out1 and os.path.getmtime(out2) == mtime


class TestSegmentMerger:
    def test_merges_same_speaker_within_gap(self):
        segs = [
            {"speaker": "A", "start": 0.0, "end": 1.0, "text": "hello"},
            {"speaker": "A", "start": 1.3, "end": 2.0, "text": "world"},
            {"speaker": "B", "start": 2.1, "end": 3.0, "text": "hi"},
            {"speaker": "A", "start": 3.05, "end": 4.0, "text": "again"},
        ]
        merged = SegmentMerger(max_gap_s=0.5).merge(segs)
        assert len(merged) == 3
        assert merged[0]["text"] == "hello world"
        assert merged[0]["end"] == 2.0
        assert merged[2]["text"] == "again"

    def test_gap_exceeded_not_merged(self):
        segs = [
            {"speaker": "A", "start": 0.0, "end": 1.0, "text": "a"},
            {"speaker": "A", "start": 2.0, "end": 3.0, "text": "b"},
        ]
        assert len(SegmentMerger(max_gap_s=0.5).merge(segs)) == 2

    def test_dataclass_segments_preserve_type(self):
        segs = [
            DiarizationSegment("A", 0.0, 1.0),
            DiarizationSegment("A", 1.2, 2.0),
        ]
        merged = SegmentMerger().merge(segs)
        assert len(merged) == 1
        assert isinstance(merged[0], DiarizationSegment)
        assert merged[0].end == 2.0

    def test_sorts_by_start(self):
        segs = [
            {"speaker": "B", "start": 5.0, "end": 6.0, "text": "later"},
            {"speaker": "A", "start": 0.0, "end": 1.0, "text": "first"},
        ]
        merged = SegmentMerger().merge(segs)
        assert merged[0]["text"] == "first"

    def test_empty(self):
        assert SegmentMerger().merge([]) == []

    def test_overlapping_end_uses_max(self):
        segs = [
            {"speaker": "A", "start": 0.0, "end": 5.0, "text": "long"},
            {"speaker": "A", "start": 1.0, "end": 2.0, "text": "inner"},
        ]
        merged = SegmentMerger().merge(segs)
        assert merged[0]["end"] == 5.0


class TestRedundancy:
    def test_drops_near_duplicates(self):
        segs = [
            {"text": "Hello there, how are you?"},
            {"text": "Hello there how are you"},  # same after normalisation
            {"text": "Completely different content."},
        ]
        out = RedundancyRemover(0.85).remove(segs)
        assert len(out) == 2

    def test_drops_empty(self):
        segs = [{"text": "a sentence"}, {"text": "   "}, {"text": "another one"}]
        out = RedundancyRemover().remove(segs)
        assert len(out) == 2

    def test_similarity_normalisation(self):
        r = RedundancyRemover()
        assert r.get_similarity("Hello, WORLD!", "hello world") == 1.0
        assert r.is_similar("abc def", "abc def")
        assert not r.is_similar("abc", "xyz")

    def test_custom_similarity_fn(self):
        r = RedundancyRemover(custom_similarity_fn=lambda a, b: 1.0)
        assert r.remove([{"text": "a"}, {"text": "b"}]) == [{"text": "a"}]

    def test_remove_with_merging(self):
        segs = [
            {"speaker": "A", "start": 0.0, "end": 1.0, "text": "one"},
            {"speaker": "A", "start": 1.2, "end": 2.0, "text": "two"},
        ]
        out = RedundancyRemover().remove_with_merging(segs)
        assert len(out) == 1 and out[0]["text"] == "one two"

    def test_find_duplicates(self):
        segs = [{"text": "same thing"}, {"text": "other"}, {"text": "same thing"}]
        dups = RedundancyRemover().find_duplicates(segs)
        assert (0, 2, 1.0) in dups


class TestMediaHandler:
    def test_discovery_prefers_audio_sorted(self, tmp_path):
        d = tmp_path / "m"
        d.mkdir()
        write_wav(str(d / "b.wav"), np.zeros(SR, np.float32), SR)
        write_wav(str(d / "a.wav"), np.zeros(SR, np.float32), SR)
        (d / "video.mp4").write_bytes(b"0" * 200)
        handler = MediaHandler(str(d), str(tmp_path / "t"), SR)
        path, is_video = handler.find_media_file()
        assert Path(path).name == "a.wav" and not is_video

    def test_video_fallback(self, tmp_path):
        d = tmp_path / "m"
        d.mkdir()
        (d / "only.mp4").write_bytes(b"0" * 200)
        handler = MediaHandler(str(d), str(tmp_path / "t"), SR)
        path, is_video = handler.find_media_file()
        assert is_video

    def test_no_media_raises(self, tmp_path):
        d = tmp_path / "m"
        d.mkdir()
        handler = MediaHandler(str(d), str(tmp_path / "t"), SR)
        with pytest.raises(MediaNotFoundError):
            handler.find_media_file()

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises(FileValidationError):
            MediaHandler(str(tmp_path / "nope"), str(tmp_path / "t"), SR)

    def test_native_wav_conversion_resamples(self, tmp_path):
        d = tmp_path / "m"
        d.mkdir()
        audio = (0.2 * np.sin(2 * np.pi * 440 * np.arange(44100) / 44100)).astype(
            np.float32
        )
        write_wav(str(d / "x.wav"), audio, 44100)
        handler = MediaHandler(str(d), str(tmp_path / "t"), SR)
        out = handler.convert_to_wav(str(d / "x.wav"))
        samples, sr = read_wav(out)
        assert sr == SR
        assert abs(len(samples) - SR) < 10  # ~1 second

    def test_get_media_info_wav(self, tmp_path):
        d = tmp_path / "m"
        d.mkdir()
        write_wav(str(d / "x.wav"), np.zeros(SR * 2, np.float32), SR)
        handler = MediaHandler(str(d), str(tmp_path / "t"), SR)
        info = handler.get_media_info(str(d / "x.wav"))
        assert info["duration"] == pytest.approx(2.0, abs=0.01)
        assert info["sample_rate"] == SR
        assert info["channels"] == 1


class TestPreprocessorAdapters:
    def test_full_chain(self, tmp_path, tone_plus_silence):
        x, sr = tone_plus_silence
        src = str(tmp_path / "in.wav")
        write_wav(src, x, sr)
        cfg = PipelineConfig(media_dir=str(tmp_path))
        pre = AudioPreprocessor.from_config(cfg)

        denoised = pre.reduce_stationary_noise(src)
        assert denoised.endswith("_denoised.wav")
        norm = pre.normalize_audio(denoised)
        assert norm.endswith("_norm.wav")
        loud = pre.normalize_loudness(norm)
        out, mappings = pre.remove_silence(loud)
        assert mappings
        processed, _ = read_wav(out)
        assert len(processed) < len(x)

    def test_loudness_skips_silence(self, tmp_path):
        src = str(tmp_path / "quiet.wav")
        write_wav(src, np.zeros(SR, np.float32), SR)
        cfg = PipelineConfig(media_dir=str(tmp_path))
        pre = AudioPreprocessor.from_config(cfg)
        assert pre.normalize_loudness(src) == src  # unchanged path

    def test_peak_normalization_level(self, tmp_path):
        src = str(tmp_path / "low.wav")
        write_wav(src, (0.1 * np.sin(np.arange(SR) / 10)).astype(np.float32), SR)
        cfg = PipelineConfig(media_dir=str(tmp_path))
        pre = AudioPreprocessor.from_config(cfg)
        out, _ = read_wav(pre.normalize_audio(src))
        assert np.abs(out).max() == pytest.approx(10 ** (-0.1 / 20), abs=5e-3)


class TestMaskUNet:
    def test_mask_and_reconstruction(self, rng):
        import jax.numpy as jnp

        from modular_audio_pipeline_tpu.models.separation.unet import (
            MaskUNet,
            masking_loss,
        )

        net = MaskUNet(seed=0)
        mag = jnp.asarray(
            np.abs(rng.standard_normal((1, 1025, 50))).astype(np.float32)
        )
        mask = MaskUNet.apply(net.params, mag)
        assert mask.shape == (1, 1025, 50)
        assert 0.0 <= float(mask.min()) and float(mask.max()) <= 1.0

        audio = (0.2 * rng.standard_normal(SR * 2)).astype(np.float32)
        vocals, music = net.separate(audio, SR)
        # masked split is a perfect decomposition of the mixture
        np.testing.assert_allclose(vocals + music, audio, atol=1e-5)

        loss = float(masking_loss(net.params, mag, mag * 0.5))
        assert np.isfinite(loss) and loss > 0

    def test_checkpoint_roundtrip_selects_unet(self, tmp_path, monkeypatch, rng):
        import jax

        from modular_audio_pipeline_tpu.models.separation.unet import MaskUNet
        from modular_audio_pipeline_tpu.models.whisper.convert import save_params

        net = MaskUNet(seed=0)
        ckpt = tmp_path / "separation-htdemucs"
        save_params(jax.tree.map(np.asarray, net.params), str(ckpt))
        monkeypatch.setenv("MAP_TPU_WEIGHTS", str(tmp_path))

        sep = VocalSeparator(sample_rate=SR, temp_dir=str(tmp_path / "t"))
        backend = sep._separation_backend()
        audio = (0.2 * rng.standard_normal(SR)).astype(np.float32)
        vocals, music = backend(audio, SR)
        assert vocals.shape == audio.shape


class TestSpeechFlagSmoothing:
    """pyannote-style min_duration_off/on smoothing (10 ms grid)."""

    def _smooth(self, flags):
        import numpy as np

        from modular_audio_pipeline_tpu.diarizer import SpeakerDiarizer

        return SpeakerDiarizer._smooth_speech_flags(np.asarray(flags, bool))

    def test_fills_short_internal_gap(self):
        f = [True] * 50 + [False] * 30 + [True] * 50  # 300 ms gap
        assert self._smooth(f).all()

    def test_keeps_long_gap(self):
        f = [True] * 50 + [False] * 60 + [True] * 50  # 600 ms gap
        out = self._smooth(f)
        assert not out[50:110].any() and out[:50].all() and out[110:].all()

    def test_drops_short_island(self):
        f = [False] * 100 + [True] * 15 + [False] * 100  # 150 ms island
        assert not self._smooth(f).any()

    def test_preserves_leading_and_trailing_silence(self):
        f = [False] * 10 + [True] * 100 + [False] * 10  # short edge gaps
        out = self._smooth(f)
        assert not out[:10].any() and not out[-10:].any()
        assert out[10:110].all()

    def test_splintered_micro_regions_consolidate(self):
        # the failure mode that zeroed out diarization: 30-40 ms speech
        # islands separated by sub-100 ms gaps must merge, not vanish.
        f = ([True] * 4 + [False] * 7) * 40
        out = self._smooth(f)
        assert out.sum() > 400  # consolidated into one long region
