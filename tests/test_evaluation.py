"""WER/DER metric tests + language detection."""

import json

import numpy as np
import pytest

from modular_audio_pipeline_tpu.evaluation import compare_transcriptions, der, wer


class TestWER:
    def test_identical(self):
        r = wer("hello world how are you", "hello world how are you")
        assert r["wer"] == 0.0

    def test_case_and_punct_normalised(self):
        assert wer("Hello, World!", "hello world")["wer"] == 0.0

    def test_known_counts(self):
        # ref: a b c d ; hyp: a x c  => 1 sub (b->x), 1 del (d)
        r = wer("a b c d", "a x c")
        assert r["wer"] == pytest.approx(2 / 4)
        assert r["substitutions"] == 1
        assert r["deletions"] == 1
        assert r["insertions"] == 0

    def test_insertion(self):
        r = wer("a b", "a x b")
        assert r["insertions"] == 1
        assert r["wer"] == pytest.approx(0.5)

    def test_empty_reference(self):
        assert wer("", "something here")["wer"] == float("inf")
        assert wer("", "")["wer"] == 0.0


class TestDER:
    def test_perfect(self):
        turns = [("A", 0.0, 5.0), ("B", 5.0, 10.0)]
        assert der(turns, turns)["der"] == pytest.approx(0.0, abs=1e-6)

    def test_label_permutation_is_free(self):
        ref = [("A", 0.0, 5.0), ("B", 5.0, 10.0)]
        hyp = [("SPEAKER_01", 0.0, 5.0), ("SPEAKER_00", 5.0, 10.0)]
        assert der(ref, hyp)["der"] == pytest.approx(0.0, abs=1e-6)

    def test_missed_speech(self):
        ref = [("A", 0.0, 10.0)]
        hyp = [("A", 0.0, 5.0)]
        r = der(ref, hyp)
        assert r["der"] == pytest.approx(0.5, abs=0.01)
        assert r["missed"] == pytest.approx(5.0, abs=0.1)

    def test_confusion(self):
        ref = [("A", 0.0, 5.0), ("B", 5.0, 10.0)]
        hyp = [("X", 0.0, 7.5), ("Y", 7.5, 10.0)]
        r = der(ref, hyp)
        # X maps to A; 2.5s of B mislabelled as X
        assert r["confusion"] == pytest.approx(2.5, abs=0.1)
        assert r["der"] == pytest.approx(0.25, abs=0.02)

    def test_false_alarm(self):
        ref = [("A", 0.0, 5.0)]
        hyp = [("A", 0.0, 5.0), ("A", 6.0, 8.0)]
        r = der(ref, hyp)
        assert r["false_alarm"] == pytest.approx(2.0, abs=0.1)


class TestCompare:
    def test_compare_files(self, tmp_path):
        a = {"segments": [{"speaker": "A", "start": 0.0, "end": 2.0, "text": "hi there"}]}
        b = {"segments": [{"speaker": "B", "start": 0.0, "end": 2.0, "text": "hi there"}]}
        pa, pb = tmp_path / "a.json", tmp_path / "b.json"
        pa.write_text(json.dumps(a))
        pb.write_text(json.dumps(b))
        result = compare_transcriptions(str(pa), str(pb))
        assert result["wer"]["wer"] == 0.0
        assert result["der"]["der"] == pytest.approx(0.0, abs=1e-6)


class TestLanguageDetection:
    def test_detect_language_runs(self, rng):
        import jax.numpy as jnp

        from modular_audio_pipeline_tpu.models.whisper.config import WHISPER_DIMS
        from modular_audio_pipeline_tpu.models.whisper.decode import detect_language
        from modular_audio_pipeline_tpu.models.whisper.model import init_params
        from modular_audio_pipeline_tpu.models.whisper.tokenizer import DummyTokenizer
        from modular_audio_pipeline_tpu.ops.mel import log_mel

        dims = WHISPER_DIMS["test-tiny"]
        params = init_params(dims, seed=0, dtype=jnp.float32)
        tok = DummyTokenizer()
        audio = (0.1 * rng.standard_normal(16000 * 30)).astype(np.float32)
        mel = log_mel(jnp.asarray(audio)[None])
        lang, probs = detect_language(params, dims, tok, mel)
        assert lang in probs
        assert sum(probs.values()) == pytest.approx(1.0, abs=1e-3)
        assert probs[lang] == max(probs.values())

    def test_auto_language_in_backend(self, rng):
        from modular_audio_pipeline_tpu.transcriber import JaxWhisperBackend

        backend = JaxWhisperBackend(
            "test-tiny", language="auto", beam_size=1,
            weights_path="random:0", batch_size=1, max_decode_tokens=8,
        )
        audio = (0.1 * rng.standard_normal(16000 * 5)).astype(np.float32)
        result = backend.transcribe_array(audio, 16000)
        from modular_audio_pipeline_tpu.models.whisper.tokenizer import LANGUAGES

        assert result["language"] in LANGUAGES
