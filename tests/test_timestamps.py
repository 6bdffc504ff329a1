"""Word-timestamp alignment tests: DTW (python + native) and the
end-to-end words attachment."""

import numpy as np
import pytest

import jax.numpy as jnp

from modular_audio_pipeline_tpu.models.whisper.config import WHISPER_DIMS
from modular_audio_pipeline_tpu.models.whisper.model import cross_kv, encoder_forward, init_params
from modular_audio_pipeline_tpu.models.whisper.timestamps import (
    align_words,
    dtw_path,
    dtw_path_python,
)
from modular_audio_pipeline_tpu.models.whisper.tokenizer import DummyTokenizer
from modular_audio_pipeline_tpu.ops.mel import log_mel
from modular_audio_pipeline_tpu.runtime.native_lib import have_native, native_dtw_path


class TestDTW:
    def test_diagonal_identity(self):
        # Strong diagonal: path should follow it
        n = 10
        cost = np.ones((n, n)) - np.eye(n)
        cols = dtw_path_python(cost)
        np.testing.assert_array_equal(cols, np.arange(n))

    def test_monotonic_nondecreasing(self, rng):
        cost = rng.random((20, 50))
        cols = dtw_path_python(cost)
        assert (np.diff(cols) >= 0).all()
        assert cols[0] >= 0 and cols[-1] <= 49

    def test_block_alignment(self):
        # tokens 0-1 attend frames 0-4, tokens 2-3 attend frames 5-9
        cost = np.ones((4, 10))
        cost[0:2, 0:5] = 0.0
        cost[2:4, 5:10] = 0.0
        cols = dtw_path_python(cost)
        assert cols[0] < 5 and cols[1] < 5
        assert cols[2] >= 5 and cols[3] >= 5

    @pytest.mark.skipif(not have_native(), reason="native runtime unavailable")
    def test_native_matches_python(self, rng):
        for shape in [(5, 8), (30, 100), (64, 300)]:
            cost = rng.random(shape)
            np.testing.assert_array_equal(
                native_dtw_path(cost), dtw_path_python(cost)
            )

    @pytest.mark.skipif(not have_native(), reason="native runtime unavailable")
    def test_native_is_used_by_default(self, rng):
        cost = rng.random((16, 40))
        np.testing.assert_array_equal(dtw_path(cost), dtw_path_python(cost))

    def test_device_batched_matches_python(self, rng):
        from modular_audio_pipeline_tpu.models.whisper.timestamps import (
            dtw_cols_batched,
        )

        b, s, t = 4, 24, 80
        cost = rng.random((b, s, t)).astype(np.float32)
        lens = np.array([s, 17, 1, 9], np.int32)
        cols = np.asarray(dtw_cols_batched(jnp.asarray(cost), jnp.asarray(lens)))
        for i in range(b):
            if lens[i] == 0:
                continue
            expect = dtw_path_python(cost[i, : lens[i]].astype(np.float64))
            np.testing.assert_array_equal(cols[i, : lens[i]], expect)


class TestMedianNetwork:
    def test_matches_numpy_median_of_7(self, rng):
        from modular_audio_pipeline_tpu.models.whisper.timestamps import _median7

        x = rng.standard_normal((7, 5, 33)).astype(np.float32)
        got = np.asarray(_median7([jnp.asarray(x[i]) for i in range(7)]))
        np.testing.assert_allclose(got, np.median(x, axis=0), rtol=0, atol=0)

    def test_running_median_matches_scipy_style(self, rng):
        """Edge-padded width-7 running median == np.median over a stack of
        the 7 shifted views (the round-2 implementation's semantics)."""
        from modular_audio_pipeline_tpu.models.whisper.timestamps import _median7

        t = 40
        x = rng.standard_normal((3, t)).astype(np.float32)
        padded = np.pad(x, ((0, 0), (3, 3)), mode="edge")
        slices = [padded[:, i : i + t] for i in range(7)]
        got = np.asarray(_median7([jnp.asarray(s) for s in slices]))
        expect = np.median(np.stack(slices), axis=0)
        np.testing.assert_allclose(got, expect)


class TestAlignWords:
    def test_align_words_end_to_end(self, rng):
        dims = WHISPER_DIMS["test-tiny"]
        params = init_params(dims, seed=0, dtype=jnp.float32)
        tok = DummyTokenizer()

        audio = (0.1 * rng.standard_normal(16000 * 30)).astype(np.float32)
        mel = log_mel(jnp.asarray(audio)[None])
        xa = encoder_forward(params, dims, mel)
        xa_k, xa_v = cross_kv(params, dims, xa)

        prefix = tok.sot_sequence("en")
        ts = tok.timestamp_begin
        tokens = [ts, 300, 301, 302, ts + 100, ts + 100, 310, ts + 200, tok.eot]
        words = align_words(params, dims, tok, xa_k, xa_v, tokens, prefix)

        assert words, "expected aligned words"
        for w in words:
            assert 0.0 <= w["start"] <= w["end"] <= 30.0
            assert w["word"]
        # words in emission order have non-decreasing starts
        starts = [w["start"] for w in words]
        assert starts == sorted(starts)

    def test_no_text_tokens(self):
        dims = WHISPER_DIMS["test-tiny"]
        params = init_params(dims, seed=0, dtype=jnp.float32)
        tok = DummyTokenizer()
        xa_k = jnp.zeros((dims.n_text_layer, 1, dims.n_text_head, 1500, 32))
        xa_v = jnp.zeros_like(xa_k)
        assert align_words(params, dims, tok, xa_k, xa_v, [tok.eot], [tok.sot]) == []


class TestWordsInPipeline:
    def test_backend_attaches_words(self, rng, tmp_path):
        from modular_audio_pipeline_tpu.audio_io import write_wav
        from modular_audio_pipeline_tpu.transcriber import JaxWhisperBackend

        audio = (0.1 * rng.standard_normal(16000 * 32)).astype(np.float32)
        backend = JaxWhisperBackend(
            "test-tiny", language="en", beam_size=1, weights_path="random:0",
            batch_size=2, max_decode_tokens=24, word_timestamps=True,
        )
        result = backend.transcribe_array(audio, 16000)
        with_words = [s for s in result["segments"] if "words" in s]
        if result["segments"]:
            assert with_words, "expected word lists on segments"
            for seg in with_words:
                for w in seg["words"]:
                    assert w["start"] <= w["end"]


@pytest.mark.skipif(not have_native(), reason="native runtime unavailable")
class TestNativePCMAndCrossfade:
    def test_pcm_conversions_match_numpy(self, rng):
        from modular_audio_pipeline_tpu.runtime.native_lib import (
            native_f32_to_pcm16,
            native_pcm16_to_f32,
        )

        pcm = (rng.standard_normal(10000) * 20000).astype(np.int16)
        np.testing.assert_allclose(
            native_pcm16_to_f32(pcm), pcm.astype(np.float32) / 32768.0, atol=1e-7
        )
        x = rng.standard_normal(10000).astype(np.float32) * 1.2  # incl. clipping
        expected = np.clip(x * 32768.0, -32768, 32767).astype(np.int16)
        got = native_f32_to_pcm16(x)
        assert np.abs(got.astype(np.int32) - expected.astype(np.int32)).max() <= 1

    def test_crossfade_matches_numpy_fallback(self, rng):
        import modular_audio_pipeline_tpu.runtime.native_lib as nl
        from modular_audio_pipeline_tpu.ops.silence import _crossfade_concat

        chunks = [rng.standard_normal(3000).astype(np.float32) for _ in range(4)]
        xfs = [20, 5, 0]
        native = nl.native_crossfade_concat(chunks, xfs, 16000)

        # force the numpy path by monkeypatching the loader
        orig = nl.native_crossfade_concat
        nl.native_crossfade_concat = lambda *a, **k: None
        try:
            fallback = _crossfade_concat(chunks, xfs, 16000)
        finally:
            nl.native_crossfade_concat = orig

        assert len(native) == len(fallback)
        np.testing.assert_allclose(native, fallback, atol=1e-5)
