"""Temperature-fallback ladder tests (whisper decode quality gates)."""

import numpy as np
import pytest

from modular_audio_pipeline_tpu.transcriber import JaxWhisperBackend


class TestQualityGates:
    @pytest.fixture
    def backend(self):
        b = JaxWhisperBackend(
            "test-tiny", language="en", beam_size=1,
            weights_path="random:0", batch_size=2, max_decode_tokens=16,
        )
        b.load()
        return b

    def test_compression_ratio(self, backend):
        assert backend._compression_ratio("a a a a a a a a a a a a a a a a") > 2.4
        assert backend._compression_ratio("the quick brown fox jumps") < 2.0
        assert backend._compression_ratio("") == 0.0

    def test_gates(self, backend):
        # repetition loop -> fallback
        assert backend._needs_fallback(-0.3, None, "word " * 50)
        # low logprob -> fallback
        assert backend._needs_fallback(-1.5, None, "normal sentence here")
        # healthy -> no fallback
        assert not backend._needs_fallback(-0.3, None, "a perfectly normal sentence")

    def test_random_weights_disable_ladder(self, backend):
        assert backend.temperature_fallback is False

    def test_retry_windows_returns_results(self, backend):
        """The ladder machinery itself: retry two failing windows."""
        import jax.numpy as jnp

        from modular_audio_pipeline_tpu.models.whisper.decode import DecodeOptions
        from modular_audio_pipeline_tpu.ops.mel import log_mel

        rng = np.random.default_rng(0)
        audio = (0.1 * rng.standard_normal((2, 16000 * 30))).astype(np.float32)
        mel = log_mel(jnp.asarray(audio), n_mels=backend.dims.n_mels)
        opts = DecodeOptions(language="en", beam_size=1, max_tokens=8)
        out = backend._retry_windows(mel, [0, 1], opts)
        assert set(out.keys()) == {0, 1}
        for toks, lp in out.values():
            assert np.isfinite(lp)
            assert len(toks) > 0
