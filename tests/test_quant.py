"""Weight-only int8 quantization tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from modular_audio_pipeline_tpu.models.whisper.config import WHISPER_DIMS
from modular_audio_pipeline_tpu.models.whisper.model import (
    KVCache,
    cross_kv,
    decoder_forward,
    encoder_forward,
    init_params,
)
from modular_audio_pipeline_tpu.ops.mel import log_mel
from modular_audio_pipeline_tpu.ops.quant import (
    int8_matmul,
    quantize_decoder,
    quantize_weight,
)

DIMS = WHISPER_DIMS["test-tiny"]


def _cosine(a, b):
    a, b = np.ravel(a), np.ravel(b)
    return float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


class TestQuantWeight:
    def test_roundtrip_error_small(self, rng):
        w = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32) * 0.1)
        wq, ws = quantize_weight(w)
        assert wq.dtype == jnp.int8 and ws.shape == (256,)
        deq = np.asarray(wq, np.float32) * np.asarray(ws)[None, :]
        assert _cosine(deq, np.asarray(w)) > 0.9999

    @pytest.mark.parametrize("interpret", [True, False])
    def test_matmul_matches_f32(self, rng, interpret):
        x = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((256, 512)).astype(np.float32) * 0.05)
        wq, ws = quantize_weight(w)
        ref = np.asarray(x @ w)
        got = np.asarray(int8_matmul(x, wq, ws, interpret=interpret))
        assert _cosine(ref, got) > 0.9999

    def test_batched_input_shapes(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 3, 128)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((128, 512)).astype(np.float32))
        wq, ws = quantize_weight(w)
        out = int8_matmul(x, wq, ws)
        assert out.shape == (2, 3, 512)


class TestQuantizedDecoder:
    def test_logits_close_and_argmax_identical(self, rng):
        params = init_params(DIMS, seed=0, dtype=jnp.float32)
        qparams = quantize_decoder(params)
        audio = (0.1 * rng.standard_normal(16000 * 30)).astype(np.float32)
        mel = log_mel(jnp.asarray(audio)[None])
        xa = encoder_forward(params, DIMS, mel)
        toks = jnp.asarray([[100, 200, 300]], dtype=jnp.int32)

        lf, _ = decoder_forward(
            params, DIMS, toks, *cross_kv(params, DIMS, xa),
            KVCache.zeros(DIMS, 1, jnp.float32, ctx=8),
        )
        lq, _ = decoder_forward(
            qparams, DIMS, toks, *cross_kv(qparams, DIMS, xa),
            KVCache.zeros(DIMS, 1, jnp.float32, ctx=8),
        )
        assert _cosine(np.asarray(lf), np.asarray(lq)) > 0.999
        np.testing.assert_array_equal(
            np.asarray(lf).argmax(-1), np.asarray(lq).argmax(-1)
        )

    def test_backend_int8_end_to_end(self, rng):
        from modular_audio_pipeline_tpu.transcriber import JaxWhisperBackend

        b = JaxWhisperBackend(
            "test-tiny", language="en", beam_size=1, weights_path="random:0",
            compute_dtype="int8", batch_size=1, max_decode_tokens=8,
        )
        audio = (0.1 * rng.standard_normal(16000 * 5)).astype(np.float32)
        result = b.transcribe_array(audio, 16000)
        assert "segments" in result
        assert "logits_wq" in b.params["decoder"]
