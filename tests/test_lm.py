"""Llama-architecture LM tests (local post-processing backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

from modular_audio_pipeline_tpu.models.lm import LLAMA_CONFIGS, LlamaLM
from modular_audio_pipeline_tpu.models.lm.llama import LMCache, forward, init_params
from modular_audio_pipeline_tpu.post_processing_hybrid import extract_json_block

CFG = LLAMA_CONFIGS["test-small"]


@pytest.fixture(scope="module")
def lm():
    return LlamaLM(CFG, params=init_params(CFG, 0, dtype=jnp.float32))


class TestLlama:
    def test_incremental_matches_teacher_forced(self, lm):
        toks = jnp.asarray([[1, 2, 3, 4, 5]], dtype=jnp.int32)
        full, _ = forward(lm.params, CFG, toks, LMCache.zeros(CFG, 1, 16, jnp.float32))
        cache = LMCache.zeros(CFG, 1, 16, jnp.float32)
        outs = []
        for i in range(5):
            lg, cache = forward(lm.params, CFG, toks[:, i : i + 1], cache)
            outs.append(np.asarray(lg[:, 0]))
        np.testing.assert_allclose(
            np.asarray(full), np.stack(outs, 1), rtol=1e-4, atol=1e-4
        )

    def test_greedy_deterministic(self, lm):
        p = np.arange(8, dtype=np.int32)
        a = lm.generate(p, max_new_tokens=10, temperature=0.0)
        b = lm.generate(p, max_new_tokens=10, temperature=0.0)
        np.testing.assert_array_equal(a, b)
        assert len(a) == 10

    def test_eos_stops_generation(self, lm):
        # pick whatever greedy emits first and use it as EOS
        p = np.arange(8, dtype=np.int32)
        first = int(lm.generate(p, max_new_tokens=1, temperature=0.0)[0])
        out = lm.generate(p, max_new_tokens=10, temperature=0.0, eos_id=first)
        assert len(out) == 1 and int(out[0]) == first

    def test_gqa_head_counts(self):
        assert CFG.n_heads % CFG.n_kv_heads == 0


class TestJSONExtraction:
    def test_fenced_block(self):
        raw = 'noise ```json\n{"summary": "hi", "topics": ["a"]}\n``` more'
        assert extract_json_block(raw)["summary"] == "hi"

    def test_balanced_object(self):
        raw = 'Answer: {"summary": "ok", "topics": [], "nested": {"x": 1}} trailing'
        assert extract_json_block(raw)["nested"]["x"] == 1

    def test_regex_fallback(self):
        raw = 'gibberish "summary": "partial result" and "alpha" "beta" junk'
        data = extract_json_block(raw)
        assert data["summary"] == "partial result"

    def test_no_json(self):
        assert extract_json_block("nothing here at all") is None
