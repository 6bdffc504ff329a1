"""JAX Whisper stack tests: model mechanics, decode grammar, tokenizer,
checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modular_audio_pipeline_tpu.models.whisper.config import WHISPER_DIMS
from modular_audio_pipeline_tpu.models.whisper.convert import (
    flatten_tree,
    load_params,
    save_params,
    unflatten_tree,
)
from modular_audio_pipeline_tpu.models.whisper.decode import (
    DecodeOptions,
    decode_windows,
)
from modular_audio_pipeline_tpu.models.whisper.model import (
    KVCache,
    cross_kv,
    decoder_forward,
    encoder_forward,
    init_params,
    sinusoids,
)
from modular_audio_pipeline_tpu.models.whisper.tokenizer import (
    DummyTokenizer,
    WhisperTokenizer,
)
from modular_audio_pipeline_tpu.ops.mel import log_mel


DIMS = WHISPER_DIMS["test-tiny"]


@pytest.fixture(scope="module")
def params():
    return init_params(DIMS, seed=0, dtype=jnp.float32)


@pytest.fixture(scope="module")
def mel_input(params):
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(16000 * 30)).astype(np.float32)
    return log_mel(jnp.asarray(audio)[None], n_mels=DIMS.n_mels)


class TestModel:
    def test_encoder_shapes(self, params, mel_input):
        xa = encoder_forward(params, DIMS, mel_input)
        assert xa.shape == (1, DIMS.n_audio_ctx, DIMS.n_audio_state)
        assert np.isfinite(np.asarray(xa)).all()

    def test_sinusoids_match_known_form(self):
        pos = sinusoids(8, 4)
        assert pos.shape == (8, 4)
        np.testing.assert_allclose(pos[0], [0, 0, 1, 1], atol=1e-6)

    def test_incremental_decode_matches_teacher_forced(self, params, mel_input):
        """The KV-cached step loop must reproduce the full-sequence forward."""
        xa = encoder_forward(params, DIMS, mel_input)
        xa_k, xa_v = cross_kv(params, DIMS, xa)
        tokens = jnp.asarray([[100, 200, 300, 400, 500]], dtype=jnp.int32)

        cache = KVCache.zeros(DIMS, 1, jnp.float32)
        full_logits, _ = decoder_forward(params, DIMS, tokens, xa_k, xa_v, cache)

        cache = KVCache.zeros(DIMS, 1, jnp.float32)
        step_logits = []
        for i in range(5):
            lg, cache = decoder_forward(
                params, DIMS, tokens[:, i : i + 1], xa_k, xa_v, cache
            )
            step_logits.append(lg[:, 0])
        step_logits = jnp.stack(step_logits, axis=1)

        np.testing.assert_allclose(
            np.asarray(full_logits), np.asarray(step_logits), rtol=2e-3, atol=2e-3
        )

    def test_prefill_then_steps_consistent(self, params, mel_input):
        xa = encoder_forward(params, DIMS, mel_input)
        xa_k, xa_v = cross_kv(params, DIMS, xa)
        tokens = jnp.asarray([[7, 8, 9, 10]], dtype=jnp.int32)

        cache = KVCache.zeros(DIMS, 1, jnp.float32)
        full_logits, _ = decoder_forward(params, DIMS, tokens, xa_k, xa_v, cache)

        cache = KVCache.zeros(DIMS, 1, jnp.float32)
        _, cache = decoder_forward(params, DIMS, tokens[:, :3], xa_k, xa_v, cache)
        last, _ = decoder_forward(params, DIMS, tokens[:, 3:4], xa_k, xa_v, cache)
        np.testing.assert_allclose(
            np.asarray(full_logits[:, 3]), np.asarray(last[:, 0]), rtol=2e-3, atol=2e-3
        )

    def test_batched_encoder(self, params):
        rng = np.random.default_rng(1)
        audio = (0.1 * rng.standard_normal((3, 16000 * 30))).astype(np.float32)
        mel = log_mel(jnp.asarray(audio), n_mels=DIMS.n_mels)
        xa = encoder_forward(params, DIMS, mel)
        assert xa.shape == (3, DIMS.n_audio_ctx, DIMS.n_audio_state)


class TestDecodeGrammar:
    def test_greedy_respects_timestamp_rules(self, params, mel_input):
        tok = DummyTokenizer()
        res = decode_windows(
            params, DIMS, tok, mel_input,
            DecodeOptions(language="en", beam_size=1, max_tokens=24),
        )
        toks = [int(t) for t in res.tokens[0] if int(t) != tok.eot]
        assert toks, "expected generated tokens"
        # first token is a timestamp <= max_initial (1.0s => begin+50)
        assert tok.is_timestamp(toks[0])
        assert toks[0] <= tok.timestamp_begin + 50
        # timestamps never decrease
        ts = [t for t in toks if tok.is_timestamp(t)]
        assert ts == sorted(ts)
        # never three timestamps in a row
        run = 0
        for t in toks:
            run = run + 1 if tok.is_timestamp(t) else 0
            assert run <= 2

    def test_beam_matches_constraints_and_batches(self, params):
        tok = DummyTokenizer()
        rng = np.random.default_rng(2)
        audio = (0.1 * rng.standard_normal((2, 16000 * 30))).astype(np.float32)
        mel = log_mel(jnp.asarray(audio), n_mels=DIMS.n_mels)
        res = decode_windows(
            params, DIMS, tok, mel,
            DecodeOptions(language="en", beam_size=3, max_tokens=16),
        )
        assert res.tokens.shape[0] == 2
        for b in range(2):
            toks = [int(t) for t in res.tokens[b] if int(t) != tok.eot]
            if toks:
                assert tok.is_timestamp(toks[0])

    def test_exact_einsum_preserves_large_token_ids(self):
        """The beam loop permutes out_tokens (and inserts finished-pool
        rows) via one-hot matmuls. At the backend's DEFAULT matmul
        precision, f32 operands are rounded to bf16 on TPU — token ids
        > 256 drift by up to 128 on a 51k vocab (a real shipped bug,
        caught round 3). _exact_einsum pins Precision.HIGHEST; this test
        guards it with ids across the full whisper vocab on whatever
        backend the suite runs on."""
        from modular_audio_pipeline_tpu.models.whisper.decode import (
            _exact_einsum,
        )

        rng = np.random.default_rng(7)
        ids = rng.integers(0, 51865, size=(80, 224)).astype(np.int32)
        src = rng.integers(0, 80, size=80)
        oh = jax.nn.one_hot(jnp.asarray(src), 80, dtype=jnp.float32)

        @jax.jit
        def permute(oh, vals):
            return _exact_einsum("nb,bt->nt", oh, vals).astype(jnp.int32)

        out = np.asarray(permute(oh, jnp.asarray(ids, jnp.float32)))
        np.testing.assert_array_equal(out, ids[src])

        # logprob-valued selection must be bit-exact too
        vals = rng.standard_normal((80, 224)).astype(np.float32) * 20.0
        out_f = np.asarray(
            jax.jit(lambda o, v: _exact_einsum("nb,bt->nt", o, v))(
                oh, jnp.asarray(vals)
            )
        )
        np.testing.assert_array_equal(out_f, vals[src])

    def test_timestamp_monotonicity_matches_openai_rules(self):
        # openai ApplyTimestampRules: after a completed pair, suppress
        # <= last timestamp; right after a single timestamp, its pair end
        # may equal it (suppress < last only).
        from modular_audio_pipeline_tpu.models.whisper.decode import (
            _apply_timestamp_rules,
        )

        ts_begin, eot, v = 10, 9, 20
        lp = jnp.zeros((1, v), jnp.float32)

        def run(last, penult, max_ts, step=3):
            return np.asarray(_apply_timestamp_rules(
                lp,
                jnp.asarray([last], jnp.int32),
                jnp.asarray([penult], jnp.int32),
                jnp.asarray([max_ts], jnp.int32),
                jnp.asarray(step, jnp.int32),
                ts_begin, eot, ts_begin + 50,
            ))[0]

        suppressed = -1e8  # _NEG_INF is a large negative, not literal -inf

        # text state, pair completed at ts=12: equality now suppressed
        out = run(last=5, penult=12, max_ts=12)
        assert out[12] < suppressed and out[11] < suppressed
        assert out[13] > suppressed
        # single trailing timestamp 12: pair end may equal the start
        out = run(last=12, penult=5, max_ts=12)
        assert out[12] > suppressed and out[11] < suppressed
        # no timestamp seen yet: nothing suppressed by monotonicity
        out = run(last=5, penult=4, max_ts=0)
        assert (out[ts_begin:] > suppressed).all()

    def test_text_follows_opening_timestamp(self, params):
        """Regression (ADVICE r2, high): openai's ``len(sampled) < 2``
        penultimate convention keeps the sentinel alive through the second
        sampled position, so the token right after the forced opening
        timestamp must be TEXT (or EOT) — never a second timestamp. The
        off-by-one made every window open ``<|t|><|t|> text...``."""
        tok = DummyTokenizer()
        rng = np.random.default_rng(7)
        audio = (0.1 * rng.standard_normal((2, 16000 * 30))).astype(np.float32)
        mel = log_mel(jnp.asarray(audio), n_mels=DIMS.n_mels)
        for beam in (1, 3):
            res = decode_windows(
                params, DIMS, tok, mel,
                DecodeOptions(language="en", beam_size=beam, max_tokens=12),
            )
            for b in range(2):
                toks = [int(t) for t in res.tokens[b] if int(t) != tok.eot]
                if len(toks) >= 2:
                    assert tok.is_timestamp(toks[0])
                    assert not tok.is_timestamp(toks[1]), (
                        f"beam={beam}: second sampled token is a timestamp "
                        f"({toks[:4]}) — penult sentinel regressed"
                    )

    def test_no_speech_prob_in_range(self, params, mel_input):
        tok = DummyTokenizer()
        res = decode_windows(
            params, DIMS, tok, mel_input,
            DecodeOptions(language="en", beam_size=1, max_tokens=4),
        )
        assert 0.0 <= res.no_speech_probs[0] <= 1.0

    def test_prompt_conditioning_changes_output(self, params, mel_input):
        tok = DummyTokenizer()
        r1 = decode_windows(
            params, DIMS, tok, mel_input,
            DecodeOptions(language="en", beam_size=1, max_tokens=12),
        )
        r2 = decode_windows(
            params, DIMS, tok, mel_input,
            DecodeOptions(
                language="en", beam_size=1, max_tokens=12,
                prompt_tokens=tuple(tok.encode("hello there")),
            ),
        )
        # different conditioning should (almost surely) change something
        assert (r1.tokens != r2.tokens).any() or (
            r1.sum_logprobs != r2.sum_logprobs
        ).any()


class TestSeekDecoding:
    """whisper's seek-based long-form loop + no-speech gating."""

    @staticmethod
    def _backend():
        from modular_audio_pipeline_tpu.transcriber import JaxWhisperBackend

        b = JaxWhisperBackend("test-tiny", weights_path="random:0", beam_size=1)
        b.tokenizer = DummyTokenizer()
        return b

    def test_advance_equals_last_paired_timestamp(self):
        b = self._backend()
        tok = b.tokenizer
        ts = lambda s: tok.timestamp_begin + int(s / 0.02)
        w = ord("a")
        # two completed segments, window ends mid-pair: advance = 12.2 s
        tokens = [ts(0.0), w, ts(5.0), ts(5.0), w, ts(12.2), ts(12.2), tok.eot]
        segs, advance, consumed = b._parse_window_seek(tokens, -0.1, 30.0, 30.0)
        assert advance == pytest.approx(12.2)
        assert [(s["start"], s["end"]) for s in segs] == [(30.0, 35.0), (35.0, 42.2)]
        assert consumed == [w, w]  # conditioning uses text tokens only

    def test_single_trailing_timestamp_consumes_window(self):
        b = self._backend()
        tok = b.tokenizer
        ts = lambda s: tok.timestamp_begin + int(s / 0.02)
        w = ord("b")
        tokens = [ts(0.0), w, ts(5.0), ts(5.0), w, ts(12.2), tok.eot]
        segs, advance, _ = b._parse_window_seek(tokens, -0.1, 0.0, 30.0)
        assert advance == pytest.approx(30.0)
        assert len(segs) == 2

    def test_no_pairs_single_segment_full_advance(self):
        b = self._backend()
        tok = b.tokenizer
        ts = lambda s: tok.timestamp_begin + int(s / 0.02)
        w = ord("c")
        tokens = [ts(0.0), w, ts(7.5), tok.eot]
        segs, advance, _ = b._parse_window_seek(tokens, -0.1, 0.0, 30.0)
        assert advance == pytest.approx(30.0)
        assert len(segs) == 1
        assert segs[0]["end"] == pytest.approx(7.5)

    def test_no_speech_gate(self):
        b = self._backend()
        # high no-speech prob + low logprob => skipped
        assert b._should_skip_window(0.9, -2.0)
        # confident decode overrides the no-speech prob
        assert not b._should_skip_window(0.9, -0.3)
        assert not b._should_skip_window(0.1, -2.0)
        b.no_speech_threshold = None
        assert not b._should_skip_window(0.99, -5.0)

    def test_sequential_end_to_end_terminates(self, params):
        b = self._backend()
        b.chunking = "sequential"
        b.load()
        rng = np.random.default_rng(4)
        audio = (0.1 * rng.standard_normal(16000 * 70)).astype(np.float32)
        result = b.transcribe_array(audio, 16000)
        assert result["duration"] == pytest.approx(70.0, abs=0.1)
        for seg in result["segments"]:
            assert 0 <= seg["start"] <= 70.5
            assert seg["end"] >= seg["start"]


class TestTokenizer:
    def test_special_token_layout_multilingual(self):
        tok = DummyTokenizer(n_vocab=51865)
        assert tok.eot == 50257
        assert tok.sot == 50258
        assert tok.language_token("en") == 50259
        assert tok.language_token("pt") == 50259 + 8
        assert tok.special.transcribe == 50359
        assert tok.no_timestamps == 50363
        assert tok.timestamp_begin == 50364

    def test_special_token_layout_v3(self):
        tok = DummyTokenizer(n_vocab=51866)
        assert tok.eot == 50257
        assert tok.language_token("yue") == 50258 + 1 + 99
        assert tok.timestamp_begin == 50365

    def test_timestamp_round_trip(self):
        tok = DummyTokenizer()
        assert tok.timestamp_to_seconds(tok.timestamp_begin) == 0.0
        assert tok.timestamp_to_seconds(tok.timestamp_begin + 1500) == pytest.approx(30.0)

    def test_sot_sequence(self):
        tok = DummyTokenizer()
        seq = tok.sot_sequence("pt", "transcribe", timestamps=True)
        assert seq == [tok.sot, tok.language_token("pt"), tok.special.transcribe]
        seq2 = tok.sot_sequence("en", "translate", timestamps=False)
        assert seq2[-1] == tok.no_timestamps

    def test_gpt2_split_separates_letters_and_digits(self):
        # GPT-2's pattern keeps \p{L}+ and \p{N}+ as separate pieces, so a
        # merge spanning a letter-digit boundary must never fire (the old
        # ' ?\w+' approximation let it).
        from modular_audio_pipeline_tpu.models.whisper.tokenizer import (
            _bytes_to_unicode,
        )

        b2u = _bytes_to_unicode()
        vocab = {ch: i for i, ch in enumerate(
            sorted(set(b2u[b] for b in range(256)))
        )}
        vocab["b1"] = len(vocab)
        tok = WhisperTokenizer(vocab, merges=[("b", "1")], n_vocab=51865)
        ids = tok.encode("ab12")
        assert vocab["b1"] not in ids
        assert ids == [vocab["a"], vocab["b"], vocab["1"], vocab["2"]]
        assert tok.decode(ids) == "ab12"

    def test_real_checkpoint_dir_without_bpe_warns(self, tmp_path, caplog):
        import logging

        from modular_audio_pipeline_tpu.models.whisper.tokenizer import (
            DummyTokenizer as DT,
            load_tokenizer,
        )

        (tmp_path / "params.npz").write_bytes(b"")
        with caplog.at_level(logging.WARNING):
            tok = load_tokenizer(str(tmp_path))
        assert isinstance(tok, DT)
        assert any("DummyTokenizer" in r.message for r in caplog.records)

    def test_bpe_tokenizer_roundtrip(self):
        # Minimal BPE vocab exercising merges
        from modular_audio_pipeline_tpu.models.whisper.tokenizer import (
            _bytes_to_unicode,
        )

        b2u = _bytes_to_unicode()
        words = ["hello", "world", " hello", " world", "he", "ll", "o"]
        vocab = {}
        for w in words:
            mapped = "".join(b2u[b] for b in w.encode())
            vocab.setdefault(mapped, len(vocab))
        for ch in set("".join(b2u[b] for b in bytes(range(256)))):
            vocab.setdefault(ch, len(vocab))
        tok = WhisperTokenizer(vocab, merges=[("he", "ll"), ("hell", "o")], n_vocab=51865)
        ids = tok.encode("hello world")
        assert tok.decode(ids) == "hello world"


class TestCheckpointRoundTrip:
    def test_save_load_identical(self, tmp_path, params):
        save_params(jax.tree.map(np.asarray, params), str(tmp_path))
        loaded = load_params(str(tmp_path))
        flat_a = flatten_tree(jax.tree.map(np.asarray, params))
        flat_b = flatten_tree(loaded)
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            np.testing.assert_array_equal(flat_a[k], flat_b[k])

    def test_flatten_unflatten(self):
        tree = {"a": {"b": np.ones(3), "c": {"d": np.zeros(2)}}}
        assert unflatten_tree(flatten_tree(tree))["a"]["c"]["d"].shape == (2,)


class TestDecodeOptionsParity:
    def test_suppress_tokens_extra(self, params, mel_input):
        tok = DummyTokenizer()
        # suppress everything the unsuppressed run chose -> output changes
        base = decode_windows(
            params, DIMS, tok, mel_input,
            DecodeOptions(language="en", beam_size=1, max_tokens=8),
        )
        banned = tuple(
            int(t) for t in base.tokens[0] if int(t) < tok.eot
        )
        if banned:
            alt = decode_windows(
                params, DIMS, tok, mel_input,
                DecodeOptions(language="en", beam_size=1, max_tokens=8,
                              suppress_tokens=banned),
            )
            alt_text_toks = {int(t) for t in alt.tokens[0] if int(t) < tok.eot}
            assert not (set(banned) & alt_text_toks)

    def test_length_penalty_changes_selection_shape(self, params, mel_input):
        tok = DummyTokenizer()
        r = decode_windows(
            params, DIMS, tok, mel_input,
            DecodeOptions(language="en", beam_size=3, max_tokens=8,
                          length_penalty=1.0),
        )
        assert r.tokens.shape[0] == 1  # mechanics run with the penalty path


class TestBeamPatience:
    """Live/finished-pool beam semantics (openai BeamSearchDecoder +
    faster-whisper patience)."""

    def test_pool_capacity_scales_with_patience(self, params):
        from modular_audio_pipeline_tpu.models.whisper.decode import (
            decode_windows_async,
        )

        tok = DummyTokenizer()
        rng = np.random.default_rng(3)
        audio = (0.1 * rng.standard_normal((1, 16000 * 30))).astype(np.float32)
        mel = log_mel(jnp.asarray(audio), n_mels=DIMS.n_mels)
        pending = decode_windows_async(
            params, DIMS, tok, mel,
            DecodeOptions(language="en", beam_size=2, max_tokens=8, patience=2.0),
        )
        assert pending["fin_tok"].shape == (1, 4, 8)  # C = round(2 * 2.0)
        assert pending["fin_lp"].shape == (1, 4)
        from modular_audio_pipeline_tpu.models.whisper.decode import finalize_decode

        res = finalize_decode(pending)
        assert res.tokens.shape == (1, 8)

    def test_patience_below_one_shrinks_pool(self, params):
        # openai/faster-whisper allow round(k * patience) < k; the pool
        # was previously clamped up to beam_size (ADVICE r2, medium).
        from modular_audio_pipeline_tpu.models.whisper.decode import (
            decode_windows_async, finalize_decode,
        )

        tok = DummyTokenizer()
        rng = np.random.default_rng(4)
        audio = (0.1 * rng.standard_normal((1, 16000 * 30))).astype(np.float32)
        mel = log_mel(jnp.asarray(audio), n_mels=DIMS.n_mels)
        pending = decode_windows_async(
            params, DIMS, tok, mel,
            DecodeOptions(language="en", beam_size=4, max_tokens=8, patience=0.25),
        )
        assert pending["fin_tok"].shape == (1, 1, 8)  # C = round(4 * 0.25) = 1
        res = finalize_decode(pending)
        assert res.tokens.shape == (1, 8)

    def test_finalize_prefers_finished_hypotheses(self):
        from modular_audio_pipeline_tpu.models.whisper.decode import finalize_decode

        eot = 9
        # live fold: 2 beams, high raw lp, long sequences; finished pool:
        # one short hypothesis with better per-token normalised score.
        live_tok = np.array([[1, 2, 3, 4], [5, 6, 7, 8]], np.int32)
        live_lp = np.array([-4.0, -5.0], np.float32)
        fin_tok = np.array([[[1, 2, eot, eot], [eot] * 4]], np.int32)
        fin_lp = np.array([[-1.0, -1e9]], np.float32)
        pending = {
            "beam": True, "b": 1, "k": 2, "eot": eot,
            "tokens": live_tok.reshape(2, 4), "sum_lp": live_lp,
            "fin_tok": fin_tok, "fin_lp": fin_lp,
            "ns_prob": np.array([0.1], np.float32),
            "length_penalty": None,
        }
        res = finalize_decode(pending)
        # finished: -1.0 / 2 = -0.5 beats live best -4.0 / 4 = -1.0
        assert list(res.tokens[0]) == [1, 2, eot, eot]
        assert res.sum_logprobs[0] == pytest.approx(-1.0)
        assert res.lengths[0] == 2

    def test_finalize_tops_up_from_live_when_pool_short(self):
        from modular_audio_pipeline_tpu.models.whisper.decode import finalize_decode

        eot = 9
        live_tok = np.array([[1, 2, 3, 4], [5, 6, eot, eot]], np.int32)
        live_lp = np.array([-8.0, -2.0], np.float32)
        fin_tok = np.full((1, 2, 4), eot, np.int32)
        fin_lp = np.full((1, 2), -1e9, np.float32)  # empty pool
        pending = {
            "beam": True, "b": 1, "k": 2, "eot": eot,
            "tokens": live_tok, "sum_lp": live_lp,
            "fin_tok": fin_tok, "fin_lp": fin_lp,
            "ns_prob": np.array([0.2], np.float32),
            "length_penalty": None,
        }
        res = finalize_decode(pending)
        # no finished hypotheses -> live beams ranked by normalised lp:
        # beam1 -2.0/2 = -1.0 beats beam0 -8.0/4 = -2.0
        assert list(res.tokens[0]) == [5, 6, eot, eot]
        assert res.sum_logprobs[0] == pytest.approx(-2.0)


class TestConvertReadiness:
    """VERDICT r3 #7: exercise convert_checkpoint's HF and OpenAI
    key-mapping paths end-to-end on synthetic checkpoints, so the first
    real (egress) conversion isn't the first execution of that code.

    One random ground-truth tree is exported to BOTH source layouts
    (applying the inverse transposes), converted, and loaded back — the
    flat trees must match the ground truth exactly, and a decode must
    run on the converted bundle."""

    @staticmethod
    def _true_tree(dims, rng):
        d = dims.n_audio_state

        def lin(din, dout):
            return rng.standard_normal((din, dout)).astype(np.float32)

        def vec(n):
            return rng.standard_normal((n,)).astype(np.float32)

        def block(cross):
            p = {
                "attn": {
                    "q_w": lin(d, d), "q_b": vec(d), "k_w": lin(d, d),
                    "v_w": lin(d, d), "v_b": vec(d),
                    "o_w": lin(d, d), "o_b": vec(d),
                },
                "attn_ln": {"g": vec(d), "b": vec(d)},
                "mlp": {
                    "fc1_w": lin(d, 4 * d), "fc1_b": vec(4 * d),
                    "fc2_w": lin(4 * d, d), "fc2_b": vec(d),
                },
                "mlp_ln": {"g": vec(d), "b": vec(d)},
            }
            if cross:
                p["cross"] = {
                    "q_w": lin(d, d), "q_b": vec(d), "k_w": lin(d, d),
                    "v_w": lin(d, d), "v_b": vec(d),
                    "o_w": lin(d, d), "o_b": vec(d),
                }
                p["cross_ln"] = {"g": vec(d), "b": vec(d)}
            return p

        def stack(blocks):
            out = {}
            for key in blocks[0]:
                if isinstance(blocks[0][key], dict):
                    out[key] = stack([b[key] for b in blocks])
                else:
                    out[key] = np.stack([b[key] for b in blocks])
            return out

        return {
            "encoder": {
                "conv1": {
                    "w": rng.standard_normal(
                        (d, dims.n_mels, 3)).astype(np.float32),
                    "b": vec(d),
                },
                "conv2": {
                    "w": rng.standard_normal((d, d, 3)).astype(np.float32),
                    "b": vec(d),
                },
                "blocks": stack(
                    [block(False) for _ in range(dims.n_audio_layer)]
                ),
                "ln_post": {"g": vec(d), "b": vec(d)},
            },
            "decoder": {
                "tok_emb": rng.standard_normal(
                    (dims.n_vocab, d)).astype(np.float32),
                "pos_emb": rng.standard_normal(
                    (dims.n_text_ctx, d)).astype(np.float32),
                "blocks": stack(
                    [block(True) for _ in range(dims.n_text_layer)]
                ),
                "ln": {"g": vec(d), "b": vec(d)},
            },
        }

    @staticmethod
    def _export_hf(tree, dims):
        """Inverse of convert._from_hf: our tree -> HF state dict."""
        sd = {}
        enc, dec = tree["encoder"], tree["decoder"]
        sd["model.encoder.conv1.weight"] = enc["conv1"]["w"]
        sd["model.encoder.conv1.bias"] = enc["conv1"]["b"]
        sd["model.encoder.conv2.weight"] = enc["conv2"]["w"]
        sd["model.encoder.conv2.bias"] = enc["conv2"]["b"]
        sd["model.encoder.layer_norm.weight"] = enc["ln_post"]["g"]
        sd["model.encoder.layer_norm.bias"] = enc["ln_post"]["b"]
        sd["model.decoder.embed_tokens.weight"] = dec["tok_emb"]
        sd["model.decoder.embed_positions.weight"] = dec["pos_emb"]
        sd["model.decoder.layer_norm.weight"] = dec["ln"]["g"]
        sd["model.decoder.layer_norm.bias"] = dec["ln"]["b"]

        def put_blocks(blocks, prefix, n, attn_name, cross):
            for i in range(n):
                a = blocks["attn"]
                sd[f"{prefix}.{i}.{attn_name}.q_proj.weight"] = a["q_w"][i].T
                sd[f"{prefix}.{i}.{attn_name}.q_proj.bias"] = a["q_b"][i]
                sd[f"{prefix}.{i}.{attn_name}.k_proj.weight"] = a["k_w"][i].T
                sd[f"{prefix}.{i}.{attn_name}.v_proj.weight"] = a["v_w"][i].T
                sd[f"{prefix}.{i}.{attn_name}.v_proj.bias"] = a["v_b"][i]
                sd[f"{prefix}.{i}.{attn_name}.out_proj.weight"] = a["o_w"][i].T
                sd[f"{prefix}.{i}.{attn_name}.out_proj.bias"] = a["o_b"][i]
                sd[f"{prefix}.{i}.self_attn_layer_norm.weight"] = (
                    blocks["attn_ln"]["g"][i])
                sd[f"{prefix}.{i}.self_attn_layer_norm.bias"] = (
                    blocks["attn_ln"]["b"][i])
                sd[f"{prefix}.{i}.fc1.weight"] = blocks["mlp"]["fc1_w"][i].T
                sd[f"{prefix}.{i}.fc1.bias"] = blocks["mlp"]["fc1_b"][i]
                sd[f"{prefix}.{i}.fc2.weight"] = blocks["mlp"]["fc2_w"][i].T
                sd[f"{prefix}.{i}.fc2.bias"] = blocks["mlp"]["fc2_b"][i]
                sd[f"{prefix}.{i}.final_layer_norm.weight"] = (
                    blocks["mlp_ln"]["g"][i])
                sd[f"{prefix}.{i}.final_layer_norm.bias"] = (
                    blocks["mlp_ln"]["b"][i])
                if cross:
                    c = blocks["cross"]
                    sd[f"{prefix}.{i}.encoder_attn.q_proj.weight"] = c["q_w"][i].T
                    sd[f"{prefix}.{i}.encoder_attn.q_proj.bias"] = c["q_b"][i]
                    sd[f"{prefix}.{i}.encoder_attn.k_proj.weight"] = c["k_w"][i].T
                    sd[f"{prefix}.{i}.encoder_attn.v_proj.weight"] = c["v_w"][i].T
                    sd[f"{prefix}.{i}.encoder_attn.v_proj.bias"] = c["v_b"][i]
                    sd[f"{prefix}.{i}.encoder_attn.out_proj.weight"] = c["o_w"][i].T
                    sd[f"{prefix}.{i}.encoder_attn.out_proj.bias"] = c["o_b"][i]
                    sd[f"{prefix}.{i}.encoder_attn_layer_norm.weight"] = (
                        blocks["cross_ln"]["g"][i])
                    sd[f"{prefix}.{i}.encoder_attn_layer_norm.bias"] = (
                        blocks["cross_ln"]["b"][i])

        put_blocks(enc["blocks"], "model.encoder.layers",
                   dims.n_audio_layer, "self_attn", False)
        put_blocks(dec["blocks"], "model.decoder.layers",
                   dims.n_text_layer, "self_attn", True)
        # extra HF keys the converter must ignore
        sd["proj_out.weight"] = dec["tok_emb"]
        return sd

    @staticmethod
    def _export_openai(tree, dims):
        """Inverse of convert._from_openai: our tree -> OpenAI state dict."""
        sd = {}
        enc, dec = tree["encoder"], tree["decoder"]
        sd["encoder.conv1.weight"] = enc["conv1"]["w"]
        sd["encoder.conv1.bias"] = enc["conv1"]["b"]
        sd["encoder.conv2.weight"] = enc["conv2"]["w"]
        sd["encoder.conv2.bias"] = enc["conv2"]["b"]
        sd["encoder.ln_post.weight"] = enc["ln_post"]["g"]
        sd["encoder.ln_post.bias"] = enc["ln_post"]["b"]
        sd["decoder.token_embedding.weight"] = dec["tok_emb"]
        sd["decoder.positional_embedding"] = dec["pos_emb"]
        sd["decoder.ln.weight"] = dec["ln"]["g"]
        sd["decoder.ln.bias"] = dec["ln"]["b"]

        def put_blocks(blocks, prefix, n, cross):
            for i in range(n):
                a = blocks["attn"]
                sd[f"{prefix}.{i}.attn.query.weight"] = a["q_w"][i].T
                sd[f"{prefix}.{i}.attn.query.bias"] = a["q_b"][i]
                sd[f"{prefix}.{i}.attn.key.weight"] = a["k_w"][i].T
                sd[f"{prefix}.{i}.attn.value.weight"] = a["v_w"][i].T
                sd[f"{prefix}.{i}.attn.value.bias"] = a["v_b"][i]
                sd[f"{prefix}.{i}.attn.out.weight"] = a["o_w"][i].T
                sd[f"{prefix}.{i}.attn.out.bias"] = a["o_b"][i]
                sd[f"{prefix}.{i}.attn_ln.weight"] = blocks["attn_ln"]["g"][i]
                sd[f"{prefix}.{i}.attn_ln.bias"] = blocks["attn_ln"]["b"][i]
                sd[f"{prefix}.{i}.mlp.0.weight"] = blocks["mlp"]["fc1_w"][i].T
                sd[f"{prefix}.{i}.mlp.0.bias"] = blocks["mlp"]["fc1_b"][i]
                sd[f"{prefix}.{i}.mlp.2.weight"] = blocks["mlp"]["fc2_w"][i].T
                sd[f"{prefix}.{i}.mlp.2.bias"] = blocks["mlp"]["fc2_b"][i]
                sd[f"{prefix}.{i}.mlp_ln.weight"] = blocks["mlp_ln"]["g"][i]
                sd[f"{prefix}.{i}.mlp_ln.bias"] = blocks["mlp_ln"]["b"][i]
                if cross:
                    c = blocks["cross"]
                    sd[f"{prefix}.{i}.cross_attn.query.weight"] = c["q_w"][i].T
                    sd[f"{prefix}.{i}.cross_attn.query.bias"] = c["q_b"][i]
                    sd[f"{prefix}.{i}.cross_attn.key.weight"] = c["k_w"][i].T
                    sd[f"{prefix}.{i}.cross_attn.value.weight"] = c["v_w"][i].T
                    sd[f"{prefix}.{i}.cross_attn.value.bias"] = c["v_b"][i]
                    sd[f"{prefix}.{i}.cross_attn.out.weight"] = c["o_w"][i].T
                    sd[f"{prefix}.{i}.cross_attn.out.bias"] = c["o_b"][i]
                    sd[f"{prefix}.{i}.cross_attn_ln.weight"] = (
                        blocks["cross_ln"]["g"][i])
                    sd[f"{prefix}.{i}.cross_attn_ln.bias"] = (
                        blocks["cross_ln"]["b"][i])

        put_blocks(enc["blocks"], "encoder.blocks", dims.n_audio_layer, False)
        put_blocks(dec["blocks"], "decoder.blocks", dims.n_text_layer, True)
        return sd

    def _assert_matches_truth(self, loaded, truth):
        from modular_audio_pipeline_tpu.models.whisper.model import padded_vocab

        flat_got = flatten_tree(loaded)
        flat_true = flatten_tree(truth)
        # load_params pads the embedding table to the lane multiple
        emb = flat_true["decoder/tok_emb"]
        target = padded_vocab(emb.shape[0])
        if target > emb.shape[0]:
            flat_true["decoder/tok_emb"] = np.concatenate(
                [emb, np.zeros((target - emb.shape[0], emb.shape[1]),
                               emb.dtype)]
            )
        assert set(flat_got) == set(flat_true)
        for k in flat_true:
            np.testing.assert_array_equal(
                flat_got[k], flat_true[k], err_msg=k
            )

    def _decode_smoke(self, bundle_dir):
        params = jax.tree.map(
            jnp.asarray, load_params(str(bundle_dir), dtype="float32")
        )
        rng = np.random.default_rng(3)
        audio = (0.1 * rng.standard_normal(16000 * 30)).astype(np.float32)
        mel = log_mel(jnp.asarray(audio[None]), n_mels=DIMS.n_mels)
        out = decode_windows(
            params, DIMS, DummyTokenizer(), mel,
            DecodeOptions(language="en", beam_size=1, max_tokens=4),
        )
        assert out.tokens.shape[0] == 1

    def test_hf_layout_bin(self, tmp_path):
        import torch

        from modular_audio_pipeline_tpu.models.whisper.convert import (
            convert_checkpoint,
        )

        truth = self._true_tree(DIMS, np.random.default_rng(0))
        sd = self._export_hf(truth, DIMS)
        src = tmp_path / "hf"
        src.mkdir()
        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in sd.items()},
            src / "pytorch_model.bin",
        )
        dst = tmp_path / "converted-hf"
        convert_checkpoint(str(src), str(dst), "test-tiny")
        self._assert_matches_truth(load_params(str(dst)), truth)
        self._decode_smoke(dst)

    def test_hf_layout_safetensors(self, tmp_path):
        pytest.importorskip("safetensors")
        from safetensors.numpy import save_file

        from modular_audio_pipeline_tpu.models.whisper.convert import (
            convert_checkpoint,
        )

        truth = self._true_tree(DIMS, np.random.default_rng(1))
        sd = self._export_hf(truth, DIMS)
        src = tmp_path / "hf-st"
        src.mkdir()
        save_file(
            {k: np.ascontiguousarray(v) for k, v in sd.items()},
            str(src / "model.safetensors"),
        )
        dst = tmp_path / "converted-st"
        convert_checkpoint(str(src), str(dst), "test-tiny")
        self._assert_matches_truth(load_params(str(dst)), truth)

    def test_openai_pt(self, tmp_path):
        import torch

        from modular_audio_pipeline_tpu.models.whisper.convert import (
            convert_checkpoint,
        )

        truth = self._true_tree(DIMS, np.random.default_rng(2))
        sd = self._export_openai(truth, DIMS)
        pt = tmp_path / "test-tiny.pt"
        torch.save(
            {
                "model_state_dict": {
                    k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()
                },
                "dims": {"n_vocab": DIMS.n_vocab},
            },
            pt,
        )
        dst = tmp_path / "converted-oai"
        convert_checkpoint(str(pt), str(dst), "test-tiny")
        self._assert_matches_truth(load_params(str(dst)), truth)
        self._decode_smoke(dst)

    def test_hf_and_openai_agree(self, tmp_path):
        """Both layouts of the SAME weights convert to identical trees."""
        import torch

        from modular_audio_pipeline_tpu.models.whisper.convert import (
            convert_checkpoint,
        )

        truth = self._true_tree(DIMS, np.random.default_rng(4))
        hf_src = tmp_path / "hf"
        hf_src.mkdir()
        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in self._export_hf(truth, DIMS).items()},
            hf_src / "pytorch_model.bin",
        )
        pt = tmp_path / "w.pt"
        torch.save(
            {"model_state_dict": {
                k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in self._export_openai(truth, DIMS).items()
            }},
            pt,
        )
        d1, d2 = tmp_path / "c1", tmp_path / "c2"
        convert_checkpoint(str(hf_src), str(d1), "test-tiny")
        convert_checkpoint(str(pt), str(d2), "test-tiny")
        f1 = flatten_tree(load_params(str(d1)))
        f2 = flatten_tree(load_params(str(d2)))
        assert set(f1) == set(f2)
        for k in f1:
            np.testing.assert_array_equal(f1[k], f2[k], err_msg=k)
