"""Batched Whisper decoding on TPU: greedy and beam search with KV cache.

Replaces CTranslate2's C++ beam search (the reference's hot path,
``/root/reference/audio_pipeline/transcriber.py:421-427``; beam_size 5,
temperature 0.0, word timestamps). Everything runs inside one
``lax.while_loop`` per batch of 30 s windows:

- static token bound (``max_tokens``; whisper's n_text_ctx/2 = 224),
- logit filters applied as vectorised masks (suppress-blank,
  suppress-non-speech, and the full timestamp grammar: pairing,
  monotonicity, max-initial-timestamp, sum-of-timestamp-probability rule),
- beams folded into the batch dimension: ``[B*K]``; cache reordering is a
  gather on the batch axis,
- per-sequence EOT tracking so finished windows idle (no host sync until
  the loop exits).

The same step function serves greedy (K=1) and beam (K>1) decoding, and
temperature>0 sampling for whisper's fallback ladder.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from functools import lru_cache

from ...runtime.integrity import checksum_device, fetch_verified_many
from .config import WhisperDims
from .model import (
    KVCache,
    _quantize_rows,
    cross_kv,
    decoder_forward,
    encoder_forward,
)
from .tokenizer import WhisperTokenizer

__all__ = ["DecodeOptions", "DecodeResult", "decode_windows", "encode_audio_kv"]


@lru_cache(maxsize=4)
def _encode_kv_jit(dims: WhisperDims):
    """Jitted encoder + cross-KV projection (cached per model dims)."""

    @jax.jit
    def run(params, mel):
        xa = encoder_forward(params, dims, mel)
        return cross_kv(params, dims, xa)

    return run


def encode_audio_kv(params, dims: WhisperDims, mel):
    """mel [B, n_mels, 3000] -> (xa_k, xa_v), one fused jitted program."""
    return _encode_kv_jit(dims)(params, mel)


@jax.jit
def _quantize_cross_kv(xa_k, xa_v):
    """Per-position int8 copies of the cross-attention K/V.

    The decode loop re-reads the full audio K/V every step (the largest
    per-step HBM read in the early cache buckets: ~490 MB bf16 for 16
    windows of large-v3-turbo); int8 halves it. Quantised once per batch;
    the bf16 originals stay untouched for the DTW alignment pass, which
    keeps word-timing numerics identical.
    """
    kq, ks = _quantize_rows(xa_k)
    vq, vs = _quantize_rows(xa_v)
    return (kq, ks), (vq, vs)

# Python float, not jnp.float32(...): a module-level jnp array would
# initialise the accelerator backend as an import side effect (and hang
# imports outright when the TPU relay is unreachable). jnp ops coerce it.
_NEG_INF = -1e9


def _exact_einsum(spec: str, *ops) -> jnp.ndarray:
    """einsum at ``Precision.HIGHEST`` with f32 accumulation.

    Every one-hot selection that carries VALUES (token ids, logprobs,
    dequant scales) must use this: the TPU's DEFAULT matmul precision
    rounds f32 operands to bf16, which corrupts token ids > 256
    (measured drift up to 128 on a 51k vocab) and perturbs selected
    logprobs by ~1e-2. HIGHEST keeps f32 operands intact, so one-hot
    selection is exact for integers < 2^24 and bit-exact for f32 values.
    """
    return jnp.einsum(
        spec, *ops,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@dataclass(frozen=True)
class DecodeOptions:
    """Decoding controls (mirrors the reference's TranscriptionConfig knobs)."""

    language: str = "en"
    task: str = "transcribe"
    beam_size: int = 1
    temperature: float = 0.0
    max_tokens: int = 224
    timestamps: bool = True
    max_initial_timestamp: float = 1.0
    suppress_blank: bool = True
    suppress_non_speech: bool = True
    suppress_tokens: Tuple[int, ...] = ()  # extra ids to mask (faster-whisper opt)
    prompt_tokens: Tuple[int, ...] = ()
    length_penalty: Optional[float] = None  # None => simple length norm
    # Beam-search patience (faster-whisper/openai option): keep expanding
    # until round(beam_size * patience) finished hypotheses are collected
    # per window. None => 1.0 (the upstream default).
    patience: Optional[float] = None
    # int8 self-attention KV cache (halves the decode step's dominant HBM
    # traffic; per-position symmetric scales keep the attention algebra
    # exact up to int8 rounding — see model.KVCache).
    kv_int8: bool = True
    # Ancestry-indexed beam attention: never physically permute the KV
    # cache on beam reorder (a full cache read + write per step — the
    # largest reorder term); track per-position ancestors instead and
    # select rows inside self-attention (model._ancestor_attention).
    # Token outputs are identical; this only changes the memory schedule.
    # On TPU this routes to the fused Pallas kernel
    # (ops/ancestor_attention.py): 3.42 -> 2.78 ms/step at the 224-token
    # turbo budget (the pure-XLA formulation used off-TPU is correct but
    # would be slower than the physical reorder — kernel-or-nothing).
    ancestry: bool = True


class DecodeResult(NamedTuple):
    tokens: np.ndarray  # [B, max_tokens] int32, EOT-padded
    lengths: np.ndarray  # [B] valid token counts (excl. EOT)
    sum_logprobs: np.ndarray  # [B]
    avg_logprobs: np.ndarray  # [B]
    no_speech_probs: np.ndarray  # [B]


def _build_filter_tables(tok: WhisperTokenizer, opts: DecodeOptions, n_vocab: int):
    """Static suppression masks, cached on device per (tokenizer, options).

    Rebuilding these per decode call re-uploaded two vocab-sized f32
    arrays every batch (~400 KB each for large models) — per-run link
    round-trips the transfer census flagged (VERDICT r3 #10). Only the
    fields the masks depend on key the cache (``prompt_tokens`` changes
    per window in seek mode and must not thrash it)."""
    return _build_filter_tables_cached(
        tok, opts.suppress_non_speech, tuple(opts.suppress_tokens),
        opts.timestamps, n_vocab,
    )


@lru_cache(maxsize=16)
def _build_filter_tables_cached(
    tok: WhisperTokenizer,
    suppress_non_speech: bool,
    suppress_tokens: Tuple[int, ...],
    timestamps: bool,
    n_vocab: int,
):
    opts = DecodeOptions(
        suppress_non_speech=suppress_non_speech,
        suppress_tokens=suppress_tokens,
        timestamps=timestamps,
    )
    suppress = np.zeros(n_vocab, dtype=np.float32)
    special = [
        tok.sot, tok.special.sot_lm, tok.sot_prev, tok.no_speech,
        tok.special.translate, tok.special.transcribe,
    ] + [tok.special.language_start + i for i in range(tok.special.n_languages)]
    for t in special:
        if t < n_vocab:
            suppress[t] = 1.0
    if opts.suppress_non_speech:
        for t in tok.non_speech_tokens():
            suppress[t] = 1.0
    for t in opts.suppress_tokens:
        if 0 <= t < n_vocab:
            suppress[t] = 1.0
    if opts.timestamps:
        suppress[tok.no_timestamps] = 1.0

    blank = np.zeros(n_vocab, dtype=np.float32)
    for t in tok.encode(" ") + [tok.eot]:
        blank[t] = 1.0
    return jnp.asarray(suppress), jnp.asarray(blank)


def _apply_timestamp_rules(
    logprobs: jnp.ndarray,  # [B, V] f32 log-softmax
    last_tok: jnp.ndarray,  # [B]
    penult_tok: jnp.ndarray,  # [B]
    max_ts_tok: jnp.ndarray,  # [B] highest timestamp token emitted so far
    step_idx: jnp.ndarray,  # scalar: tokens generated so far (0 on first)
    ts_begin: int,
    eot: int,
    max_initial_ts_tok: int,
) -> jnp.ndarray:
    """Whisper's timestamp grammar as one vectorised mask pass."""
    v = logprobs.shape[-1]
    ids = jnp.arange(v)
    is_ts = ids >= ts_begin  # [V]

    last_was_ts = last_tok >= ts_begin
    penult_was_ts = penult_tok >= ts_begin

    # 1. after <ts><ts> or at text: next cannot be a timestamp;
    #    after a single <ts>: next must be a timestamp or EOT.
    forbid_ts = last_was_ts & penult_was_ts  # [B]
    force_ts = last_was_ts & ~penult_was_ts
    mask = jnp.where(forbid_ts[:, None] & is_ts[None, :], _NEG_INF, 0.0)
    not_ts_not_eot = (~is_ts) & (ids != eot)
    mask = mask + jnp.where(force_ts[:, None] & not_ts_not_eot[None, :], _NEG_INF, 0.0)

    # 2. timestamps are non-decreasing (openai ApplyTimestampRules): after
    #    a completed pair the next start must be strictly greater
    #    (suppress <= max seen); right after a single timestamp its pair
    #    end may equal it (suppress < max seen). No-ts-yet case: max_ts=0
    #    < ts_begin, so the maximum() clamps the cutoff to suppress nothing.
    pair_open = force_ts  # exactly one trailing unpaired timestamp
    cutoff = jnp.maximum(
        max_ts_tok + (~pair_open).astype(jnp.int32), ts_begin
    )
    below = ids[None, :] < cutoff[:, None]
    mask = mask + jnp.where(below & is_ts[None, :], _NEG_INF, 0.0)

    # 3. first generated token must be a timestamp, capped at
    #    max_initial_timestamp.
    first = step_idx == 0
    mask = mask + jnp.where(
        first & not_ts_not_eot[None, :], _NEG_INF, 0.0
    )
    mask = mask + jnp.where(
        first & (ids[None, :] > max_initial_ts_tok) & is_ts[None, :], _NEG_INF, 0.0
    )

    filtered = logprobs + mask

    # 4. if total timestamp probability beats the best text token, force a
    #    timestamp.
    ts_logprob = jax.nn.logsumexp(jnp.where(is_ts[None, :], filtered, _NEG_INF), axis=-1)
    max_text = jnp.max(jnp.where(is_ts[None, :], _NEG_INF, filtered), axis=-1)
    force = ts_logprob > max_text  # [B]
    filtered = filtered + jnp.where(
        force[:, None] & (~is_ts)[None, :], _NEG_INF, 0.0
    )
    return filtered


def _stage_bounds(p: int, max_new: int, n_text_ctx: int) -> List[Tuple[int, int]]:
    """Bucketed decode schedule: ``[(stage_end_token, cache_ctx)]``.

    The KV cache starts at the smallest 64-multiple that fits the prompt
    plus the first tokens, and grows by 64-slot buckets between staged
    ``while_loop`` runs. Every per-step cost that scales with cache
    capacity (attention reads, beam cache reorders, scan xs reads,
    carry copies) then tracks the LIVE context instead of the final
    224-token capacity — ~36 % less cache traffic over a full budget,
    and far less when real checkpoints EOT early. Numerics are
    unchanged: padded slots are masked by position exactly as before.
    """
    bounds: List[Tuple[int, int]] = []
    t = 0
    while t < max_new:
        ctx = min(n_text_ctx, ((p + t + 64) // 64) * 64)
        t_next = max_new if ctx >= n_text_ctx else min(max_new, ctx - p)
        bounds.append((t_next, ctx))
        t = t_next
    return bounds


def _pad_cache(cache: KVCache, ctx: int) -> KVCache:
    cur = cache.k.shape[-2]
    if cur == ctx:
        return cache
    pad = ((0, 0), (0, 0), (0, 0), (0, ctx - cur), (0, 0))
    spad = pad[:-1]
    return KVCache(
        k=jnp.pad(cache.k, pad),
        v=jnp.pad(cache.v, pad),
        pos=cache.pos,
        k_scale=None if cache.k_scale is None else jnp.pad(cache.k_scale, spad),
        v_scale=None if cache.v_scale is None else jnp.pad(cache.v_scale, spad),
    )


def _greedy_prefill(
    params,
    dims: WhisperDims,
    xa_k,
    xa_v,
    initial_tokens: jnp.ndarray,  # [B, P]
    sot_index: int,
    opts_static: Dict[str, Any],
    rng: jnp.ndarray,
    ctx0: int,
):
    """Prompt pass -> (loop state, no_speech_prob)."""
    b, p = initial_tokens.shape
    max_new = opts_static["max_tokens"]
    eot = opts_static["eot"]
    ts_begin = opts_static["ts_begin"]

    cache = KVCache.zeros(
        dims, b, dtype=params["decoder"]["tok_emb"].dtype, ctx=ctx0,
        quant=opts_static.get("kv_int8", False),
    )
    logits, cache = decoder_forward(params, dims, initial_tokens, xa_k, xa_v, cache)
    sot_logits = logits[:, sot_index].astype(jnp.float32)
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, opts_static["no_speech"]]

    out_tokens = jnp.full((b, max_new), eot, dtype=jnp.int32)
    last = initial_tokens[:, -1]
    # openai ApplyTimestampRules treats the penultimate slot as a
    # timestamp while fewer than two tokens have been SAMPLED (its
    # `len(sampled) < 2 or ...` convention), so text is allowed right
    # after the opening <|0.00|>. Prompt tokens must not leak into the
    # rule, hence the timestamp-sentinel init rather than the prompt tail.
    penult = jnp.full((b,), ts_begin, jnp.int32)
    state = (
        jnp.asarray(0, jnp.int32), cache, out_tokens, last, penult,
        jnp.zeros((b,), jnp.int32), jnp.zeros((b,), bool),
        jnp.zeros((b,), jnp.float32), rng,
        logits[:, -1].astype(jnp.float32),
    )
    return state, no_speech_prob


def _greedy_stage(
    params,
    dims: WhisperDims,
    xa_k,
    xa_v,
    state,
    suppress_mask: jnp.ndarray,
    blank_mask: jnp.ndarray,
    opts_static: Dict[str, Any],
    stage_end: int,
):
    """Greedy/sampling decode from state.i to ``stage_end`` tokens."""
    eot = opts_static["eot"]
    ts_begin = opts_static["ts_begin"]
    timestamps = opts_static["timestamps"]
    temperature = opts_static["temperature"]

    def body(state):
        (i, cache, out_tokens, last, penult, max_ts, done, sum_lp, rng_key, prev_logits) = state

        logprobs = jax.nn.log_softmax(prev_logits, axis=-1)  # [B, V]

        # suppress-blank only on the first generated token
        lp = jnp.where(suppress_mask[None, :] > 0, _NEG_INF, logprobs)
        lp = jnp.where(
            (i == 0) & opts_static["suppress_blank"],
            jnp.where(blank_mask[None, :] > 0, _NEG_INF, lp),
            lp,
        )
        if timestamps:
            lp = _apply_timestamp_rules(
                lp, last, penult, max_ts, i, ts_begin, eot,
                opts_static["max_initial_ts_tok"],
            )

        if temperature > 0:
            rng_key, sub = jax.random.split(rng_key)
            next_tok = jax.random.categorical(sub, lp / temperature, axis=-1)
        else:
            next_tok = jnp.argmax(lp, axis=-1)
        next_tok = jnp.where(done, eot, next_tok).astype(jnp.int32)

        tok_lp = jnp.take_along_axis(lp, next_tok[:, None], axis=-1)[:, 0]
        sum_lp = sum_lp + jnp.where(done, 0.0, tok_lp)

        out_tokens = jax.lax.dynamic_update_slice_in_dim(
            out_tokens, next_tok[:, None], i, axis=1
        )
        new_done = done | (next_tok == eot)
        new_max_ts = jnp.where(
            (next_tok >= ts_begin) & ~done, jnp.maximum(max_ts, next_tok), max_ts
        )

        # openai's `len(sampled) < 2` convention: the penultimate slot reads
        # as a timestamp through the SECOND sampled position, so after the
        # forced opening <|t|> the next token is text, not another
        # timestamp. The step that samples token 0 must therefore hand the
        # sentinel (not the prompt tail) to step 1.
        new_penult = jnp.where(i == 0, jnp.full_like(last, ts_begin), last)

        logits, cache = decoder_forward(
            params, dims, next_tok[:, None], xa_k, xa_v, cache
        )
        return (
            i + 1, cache, out_tokens, next_tok, new_penult, new_max_ts, new_done,
            sum_lp, rng_key, logits[:, -1].astype(jnp.float32),
        )

    def cond(state):
        i, _, _, _, _, _, done, _, _, _ = state
        return (i < stage_end) & ~jnp.all(done)

    return jax.lax.while_loop(cond, body, state)


@partial(jax.jit, static_argnames=("dims", "sot_index", "opts_key", "ctx0"))
def _greedy_prefill_jit(
    params, dims, xa_k, xa_v, initial_tokens, sot_index, opts_key, rng, ctx0
):
    return _greedy_prefill(
        params, dims, xa_k, xa_v, initial_tokens, sot_index,
        dict(opts_key), rng, ctx0,
    )


@partial(jax.jit, static_argnames=("dims", "opts_key", "stage_end", "pad_to"))
def _greedy_stage_jit(
    params, dims, xa_k, xa_v, state, suppress_mask, blank_mask,
    opts_key, stage_end, pad_to,
):
    state = state[:1] + (_pad_cache(state[1], pad_to),) + state[2:]
    return _greedy_stage(
        params, dims, xa_k, xa_v, state, suppress_mask, blank_mask,
        dict(opts_key), stage_end,
    )


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------

def _beam_prefill(
    params,
    dims: WhisperDims,
    xa_k,
    xa_v,
    initial_tokens: jnp.ndarray,  # [B*K, P]
    sot_index: int,
    opts_static: Dict[str, Any],
    ctx0: int,
):
    """Prompt pass -> (beam loop state, no_speech_prob)."""
    bk, p = initial_tokens.shape
    k_beams = opts_static["beam_size"]
    b = bk // k_beams
    max_new = opts_static["max_tokens"]
    eot = opts_static["eot"]
    ts_begin = opts_static["ts_begin"]
    pool = opts_static["pool_size"]

    cache = KVCache.zeros(
        dims, bk, dtype=params["decoder"]["tok_emb"].dtype, ctx=ctx0,
        quant=opts_static.get("kv_int8", False),
    )
    logits, cache = decoder_forward(params, dims, initial_tokens, xa_k, xa_v, cache)
    sot_logits = logits[:, sot_index].astype(jnp.float32)
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, opts_static["no_speech"]]
    no_speech_prob = no_speech_prob.reshape(b, k_beams)[:, 0]

    out_tokens = jnp.full((bk, max_new), eot, dtype=jnp.int32)
    last = initial_tokens[:, -1]
    # Timestamp-sentinel init: see the greedy loop's note (openai's
    # sampled-only penultimate convention).
    penult = jnp.full((bk,), ts_begin, jnp.int32)

    # beam 0 active, others start at -inf so the first expansion fans out.
    beam_lp = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((k_beams - 1,), -1e9)])[None, :],
        (b, 1),
    ).reshape(bk)

    fin_lp = jnp.full((b, pool), _NEG_INF, jnp.float32)
    fin_tok = jnp.full((b, pool, max_new), eot, jnp.int32)
    fin_cnt = jnp.zeros((b,), jnp.int32)
    # Ancestor table for ancestry-indexed attention: anc[b, k, p] = local
    # beam row holding hypothesis k's K/V at position p. Prefill writes
    # each row's own prompt, so it starts as the identity everywhere
    # (positions beyond pos are masked until written).
    anc = jnp.broadcast_to(
        jnp.arange(k_beams, dtype=jnp.int32)[None, :, None], (b, k_beams, ctx0)
    )
    state = (
        jnp.asarray(0, jnp.int32), cache, out_tokens, last, penult,
        jnp.zeros((bk,), jnp.int32), beam_lp,
        logits[:, -1].astype(jnp.float32), fin_lp, fin_tok, fin_cnt, anc,
    )
    return state, no_speech_prob


def _beam_stage(
    params,
    dims: WhisperDims,
    xa_k,  # [L, B, H, T, hd] (shared across beams)
    xa_v,
    state,
    suppress_mask,
    blank_mask,
    opts_static: Dict[str, Any],
    stage_end: int,
):
    """Live/finished-pool beam search (t5x-style, TPU-shaped).

    Matches openai-whisper's ``BeamSearchDecoder`` semantics exactly
    (including ``patience``): each step expands the top 2K candidates,
    routes EOT candidates into a per-window finished pool (capacity
    C = round(K * patience), first-come in logprob order, never evicted),
    and refills the live fold with the top K non-EOT candidates. The
    search stops when every window has collected C finished hypotheses
    or the token budget runs out. Finished beams never occupy fold
    slots, so the fold keeps exploring — the behaviour faster-whisper
    inherits at /root/reference/audio_pipeline/transcriber.py:316-319.

    Runs tokens ``state.i .. stage_end`` against a cache sized for this
    bucket (see :func:`_stage_bounds`).
    """
    bk = state[3].shape[0]  # last tokens [BK]
    k_beams = opts_static["beam_size"]
    b = bk // k_beams
    v = dims.n_vocab
    max_new = opts_static["max_tokens"]
    eot = opts_static["eot"]
    ts_begin = opts_static["ts_begin"]
    timestamps = opts_static["timestamps"]
    pool = opts_static["pool_size"]  # C = max(1, round(k * patience))

    ancestry = bool(opts_static.get("ancestry", False))

    def body(state):
        (i, cache, out_tokens, last, penult, max_ts, beam_lp, prev_logits,
         fin_lp, fin_tok, fin_cnt, anc) = state

        logprobs = jax.nn.log_softmax(prev_logits, axis=-1)  # [BK, V]
        lp = jnp.where(suppress_mask[None, :] > 0, _NEG_INF, logprobs)
        lp = jnp.where(
            (i == 0) & opts_static["suppress_blank"],
            jnp.where(blank_mask[None, :] > 0, _NEG_INF, lp),
            lp,
        )
        if timestamps:
            lp = _apply_timestamp_rules(
                lp, last, penult, max_ts, i, ts_begin, eot,
                opts_static["max_initial_ts_tok"],
            )

        total = beam_lp[:, None] + lp  # [BK, V]
        total = total.reshape(b, k_beams * v)
        # 2K candidates: at most K can be EOT (one per source beam), so the
        # top 2K always contain K live continuations plus every EOT
        # candidate that could rank into the finished pool this step.
        # approx_max_k at recall 1.0 is exact and lowers to the TPU's
        # partial-reduction TopK, much faster than top_k's full sort over
        # the 260k-wide candidate row.
        top_lp, top_idx = jax.lax.approx_max_k(
            total, 2 * k_beams, recall_target=1.0
        )  # [B, 2K], descending
        src_beam = top_idx // v  # [B, 2K]
        cand_tok = (top_idx % v).astype(jnp.int32)
        # Dead-beam padding sits at ~-1e9; exclude it from the pool. And
        # match openai's candidate scan exactly: it walks candidates in
        # descending score and STOPS once beam_size live continuations are
        # saved, so an EOT ranked below the K-th live candidate never
        # reaches the finished pool. (This also subsumes openai's
        # per-beam topk(K+1) truncation: an EOT outside its beam's top
        # K+1 has >= K live candidates from its own beam above it.)
        is_live_cand = (cand_tok != eot) & (top_lp > -1e8)
        live_before = jnp.cumsum(is_live_cand.astype(jnp.int32), axis=1) - \
            is_live_cand.astype(jnp.int32)  # exclusive scan [B, 2K]
        valid_eot = (cand_tok == eot) & (top_lp > -1e8) & (live_before < k_beams)

        # --- finished pool: insert EOT candidates in logprob order while
        # the pool has room (never evict — first-come, as openai-whisper's
        # finished_sequences dict with max_candidates). The insertion
        # arithmetic only runs on steps where an EOT candidate actually
        # surfaced (with real checkpoints that's a minority of steps;
        # lax.cond skips the work entirely otherwise).
        def _insert_pool(args):
            fin_lp, fin_tok, fin_cnt = args
            rank = jnp.cumsum(valid_eot.astype(jnp.int32), axis=1) - 1  # [B, 2K]
            slot = fin_cnt[:, None] + rank
            insert = valid_eot & (slot < pool)
            sel = jnp.where(
                insert[:, :, None],
                jax.nn.one_hot(slot, pool, dtype=jnp.float32),
                0.0,
            )  # [B, 2K, C] — each pool slot receives at most one candidate
            written = jnp.sum(sel, axis=1) > 0  # [B, C]
            fin_lp = jnp.where(
                written, _exact_einsum("bec,be->bc", sel, top_lp), fin_lp
            )
            # Candidate sequences = their source beam's out_tokens
            # (positions >= i are still EOT). Route beam rows into pool
            # slots with a dense [K -> C] mixing matrix instead of a row
            # gather: advanced indexing over the batch axis lowers to a
            # per-row DMA loop on TPU; the tiny einsums stay on the MXU.
            src_oh = jax.nn.one_hot(src_beam, k_beams, dtype=jnp.float32)
            beam_to_slot = _exact_einsum("bec,bek->bkc", sel, src_oh)  # [B, K, C]
            new_rows = _exact_einsum(
                "bkc,bkt->bct", beam_to_slot,
                out_tokens.reshape(b, k_beams, max_new).astype(jnp.float32),
            ).astype(jnp.int32)
            fin_tok = jnp.where(written[:, :, None], new_rows, fin_tok)
            fin_cnt = jnp.minimum(
                fin_cnt + jnp.sum(valid_eot.astype(jnp.int32), axis=1), pool
            )
            return fin_lp, fin_tok, fin_cnt

        fin_lp, fin_tok, fin_cnt = jax.lax.cond(
            jnp.any(valid_eot), _insert_pool, lambda args: args,
            (fin_lp, fin_tok, fin_cnt),
        )

        # --- live fold: top K non-EOT candidates.
        live_cand_lp = jnp.where(cand_tok == eot, _NEG_INF, top_lp)  # [B, 2K]
        live_lp, live_sel = jax.lax.top_k(live_cand_lp, k_beams)  # [B, K]
        live_src = jnp.take_along_axis(src_beam, live_sel, axis=1)
        next_tok = jnp.take_along_axis(cand_tok, live_sel, axis=1)

        # Gather/reorder everything by source beam (batch-local indices).
        flat_src = (live_src + jnp.arange(b)[:, None] * k_beams).reshape(bk)
        max_ts = max_ts[flat_src]
        last = last[flat_src]
        # out_tokens ride a one-hot permutation matmul: a row gather over
        # the batch axis lowers to a per-row while loop on TPU; the small
        # einsum stays on the MXU (exactness: see _exact_einsum).
        perm = jax.nn.one_hot(flat_src, bk, dtype=cache.k.dtype)  # [BK_new, BK_old]
        out_tokens = _exact_einsum(
            "nb,bt->nt", perm.astype(jnp.float32),
            out_tokens.astype(jnp.float32),
        ).astype(jnp.int32)
        if ancestry:
            # Never move the cache: permute the tiny ancestor table by the
            # same source map (exact one-hot matmul over values < K) and
            # claim the about-to-be-written position for each row itself.
            src_oh = jax.nn.one_hot(live_src, k_beams, dtype=jnp.float32)
            anc = _exact_einsum(
                "bnk,bkp->bnp", src_oh, anc.astype(jnp.float32)
            ).astype(jnp.int32)
            own = jnp.broadcast_to(
                jnp.arange(k_beams, dtype=jnp.int32)[None, :, None],
                (b, k_beams, 1),
            )
            anc = jax.lax.dynamic_update_slice(anc, own, (0, 0, cache.pos))
        else:
            # Physical cache reorder (fallback path, kept for A/B and
            # non-ancestry callers): one-hot permutation matmuls stream
            # the whole cache through the MXU — a full read + write of
            # every layer's K/V per step. int8 caches permute through the
            # MXU's int8 path (int32 accumulate is exact for one-hot row
            # selection).
            acc = jnp.int32 if cache.k.dtype == jnp.int8 else jnp.float32
            new_ck = jnp.einsum(
                "nb,lbhcd->lnhcd", perm, cache.k, preferred_element_type=acc
            ).astype(cache.k.dtype)
            new_cv = jnp.einsum(
                "nb,lbhcd->lnhcd", perm, cache.v, preferred_element_type=acc
            ).astype(cache.v.dtype)
            if cache.k_scale is not None:
                # _exact_einsum: DEFAULT precision would round the f32
                # dequant scales to bf16 in the permute (~0.4% drift per
                # reorder, compounding across steps).
                perm_f = perm.astype(jnp.float32)
                new_ks = _exact_einsum("nb,lbhc->lnhc", perm_f, cache.k_scale)
                new_vs = _exact_einsum("nb,lbhc->lnhc", perm_f, cache.v_scale)
            else:
                new_ks = new_vs = None
            cache = KVCache(
                k=new_ck, v=new_cv, pos=cache.pos, k_scale=new_ks, v_scale=new_vs
            )

        next_tok = next_tok.reshape(bk)
        beam_lp = live_lp.reshape(bk)

        out_tokens = jax.lax.dynamic_update_slice_in_dim(
            out_tokens, next_tok[:, None], i, axis=1
        )
        new_max_ts = jnp.where(
            next_tok >= ts_begin, jnp.maximum(max_ts, next_tok), max_ts
        )
        # Sampled-only penultimate convention (see greedy loop): step 0
        # hands the timestamp sentinel forward so the token after the
        # forced opening timestamp is text.
        penult_new = jnp.where(i == 0, jnp.full_like(last, ts_begin), last)
        last_new = next_tok

        logits, cache = decoder_forward(
            params, dims, next_tok[:, None], xa_k, xa_v, cache,
            anc=anc if ancestry else None,
        )
        return (
            i + 1, cache, out_tokens, last_new, penult_new, new_max_ts,
            beam_lp, logits[:, -1].astype(jnp.float32), fin_lp, fin_tok,
            fin_cnt, anc,
        )

    def cond(state):
        i = state[0]
        fin_cnt = state[10]
        return (i < stage_end) & ~jnp.all(fin_cnt >= pool)

    return jax.lax.while_loop(cond, body, state)


@partial(jax.jit, static_argnames=("dims", "sot_index", "opts_key", "ctx0"))
def _beam_prefill_jit(
    params, dims, xa_k, xa_v, initial_tokens, sot_index, opts_key, ctx0
):
    return _beam_prefill(
        params, dims, xa_k, xa_v, initial_tokens, sot_index, dict(opts_key), ctx0
    )


@partial(jax.jit, static_argnames=("dims", "opts_key", "stage_end", "pad_to"))
def _beam_stage_jit(
    params, dims, xa_k, xa_v, state, suppress_mask, blank_mask,
    opts_key, stage_end, pad_to,
):
    anc = state[11]
    if anc.shape[-1] != pad_to:
        # Grow the ancestor table with the cache; padded slots are masked
        # by position until written, so zero ancestors are inert.
        anc = jnp.pad(anc, ((0, 0), (0, 0), (0, pad_to - anc.shape[-1])))
    state = state[:1] + (_pad_cache(state[1], pad_to),) + state[2:11] + (anc,)
    return _beam_stage(
        params, dims, xa_k, xa_v, state, suppress_mask, blank_mask,
        dict(opts_key), stage_end,
    )


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def detect_language(
    params,
    dims: WhisperDims,
    tokenizer: WhisperTokenizer,
    mel: jnp.ndarray,  # [B, n_mels, 3000]
) -> Tuple[str, Dict[str, float]]:
    """Single-step language ID: distribution over language tokens after SOT.

    Mirrors whisper's ``detect_language`` (the reference exposes this via
    faster-whisper's automatic detection when no language is forced).
    Returns (language_code, {code: prob}) using the batch-mean distribution.
    """
    from .tokenizer import LANGUAGES

    xa = encoder_forward(params, dims, mel)
    xa_k, xa_v = cross_kv(params, dims, xa)
    b = mel.shape[0]
    sot = jnp.full((b, 1), tokenizer.sot, dtype=jnp.int32)
    cache = KVCache.zeros(dims, b, params["decoder"]["tok_emb"].dtype, ctx=8)
    logits, _ = decoder_forward(params, dims, sot, xa_k, xa_v, cache)

    n_lang = tokenizer.special.n_languages
    start = tokenizer.special.language_start
    lang_logits = logits[:, 0, start : start + n_lang].astype(jnp.float32)
    probs = np.asarray(jax.nn.softmax(lang_logits, axis=-1)).mean(axis=0)
    best = int(np.argmax(probs))
    table = {LANGUAGES[i]: float(probs[i]) for i in range(n_lang)}
    return LANGUAGES[best], table


def build_initial_tokens(
    tokenizer: WhisperTokenizer, opts: DecodeOptions
) -> Tuple[List[int], int]:
    """Conditioning sequence ([prev-prompt] + SOT block) and SOT position."""
    sot_seq = tokenizer.sot_sequence(opts.language, opts.task, opts.timestamps)
    prefix = list(opts.prompt_tokens)
    if prefix:
        prefix = [tokenizer.sot_prev] + prefix
    initial = prefix + sot_seq
    return initial, len(initial) - len(sot_seq)


@lru_cache(maxsize=64)
def _tiled_initial(initial: Tuple[int, ...], rows: int):
    """Device-cached [rows, len(initial)] conditioning block (one upload
    per distinct prompt, not one per decode call)."""
    return jnp.tile(jnp.asarray(initial, jnp.int32)[None], (rows, 1))


def decode_windows_async(
    params,
    dims: WhisperDims,
    tokenizer: WhisperTokenizer,
    mel: Optional[jnp.ndarray],  # [B, n_mels, 3000]
    opts: DecodeOptions,
    rng: Optional[jnp.ndarray] = None,
    audio_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
):
    """Dispatch encode + decode for one batch; returns device arrays.

    JAX dispatch is asynchronous, so callers can launch several batches
    back-to-back and keep the device busy, then finalize each with
    :func:`finalize_decode` (the only host sync point).
    """
    if audio_kv is not None:
        xa_k, xa_v = audio_kv
    else:
        xa_k, xa_v = encode_audio_kv(params, dims, mel)
    b = xa_k.shape[1]
    if opts.kv_int8 and not isinstance(xa_k, tuple):
        xa_k, xa_v = _quantize_cross_kv(xa_k, xa_v)

    initial, sot_index = build_initial_tokens(tokenizer, opts)
    suppress_mask, blank_mask = _build_filter_tables(tokenizer, opts, dims.n_vocab)

    max_initial_ts_tok = tokenizer.timestamp_begin + int(
        round(opts.max_initial_timestamp / 0.02)
    )
    opts_key = tuple(
        sorted(
            {
                "max_tokens": opts.max_tokens,
                "eot": tokenizer.eot,
                "ts_begin": tokenizer.timestamp_begin,
                "no_speech": tokenizer.no_speech,
                "timestamps": opts.timestamps,
                "temperature": float(opts.temperature),
                "suppress_blank": opts.suppress_blank,
                "max_initial_ts_tok": max_initial_ts_tok,
                "beam_size": opts.beam_size,
                # openai/faster-whisper allow round(k * patience) < k
                # (patience < 1 ends the search early); only pool >= 1 is
                # required (openai asserts max_candidates > 0).
                "pool_size": max(
                    1, int(round(opts.beam_size * (opts.patience or 1.0)))
                ),
                "kv_int8": opts.kv_int8,
                "ancestry": opts.ancestry,
            }.items()
        )
    )

    beam = opts.beam_size > 1 and opts.temperature == 0.0
    fin_tok = fin_lp = None
    # Bucketed cache schedule: every stage is its own compiled program
    # over a 64-slot-larger cache; a finished batch falls through the
    # remaining stages at one while-cond evaluation each.
    stages = _stage_bounds(len(initial), opts.max_tokens, dims.n_text_ctx)
    if beam:
        k = opts.beam_size
        init = _tiled_initial(tuple(initial), b * k)
        # xa_k/xa_v stay at batch B: the decoder's grouped cross-attention
        # shares audio K/V across beams (model.decoder_forward).
        state, ns_prob = _beam_prefill_jit(
            params, dims, xa_k, xa_v, init, sot_index, opts_key, stages[0][1]
        )
        for stage_end, ctx in stages:
            state = _beam_stage_jit(
                params, dims, xa_k, xa_v, state, suppress_mask, blank_mask,
                opts_key, stage_end, ctx,
            )
        tokens, sum_lp, fin_tok, fin_lp = state[2], state[6], state[9], state[8]
        chk = checksum_device((tokens, sum_lp, fin_tok, fin_lp, ns_prob))
    else:
        init = _tiled_initial(tuple(initial), b)
        state, ns_prob = _greedy_prefill_jit(
            params, dims, xa_k, xa_v, init, sot_index, opts_key,
            rng if rng is not None else jax.random.PRNGKey(0), stages[0][1],
        )
        for stage_end, ctx in stages:
            state = _greedy_stage_jit(
                params, dims, xa_k, xa_v, state, suppress_mask, blank_mask,
                opts_key, stage_end, ctx,
            )
        tokens, sum_lp = state[2], state[7]
        chk = checksum_device((tokens, sum_lp, ns_prob))
    return {"tokens": tokens, "sum_lp": sum_lp, "ns_prob": ns_prob,
            "fin_tok": fin_tok, "fin_lp": fin_lp, "chk": chk,
            "beam": beam, "b": b, "k": opts.beam_size, "eot": tokenizer.eot,
            "length_penalty": opts.length_penalty}


def finalize_decode(pending) -> DecodeResult:
    """Host side of :func:`decode_windows_async`: beam selection + stats."""
    b, eot = pending["b"], pending["eot"]
    chk = pending.get("chk")
    if pending["beam"]:
        k = pending["k"]
        if chk is not None:
            # Verified fetch: the relay link can return zeroed buffers
            # (runtime/integrity.py); tokens/logprobs drive everything
            # downstream, so they are checksummed on device and compared.
            live_tok_h, live_lp_h, fin_tok, fin_lp, ns_prob = (
                fetch_verified_many(
                    (pending["tokens"], pending["sum_lp"],
                     pending["fin_tok"], pending["fin_lp"],
                     pending["ns_prob"]),
                    chk,
                    ("tokens", "sum_lp", "fin_tok", "fin_lp", "ns_prob"),
                )
            )
        else:
            live_tok_h = np.asarray(pending["tokens"])
            live_lp_h = np.asarray(pending["sum_lp"])
            fin_tok = np.asarray(pending["fin_tok"])
            fin_lp = np.asarray(pending["fin_lp"])
            ns_prob = None
        live_tok = live_tok_h.reshape(b, k, -1)
        live_lp = live_lp_h.reshape(b, k)
        # fin_tok: [B, C, T]; fin_lp: [B, C]
        penalty = pending.get("length_penalty")

        def _norm(lp, lens):
            if penalty is not None:
                # Google NMT penalty: ((5 + len) / 6) ** alpha
                # (faster-whisper's length_penalty option)
                return lp / ((5.0 + np.maximum(lens, 1)) / 6.0) ** penalty
            # whisper default: simple total/length normalisation
            return lp / np.maximum(lens, 1)

        t_len = live_tok.shape[-1]
        tokens = np.empty((b, t_len), np.int32)
        sum_lp = np.empty((b,), np.float32)
        for bi in range(b):
            # Finished hypotheses first; top up from the live fold (in raw
            # logprob order, EOT-padded) when fewer than beam_size finished
            # — openai-whisper BeamSearchDecoder.finalize.
            valid = fin_lp[bi] > -1e8
            cand_t, cand_l = [fin_tok[bi][valid]], [fin_lp[bi][valid]]
            n_fin = int(valid.sum())
            if n_fin < k:
                order = np.argsort(-live_lp[bi])[: k - n_fin]
                cand_t.append(live_tok[bi][order])
                cand_l.append(live_lp[bi][order])
            ct = np.concatenate(cand_t)
            cl = np.concatenate(cand_l)
            best = int(_norm(cl, (ct != eot).sum(axis=-1)).argmax())
            tokens[bi] = ct[best]
            sum_lp[bi] = cl[best]
        if ns_prob is None:
            ns_prob = np.asarray(pending["ns_prob"])
    else:
        if chk is not None:
            tokens, sum_lp, ns_prob = fetch_verified_many(
                (pending["tokens"], pending["sum_lp"], pending["ns_prob"]),
                chk, ("tokens", "sum_lp", "ns_prob"),
            )
        else:
            tokens = np.asarray(pending["tokens"])
            sum_lp = np.asarray(pending["sum_lp"])
            ns_prob = np.asarray(pending["ns_prob"])

    lengths = (tokens != eot).sum(axis=-1).astype(np.int64)
    avg = sum_lp / np.maximum(lengths + 1, 1)  # +1 for EOT, as whisper does
    return DecodeResult(
        tokens=tokens.astype(np.int32),
        lengths=lengths,
        sum_logprobs=sum_lp.astype(np.float32),
        avg_logprobs=avg.astype(np.float32),
        no_speech_probs=ns_prob.astype(np.float32),
    )


def decode_windows(
    params,
    dims: WhisperDims,
    tokenizer: WhisperTokenizer,
    mel: Optional[jnp.ndarray],
    opts: DecodeOptions,
    rng: Optional[jnp.ndarray] = None,
    audio_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> DecodeResult:
    """Encode + decode one batch of 30 s mel windows (synchronous)."""
    return finalize_decode(
        decode_windows_async(params, dims, tokenizer, mel, opts, rng, audio_kv)
    )
