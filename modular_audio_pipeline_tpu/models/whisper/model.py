"""Whisper encoder/decoder in pure functional JAX.

Replaces the CTranslate2 C++ inference core the reference uses
(``/root/reference/audio_pipeline/transcriber.py:40-42,362-366``). Design
choices are TPU-first, not a port:

- **Stacked layers + ``lax.scan``**: every per-layer weight carries a
  leading ``[L, ...]`` dim and blocks run under one scan, so compile time
  and HLO size stay flat from tiny (4 layers) to large-v3 (32 layers).
- **bf16 on the MXU**: all projections/matmuls run in the configured
  compute dtype with f32 accumulation (``preferred_element_type``);
  layer norms run in f32.
- **Static shapes**: 30 s windows -> mel ``[B, n_mels, 3000]`` -> encoder
  ``[B, 1500, d]``; the decoder KV cache is pre-allocated at
  ``n_text_ctx`` and indexed with positions, so one compiled step serves
  the whole autoregressive loop.
- **Batched decode step**: the single-token step is ``[B, 1]`` and is used
  by both greedy and beam search (beams folded into the batch dim).

Weights come from :mod:`.convert` (offline HF/OpenAI checkpoint
conversion) or :func:`init_params` (seeded random, for tests/benches).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperDims

__all__ = ["WhisperModel", "init_params", "KVCache", "sinusoids"]

Params = Dict[str, Any]


def padded_vocab(n_vocab: int) -> int:
    """Vocab rounded up to a lane multiple (128).

    Whisper's 51865/51866 vocab produces odd-shaped logits matmuls that
    the TPU backend tiles (and compiles) poorly; the embedding table is
    padded with zero rows and logits are sliced back to ``n_vocab``.
    """
    return ((n_vocab + 127) // 128) * 128


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Whisper's fixed sinusoidal positions for the audio encoder."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


def _layer_norm(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray]) -> jnp.ndarray:
    y = jnp.einsum("...d,df->...f", x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _proj(y: jnp.ndarray, mod: Dict[str, Any], name: str) -> jnp.ndarray:
    """Projection that dispatches on quantisation: ``name_w`` (bf16) or
    ``name_wq``/``name_ws`` (weight-only int8 via the Pallas kernel)."""
    wq = mod.get(f"{name}_wq")
    bias = mod.get(f"{name}_b")
    if wq is not None:
        from ...ops.quant import int8_matmul

        out = int8_matmul(y, wq, mod[f"{name}_ws"])
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out.astype(y.dtype)
    return _linear(y, mod[f"{name}_w"], bias)


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """[B, T, D] -> [B, H, T, hd]"""
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, hd] -> [B, T, D]"""
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def _attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Scaled dot-product attention; whisper scales q and k by hd^-0.25."""
    scale = q.shape[-1] ** -0.25
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k * scale, preferred_element_type=jnp.float32
    )
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


# Ancestry-indexed beam self-attention over an un-permuted KV cache:
# fused Pallas kernel on TPU, pure-XLA oracle elsewhere. See
# ops/ancestor_attention.py for the memory-schedule rationale.
from ...ops.ancestor_attention import ancestor_attention as _ancestor_attention


def _attention_probs(q, k, mask):
    """f32 attention probabilities (for cross-attention alignment)."""
    scale = q.shape[-1] ** -0.25
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k * scale, preferred_element_type=jnp.float32
    )
    if mask is not None:
        logits = logits + mask
    return jax.nn.softmax(logits, axis=-1)


class KVCache(NamedTuple):
    """Pre-allocated decoder self-attention cache.

    ``k``/``v``: [L, B, H, n_text_ctx, hd]; ``pos``: next write index.

    In int8 mode (``quant=True``) ``k``/``v`` hold symmetric per-position
    int8 codes and ``k_scale``/``v_scale`` ([L, B, H, n_text_ctx] f32) the
    dequantisation scales. Halving the cache bytes halves every per-step
    HBM cost that dominates beam decoding on TPU (attention reads, beam
    reorders, scan xs reads, while-carry copies); the scales fold exactly
    into the attention algebra (per-key-position factors multiply scores
    after the QK matmul and probabilities before the PV matmul).
    """

    k: jnp.ndarray
    v: jnp.ndarray
    pos: jnp.ndarray  # scalar int32
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @staticmethod
    def zeros(
        dims: WhisperDims,
        batch: int,
        dtype,
        ctx: Optional[int] = None,
        quant: bool = False,
    ) -> "KVCache":
        shape = (
            dims.n_text_layer,
            batch,
            dims.n_text_head,
            ctx if ctx is not None else dims.n_text_ctx,
            dims.n_text_state // dims.n_text_head,
        )
        if quant:
            return KVCache(
                k=jnp.zeros(shape, dtype=jnp.int8),
                v=jnp.zeros(shape, dtype=jnp.int8),
                pos=jnp.zeros((), dtype=jnp.int32),
                k_scale=jnp.zeros(shape[:-1], dtype=jnp.float32),
                v_scale=jnp.zeros(shape[:-1], dtype=jnp.float32),
            )
        return KVCache(
            k=jnp.zeros(shape, dtype=dtype),
            v=jnp.zeros(shape, dtype=dtype),
            pos=jnp.zeros((), dtype=jnp.int32),
        )


def _quantize_rows(rows: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-position int8 quantisation over the head dim.

    ``rows [B, H, S, hd]`` -> (int8 codes, f32 scales ``[B, H, S]``);
    dequantisation is ``codes * scales[..., None]``.
    """
    f32 = rows.astype(jnp.float32)
    amax = jnp.max(jnp.abs(f32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(f32 / scale).astype(jnp.int8)
    return q, scale[..., 0]


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def encoder_forward(params: Params, dims: WhisperDims, mel: jnp.ndarray) -> jnp.ndarray:
    """``mel [B, n_mels, T]`` -> audio states ``[B, T//2, d]``."""
    enc = params["encoder"]
    dtype = enc["conv1"]["w"].dtype
    x = mel.astype(dtype)

    # conv1: k=3 pad=1; conv2: k=3 stride=2 pad=1. NCT layout.
    x = jax.lax.conv_general_dilated(
        x, enc["conv1"]["w"], window_strides=(1,), padding=((1, 1),),
        dimension_numbers=("NCT", "OIT", "NCT"),
        preferred_element_type=jnp.float32,
    ).astype(dtype) + enc["conv1"]["b"][None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = jax.lax.conv_general_dilated(
        x, enc["conv2"]["w"], window_strides=(2,), padding=((1, 1),),
        dimension_numbers=("NCT", "OIT", "NCT"),
        preferred_element_type=jnp.float32,
    ).astype(dtype) + enc["conv2"]["b"][None, :, None]
    x = jax.nn.gelu(x, approximate=False)

    x = x.transpose(0, 2, 1)  # [B, T', d]
    pos = jnp.asarray(sinusoids(x.shape[1], dims.n_audio_state), dtype=dtype)
    x = x + pos

    h = dims.n_audio_head

    from ...ops.attention import flash_attention

    def block(x, p):
        resid = x
        y = _layer_norm(x, p["attn_ln"]["g"], p["attn_ln"]["b"])
        q = _split_heads(_linear(y, p["attn"]["q_w"], p["attn"]["q_b"]), h)
        k = _split_heads(_linear(y, p["attn"]["k_w"], None), h)
        v = _split_heads(_linear(y, p["attn"]["v_w"], p["attn"]["v_b"]), h)
        # Pallas flash attention on TPU (XLA einsum elsewhere): the full
        # 1500x1500 score tensor never hits HBM.
        y = _merge_heads(flash_attention(q, k, v))
        x = resid + _linear(y, p["attn"]["o_w"], p["attn"]["o_b"])

        resid = x
        y = _layer_norm(x, p["mlp_ln"]["g"], p["mlp_ln"]["b"])
        y = jax.nn.gelu(_linear(y, p["mlp"]["fc1_w"], p["mlp"]["fc1_b"]), approximate=False)
        x = resid + _linear(y, p["mlp"]["fc2_w"], p["mlp"]["fc2_b"])
        return x, None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    return _layer_norm(x, enc["ln_post"]["g"], enc["ln_post"]["b"])


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def cross_kv(params: Params, dims: WhisperDims, xa: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute per-layer cross-attention K/V from encoder output.

    Returns (k, v), each ``[L, B, H, T_audio, hd]`` — computed once per
    audio window and reused for every decode step.
    """
    dec = params["decoder"]
    h = dims.n_text_head

    def one_layer(_, p):
        k = _split_heads(_proj(xa, p["cross"], "k"), h)
        v = _split_heads(_proj(xa, p["cross"], "v"), h)
        return None, (k, v)

    _, (ks, vs) = jax.lax.scan(one_layer, None, dec["blocks"])
    return ks, vs


def decoder_forward(
    params: Params,
    dims: WhisperDims,
    tokens: jnp.ndarray,  # [B, S] int32
    xa_k: jnp.ndarray,
    xa_v: jnp.ndarray,
    cache: KVCache,
    return_cross_probs: bool = False,
    skip_logits: bool = False,
    anc: Optional[jnp.ndarray] = None,
):
    """Run ``S`` decoder positions starting at ``cache.pos``.

    Writes the new self-attention K/V into the cache and returns
    ``(logits [B, S, V], new_cache[, cross_probs [L, B, H, S, T_audio]])``.
    Used with S>1 for prefill / teacher forcing and S=1 for decode steps.
    ``skip_logits=True`` skips the vocab projection (the teacher-forced
    alignment pass only needs the cross-attention probabilities; the
    [B, S, V] matmul is ~270 GFLOPs + a 425 MB write it never reads) and
    returns ``None`` logits. Cross probabilities are emitted in float16 —
    they are post-softmax values in [0, 1] and are standardised per head
    downstream, so f16's 10 mantissa bits are ample, and halving the
    [L, B, H, S, T] write is the dominant cost of the alignment pass.

    ``anc`` enables ancestry-indexed beam attention (decode steps only,
    S == 1): an int32 ``[BW, K, ctx]`` table where ``anc[b, k, p] == j``
    means hypothesis ``k``'s token at cache position ``p`` physically
    lives in beam row ``j``. The beam search then never permutes the
    cache (the largest per-step HBM term — a full read + write of every
    layer's K/V); instead self-attention selects ancestor rows in place
    (ops/ancestor_attention.py — fused Pallas kernel on TPU). Extra MACs
    are K× on the QK/PV contractions — trivial next to the saved cache
    traffic.
    """
    dec = params["decoder"]
    dtype = dec["tok_emb"].dtype
    b, s = tokens.shape
    h = dims.n_text_head
    ctx = cache.k.shape[-2]  # cache capacity (n_text_ctx, or shorter in training)
    pos0 = cache.pos

    # Positional rows via one-hot matmul rather than dynamic_slice: the
    # tiny [s, d] slice otherwise lowers to per-step scalar-space copies
    # that cost ~1 ms each on TPU (profiled: 2 copies = 62% of decode).
    pos_ids = pos0 + jnp.arange(s)
    pos_onehot = jax.nn.one_hot(pos_ids, dec["pos_emb"].shape[0], dtype=dtype)
    pos_rows = jnp.einsum(
        "sp,pd->sd", pos_onehot, dec["pos_emb"], preferred_element_type=jnp.float32
    ).astype(dtype)
    x = dec["tok_emb"][tokens] + pos_rows

    # Self-attention mask: query i (absolute pos0+i) attends to cache
    # positions <= pos0+i. Keys live in the fixed [ctx] cache.
    q_pos = pos0 + jnp.arange(s)[:, None]  # [S, 1]
    k_pos = jnp.arange(ctx)[None, :]  # [1, ctx]
    self_mask = jnp.where(k_pos <= q_pos, 0.0, -jnp.inf).astype(jnp.float32)  # [S, ctx]

    quant = cache.k.dtype == jnp.int8

    def block(carry, layer_in):
        if quant:
            x, l, ck_all, cv_all, cks_all, cvs_all = carry
            p, xk, xv = layer_in
        else:
            x, l, ck_all, cv_all = carry
            p, xk, xv = layer_in
        resid = x
        y = _layer_norm(x, p["attn_ln"]["g"], p["attn_ln"]["b"])
        q = _split_heads(_proj(y, p["attn"], "q"), h)
        k_new = _split_heads(_proj(y, p["attn"], "k"), h)
        v_new = _split_heads(_proj(y, p["attn"], "v"), h)

        # The stacked [L, ...] caches ride the scan CARRY with a layer
        # counter, not xs -> ys: a scanned cache forces XLA to copy every
        # layer's full slice each step (profiled ~0.9 ms/step of copy +
        # dynamic-update-slice on v5e beam-5 turbo), whereas carry buffers
        # alias in place so only the new rows are written.
        if quant:
            # int8 cache: quantise the new rows, fold the per-position
            # scales into the attention algebra (exact — K = codes * s_k
            # multiplies scores post-matmul; V = codes * s_v multiplies
            # probabilities pre-matmul). HBM reads the cache at half the
            # bf16 bytes; the converts fuse into the matmul operands.
            k_q, k_s = _quantize_rows(k_new)
            v_q, v_s = _quantize_rows(v_new)
            qs = (q * (q.shape[-1] ** -0.5)).astype(q.dtype)
            if anc is not None:
                # Pass the STACKED, PRE-update caches + layer counter:
                # the Pallas kernel indexes layer l via scalar prefetch
                # (no per-layer slice is ever materialised — a
                # pallas_call operand cannot fuse a slice away; XLA
                # copies the full layer otherwise), patches this step's
                # rows in from k_q/v_q at pos0, and writes them into the
                # cache itself via input_output_aliases (a DUS whose
                # buffer also feeds a custom call loses XLA's in-place
                # fusion and copies the whole layer, ~0.3 ms/step).
                y, ck_all, cv_all, cks_all, cvs_all = _ancestor_attention(
                    qs, ck_all, cv_all, cks_all, cvs_all, l, anc,
                    self_mask[0],
                    new_k=k_q, new_v=v_q,
                    new_ks=k_s, new_vs=v_s, pos=pos0,
                )
            else:
                ck_all = jax.lax.dynamic_update_slice(
                    ck_all, k_q[None], (l, 0, 0, pos0, 0)
                )
                cv_all = jax.lax.dynamic_update_slice(
                    cv_all, v_q[None], (l, 0, 0, pos0, 0)
                )
                cks_all = jax.lax.dynamic_update_slice(
                    cks_all, k_s[None], (l, 0, 0, pos0)
                )
                cvs_all = jax.lax.dynamic_update_slice(
                    cvs_all, v_s[None], (l, 0, 0, pos0)
                )
                ck = jax.lax.dynamic_index_in_dim(ck_all, l, 0, keepdims=False)
                cv = jax.lax.dynamic_index_in_dim(cv_all, l, 0, keepdims=False)
                cks = jax.lax.dynamic_index_in_dim(cks_all, l, 0, keepdims=False)
                cvs = jax.lax.dynamic_index_in_dim(cvs_all, l, 0, keepdims=False)
                logits = jnp.einsum(
                    "bhqd,bhkd->bhqk", qs, ck.astype(q.dtype),
                    preferred_element_type=jnp.float32,
                ) * cks[:, :, None, :] + self_mask[None, None]
                probs = jax.nn.softmax(logits, axis=-1)
                y = jnp.einsum(
                    "bhqk,bhkd->bhqd",
                    (probs * cvs[:, :, None, :]).astype(q.dtype),
                    cv.astype(q.dtype),
                    preferred_element_type=jnp.float32,
                ).astype(q.dtype)
            y = _merge_heads(y)
        else:
            if anc is not None:
                # 64^-0.5 = 1/8 folds exactly into q in bf16 (the split
                # hd^-0.25 scaling would round on both operands).
                # Pre-update cache + in-kernel row writes as in the int8
                # branch above.
                qs = (q * (q.shape[-1] ** -0.5)).astype(q.dtype)
                y, ck_all, cv_all, _, _ = _ancestor_attention(
                    qs, ck_all, cv_all, None, None, l, anc,
                    self_mask[0],
                    new_k=k_new, new_v=v_new, pos=pos0,
                )
                y = _merge_heads(y)
            else:
                ck_all = jax.lax.dynamic_update_slice(
                    ck_all, k_new[None], (l, 0, 0, pos0, 0)
                )
                cv_all = jax.lax.dynamic_update_slice(
                    cv_all, v_new[None], (l, 0, 0, pos0, 0)
                )
                ck = jax.lax.dynamic_index_in_dim(ck_all, l, 0, keepdims=False)
                cv = jax.lax.dynamic_index_in_dim(cv_all, l, 0, keepdims=False)
                y = _merge_heads(_attention(q, ck, cv, self_mask[None, None]))
        x = resid + _proj(y, p["attn"], "o")

        # Cross-attention over precomputed audio K/V. When the token batch
        # is a beam-expanded multiple of the audio batch (B*K vs B), the
        # audio K/V is SHARED across beams via a grouped einsum instead of
        # being materialised K times (the cross-KV is the largest buffer in
        # beam decoding: ~2.5 GB for 16 windows of large-v3-turbo).
        resid = x
        y = _layer_norm(x, p["cross_ln"]["g"], p["cross_ln"]["b"])
        qx = _split_heads(_proj(y, p["cross"], "q"), h)
        if isinstance(xk, tuple):
            # int8 cross K/V (decode loop): codes + per-position scales
            # (see decode._quantize_cross_kv). Scales fold exactly —
            # K-side multiplies scores post-matmul, V-side multiplies
            # probabilities pre-matmul.
            xk_q, xk_s = xk
            xv_q, xv_s = xv
            groups = qx.shape[0] // xk_q.shape[0]
            qxs = (qx * (qx.shape[-1] ** -0.5)).astype(qx.dtype)
            if groups > 1:
                qg = qxs.reshape((xk_q.shape[0], groups) + qx.shape[1:])
                logits_x = jnp.einsum(
                    "bghqd,bhkd->bghqk", qg, xk_q.astype(qx.dtype),
                    preferred_element_type=jnp.float32,
                ) * xk_s[:, None, :, None, :]
                probs_x = jax.nn.softmax(logits_x, axis=-1)
                y = jnp.einsum(
                    "bghqk,bhkd->bghqd",
                    (probs_x * xv_s[:, None, :, None, :]).astype(x.dtype),
                    xv_q.astype(x.dtype),
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
                y = y.reshape(qx.shape)
            else:
                logits_x = jnp.einsum(
                    "bhqd,bhkd->bhqk", qxs, xk_q.astype(qx.dtype),
                    preferred_element_type=jnp.float32,
                ) * xk_s[:, :, None, :]
                probs_x = jax.nn.softmax(logits_x, axis=-1)
                y = jnp.einsum(
                    "bhqk,bhkd->bhqd",
                    (probs_x * xv_s[:, :, None, :]).astype(x.dtype),
                    xv_q.astype(x.dtype),
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
            probs = jnp.zeros((), dtype=jnp.float32)
        else:
            groups = qx.shape[0] // xk.shape[0]
            scale = qx.shape[-1] ** -0.25
            if groups > 1:
                qg = qx.reshape((xk.shape[0], groups) + qx.shape[1:])
                logits_x = jnp.einsum(
                    "bghqd,bhkd->bghqk", qg * scale, xk * scale,
                    preferred_element_type=jnp.float32,
                )
                probs_x = jax.nn.softmax(logits_x, axis=-1)
                y = jnp.einsum(
                    "bghqk,bhkd->bghqd", probs_x.astype(x.dtype), xv,
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
                y = y.reshape(qx.shape)
                probs = jnp.zeros((), dtype=jnp.float32)
            elif return_cross_probs:
                probs = _attention_probs(qx, xk, None)
                y = jnp.einsum(
                    "bhqk,bhkd->bhqd", probs.astype(x.dtype), xv,
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
                probs = probs.astype(jnp.float16)
            else:
                probs = jnp.zeros((), dtype=jnp.float32)
                y = _attention(qx, xk, xv, None)
        y = _merge_heads(y)
        x = resid + _proj(y, p["cross"], "o")

        resid = x
        y = _layer_norm(x, p["mlp_ln"]["g"], p["mlp_ln"]["b"])
        y = jax.nn.gelu(_proj(y, p["mlp"], "fc1"), approximate=False)
        x = resid + _proj(y, p["mlp"], "fc2")
        if quant:
            return (x, l + 1, ck_all, cv_all, cks_all, cvs_all), probs
        return (x, l + 1, ck_all, cv_all), probs

    # NOTE: unrolling this scan for shallow decoders speeds greedy decoding
    # ~20% but regresses beam search ~50% (measured on v5e) — keep rolled.
    # NOTE 2 (layout history): round 2 scanned the caches as xs -> ys with
    # the per-layer update inside the block; profiling showed XLA still
    # copies each layer's full ys slice every step (~0.9 ms/step on v5e
    # beam-5 turbo). Round 3 moved the stacked caches into the scan CARRY
    # with a layer counter: carry buffers alias in place across
    # iterations, so the update writes only the new rows and the
    # attention reads the layer slice via dynamic_index (fuses into the
    # attention einsums). A round-2 "carry-free" variant (emit new rows,
    # update the stacked cache post-scan) was worse still: the cache is
    # then both scan input and post-update target, forcing a ~420 MB
    # double-buffer copy pair per step.
    l0 = jnp.zeros((), jnp.int32)
    if quant:
        carry_out, cross_probs = jax.lax.scan(
            block,
            (x, l0, cache.k, cache.v, cache.k_scale, cache.v_scale),
            (dec["blocks"], xa_k, xa_v),
        )
        x, _, new_k, new_v, new_ks, new_vs = carry_out
    else:
        carry_out, cross_probs = jax.lax.scan(
            block, (x, l0, cache.k, cache.v), (dec["blocks"], xa_k, xa_v)
        )
        x, _, new_k, new_v = carry_out
        new_ks = new_vs = None
    x = _layer_norm(x, dec["ln"]["g"], dec["ln"]["b"])

    if skip_logits:
        logits = None
    elif "logits_wq" in dec:  # weight-only int8 head (ops.quant)
        from ...ops.quant import int8_matmul

        logits = int8_matmul(x, dec["logits_wq"], dec["logits_ws"])[..., : dims.n_vocab]
    else:
        logits = jnp.einsum(
            "bsd,vd->bsv", x, dec["tok_emb"], preferred_element_type=jnp.float32
        )[..., : dims.n_vocab]
    new_cache = KVCache(
        k=new_k, v=new_v, pos=pos0 + s, k_scale=new_ks, v_scale=new_vs
    )
    if return_cross_probs:
        return logits, new_cache, cross_probs
    return logits, new_cache


# ---------------------------------------------------------------------------
# Initialisation
# ---------------------------------------------------------------------------

def _init_block(key, d: int, cross: bool, dtype) -> Params:
    ks = jax.random.split(key, 16)
    s = d**-0.5

    def lin(k, din, dout):
        return (jax.random.normal(k, (din, dout), dtype=jnp.float32) * s).astype(dtype)

    def zeros(dout):
        return jnp.zeros((dout,), dtype=dtype)

    p = {
        "attn": {
            "q_w": lin(ks[0], d, d), "q_b": zeros(d),
            "k_w": lin(ks[1], d, d),
            "v_w": lin(ks[2], d, d), "v_b": zeros(d),
            "o_w": lin(ks[3], d, d), "o_b": zeros(d),
        },
        "attn_ln": {"g": jnp.ones((d,), dtype), "b": zeros(d)},
        "mlp": {
            "fc1_w": lin(ks[4], d, 4 * d), "fc1_b": zeros(4 * d),
            "fc2_w": lin(ks[5], 4 * d, d), "fc2_b": zeros(d),
        },
        "mlp_ln": {"g": jnp.ones((d,), dtype), "b": zeros(d)},
    }
    if cross:
        p["cross"] = {
            "q_w": lin(ks[6], d, d), "q_b": zeros(d),
            "k_w": lin(ks[7], d, d),
            "v_w": lin(ks[8], d, d), "v_b": zeros(d),
            "o_w": lin(ks[9], d, d), "o_b": zeros(d),
        }
        p["cross_ln"] = {"g": jnp.ones((d,), dtype), "b": zeros(d)}
    return p


def init_params(dims: WhisperDims, seed: int = 0, dtype=jnp.bfloat16) -> Params:
    """Seeded random parameters with the exact checkpoint tree layout.

    The whole tree initialises inside ONE jitted program: eager per-leaf
    creation would issue dozens of separate compiles (minutes on a
    remote-compile backend) for a large model."""
    return _init_params_jit(dims, seed, jnp.dtype(dtype).name)


@partial(jax.jit, static_argnames=("dims", "seed", "dtype_name"))
def _init_params_jit(dims: WhisperDims, seed: int, dtype_name: str) -> Params:
    dtype = jnp.dtype(dtype_name)
    key = jax.random.PRNGKey(seed)
    k_enc, k_dec, k_conv1, k_conv2, k_emb = jax.random.split(key, 5)
    d = dims.n_audio_state

    enc_blocks = [
        _init_block(k, d, cross=False, dtype=dtype)
        for k in jax.random.split(k_enc, dims.n_audio_layer)
    ]
    dec_blocks = [
        _init_block(k, dims.n_text_state, cross=True, dtype=dtype)
        for k in jax.random.split(k_dec, dims.n_text_layer)
    ]

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    s = d**-0.5
    params = {
        "encoder": {
            "conv1": {
                "w": (jax.random.normal(k_conv1, (d, dims.n_mels, 3)) * s).astype(dtype),
                "b": jnp.zeros((d,), dtype),
            },
            "conv2": {
                "w": (jax.random.normal(k_conv2, (d, d, 3)) * s).astype(dtype),
                "b": jnp.zeros((d,), dtype),
            },
            "blocks": stack(enc_blocks),
            "ln_post": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        },
        "decoder": {
            "tok_emb": (
                jax.random.normal(k_emb, (padded_vocab(dims.n_vocab), dims.n_text_state))
                * s
            ).astype(dtype),
            "pos_emb": (
                jax.random.normal(k_emb, (dims.n_text_ctx, dims.n_text_state)) * 0.01
            ).astype(dtype),
            "blocks": stack(dec_blocks),
            "ln": {
                "g": jnp.ones((dims.n_text_state,), dtype),
                "b": jnp.zeros((dims.n_text_state,), dtype),
            },
        },
    }
    return params


class WhisperModel:
    """Convenience wrapper bundling dims + params + jitted entry points."""

    def __init__(self, dims: WhisperDims, params: Params):
        self.dims = dims
        self.params = params
        self._encode = jax.jit(partial(encoder_forward, dims=dims))
        self._cross_kv = jax.jit(partial(cross_kv, dims=dims))

    def encode(self, mel: jnp.ndarray) -> jnp.ndarray:
        return self._encode(self.params, mel=mel)

    def audio_kv(self, xa: jnp.ndarray):
        return self._cross_kv(self.params, xa=xa)

    @property
    def dtype(self):
        return self.params["decoder"]["tok_emb"].dtype
