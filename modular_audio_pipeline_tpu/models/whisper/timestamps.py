"""Word-level timestamps: cross-attention alignment + DTW.

The reference enables ``word_timestamps=True`` on both backends
(``/root/reference/audio_pipeline/transcriber.py:237,426``); the
underlying technique (OpenAI Whisper's) aligns decoded tokens to audio
frames by dynamic-time-warping the decoder's cross-attention:

1. teacher-forced decoder pass over the final token sequence, returning
   cross-attention probabilities (one extra batched forward — cheap next
   to the autoregressive decode),
2. per-head standardisation over time + median filtering,
3. head-averaged attention -> cost matrix -> monotonic DTW path,
4. token boundary = the DTW path's column (audio frame, 20 ms each) at
   each token row transition; words grouped from tokens.

Steps 1 runs on device; 2-4 are tiny host-side NumPy (S x 1500 per
window).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from .config import WhisperDims
from .model import KVCache, decoder_forward
from .tokenizer import WhisperTokenizer

__all__ = ["dtw_path", "align_words", "align_words_batched"]

_FRAME_S = 0.02  # one encoder position = 20 ms of audio


def dtw_path(cost: np.ndarray) -> np.ndarray:
    """Monotonic DTW through ``cost [S, T]``; returns column index per row.

    Dispatches to the C++ runtime when available (~300x faster than the
    Python loop for a 224x1500 window); :func:`dtw_path_python` is the
    fallback and the oracle the native kernel is tested against.
    """
    from ...runtime.native_lib import native_dtw_path

    native = native_dtw_path(cost)
    if native is not None:
        return native
    return dtw_path_python(cost)


def dtw_path_python(cost: np.ndarray) -> np.ndarray:
    """Pure-NumPy DTW (diag/up/left moves), O(S*T)."""
    s_len, t_len = cost.shape
    acc = np.full((s_len + 1, t_len + 1), np.inf, dtype=np.float64)
    acc[0, 0] = 0.0
    trace = np.zeros((s_len + 1, t_len + 1), dtype=np.int8)

    for i in range(1, s_len + 1):
        row_cost = cost[i - 1]
        prev = acc[i - 1]
        cur = acc[i]
        for j in range(1, t_len + 1):
            c0 = prev[j - 1]  # diagonal
            c1 = prev[j]      # up (advance token, hold frame)
            c2 = cur[j - 1]   # left (advance frame, hold token)
            best = c0
            move = 0
            if c1 < best:
                best, move = c1, 1
            if c2 < best:
                best, move = c2, 2
            cur[j] = row_cost[j - 1] + best
            trace[i, j] = move

    # backtrack
    i, j = s_len, t_len
    cols = np.zeros(s_len, dtype=np.int64)
    while i > 0 and j > 0:
        cols[i - 1] = j - 1
        move = trace[i, j]
        if move == 0:
            i, j = i - 1, j - 1
        elif move == 1:
            i -= 1
        else:
            j -= 1
    return cols


def _median_filter(x: np.ndarray, width: int = 7) -> np.ndarray:
    """Median filter along the last axis (whisper uses width 7)."""
    if width <= 1 or x.shape[-1] < width:
        return x
    pad = width // 2
    padded = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
    windows = np.lib.stride_tricks.sliding_window_view(padded, width, axis=-1)
    return np.median(windows, axis=-1)


def _alignment_matrix_jit(dims: WhisperDims):
    """Device half of the alignment, batched over windows: one
    teacher-forced cross-attention pass for ALL windows, per-head
    standardisation over time, width-7 median filter, head average — so
    only the final [B, S, T] matrices cross the device link (in bf16:
    the relay's D2H path runs ~20 MB/s, so every byte counts), instead
    of every head's attention (~0.5 GB per 224-token window) or one
    device pass per window (profiled at ~4 s of the 8-minute serving
    run before batching).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(params, seq, xa_k, xa_v):
        b = seq.shape[0]
        cache = KVCache.zeros(
            dims, b, dtype=params["decoder"]["tok_emb"].dtype, ctx=seq.shape[1]
        )
        _, _, cross = decoder_forward(
            params, dims, seq, xa_k, xa_v, cache, return_cross_probs=True
        )
        w = cross.astype(jnp.float32)  # [L, B, H, S, T]
        l, _, h, s, t = w.shape
        w = w.transpose(1, 0, 2, 3, 4).reshape(b * l * h, s, t)
        mean = w.mean(-1, keepdims=True)
        std = w.std(-1, keepdims=True) + 1e-9
        w = (w - mean) / std

        def medfilt(x):  # [S, T] width-7 median over time, edge-padded
            padded = jnp.pad(x, ((0, 0), (3, 3)), mode="edge")
            stack = jnp.stack([padded[:, i : i + t] for i in range(7)])
            return jnp.median(stack, axis=0)

        # map (not vmap): per-head 7-stack keeps peak memory ~7 x [S, T]
        w = jax.lax.map(medfilt, w)
        # f16, not bf16: same D2H bytes, ~3x the mantissa for the
        # standardised values (roughly [-3, 3]) — bf16's ~8 mantissa bits
        # moved DTW paths relative to the f32 single-window reference.
        return w.reshape(b, l * h, s, t).mean(axis=1).astype(jnp.float16)

    return run


_ALIGN_CACHE: Dict = {}


def align_words_batched(
    params,
    dims: WhisperDims,
    tokenizer: WhisperTokenizer,
    xa_k,
    xa_v,
    items: Sequence[Tuple[int, Sequence[int], Sequence[int]]],
    n_audio_frames: int = 1500,
    chunk: int = 8,
) -> List[List[Dict[str, float]]]:
    """Align many windows' decoded tokens to audio time in one (or few)
    batched device passes.

    ``items``: ``(window_index, generated_tokens, prompt_prefix)`` per
    window; ``xa_k``/``xa_v`` are the FULL batch audio K/V — window rows
    are selected here. Returns one word list per item (same order).

    Sequences are EOT-padded to a shared 64-multiple bucket so the
    jitted pass compiles a handful of shapes; the decoder is causal, so
    padded rows cannot affect the real rows and are sliced off.
    """
    import jax.numpy as jnp

    if not items:
        return []

    fulls = []
    for _, tokens, prefix in items:
        fulls.append(list(prefix) + [int(t) for t in tokens if int(t) != tokenizer.eot])
    s_bucket = ((max(len(f) for f in fulls) + 63) // 64) * 64

    if dims not in _ALIGN_CACHE:
        _ALIGN_CACHE[dims] = _alignment_matrix_jit(dims)

    out: List[List[Dict[str, float]]] = []
    for c0 in range(0, len(items), chunk):
        part = items[c0 : c0 + chunk]
        part_fulls = fulls[c0 : c0 + chunk]
        idxs = [it[0] for it in part]
        if idxs == list(range(idxs[0], idxs[0] + len(idxs))):
            xk = xa_k[:, idxs[0] : idxs[0] + len(idxs)]
            xv = xa_v[:, idxs[0] : idxs[0] + len(idxs)]
        else:
            sel = jnp.asarray(idxs, jnp.int32)
            xk = jnp.take(xa_k, sel, axis=1)
            xv = jnp.take(xa_v, sel, axis=1)
        seq = jnp.asarray(
            [f + [tokenizer.eot] * (s_bucket - len(f)) for f in part_fulls],
            dtype=jnp.int32,
        )
        matrices = np.asarray(
            _ALIGN_CACHE[dims](params, seq, xk, xv), dtype=np.float64
        )
        for j, (_, tokens, prefix) in enumerate(part):
            out.append(_words_from_matrix(
                matrices[j], list(tokens), list(prefix), tokenizer,
                len(part_fulls[j]), n_audio_frames,
            ))
    return out


def align_words(
    params,
    dims: WhisperDims,
    tokenizer: WhisperTokenizer,
    xa_k,
    xa_v,
    tokens: Sequence[int],
    prefix: Sequence[int],
    n_audio_frames: int = 1500,
) -> List[Dict[str, float]]:
    """Single-window convenience wrapper over :func:`align_words_batched`
    (callers with one window at a time: sequential seek mode, streaming)."""
    text_tokens = [int(t) for t in tokens if int(t) < tokenizer.eot]
    if not text_tokens:
        return []
    return align_words_batched(
        params, dims, tokenizer, xa_k[:, :1], xa_v[:, :1],
        [(0, tokens, prefix)], n_audio_frames,
    )[0]


def _words_from_matrix(
    matrix: np.ndarray,  # [S_bucket, T] alignment matrix for one window
    tokens: List[int],
    prefix: List[int],
    tokenizer: WhisperTokenizer,
    full_len: int,
    n_audio_frames: int,
) -> List[Dict[str, float]]:
    """Host half: DTW over the generated rows + word grouping."""
    text_tokens = [int(t) for t in tokens if int(t) < tokenizer.eot]
    if not text_tokens:
        return []
    matrix = matrix[:full_len]

    # rows for the *generated* positions only (skip the prompt/SOT prefix)
    gen_rows = matrix[len(prefix) :, :n_audio_frames]
    if gen_rows.shape[0] == 0:
        return []

    cols = dtw_path(-gen_rows)
    gen_tokens = [int(t) for t in tokens if int(t) != tokenizer.eot]

    # token start time = DTW column at its row; end = next row's column
    starts = cols * _FRAME_S
    ends = np.append(cols[1:], cols[-1] + 1) * _FRAME_S

    # group text tokens into words (specials/timestamps break words)
    words: List[Dict[str, float]] = []
    cur_ids: List[int] = []
    cur_start = None
    cur_end = None

    def flush():
        nonlocal cur_ids, cur_start, cur_end
        if cur_ids:
            text = tokenizer.decode(cur_ids).strip()
            if text:
                words.append(
                    {"word": text, "start": round(float(cur_start), 3),
                     "end": round(float(cur_end), 3)}
                )
        cur_ids, cur_start, cur_end = [], None, None

    for idx, tok in enumerate(gen_tokens):
        if idx >= len(starts):
            break
        if tok >= tokenizer.eot:  # special/timestamp token
            flush()
            continue
        piece = tokenizer.decode([tok])
        if piece.startswith(" ") or piece.startswith(" w"):
            flush()
        if cur_start is None:
            cur_start = starts[idx]
        cur_end = ends[idx]
        cur_ids.append(tok)
    flush()
    return words
