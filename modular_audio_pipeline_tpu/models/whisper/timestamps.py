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

from typing import Dict, List, Sequence

import numpy as np

from .config import WhisperDims
from .model import KVCache, decoder_forward
from .tokenizer import WhisperTokenizer

__all__ = ["dtw_path", "align_words"]

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
    """Align one window's decoded tokens to audio time.

    ``tokens`` are the generated tokens (timestamps + text + EOT allowed —
    specials are skipped for word grouping); ``prefix`` is the prompt/SOT
    sequence they were conditioned on. Returns
    ``[{"word", "start", "end"}]`` in window-relative seconds.
    """
    import jax.numpy as jnp

    text_tokens = [int(t) for t in tokens if int(t) < tokenizer.eot]
    if not text_tokens:
        return []

    full = list(prefix) + [int(t) for t in tokens if int(t) != tokenizer.eot]
    seq = jnp.asarray(full, dtype=jnp.int32)[None]

    cache = KVCache.zeros(dims, 1, dtype=params["decoder"]["tok_emb"].dtype,
                          ctx=max(len(full), 8))
    _, _, cross = decoder_forward(
        params, dims, seq, xa_k[:, :1], xa_v[:, :1], cache, return_cross_probs=True
    )
    # cross: [L, B=1, H, S, T]
    w = np.asarray(cross[:, 0], dtype=np.float64)  # [L, H, S, T]
    w = w.reshape(-1, w.shape[-2], w.shape[-1])  # [L*H, S, T]

    # standardise per head over time, median-filter, average heads
    mean = w.mean(axis=-1, keepdims=True)
    std = w.std(axis=-1, keepdims=True) + 1e-9
    w = (w - mean) / std
    w = _median_filter(w)
    matrix = w.mean(axis=0)  # [S, T]

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
