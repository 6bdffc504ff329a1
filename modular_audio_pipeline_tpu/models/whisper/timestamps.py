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


def _alignment_matrix_jit(dims: WhisperDims):
    """Device half of the alignment: teacher-forced cross-attention,
    per-head standardisation over time, width-7 median filter, head
    average — so only the final [S, T] f32 matrix (a couple of MB)
    crosses the device link instead of every head's attention (~0.5 GB
    per 224-token window on large models).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(params, seq, xa_k, xa_v):
        cache = KVCache.zeros(
            dims, 1, dtype=params["decoder"]["tok_emb"].dtype, ctx=seq.shape[1]
        )
        _, _, cross = decoder_forward(
            params, dims, seq, xa_k, xa_v, cache, return_cross_probs=True
        )
        w = cross[:, 0].astype(jnp.float32)  # [L, H, S, T]
        l, h, s, t = w.shape
        w = w.reshape(l * h, s, t)
        mean = w.mean(-1, keepdims=True)
        std = w.std(-1, keepdims=True) + 1e-9
        w = (w - mean) / std

        def medfilt(x):  # [S, T] width-7 median over time, edge-padded
            padded = jnp.pad(x, ((0, 0), (3, 3)), mode="edge")
            stack = jnp.stack([padded[:, i : i + t] for i in range(7)])
            return jnp.median(stack, axis=0)

        # map (not vmap): per-head 7-stack keeps peak memory ~7 x [S, T]
        w = jax.lax.map(medfilt, w)
        return w.mean(axis=0)  # [S, T]

    return run


_ALIGN_CACHE: Dict = {}


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

    The sequence is EOT-padded to a 64-multiple bucket so the jitted
    device pass compiles a handful of shapes; the decoder is causal, so
    padded rows cannot affect the real rows and are sliced off.
    """
    import jax.numpy as jnp

    text_tokens = [int(t) for t in tokens if int(t) < tokenizer.eot]
    if not text_tokens:
        return []

    full = list(prefix) + [int(t) for t in tokens if int(t) != tokenizer.eot]
    s_bucket = ((len(full) + 63) // 64) * 64
    seq = jnp.asarray(
        [full + [tokenizer.eot] * (s_bucket - len(full))], dtype=jnp.int32
    )

    if dims not in _ALIGN_CACHE:
        _ALIGN_CACHE[dims] = _alignment_matrix_jit(dims)
    matrix = np.asarray(
        _ALIGN_CACHE[dims](params, seq, xa_k[:, :1], xa_v[:, :1]),
        dtype=np.float64,
    )[: len(full)]

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
