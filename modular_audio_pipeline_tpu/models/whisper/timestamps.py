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

Steps 1-3 all run on device in ONE jitted program: the DTW itself is an
anti-diagonal wavefront ``lax.scan`` (vectorised over batch and diagonal)
plus a ``while_loop`` backtrace, so only the per-token jump columns
([B, S] int32, a few KB) ever cross the device link — the [B, S, 1500]
alignment matrices (6 MB/chunk at ~20 MB/s D2H on a tunneled chip) never
do. The host half (step 4) groups tokens into words. NumPy fallbacks
(:func:`dtw_path`) remain for CPU-only callers and as the test oracle.
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
        # f16, not bf16: same D2H bytes, ~3x the mantissa for the
        # standardised values (roughly [-3, 3]) — bf16's ~8 mantissa bits
        # moved DTW paths relative to the f32 single-window reference.
        return _alignment_matrix_impl(params, seq, xa_k, xa_v, dims).astype(
            jnp.float16
        )

    return run


# Batcher odd-even mergesort network for 8 inputs (19 compare-exchanges).
# Used to take a width-7 running median as one fused elementwise kernel:
# the 7 shifted views plus one +inf pad sort in registers, no 7x stacked
# buffer ever hits HBM (jnp.median materialises the stack AND sorts it).
_SORT8 = [
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6),
    (0, 4), (1, 5), (2, 6), (3, 7),
    (2, 4), (3, 5),
    (1, 2), (3, 4), (5, 6),
]


def _median7(slices):
    """Elementwise median of 7 equal-shape arrays (sorting network)."""
    import jax.numpy as jnp

    v = list(slices) + [jnp.full_like(slices[0], jnp.inf)]
    for i, j in _SORT8:
        lo = jnp.minimum(v[i], v[j])
        hi = jnp.maximum(v[i], v[j])
        v[i], v[j] = lo, hi
    return v[3]  # median of the 7 reals = rank 3 of the padded 8


def _alignment_matrix_impl(params, seq, xa_k, xa_v, dims: WhisperDims):
    """Traced body shared by the host-transfer and fused-DTW programs.

    Alignment heads: openai-whisper's default when a checkpoint ships no
    explicit per-model mask — every head of the TOP HALF of the text
    layers (``model.py set_alignment_heads`` default,
    ``all_heads[n_text_layer // 2:] = True``). Averaging all layers (the
    round-2 behaviour) both diverged from openai and doubled the
    alignment pass's HBM traffic.
    """
    import jax.numpy as jnp

    b = seq.shape[0]
    cache = KVCache.zeros(
        dims, b, dtype=params["decoder"]["tok_emb"].dtype, ctx=seq.shape[1]
    )
    _, _, cross = decoder_forward(
        params, dims, seq, xa_k, xa_v, cache,
        return_cross_probs=True, skip_logits=True,
    )  # f16 [L, B, H, S, T]
    cross = cross[dims.n_text_layer // 2 :]
    ls, _, h, s, t = cross.shape
    w = cross.reshape(ls * b * h, s, t)  # leading dims merge: no transpose

    # per-head standardisation over time, f32 accumulators over the f16
    # source (the converts fuse into the reductions; no f32 copy lands)
    mean = jnp.mean(w, axis=-1, keepdims=True, dtype=jnp.float32)
    meansq = jnp.mean(
        jnp.square(w.astype(jnp.float32)), axis=-1, keepdims=True
    )
    inv_std = 1.0 / (jnp.sqrt(jnp.maximum(meansq - mean * mean, 0.0)) + 1e-9)
    w = ((w.astype(jnp.float32) - mean) * inv_std).astype(jnp.float16)

    padded = jnp.pad(w, ((0, 0), (0, 0), (3, 3)), mode="edge")
    med = _median7([padded[:, :, i : i + t] for i in range(7)])
    # head average straight back to [B, S, T] in f32 (mean over the
    # selected layers x heads; leading-dim split is again layout-free)
    return jnp.mean(
        med.reshape(ls, b, h, s, t).astype(jnp.float32), axis=(0, 2)
    )


def dtw_cols_batched(cost: "jnp.ndarray", lens: "jnp.ndarray"):
    """Batched monotonic DTW on device: ``cost [B, S, T]`` -> per-row
    entry columns ``[B, S] int32`` (same semantics as
    :func:`dtw_path_python`, ties broken diag > up > left).

    Forward pass is an anti-diagonal wavefront ``lax.scan`` — every cell
    on a diagonal updates in parallel across batch and row, so the DP is
    S+T vector steps instead of S*T scalar ones. The data-dependent
    backtrace runs as a ``while_loop`` of at most S+T tiny gathers.
    Rows >= ``lens[b]`` are ignored (the backtrace starts at
    ``(lens[b], T)``; forward DP values at row i depend only on rows
    <= i, so garbage padding rows cannot corrupt real ones).
    """
    import jax
    import jax.numpy as jnp

    big = jnp.float32(1e30)
    b, s, t = cost.shape
    cost = cost.astype(jnp.float32)

    # skew: sk[b, i, d] = cost[b, i, d - i]  (anti-diagonal layout)
    d_range = jnp.arange(s + t - 1)
    j_idx = d_range[None, :] - jnp.arange(s)[:, None]  # [S, S+T-1]
    valid = (j_idx >= 0) & (j_idx < t)
    sk = jnp.take_along_axis(
        cost, jnp.clip(j_idx, 0, t - 1)[None].repeat(b, 0), axis=2
    )
    sk = jnp.where(valid[None], sk, big)  # [B, S, S+T-1]
    sk_steps = jnp.moveaxis(sk, 2, 0)  # [S+T-1, B, S]

    i1 = jnp.arange(s + 1)  # acc row index i' (1-indexed rows)

    def step(carry, xs):
        prev, prevprev, da = carry[0], carry[1], carry[2]
        sk_d = xs  # [B, S] — cost[i'-1, j'-1] along diagonal da
        inf_col = jnp.full((b, 1), big)
        c0 = jnp.concatenate([inf_col, prevprev[:, :-1]], axis=1)  # acc[i'-1, j'-1]
        c1 = jnp.concatenate([inf_col, prev[:, :-1]], axis=1)  # acc[i'-1, j']
        c2 = prev  # acc[i', j'-1]
        best = c0
        move = jnp.zeros((b, s + 1), jnp.int8)
        move = jnp.where(c1 < best, jnp.int8(1), move)
        best = jnp.minimum(best, c1)
        move = jnp.where(c2 < best, jnp.int8(2), move)
        best = jnp.minimum(best, c2)
        cost_d = jnp.concatenate([inf_col, sk_d], axis=1)  # row i' reads sk[i'-1]
        in_range = (i1 >= 1) & (i1 <= da - 1) & ((da - i1) <= t)
        new = jnp.where(in_range[None], cost_d + best, big)
        new = jnp.minimum(new, big)  # keep padded cells finite (no inf-inf NaNs)
        return (new, prev, da + 1), move

    init_diag = jnp.full((b, s + 1), big).at[:, 0].set(0.0)  # acc[0,0]=0
    diag1 = jnp.full((b, s + 1), big)  # da=1: walls only
    (_, _, _), moves = jax.lax.scan(
        step, (diag1, init_diag, jnp.asarray(2, jnp.int32)), sk_steps
    )
    # moves[k] holds diagonal da=k+2; prepend two zero slices so
    # moves_full[da] indexes directly.
    moves_full = jnp.concatenate(
        [jnp.zeros((2, b, s + 1), jnp.int8), moves], axis=0
    )  # [S+T+1, B, S+1]
    flat_moves = moves_full.reshape(-1)

    # backtrace: all windows walk in lockstep, frozen when done
    bi = jnp.arange(b)

    def bt_cond(state):
        ii, jj, _ = state
        return jnp.any((ii > 0) & (jj > 0))

    def bt_body(state):
        ii, jj, cols = state  # ii, jj: [B] current acc coords
        active = (ii > 0) & (jj > 0)
        da = ii + jj
        idx = (da * b + bi) * (s + 1) + ii
        move = flat_moves[idx]  # [B]
        row_onehot = (jnp.arange(s)[None, :] == (ii - 1)[:, None]) & active[:, None]
        cols = jnp.where(row_onehot, (jj - 1)[:, None], cols)
        ii = jnp.where(active & (move != 2), ii - 1, ii)
        jj = jnp.where(active & (move != 1), jj - 1, jj)
        return ii, jj, cols

    cols0 = jnp.zeros((b, s), jnp.int32)
    _, _, cols = jax.lax.while_loop(
        bt_cond, bt_body, (lens.astype(jnp.int32), jnp.full((b,), t, jnp.int32), cols0)
    )
    return cols


def _align_dtw_jit(dims: WhisperDims, prefix_len: int, n_audio_frames: int):
    """Fused alignment-matrix + device-DTW program (see module docstring)."""
    import jax

    @jax.jit
    def run(params, seq, xa_k, xa_v, lens):
        mat = _alignment_matrix_impl(params, seq, xa_k, xa_v, dims)  # f32
        gen = mat[:, prefix_len:, :n_audio_frames]  # generated rows only
        return dtw_cols_batched(-gen, lens)

    return run


_ALIGN_CACHE: Dict = {}
_ALIGN_DTW_CACHE: Dict = {}


def align_words_batched(
    params,
    dims: WhisperDims,
    tokenizer: WhisperTokenizer,
    xa_k,
    xa_v,
    items: Sequence[Tuple[int, Sequence[int], Sequence[int]]],
    n_audio_frames: int = 1500,
    chunk: int = 16,
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

    # The teacher-forced pass materialises every layer-head's attention:
    # [L, chunk, H, S, T] f16, plus the standardised top-half copy and
    # its median. Cap the window chunk so the peak stays ~within 2 GB —
    # at large-v3 scale (32 layers x 20 heads) one 256-token window is
    # ~0.5 GB in f16, OOMing a 16 GB chip at the turbo-tuned chunk.
    bytes_per_window = (
        dims.n_text_layer * dims.n_text_head * s_bucket * n_audio_frames * 2
    )
    chunk = max(1, min(chunk, int(2e9 // max(bytes_per_window, 1))))

    prefix_len = len(items[0][2])  # shared across a batch (same options)
    key = (dims, prefix_len, n_audio_frames)
    if key not in _ALIGN_DTW_CACHE:
        _ALIGN_DTW_CACHE[key] = _align_dtw_jit(dims, prefix_len, n_audio_frames)
    run = _ALIGN_DTW_CACHE[key]

    out: List[List[Dict[str, float]]] = []
    pending = []
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
        lens = jnp.asarray(
            [max(0, len(f) - prefix_len) for f in part_fulls], jnp.int32
        )
        # dispatch every chunk before the first D2H sync: the device
        # crunches chunk k+1 while the host fetches/groups chunk k
        pending.append((part, run(params, seq, xk, xv, lens)))
    for part, cols_d in pending:
        cols = np.asarray(cols_d)  # [chunk, S'] int32 — a few KB
        for j, (_, tokens, prefix) in enumerate(part):
            out.append(
                _words_from_cols(cols[j], list(tokens), list(prefix), tokenizer)
            )
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
    return _group_words(cols, tokens, tokenizer)


def _words_from_cols(
    cols: np.ndarray,  # [S'] DTW entry columns (device or host DTW)
    tokens: List[int],
    prefix: List[int],
    tokenizer: WhisperTokenizer,
) -> List[Dict[str, float]]:
    text_tokens = [int(t) for t in tokens if int(t) < tokenizer.eot]
    if not text_tokens:
        return []
    n_gen = len([t for t in tokens if int(t) != tokenizer.eot])
    del prefix  # cols already cover generated rows only
    if n_gen == 0:
        return []
    return _group_words(cols[:n_gen], tokens, tokenizer)


def _group_words(
    cols: np.ndarray, tokens: List[int], tokenizer: WhisperTokenizer
) -> List[Dict[str, float]]:
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
