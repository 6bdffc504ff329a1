"""Frame extraction and window functions (jittable, static shapes).

Every analysis op in the pipeline — STFT, VAD features, noise detection,
loudness blocks — starts by slicing the waveform into overlapping frames.
XLA compiles ``conv_general_dilated_patches``-style gathers poorly for 1-D
audio, so we frame with a single strided ``dynamic_slice``-free reshape
trick: gather indices are computed once at trace time (static shapes), and
the gather lowers to an efficient TPU copy.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["num_frames", "frame_signal", "hann_window", "overlap_add"]


def num_frames(n: int, frame_length: int, hop: int) -> int:
    """Number of complete frames (no padding)."""
    if n < frame_length:
        return 0
    return 1 + (n - frame_length) // hop


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Slice ``x[..., n]`` into overlapping frames -> ``[..., n_frames, frame_length]``.

    Shapes are static: ``n`` must be a compile-time constant (the pipeline
    pads audio to bucket boundaries precisely so this holds).
    """
    n = x.shape[-1]
    nf = num_frames(n, frame_length, hop)
    idx = np.arange(frame_length)[None, :] + hop * np.arange(nf)[:, None]
    return x[..., idx]


@functools.lru_cache(maxsize=32)
def _hann_np(n: int, periodic: bool) -> np.ndarray:
    m = n if periodic else n - 1
    if m <= 0:
        return np.ones(max(n, 1), dtype=np.float32)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / m)).astype(np.float32)


def hann_window(n: int, periodic: bool = True) -> jnp.ndarray:
    """Hann window. ``periodic=True`` matches torch/librosa STFT conventions."""
    return jnp.asarray(_hann_np(n, periodic))


def overlap_add(frames: jnp.ndarray, hop: int, out_len: int) -> jnp.ndarray:
    """Overlap-add frames ``[..., n_frames, frame_length]`` back to a signal.

    Used by iSTFT. Implemented as a scatter-add with trace-time indices.
    """
    nf, fl = frames.shape[-2], frames.shape[-1]
    idx = (np.arange(fl)[None, :] + hop * np.arange(nf)[:, None]).reshape(-1)
    flat = frames.reshape(frames.shape[:-2] + (nf * fl,))
    out = jnp.zeros(frames.shape[:-2] + (out_len,), dtype=frames.dtype)
    return out.at[..., idx].add(flat)
