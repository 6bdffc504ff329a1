"""Frame extraction and window functions (jittable, static shapes).

Every analysis op in the pipeline — STFT, VAD features, noise detection,
loudness blocks — starts by slicing the waveform into overlapping frames.

Framing is built from **strided slices over base blocks** rather than a
gather: with g = gcd(frame, hop), the signal reshapes to [n/g, g] blocks
and each frame is ``fb = frame/g`` consecutive blocks starting every
``hb = hop/g`` blocks, so ``fb`` strided slices + one stack produce all
frames. A trace-time gather index array would weigh
``n_frames x frame_length`` ints — hundreds of MB of HLO constants for
long audio, which this backend's compile service rejects outright.
"""

from __future__ import annotations

import functools
from math import gcd

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
    if nf == 0:
        return jnp.zeros(x.shape[:-1] + (0, frame_length), dtype=x.dtype)

    g = gcd(frame_length, hop)
    fb, hb = frame_length // g, hop // g
    n_blocks = n // g
    x2 = x[..., : n_blocks * g].reshape(x.shape[:-1] + (n_blocks, g))

    last = (nf - 1) * hb  # block index of the final frame's first block
    parts = [x2[..., j : j + last + 1 : hb, :] for j in range(fb)]
    frames = jnp.stack(parts, axis=-2)  # [..., nf, fb, g]
    return frames.reshape(x.shape[:-1] + (nf, frame_length))


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

    Used by iSTFT. Same base-block decomposition as :func:`frame_signal`:
    ``fb`` strided-slice accumulations instead of a scatter with a huge
    trace-time index constant.
    """
    nf, fl = frames.shape[-2], frames.shape[-1]
    g = gcd(fl, hop)
    fb, hb = fl // g, hop // g
    n_blocks = out_len // g
    assert n_blocks * g == out_len, "out_len must be a multiple of gcd(frame, hop)"

    frames3 = frames.reshape(frames.shape[:-2] + (nf, fb, g))
    out = jnp.zeros(frames.shape[:-2] + (n_blocks, g), dtype=frames.dtype)
    last = (nf - 1) * hb
    for j in range(fb):
        out = out.at[..., j : j + last + 1 : hb, :].add(frames3[..., :, j, :])
    return out.reshape(frames.shape[:-2] + (out_len,))
