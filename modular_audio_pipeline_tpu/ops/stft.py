"""STFT / iSTFT on TPU via framing + XLA FFT.

Conventions match librosa/scipy defaults (which is what ``noisereduce``
uses internally): centered frames with reflect padding, periodic Hann
window, one-sided spectrum. The inverse applies the standard synthesis
window normalisation (sum of squared windows) so ``istft(stft(x)) == x``
for hop <= win/2.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from functools import lru_cache
from math import gcd

from .framing import _hann_np, frame_signal, hann_window, overlap_add

__all__ = ["stft", "istft"]


@lru_cache(maxsize=16)
def _nola_norm(win_sq_key: tuple, n_fft: int, hop: int, nf: int, out_len: int) -> np.ndarray:
    """Sum of squared synthesis windows at each output sample (vectorised
    block accumulation — no giant index arrays)."""
    win_sq = np.asarray(win_sq_key, dtype=np.float64) ** 2
    g = gcd(n_fft, hop)
    fb, hb = n_fft // g, hop // g
    blocks = win_sq.reshape(fb, g)
    norm = np.zeros((out_len // g, g), dtype=np.float64)
    last = (nf - 1) * hb
    for j in range(fb):
        norm[j : j + last + 1 : hb] += blocks[j]
    norm = norm.reshape(-1)
    return np.where(norm > 1e-11, norm, 1.0).astype(np.float32)


def stft(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop: Optional[int] = None,
    win_length: Optional[int] = None,
    center: bool = True,
) -> jnp.ndarray:
    """Short-time Fourier transform -> complex ``[..., n_fft//2+1, n_frames]``.

    Frequency-major layout (freq, time) matches librosa so the spectral-gate
    math reads identically to its NumPy oracle.
    """
    hop = hop or n_fft // 4
    win_length = win_length or n_fft
    win = hann_window(win_length)
    if win_length < n_fft:  # zero-pad window to n_fft, centered
        pad = (n_fft - win_length) // 2
        win = jnp.pad(win, (pad, n_fft - win_length - pad))
    if center:
        x = jnp.pad(
            x,
            [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)],
            mode="reflect",
        )
    frames = frame_signal(x, n_fft, hop) * win  # [..., nf, n_fft]
    spec = jnp.fft.rfft(frames, axis=-1)  # [..., nf, n_bins]
    return jnp.swapaxes(spec, -1, -2)  # [..., n_bins, nf]


def istft(
    spec: jnp.ndarray,
    n_fft: int = 1024,
    hop: Optional[int] = None,
    win_length: Optional[int] = None,
    center: bool = True,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT of a complex one-sided spectrum ``[..., n_bins, n_frames]``."""
    hop = hop or n_fft // 4
    win_length = win_length or n_fft
    win_np = np.asarray(_hann_np(win_length, True), dtype=np.float64)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        win_np = np.pad(win_np, (pad, n_fft - win_length - pad))
    win = jnp.asarray(win_np.astype(np.float32))

    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * win
    nf = frames.shape[-2]
    out_len = n_fft + hop * (nf - 1)
    sig = overlap_add(frames, hop, out_len)

    # Window-sum normalisation (NOLA), block-accumulated on host and cached.
    norm = jnp.asarray(_nola_norm(tuple(win_np.tolist()), n_fft, hop, nf, out_len))
    sig = sig / norm

    if center:
        sig = sig[..., n_fft // 2 :]
        if length is not None:
            sig = sig[..., :length]
    elif length is not None:
        sig = sig[..., :length]
    return sig
