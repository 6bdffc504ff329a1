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

from .framing import _hann_np, frame_signal, hann_window, overlap_add

__all__ = ["stft", "istft"]


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

    # Window-sum normalisation (NOLA).
    win_sq = win_np**2
    norm = np.zeros(out_len, dtype=np.float64)
    idx = (np.arange(n_fft)[None, :] + hop * np.arange(nf)[:, None]).reshape(-1)
    np.add.at(norm, idx, np.tile(win_sq, nf))
    norm = np.where(norm > 1e-11, norm, 1.0).astype(np.float32)
    sig = sig / norm

    if center:
        sig = sig[..., n_fft // 2 :]
        if length is not None:
            sig = sig[..., :length]
    elif length is not None:
        sig = sig[..., :length]
    return sig
