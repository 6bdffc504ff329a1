"""Batched MFCC features on TPU.

MFCCs feed the weight-free speaker embedder. The whole path is matmuls
(mel filterbank, DCT-II) behind one FFT — MXU-friendly and jitted once per
subsegment shape.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.framing import frame_signal, hann_window
from ...ops.mel import mel_filterbank

__all__ = ["mfcc_batch"]


@lru_cache(maxsize=4)
def _dct_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix [n_out, n_in]."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    mat = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    mat *= np.sqrt(2.0 / n_in)
    mat[0] *= 1.0 / np.sqrt(2.0)
    return mat.astype(np.float32)


@partial(jax.jit, static_argnames=("sr", "n_mfcc", "n_mels"))
def mfcc_batch(
    audio: jnp.ndarray,  # [B, N] float32
    sr: int = 16000,
    n_mfcc: int = 20,
    n_mels: int = 40,
) -> jnp.ndarray:
    """[B, N] -> [B, n_frames, n_mfcc]; 25 ms frames / 10 ms hop."""
    frame_len = int(sr * 0.025)
    hop = int(sr * 0.010)
    n_fft = 512

    frames = frame_signal(audio, frame_len, hop)  # [B, nf, frame_len]
    win = hann_window(frame_len)
    frames = frames * win
    pad = n_fft - frame_len
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad)))
    power = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2  # [B, nf, 257]

    fb = jnp.asarray(mel_filterbank(n_mels=n_mels, n_fft=n_fft, sr=sr, fmax=sr / 2))
    mel = jnp.einsum(
        "mf,btf->btm", fb, power.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    log_mel = jnp.log(jnp.maximum(mel, 1e-10))

    dct = jnp.asarray(_dct_matrix(n_mfcc, n_mels))
    return jnp.einsum("km,btm->btk", dct, log_mel, preferred_element_type=jnp.float32)
