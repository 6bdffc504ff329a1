"""Whisper-compatible log-mel spectrogram frontend.

Reproduces the exact preprocessing of OpenAI Whisper (the compute the
reference delegates to ``whisper``/``faster-whisper`` —
``/root/reference/audio_pipeline/transcriber.py:229-238,421-427``):

- 16 kHz audio, n_fft=400, hop=160, periodic Hann, centered (reflect pad),
- power spectrum with the final frame dropped,
- slaney-scale mel filterbank (librosa ``filters.mel`` defaults, fmax=8000),
- ``log10(clamp(mel, 1e-10))``, floored at ``max - 8``, then ``(x+4)/4``.

The mel projection is a [n_bins, n_mels] matmul — on TPU it rides the MXU
fused right behind the FFT. The whole frontend is jittable and batched:
``log_mel(audio[B, N])`` -> ``[B, n_mels, N//hop]``.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .framing import frame_signal, hann_window

__all__ = ["mel_filterbank", "log_mel", "N_FFT", "HOP_LENGTH", "SAMPLE_RATE"]

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    safe = np.maximum(f, 1e-10)
    return np.where(
        f >= min_log_hz, min_log_mel + np.log(safe / min_log_hz) / logstep, f / f_sp
    )


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_sp * m
    )


@lru_cache(maxsize=8)
def mel_filterbank(
    n_mels: int = 80,
    n_fft: int = N_FFT,
    sr: int = SAMPLE_RATE,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> np.ndarray:
    """Slaney-normalised triangular mel filterbank, shape [n_mels, n_fft//2+1].

    Matches ``librosa.filters.mel(sr, n_fft, n_mels)`` (htk=False,
    norm="slaney"), which is what Whisper's reference implementation ships
    as a precomputed asset.
    """
    fft_freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(np.array(fmin)), _hz_to_mel_slaney(np.array(fmax)), n_mels + 2
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@partial(jax.jit, static_argnames=("n_mels", "sr"))
def log_mel(audio: jnp.ndarray, n_mels: int = 80, sr: int = SAMPLE_RATE) -> jnp.ndarray:
    """Whisper log-mel: ``audio[..., N]`` -> ``[..., n_mels, N // HOP]``."""
    window = hann_window(N_FFT)
    x = jnp.pad(
        audio,
        [(0, 0)] * (audio.ndim - 1) + [(N_FFT // 2, N_FFT // 2)],
        mode="reflect",
    )
    frames = frame_signal(x, N_FFT, HOP_LENGTH) * window  # [..., nf, n_fft]
    spec = jnp.fft.rfft(frames, axis=-1)
    power = (spec.real**2 + spec.imag**2)[..., :-1, :]  # drop last frame (whisper)

    fb = jnp.asarray(mel_filterbank(n_mels=n_mels, sr=sr))  # [n_mels, bins]
    mel = jnp.einsum(
        "mf,...tf->...mt", fb, power.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    max_val = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    return (log_spec + 4.0) / 4.0
