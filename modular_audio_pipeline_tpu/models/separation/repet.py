"""REPET: REpeating Pattern Extraction Technique for vocal isolation.

Music accompaniment repeats (bars, loops); vocals don't. REPET finds the
repeating period from the beat spectrum (autocorrelated spectrogram
energy), models the accompaniment as the per-bin median across repetitions
and removes it with a soft time-frequency mask (Rafii & Pardo, 2013 —
public-domain technique, independent implementation).

Everything except the scalar period search is jittable; the period is a
host-side argmax over the beat spectrum (one tiny transfer per chunk).
The mask math rides the same STFT kernels as the denoiser, so on TPU the
whole separator is FFT-bound.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.stft import istft, stft

__all__ = ["find_repeating_period", "repet_separate"]

_N_FFT = 2048
_HOP = 512


def beat_spectrum(power: np.ndarray) -> np.ndarray:
    """Mean over frequency of per-bin time autocorrelations. power: [F, T]."""
    f, t = power.shape
    # autocorrelation via FFT, unbiased normalisation
    n = int(2 ** np.ceil(np.log2(2 * t)))
    spec = np.fft.rfft(power, n=n, axis=1)
    ac = np.fft.irfft(spec * np.conj(spec), n=n, axis=1)[:, :t]
    ac = ac / np.maximum(np.arange(t, 0, -1)[None, :], 1)  # unbiased
    b = ac.mean(axis=0)
    if b[0] > 0:
        b = b / b[0]
    return b


def find_repeating_period(
    power: np.ndarray, sr: int, hop: int = _HOP,
    min_period_s: float = 0.8, max_period_fraction: float = 1 / 3,
) -> int:
    """Repeating period in frames from the beat spectrum peak."""
    b = beat_spectrum(power)
    t = len(b)
    lo = max(1, int(round(min_period_s * sr / hop)))
    hi = max(lo + 1, int(t * max_period_fraction))
    if hi <= lo:
        return max(1, t // 2)
    return int(lo + np.argmax(b[lo:hi]))


@partial(jax.jit, static_argnames=("period", "n_reps"))
def _repeating_mask(mag: jnp.ndarray, period: int, n_reps: int) -> jnp.ndarray:
    """Soft mask of the repeating (music) component. mag: [F, T]."""
    f, t = mag.shape
    pad = (-t) % period
    padded = jnp.pad(mag, ((0, 0), (0, pad)), constant_values=jnp.inf)
    segs = padded.reshape(f, -1, period)  # [F, n_segs, period]
    # median over repetitions, ignoring the inf padding
    finite = jnp.isfinite(segs)
    big = jnp.where(finite, segs, jnp.nan)
    w = jnp.nanmedian(big, axis=1)  # [F, period]
    w_full = jnp.tile(w, (1, segs.shape[1]))[:, :t]
    # repeating model cannot exceed the mixture
    w_full = jnp.minimum(w_full, mag)
    mask = w_full / jnp.maximum(mag, 1e-8)
    return jnp.clip(mask, 0.0, 1.0)


def repet_separate(
    audio: np.ndarray, sr: int, high_pass_hz: float = 100.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Split ``audio`` into (vocals, accompaniment)."""
    x = jnp.asarray(audio, dtype=jnp.float32)
    spec = stft(x, n_fft=_N_FFT, hop=_HOP)  # [F, T] complex
    mag = jnp.abs(spec)

    period = find_repeating_period(np.asarray(mag) ** 2, sr)
    n_reps = int(np.ceil(mag.shape[1] / period))
    music_mask = _repeating_mask(mag, period, n_reps)

    # Vocals rarely live below ~100 Hz: force those bins to accompaniment.
    freqs = np.fft.rfftfreq(_N_FFT, 1.0 / sr)
    low_bins = jnp.asarray((freqs < high_pass_hz).astype(np.float32))[:, None]
    music_mask = jnp.maximum(music_mask, low_bins)

    vocal_spec = spec * (1.0 - music_mask)
    music_spec = spec * music_mask
    vocals = istft(vocal_spec, n_fft=_N_FFT, hop=_HOP, length=len(audio))
    music = istft(music_spec, n_fft=_N_FFT, hop=_HOP, length=len(audio))
    return (
        np.asarray(vocals, dtype=np.float32),
        np.asarray(music, dtype=np.float32),
    )
