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


_N_SHIFTS = 12  # repetitions sampled for the median model (static)


@jax.jit
def _repeating_mask(mag: jnp.ndarray, period: jnp.ndarray) -> jnp.ndarray:
    """Soft mask of the repeating (music) component. mag: [F, T].

    The period is a *traced* scalar — one compiled program per spectrogram
    shape regardless of the song's tempo (a static period would recompile
    per file). The repeating model is the median of ``_N_SHIFTS``
    period-shifted copies, wrapping modulo T (the input is tiled, so the
    wrap is seamless).
    """
    f, t = mag.shape
    t_idx = jnp.arange(t)[None, :]
    k_idx = jnp.arange(_N_SHIFTS)[:, None]
    shifts = (t_idx + k_idx * period) % t  # [K, T]
    samples = mag[:, shifts]  # [F, K, T]
    w = jnp.median(samples, axis=1)  # [F, T]
    # repeating model cannot exceed the mixture
    w = jnp.minimum(w, mag)
    mask = w / jnp.maximum(mag, 1e-8)
    return jnp.clip(mask, 0.0, 1.0)


def repet_separate(
    audio: np.ndarray, sr: int, high_pass_hz: float = 100.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Split ``audio`` into (vocals, accompaniment)."""
    from ...ops.bucketing import bucket_length, tile_to_length

    # Bucket by TILING (not zero-padding): repetition is REPET's model
    # assumption, so tiled audio keeps both the beat spectrum and the
    # per-bin medians unbiased, and one program compiles per bucket.
    n_valid = len(audio)
    target = bucket_length(n_valid, sr)
    tiled = tile_to_length(np.asarray(audio, np.float32), target)

    x = jnp.asarray(tiled, dtype=jnp.float32)
    spec = stft(x, n_fft=_N_FFT, hop=_HOP)  # [F, T] complex
    mag = jnp.abs(spec)

    period = find_repeating_period(np.asarray(mag) ** 2, sr)
    music_mask = _repeating_mask(mag, jnp.asarray(period, jnp.int32))

    # Vocals rarely live below ~100 Hz: force those bins to accompaniment.
    freqs = np.fft.rfftfreq(_N_FFT, 1.0 / sr)
    low_bins = jnp.asarray((freqs < high_pass_hz).astype(np.float32))[:, None]
    music_mask = jnp.maximum(music_mask, low_bins)

    vocal_spec = spec * (1.0 - music_mask)
    music_spec = spec * music_mask
    vocals = istft(vocal_spec, n_fft=_N_FFT, hop=_HOP, length=target)
    music = istft(music_spec, n_fft=_N_FFT, hop=_HOP, length=target)
    return (
        np.asarray(vocals, dtype=np.float32)[:n_valid],
        np.asarray(music, dtype=np.float32)[:n_valid],
    )
