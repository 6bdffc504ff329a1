"""Stationary spectral-gating noise reduction on TPU.

First-party replacement for ``noisereduce.reduce_noise(..., stationary=True,
prop_decrease=0.8)`` as invoked by the reference preprocessor
(``/root/reference/audio_pipeline/preprocessor.py:200-206``). Algorithm:

1. STFT of the signal and of a noise clip (n_fft=1024, hop=256, Hann).
2. Per-frequency threshold = mean_dB(noise) + ``n_std_thresh`` * std_dB(noise).
3. Binary keep-mask where the signal magnitude (dB) exceeds the threshold.
4. Mask smoothed with a separable triangle kernel (500 Hz / 50 ms supports)
   so gating doesn't flutter bin-by-bin.
5. Gain = mask * prop_decrease + (1 - prop_decrease); complex STFT scaled,
   inverse STFT back to the waveform.

The whole chain is one jittable function — XLA fuses the masking math into
the FFT pipeline, and the only HBM round-trips are the FFTs themselves.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from .stft import istft, stft

__all__ = ["spectral_gate_stationary", "amp_to_db"]

_EPS = 1e-20


def amp_to_db(x: jnp.ndarray, top_db: float = 80.0) -> jnp.ndarray:
    """20*log10(|x|) clamped to ``max - top_db`` (librosa convention)."""
    mag = jnp.maximum(jnp.abs(x), _EPS)
    db = 20.0 * jnp.log10(mag)
    return jnp.maximum(db, jnp.max(db) - top_db)


def _box_filter(x: jnp.ndarray, n: int, axis: int) -> jnp.ndarray:
    """Zero-padded 'same' box filter of length ``n`` via cumulative sums.

    Written this way deliberately: a single-channel 2-D convolution (or an
    odd-shaped matmul) takes tens of seconds to compile on the TPU
    backend, while cumsum/slice lowers instantly and is memory-bound.
    """
    if n <= 1:
        return x
    x = jnp.moveaxis(x, axis, -1)
    t = x.shape[-1]
    cs = jnp.cumsum(x, axis=-1)
    cs = jnp.concatenate([jnp.zeros_like(cs[..., :1]), cs], axis=-1)  # [.., t+1]
    left = n // 2  # taps to the left of center for odd n
    idx_hi = np.minimum(np.arange(t) + (n - left), t)
    idx_lo = np.maximum(np.arange(t) - left, 0)
    out = cs[..., idx_hi] - cs[..., idx_lo]
    return jnp.moveaxis(out, -1, axis)


def _smooth_mask(mask: jnp.ndarray, n_freq: int, n_time: int) -> jnp.ndarray:
    """Separable triangle smoothing (box*box per axis), normalised.

    Equivalent to convolving with the normalised outer product of two
    triangles of lengths ``2*n_freq-1`` and ``2*n_time-1`` (noisereduce's
    smoothing kernel), zero-padded at the edges.
    """
    out = mask
    norm_const = 1.0
    for n, axis in ((n_freq, 0), (n_time, 1)):
        if n > 1:
            out = _box_filter(_box_filter(out, n, axis), n, axis)
            norm_const *= float(n * n)
    return out / norm_const


@partial(
    jax.jit,
    static_argnames=(
        "sr", "n_fft", "hop", "prop_decrease", "n_std_thresh",
        "freq_mask_smooth_hz", "time_mask_smooth_ms",
    ),
)
def spectral_gate_stationary(
    audio: jnp.ndarray,
    noise_clip: jnp.ndarray,
    sr: int,
    n_fft: int = 1024,
    hop: int = 256,
    prop_decrease: float = 0.8,
    n_std_thresh: float = 1.5,
    freq_mask_smooth_hz: float = 500.0,
    time_mask_smooth_ms: float = 50.0,
) -> jnp.ndarray:
    """Denoise ``audio`` given a representative ``noise_clip`` (both 1-D f32)."""
    length = audio.shape[-1]

    sig_stft = stft(audio, n_fft=n_fft, hop=hop)  # [freq, time]
    noise_stft = stft(noise_clip, n_fft=n_fft, hop=hop)

    sig_db = amp_to_db(sig_stft)
    noise_db = amp_to_db(noise_stft)

    noise_mean = jnp.mean(noise_db, axis=-1, keepdims=True)  # per-frequency
    noise_std = jnp.std(noise_db, axis=-1, keepdims=True)
    thresh = noise_mean + n_std_thresh * noise_std

    mask = (sig_db > thresh).astype(jnp.float32)

    # Smooth the binary mask (separable triangle, 'same' padding).
    n_freq = max(1, int(freq_mask_smooth_hz / (sr / n_fft)))
    n_time = max(1, int(time_mask_smooth_ms / 1000.0 * (sr / hop)))
    mask = _smooth_mask(mask, n_freq, n_time)

    gain = mask * prop_decrease + (1.0 - prop_decrease)
    denoised_stft = sig_stft * gain.astype(sig_stft.dtype)
    return istft(denoised_stft, n_fft=n_fft, hop=hop, length=length)
