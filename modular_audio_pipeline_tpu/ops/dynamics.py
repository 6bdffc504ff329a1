"""Level measurement and peak normalisation (pydub-compatible math).

The reference normalises with ``pydub.effects.normalize`` and thresholds
silence against ``AudioSegment.dBFS`` (preprocessor.py:227-233, 313). pydub
computes both on integer PCM; we reproduce the same numbers on float32
waveforms scaled by the 16-bit full-scale constant, so thresholds carry
over exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["dbfs", "peak_dbfs", "peak_normalize"]

_FULL_SCALE = 32768.0  # 16-bit reference amplitude (pydub max_possible_amplitude)
_NEG_INF = -float("inf")


def dbfs(x: jnp.ndarray) -> jnp.ndarray:
    """RMS level in dB relative to 16-bit full scale (pydub ``dBFS``)."""
    rms2 = jnp.mean(jnp.square(x * _FULL_SCALE), axis=-1)
    return jnp.where(
        rms2 > 0, 10.0 * jnp.log10(jnp.maximum(rms2, 1e-30) / (_FULL_SCALE**2)), _NEG_INF
    )


def peak_dbfs(x: jnp.ndarray) -> jnp.ndarray:
    """Peak level in dBFS (pydub ``max_dBFS``)."""
    peak = jnp.max(jnp.abs(x), axis=-1)
    return jnp.where(
        peak > 0, 20.0 * jnp.log10(jnp.maximum(peak, 1e-30)), _NEG_INF
    )


@partial(jax.jit, static_argnames=("headroom_db",))
def peak_normalize(x: jnp.ndarray, headroom_db: float = 0.1) -> jnp.ndarray:
    """Scale so the peak sits ``headroom_db`` below full scale.

    Matches ``pydub.effects.normalize(seg, headroom=0.1)``: target peak =
    full_scale * 10^(-headroom/20); silent input is returned unchanged.
    """
    peak = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    target = 10.0 ** (-headroom_db / 20.0)
    gain = target / jnp.maximum(peak, 1e-12)
    return jnp.where(peak > 0, x * gain, x)
