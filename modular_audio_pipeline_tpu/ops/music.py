"""Music/background detection: short-window energy coefficient of variation.

Exact port of the reference's separation heuristic
(``/root/reference/audio_pipeline/separator.py:87-141``): 50 ms window RMS
energies; music has *consistent* energy, so a low coefficient of variation
(std/mean < 0.6) flags music, with confidence ``clip((0.8 − cv) / 0.4)``.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["analyze_audio_content", "analyze_device", "energy_cv"]


@partial(jax.jit, static_argnames=("sr",))
def window_energies(audio: jnp.ndarray, sr: int) -> jnp.ndarray:
    """RMS energy per non-overlapping 50 ms window."""
    window = int(sr * 0.05)
    n = (audio.shape[-1] // window) * window
    windows = audio[:n].reshape(-1, window)
    return jnp.sqrt(jnp.mean(windows * windows, axis=-1))


@partial(jax.jit, static_argnames=("sr",))
def _energy_cv_device(audio: jnp.ndarray, n_valid_windows: jnp.ndarray, sr: int):
    """Energy CV over the first ``n_valid_windows`` 50 ms windows, reduced
    ON DEVICE so only one scalar crosses the link (the host formulation
    downloads the whole waveform — the largest D2H of a parity run)."""
    e = window_energies(audio, sr)
    idx = jnp.arange(e.shape[0])
    valid = (idx < n_valid_windows).astype(jnp.float32)
    n = jnp.maximum(n_valid_windows.astype(jnp.float32), 1.0)
    mean = jnp.sum(e * valid) / n
    var = jnp.sum((e - mean) ** 2 * valid) / n
    return jnp.sqrt(var) / (mean + 1e-10)


def analyze_device(device_audio, n_valid: int, sr: int) -> Dict:
    """`analyze_audio_content` over a PADDED device-resident waveform.

    Same decision rule and confidence as the host form; the reduction runs
    in one jitted program and only the CV scalar is fetched.
    """
    window = int(sr * 0.05)
    num_windows = n_valid // window
    if num_windows < 10:
        return {"has_music": False, "confidence": 0.0, "reason": "Audio too short"}
    cv = float(
        _energy_cv_device(device_audio, jnp.asarray(num_windows, jnp.int32), sr)
    )
    has_music = cv < 0.6
    confidence = max(0.0, min(1.0, (0.8 - cv) / 0.4))
    return {
        "has_music": has_music,
        "confidence": confidence,
        "energy_cv": cv,
        "reason": (
            "Low energy variance suggests background music"
            if has_music
            else "High energy variance suggests speech only"
        ),
    }


def energy_cv(audio: np.ndarray, sr: int) -> float:
    """Coefficient of variation of 50 ms window RMS energies.

    Device computes the per-window energies over bucket-padded audio; the
    host reduces over the valid windows only.
    """
    from .bucketing import pad_to_bucket

    window = int(sr * 0.05)
    n_valid = len(audio) // window
    padded, _ = pad_to_bucket(np.asarray(audio, dtype=np.float32), sr)
    energies = np.asarray(window_energies(jnp.asarray(padded), sr))[:n_valid]
    return float(np.std(energies) / (np.mean(energies) + 1e-10))


def analyze_audio_content(audio: np.ndarray, sr: int) -> Dict:
    """Reference-compatible analysis dict: has_music / confidence / energy_cv."""
    window = int(sr * 0.05)
    num_windows = len(audio) // window
    if num_windows < 10:
        return {"has_music": False, "confidence": 0.0, "reason": "Audio too short"}

    cv = energy_cv(audio, sr)
    has_music = cv < 0.6
    confidence = max(0.0, min(1.0, (0.8 - cv) / 0.4))
    return {
        "has_music": has_music,
        "confidence": confidence,
        "energy_cv": cv,
        "reason": (
            "Low energy variance suggests background music"
            if has_music
            else "High energy variance suggests speech only"
        ),
    }
