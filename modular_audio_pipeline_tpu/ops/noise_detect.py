"""Noise-profile auto-detection: frame energy + zero-crossing rate.

Vectorised TPU replacement for the reference's interpreted per-frame loop
(``/root/reference/audio_pipeline/preprocessor.py:92-147``), preserving its
decision rule exactly:

- 25 ms frames, 10 ms hop,
- noise frames = energy below the 20th percentile AND ZCR above half the
  median,
- contiguous runs of at least 100 ms become noise segments.

The feature extraction (the O(n) part) is one jitted function; the run
extraction (variable-size output) happens on host over a tiny boolean
vector of frames.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .framing import frame_signal

__all__ = [
    "frame_energy_zcr",
    "frame_features",
    "detect_noise_segments",
    "noise_segments_from_features",
]


@partial(jax.jit, static_argnames=("sr",))
def frame_energy_zcr(audio: jnp.ndarray, sr: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame (RMS energy, zero-crossing rate); 25 ms frames, 10 ms hop."""
    frame_length = int(sr * 0.025)
    hop = int(sr * 0.010)
    frames = frame_signal(audio, frame_length, hop)  # [nf, frame_length]
    energies = jnp.sqrt(jnp.mean(frames * frames, axis=-1))
    signs = jnp.signbit(frames)
    zcrs = jnp.sum(jnp.abs(jnp.diff(signs.astype(jnp.int32), axis=-1)), axis=-1) / frame_length
    return energies, zcrs.astype(jnp.float32)


@partial(jax.jit, static_argnames=("sr",))
def frame_features(audio: jnp.ndarray, sr: int) -> jnp.ndarray:
    """Stacked ``[2, nf]`` (energy, zcr): ONE device fetch instead of two
    (each ``np.asarray`` is a separate round-trip on the serial link)."""
    e, z = frame_energy_zcr(audio, sr)
    return jnp.stack([e, z])


def detect_noise_segments(audio: np.ndarray, sr: int) -> List[Tuple[int, int]]:
    """(start_sample, end_sample) runs likely to be pure noise."""
    from .bucketing import pad_to_bucket

    hop = int(sr * 0.010)
    frame_length = int(sr * 0.025)
    if len(audio) < frame_length:
        return []

    # Pad to a shape bucket (one compile per bucket); slice stats back to
    # the valid frame count so padding can't skew the percentiles.
    n_valid_frames = (len(audio) - frame_length) // hop + 1
    padded, _ = pad_to_bucket(np.asarray(audio, dtype=np.float32), sr)
    energies, zcrs = (np.asarray(v) for v in frame_energy_zcr(jnp.asarray(padded), sr))
    return noise_segments_from_features(
        energies[:n_valid_frames], zcrs[:n_valid_frames], sr
    )


def noise_segments_from_features(
    energies: np.ndarray, zcrs: np.ndarray, sr: int
) -> List[Tuple[int, int]]:
    """Decision half of :func:`detect_noise_segments` over host features
    (callers holding a device audio buffer reuse it for the feature pass)."""
    hop = int(sr * 0.010)
    if len(energies) == 0:
        return []

    energy_threshold = np.percentile(energies, 20)
    zcr_threshold = np.percentile(zcrs, 50)
    noise_frames = (energies < energy_threshold) & (zcrs > zcr_threshold * 0.5)

    # Vectorised run extraction (the reference's per-frame python loop is
    # O(hours) of interpreter time on long audio). A trailing open run is
    # intentionally dropped, matching the reference loop's behaviour
    # (preprocessor.py:135-145 never closes a run at EOF).
    flags = np.concatenate([[False], noise_frames])
    edges = np.diff(flags.astype(np.int8))
    starts = np.flatnonzero(edges == 1)
    ends = np.flatnonzero(edges == -1)
    n_pairs = len(ends)  # pairs only; open tail excluded
    segments: List[Tuple[int, int]] = [
        (int(s) * hop, int(e) * hop)
        for s, e in zip(starts[:n_pairs], ends)
        if (e - s) * hop / sr >= 0.1
    ]
    return segments
