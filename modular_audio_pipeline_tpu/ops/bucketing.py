"""Shape bucketing: pad variable-length audio onto a fixed ladder.

Everything under ``jit`` compiles per input shape; without bucketing every
new file length costs a fresh XLA compile (minutes on this backend — see
.claude/skills/verify/SKILL.md). All device DSP entry points therefore pad
audio up to the next rung of ``TPUConfig.bucket_seconds`` (default 30 s /
1 min / 5 min / 10 min / 30 min / 1 h) and slice results back to the valid
length, giving a small, fixed set of compiled programs per pipeline run.

Reductions over padded arrays must ignore the padding:

- per-frame ops (VAD flags, noise features) return frame arrays and the
  host slices to the valid frame count;
- gated reductions (BS.1770 loudness) exclude zero padding by
  construction (blocks below the −70 LUFS absolute gate);
- max-style reductions (peak) are unaffected by zero padding;
- noise *profiles* are tiled (not zero-padded) to the bucket so their
  spectral statistics stay unbiased.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["bucket_length", "pad_to_bucket", "tile_to_length", "DEFAULT_LADDER_S"]

DEFAULT_LADDER_S: Tuple[float, ...] = (30.0, 60.0, 300.0, 600.0, 1800.0, 3600.0)


def bucket_length(n: int, sr: int, ladder_s: Optional[Sequence[float]] = None) -> int:
    """Smallest ladder length (in samples) >= n; beyond the ladder, the
    next multiple of the largest rung."""
    ladder = sorted(ladder_s or DEFAULT_LADDER_S)
    for sec in ladder:
        cap = int(round(sec * sr))
        if n <= cap:
            return cap
    top = int(round(ladder[-1] * sr))
    return ((n + top - 1) // top) * top


def pad_to_bucket(
    audio: np.ndarray, sr: int, ladder_s: Optional[Sequence[float]] = None
) -> Tuple[np.ndarray, int]:
    """Zero-pad 1-D audio to its bucket; returns (padded, n_valid)."""
    n = int(audio.shape[-1])
    target = bucket_length(n, sr, ladder_s)
    if target == n:
        return audio, n
    out = np.zeros(audio.shape[:-1] + (target,), dtype=audio.dtype)
    out[..., :n] = audio
    return out, n


def tile_to_length(clip: np.ndarray, target: int) -> np.ndarray:
    """Repeat a clip up to ``target`` samples (for noise profiles, where
    zero padding would corrupt the spectral statistics)."""
    n = len(clip)
    if n == 0:
        return np.zeros(target, dtype=np.float32)
    if n >= target:
        return clip[:target]
    reps = (target + n - 1) // n
    return np.tile(clip, reps)[:target]
