"""Voice-activity detection primitives: frame classifier + hangover machine.

Replaces the ``webrtcvad`` C extension and the reference's interpreted
per-frame loop (``/root/reference/audio_pipeline/vad.py:132-280``) with two
TPU-friendly pieces:

1. :func:`frame_speech_flags` — a vectorised per-frame speech/non-speech
   classifier. WebRTC's GMM over six sub-band energies is proprietary
   model state; we reproduce its *interface* (10/20/30 ms frames,
   aggressiveness modes 0-3) with an adaptive sub-band SNR detector: band
   energies against a per-band noise floor estimated from the quietest
   frames, summed as log-SNR and thresholded per mode. All O(n·fft) work
   is one jitted call.

2. :func:`hangover_segments` — the exact ring-buffer trigger/detrigger
   state machine of the reference (vad.py:169-280), expressed as a
   ``lax.scan`` over per-frame flags: trigger when voiced frames exceed
   ``start_threshold``·ring, detrigger when unvoiced exceed
   ``stop_threshold``·ring, with ring cleared at each transition and
   segment boundaries taken from the oldest ring entry.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .framing import frame_signal

__all__ = ["frame_speech_flags", "hangover_segments"]

# WebRTC's six analysis sub-bands (Hz).
_BAND_EDGES = (80.0, 250.0, 500.0, 1000.0, 2000.0, 3000.0, 4000.0)

# Aggressiveness -> (log2-SNR score threshold, absolute energy gate dBFS).
_MODE_THRESHOLDS = {
    0: (4.0, -65.0),
    1: (5.0, -60.0),
    2: (6.5, -55.0),
    3: (8.0, -50.0),
}


@partial(jax.jit, static_argnames=("sr", "frame_ms"))
def band_energies(
    audio: jnp.ndarray, sr: int, frame_ms: int = 30
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device half of the classifier: per-frame sub-band energies + level.

    Returns (bands [nf, 6], frame_db [nf]). The decision statistics (noise
    floor quantile, thresholds) run on host over these tiny arrays so that
    zero padding from shape bucketing never skews them.
    """
    frame_len = int(sr * frame_ms / 1000)
    frames = frame_signal(audio, frame_len, frame_len)  # non-overlapping
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2  # [nf, bins]

    freqs = np.fft.rfftfreq(frame_len, 1.0 / sr)
    band_energy = []
    for lo, hi in zip(_BAND_EDGES[:-1], _BAND_EDGES[1:]):
        sel = (freqs >= lo) & (freqs < hi)
        band_energy.append(spec[:, sel].sum(axis=-1))
    bands = jnp.stack(band_energy, axis=-1)  # [nf, 6]

    frame_db = 10.0 * jnp.log10(jnp.mean(frames * frames, axis=-1) + 1e-12)
    return bands, frame_db


def frame_speech_flags(
    audio: np.ndarray, sr: int, frame_ms: int = 30, mode: int = 1
) -> np.ndarray:
    """Per-frame speech decisions (int32 0/1), shape [n_valid_frames].

    Audio is padded to a shape bucket for the device FFT pass; the
    adaptive noise floor (quietest-10%-of-frames mean per band) and the
    mode thresholds are applied on host over the valid frames only.
    """
    from .bucketing import pad_to_bucket

    audio = np.asarray(audio, dtype=np.float32)
    frame_len = sr * frame_ms // 1000
    n_valid_frames = len(audio) // frame_len
    if n_valid_frames == 0:
        return np.zeros(0, dtype=np.int32)

    padded, _ = pad_to_bucket(audio, sr)
    bands_d, db_d = band_energies(jnp.asarray(padded), sr, frame_ms)
    bands = np.asarray(bands_d)[:n_valid_frames]
    frame_db = np.asarray(db_d)[:n_valid_frames]
    return flags_from_band_stats(bands, frame_db, mode)


def flags_from_band_stats(
    bands: np.ndarray, frame_db: np.ndarray, mode: int = 1
) -> np.ndarray:
    """Host half of :func:`frame_speech_flags`: adaptive noise floor +
    mode thresholds over already-fetched band statistics (shared with
    device-resident callers that fetch the stats themselves)."""
    k = max(1, len(bands) // 10)
    floor = np.sort(bands, axis=0)[:k].mean(axis=0) + 1e-12
    score = np.log2(1.0 + bands / floor).sum(axis=-1)

    score_th, db_th = _MODE_THRESHOLDS[mode]
    return ((score > score_th) & (frame_db > db_th)).astype(np.int32)


def _hangover_scan(flags: jnp.ndarray, ring_size: int, start_th: float, stop_th: float):
    """lax.scan over frames; returns per-frame event arrays."""
    maxlen = ring_size
    idx = jnp.arange(maxlen)

    def step(state, inp):
        ring, ring_len, triggered, seg_start = state
        i, is_speech = inp

        full = ring_len == maxlen
        ring_app = jnp.where(
            full,
            jnp.roll(ring, -1).at[maxlen - 1].set(is_speech),
            ring.at[jnp.minimum(ring_len, maxlen - 1)].set(is_speech),
        )
        len_app = jnp.minimum(ring_len + 1, maxlen)
        valid = (idx < len_app).astype(jnp.int32)
        voiced = jnp.sum(ring_app * valid)
        unvoiced = len_app - voiced
        oldest = i - len_app + 1

        trigger = (~triggered) & (voiced > start_th * maxlen)
        detrig = triggered & (unvoiced > stop_th * maxlen)

        new_triggered = jnp.where(trigger, True, jnp.where(detrig, False, triggered))
        new_seg_start = jnp.where(trigger, oldest, seg_start)
        clear = trigger | detrig
        new_ring = jnp.where(clear, jnp.zeros_like(ring), ring_app)
        new_len = jnp.where(clear, 0, len_app)

        events = (trigger, detrig, new_seg_start, i, oldest)
        return (new_ring, new_len, new_triggered, new_seg_start), events

    n = flags.shape[0]
    init = (
        jnp.zeros(maxlen, dtype=jnp.int32),
        jnp.asarray(0, dtype=jnp.int32),
        jnp.asarray(False),
        jnp.asarray(0, dtype=jnp.int32),
    )
    xs = (jnp.arange(n, dtype=jnp.int32), flags.astype(jnp.int32))
    final_state, events = jax.lax.scan(step, init, xs)
    return final_state, events


def hangover_segments(
    flags: np.ndarray,
    frame_ms: int,
    padding_ms: int,
    start_threshold: float,
    stop_threshold: float,
) -> List[Tuple[int, int, int]]:
    """Extract speech segments from per-frame flags.

    Returns triples ``(start_frame, last_frame_inclusive, boundary_end_frame)``
    where the kept audio spans ``[start_frame, last_frame]`` and the
    reported original end time is ``boundary_end_frame * frame_s`` — the
    oldest ring entry's end at detrigger, exactly as the reference computes
    it (vad.py:262-269). A trailing open segment is closed at the final
    frame.
    """
    n = int(flags.shape[0])
    if n == 0:
        return []
    ring_size = max(1, int(padding_ms / frame_ms))
    final_state, events = _hangover_scan(
        jnp.asarray(flags), ring_size, start_threshold, stop_threshold
    )
    trigger, detrig, seg_start, frame_i, oldest = (np.asarray(e) for e in events)
    _, _, still_triggered, last_seg_start = (np.asarray(s) for s in final_state)

    # Triggers and detriggers strictly alternate (the machine is 2-state),
    # so pair each trigger with the next detrigger.
    trig_at = np.flatnonzero(trigger)
    detrig_at = np.flatnonzero(detrig)

    segments: List[Tuple[int, int, int]] = []
    for t in trig_at:
        j = np.searchsorted(detrig_at, t, side="right")
        if j < len(detrig_at):
            d = detrig_at[j]
            # Segment audio includes every frame up to the detrigger frame.
            segments.append((int(seg_start[t]), int(frame_i[d]), int(oldest[d]) + 1))
        else:
            if bool(still_triggered):
                segments.append((int(seg_start[t]), n - 1, n))
            break
    return segments
