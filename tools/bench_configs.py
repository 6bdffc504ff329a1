"""Measure BASELINE.json benchmark configs 1, 2 and 4 on the local chip.

bench.py covers config 3 (the headline: large-v3-turbo + diarization) and
parallel/batch.py covers config 5 (50x1-hr batch). This tool fills in the
remaining rows:

  1. whisper-tiny, one 60 s WAV, --no-diarization --no-vad --no-noise-reduction
  2. whisper-base + VAD + noise reduction + loudness norm, 10-min meeting
  4. auto-detected vocal separation + large-v3, music-contaminated podcast

Each config prints one JSON line {"config": N, "rtf": ..., "runs": [...]}
to stdout (progress to stderr). Random weights (zero-egress environment):
shapes/compute identical to converted checkpoints, decode runs the full
token budget (conservative vs real weights, which EOT early).

Usage: python tools/bench_configs.py [--configs 1 2 4] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parent.parent))

SR = 16000


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def speech_like(seconds: float, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    f0 = 130 + 40 * np.sin(2 * np.pi * 0.4 * t)
    sig = sum(
        (0.3 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / SR) for k in range(1, 5)
    )
    env = (np.sin(2 * np.pi * 1.3 * t) > -0.5).astype(np.float32)
    out = (sig * env * 0.3).astype(np.float32)
    out += 0.002 * rng.standard_normal(n).astype(np.float32)
    return out


def voiced_speech(seconds: float, seed: int = 1) -> np.ndarray:
    """Continuous voiced speech from the shipped source-filter voice model.

    The trained ConvVAD (the serving path's VAD since round 4) learned
    *that* distribution; the old pure-harmonic `speech_like` bed reads as
    non-speech to it (3.6% kept of a 480 s file), which collapses the
    decode workload and invalidates the RTF. Real workloads keep most of
    real speech through real VAD — the bench audio must do the same.
    Cached to /tmp (generation is ~30 s of host time for 8 min).
    """
    import pathlib

    cache = pathlib.Path(f"/tmp/bench_voiced_{int(seconds)}s_{seed}.npy")
    if cache.exists():
        return np.load(cache)
    from modular_audio_pipeline_tpu.training.voices import (
        sample_voice, synth_utterance,
    )

    rng = np.random.default_rng(seed)
    voices = [sample_voice(rng) for _ in range(4)]
    n = int(seconds * SR)
    out = np.zeros(n, dtype=np.float32)
    pos = 0
    while pos < n:
        utt = synth_utterance(voices[rng.integers(len(voices))],
                              float(rng.uniform(2.5, 5.0)), rng,
                              pause_prob=0.15)
        take = min(len(utt), n - pos)
        out[pos : pos + take] = utt[:take]
        pos += take + int(rng.uniform(0.08, 0.35) * SR)  # inter-utterance gap
    np.save(cache, out)
    return out


def music_podcast(seconds: float, seed: int = 1) -> np.ndarray:
    """Voiced-speech bed + repeating music loop, loud enough to trip
    auto-detect (and for separation to have real work to do)."""
    speech = voiced_speech(seconds, seed)
    n = len(speech)
    t = np.arange(n) / SR
    loop = (
        0.25 * np.sin(2 * np.pi * 98 * t)
        + 0.15 * np.sin(2 * np.pi * 196.5 * t)
        + 0.1 * np.sin(2 * np.pi * 294 * t)
    )
    return (speech + loop.astype(np.float32)).astype(np.float32)


def base_config(model: str):
    from modular_audio_pipeline_tpu.config import PipelineConfig

    cfg = PipelineConfig(media_dir="/tmp/bench_media")
    cfg.transcription.model = model
    cfg.transcription.weights_path = "random:0"
    cfg.transcription.beam_size = 5
    cfg.transcription.language = "en"
    cfg.transcription.batch_size = 16
    cfg.transcription.max_decode_tokens = 224
    cfg.transcription.word_timestamps = True
    # Random weights can trip the no-speech gate on every window, which
    # silently drops segment parse + DTW word attachment from the timed
    # region (the same workload shrink bench.py guards against) — the
    # recorded RTF must exercise the full decode workload.
    cfg.transcription.no_speech_threshold = None
    return cfg


def build(config_id: int):
    """Returns (cfg, audio, label)."""
    if config_id == 1:
        cfg = base_config("tiny")
        cfg.diarization.enabled = False
        cfg.vad.enabled = False
        cfg.noise_reduction.enabled = False
        return cfg, speech_like(60.0), "tiny_60s_no_diar_no_vad_no_nr"
    if config_id == 2:
        cfg = base_config("base")
        cfg.diarization.enabled = False
        cfg.vad.enabled = True
        cfg.noise_reduction.enabled = True
        # Voiced bed: config 2's workload includes VAD — the audio must
        # read as speech to the shipped ConvVAD (see voiced_speech).
        return cfg, voiced_speech(600.0), "base_10min_vad_nr_loudnorm"
    if config_id == 4:
        cfg = base_config("large-v3")
        # 32 decoder layers x BK=80 int8 KV + cross KV + in-flight batches
        # exceed one v5e chip's 16 GB HBM at window-batch 16; 8 fits.
        cfg.transcription.batch_size = 8
        cfg.diarization.enabled = False
        cfg.vocal_separation.enabled = True
        cfg.vocal_separation.auto_detect = True
        return cfg, music_podcast(480.0), "largev3_8min_auto_separation"
    raise SystemExit(f"unknown config {config_id}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--configs", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--compute-type", default=None,
                    help="override transcription.compute_type (e.g. int8 "
                         "for weight-only quantization — the same tier "
                         "faster-whisper drops to without float16)")
    args = ap.parse_args()

    import jax

    from modular_audio_pipeline_tpu.runtime import enable_persistent_cache
    from modular_audio_pipeline_tpu.serving import ServingPipeline

    enable_persistent_cache()
    log(f"devices: {jax.devices()}")

    for config_id in args.configs:
        cfg, audio, label = build(config_id)
        if args.compute_type:
            cfg.transcription.compute_type = args.compute_type
            label += f"_{args.compute_type}"
        seconds = len(audio) / SR
        log(f"config {config_id} ({label}): {seconds:.0f}s audio, "
            f"model={cfg.transcription.model}")
        pipe = ServingPipeline(cfg)
        pipe.backend.load()

        t0 = time.perf_counter()
        result = pipe.process(audio, SR)
        ds = result.get("decode_stats", {})
        log(f"  warmup {time.perf_counter() - t0:.1f}s "
            f"({len(result['segments'])} segments, "
            f"separated={result.get('vocal_separation')}, "
            f"kept={result.get('kept_duration', 0):.0f}s, "
            f"windows={ds.get('n_windows')}, "
            f"tok/win={ds.get('mean_tokens_per_window')})")

        times = []
        seg_counts = [len(result["segments"])]
        for i in range(args.runs):
            t0 = time.perf_counter()
            out = pipe.process(audio, SR)
            dt = time.perf_counter() - t0
            times.append(dt)
            seg_counts.append(len(out["segments"]))
            log(f"  run {i + 1}/{args.runs}: {dt:.2f}s ({seconds / dt:.1f}x, "
                f"{seg_counts[-1]} segments)")

        rtf = seconds / float(np.median(times))
        n_segments = min(seg_counts)
        if n_segments == 0:
            log(f"  WARNING: config {config_id} parsed 0 segments in at "
                "least one run — decode workload not exercised; RTF not "
                "comparable")
        print(
            json.dumps(
                {
                    "config": config_id,
                    "label": label,
                    "rtf": round(rtf, 2),
                    "unit": "audio_hours_per_hour_per_chip",
                    "runs_s": [round(x, 2) for x in times],
                    "n_segments": n_segments,
                    "kept_s": round(float(result.get("kept_duration", 0.0)), 1),
                    "decode_stats": ds,
                    "valid": bool(n_segments > 0 and ds.get("n_windows", 0) > 0),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
