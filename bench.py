"""End-to-end pipeline benchmark on the local accelerator.

Measures the BASELINE.json north-star metric: full-pipeline realtime
factor (audio-hours per wall-hour per chip) with large-v3-turbo-shaped
Whisper + diarization. The timed region covers the complete compute path
of AudioPipeline.run (SURVEY.md §3.1 steps 3-6):

  DSP preprocess (denoise -> peak -> LUFS -> silence) -> trained ConvVAD
  (the shipped weights/vad-silero bundle, on device) -> mel -> encoder ->
  beam-5 KV-cached decode at whisper's full 224-token budget per 30 s
  window -> no-speech gate -> cross-attention DTW word timestamps ->
  trained diarization (segmentation + embeddings + calibrated AHC).

Production-shape notes: random weights (zero-egress environment — shapes
and compute are identical to converted checkpoints) never emit EOT, so
every window decodes the full 224-token budget; real checkpoints stop at
EOT far earlier, making this number conservative. The temperature
fallback ladder is structurally enabled but (with random weights) every
window would fail whisper's quality gates and re-decode 5x, which no
real checkpoint does — backend.load() therefore disables it for random
weights; its steady-state cost on real weights is bounded by the failing
fraction (typically a few %).

One warmup pass excludes XLA compiles. Prints exactly one JSON line:
  {"metric": ..., "value": RTF, "unit": ..., "vs_baseline": RTF/50, ...}
(baseline = the 50x-realtime-per-chip target; the reference publishes no
numbers of its own — BASELINE.md). The extra keys are link-independent
device metrics (VERDICT r3 #6): the tunneled TPU link in this environment
varies 10x between sessions, so alongside the wall-clock RTF the line
carries ms/decode-step and decode tokens/s measured with a single
dispatch+fetch pair (2 link crossings amortised over 224 steps), plus the
raw per-run wall times so outliers are visible across rounds.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

AUDIO_MINUTES = 8.0
SR = 16000
DECODE_TOKENS = 224  # whisper's real per-window budget (sample_len)
BEAM = 5
MODEL = "large-v3-turbo"
RUNS = 5
BASELINE_RTF = 50.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_audio(seconds: float) -> np.ndarray:
    rng = np.random.default_rng(0)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    f0 = 130 + 40 * np.sin(2 * np.pi * 0.4 * t)
    sig = sum((0.3 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / SR) for k in range(1, 5))
    env = (np.sin(2 * np.pi * 1.3 * t) > -0.5).astype(np.float32)
    out = (sig * env * 0.3).astype(np.float32)
    out += 0.002 * rng.standard_normal(n).astype(np.float32)
    return out


def main() -> None:
    import argparse

    import jax

    from modular_audio_pipeline_tpu.config import PipelineConfig
    from modular_audio_pipeline_tpu.runtime import enable_persistent_cache
    from modular_audio_pipeline_tpu.serving import ServingPipeline

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--path", choices=("serving", "pipeline"), default="serving",
        help="serving = device-resident ServingPipeline (headline); "
        "pipeline = reference-parity AudioPipeline.run stage chain",
    )
    args = ap.parse_args()

    enable_persistent_cache()
    log(f"devices: {jax.devices()}")

    audio_seconds = AUDIO_MINUTES * 60.0
    # int16, as real WAV ingest delivers it (half the upload bytes)
    audio = np.clip(make_audio(audio_seconds) * 32768.0, -32768, 32767).astype(np.int16)

    cfg = PipelineConfig(media_dir="/tmp/bench_media")
    cfg.transcription.model = MODEL
    cfg.transcription.weights_path = "random:0"
    cfg.transcription.beam_size = BEAM
    cfg.transcription.language = "en"
    cfg.transcription.batch_size = 16
    cfg.transcription.max_decode_tokens = DECODE_TOKENS
    cfg.transcription.word_timestamps = True  # production default (DTW)
    # Random weights can trip whisper's no-speech gate on EVERY window
    # (seed-dependent), silently dropping the DTW word-alignment work
    # from the timed region. Disable the gate so the bench always
    # exercises the full production path: parse + DTW on all windows —
    # conservative vs real checkpoints, which gate only true silence.
    cfg.transcription.no_speech_threshold = None

    # Workload telemetry captured from the last serving run (windows
    # decoded, tokens consumed) — recorded in the JSON so the artifact
    # proves the decode workload rather than implying it.
    last_stats: dict = {}

    if args.path == "pipeline":
        # Reference-parity path: AudioPipeline.run over the same audio,
        # written as a WAV input (stages hand off device buffers, WAV
        # checkpoints land asynchronously off the critical path).
        import os

        from modular_audio_pipeline_tpu.audio_io import write_wav
        from modular_audio_pipeline_tpu.pipeline import AudioPipeline

        os.makedirs("/tmp/bench_media", exist_ok=True)
        write_wav(
            "/tmp/bench_media/bench.wav",
            audio.astype(np.float32) / 32768.0, SR,
        )
        os.environ["MAP_TPU_ALLOW_RANDOM_WEIGHTS"] = "1"
        pipe = AudioPipeline(cfg)

        def run_once() -> int:
            result = pipe.run("/tmp/bench_media/bench.wav")
            assert result.success, result.error
            return len(result.segments or [])
    else:
        log(f"loading {MODEL} (random weights)...")
        serving = ServingPipeline(cfg)
        serving.backend.load()

        def run_once() -> int:
            result = serving.process(audio, SR)
            last_stats["decode"] = result.get("decode_stats", {})
            return len(result["segments"])

    # Fetch-integrity defense (VERDICT r4 next #1): token buffers are
    # checksummed on device and verified at fetch (runtime/integrity.py).
    # A 0-segment run means the decode workload (segment parse + DTW word
    # attachment) was NOT exercised — refuse to record it as the headline:
    # retry the whole measurement in a fresh process (the relay's
    # zero-buffer pathology is per-process), and if it persists, emit the
    # JSON with "valid": false so no consumer can quote it as comparable.
    import os
    import subprocess

    from modular_audio_pipeline_tpu.exceptions import FetchIntegrityError

    attempt = int(os.environ.get("MAP_TPU_BENCH_ATTEMPT", "0"))

    def retry_fresh_process(reason: str) -> None:
        if attempt >= 2:
            return  # give up; caller emits valid: false
        log(f"RETRY: {reason} — relaunching bench in a fresh process "
            f"(attempt {attempt + 1}/2)")
        env = dict(os.environ, MAP_TPU_BENCH_ATTEMPT=str(attempt + 1))
        raise SystemExit(
            subprocess.run([sys.executable] + sys.argv, env=env).returncode
        )

    log("warmup (compiles)...")
    t0 = time.perf_counter()
    try:
        n_segments = run_once()
    except FetchIntegrityError as e:
        retry_fresh_process(f"fetch integrity failure in warmup: {e}")
        raise
    log(f"warmup done in {time.perf_counter() - t0:.1f}s ({n_segments} segments)")
    if n_segments == 0:
        retry_fresh_process("0 segments parsed in warmup — decode "
                            "workload not exercised")

    times = []
    counts = [n_segments]
    try:
        for i in range(RUNS):
            t0 = time.perf_counter()
            counts.append(run_once())
            dt = time.perf_counter() - t0
            times.append(dt)
            log(f"run {i + 1}/{RUNS}: {dt:.2f}s "
                f"({audio_seconds / dt:.1f}x realtime, {counts[-1]} segments)")
    except FetchIntegrityError as e:
        retry_fresh_process(f"fetch integrity failure mid-measurement: {e}")
        raise
    n_segments = min(counts)
    if n_segments == 0:
        retry_fresh_process("a timed run parsed 0 segments")
        log("WARNING: recording an INVALID (0-segment) headline — all "
            "fresh-process retries exhausted; the RTF below did not "
            "exercise segment parse/DTW and is NOT comparable")

    wall = float(np.median(times))
    rtf = audio_seconds / wall

    # Link-independent device metrics (VERDICT r3 #6): beam-decode step
    # time at the production shape, measured with one dispatch + one
    # result fetch so relay health contributes 2 crossings per 224 steps
    # instead of ~10 per pipeline run.
    import jax.numpy as jnp

    from modular_audio_pipeline_tpu.models.whisper.decode import (
        DecodeOptions,
        decode_windows_async,
        encode_audio_kv,
        finalize_decode,
    )

    if args.path == "pipeline":
        backend = pipe.transcriber._backend  # loaded by the runs above
    else:
        backend = serving.backend
    params, dims, tok = backend.params, backend.dims, backend.tokenizer
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (cfg.transcription.batch_size, dims.n_mels, 3000), dtype=np.float32
        )
    )
    audio_kv = encode_audio_kv(params, dims, mel)
    audio_kv[0].block_until_ready()
    opts = DecodeOptions(
        beam_size=BEAM, max_tokens=DECODE_TOKENS, timestamps=True,
        kv_int8=getattr(cfg.transcription, "kv_cache_dtype", "int8") == "int8",
    )

    def decode_once() -> float:
        t0 = time.perf_counter()
        finalize_decode(
            decode_windows_async(params, dims, tok, None, opts, audio_kv=audio_kv)
        )
        return time.perf_counter() - t0

    decode_once()  # warmup (compile)
    decode_wall = min(decode_once() for _ in range(3))
    ms_per_step = decode_wall / DECODE_TOKENS * 1000.0
    tokens_per_s = cfg.transcription.batch_size * DECODE_TOKENS / decode_wall
    log(f"decode step: {ms_per_step:.2f} ms/step "
        f"({tokens_per_s:.0f} window-tokens/s)")

    print(
        json.dumps(
            {
                "metric": (
                    f"full_pipeline_rtf_{MODEL}_beam{BEAM}_"
                    f"{DECODE_TOKENS}tok_dtw_plus_diarization"
                    + ("_parity_path" if args.path == "pipeline" else "")
                ),
                "value": round(rtf, 2),
                "unit": "audio_hours_per_hour_per_chip",
                "vs_baseline": round(rtf / BASELINE_RTF, 3),
                "n_segments": int(n_segments),
                "decode_stats": last_stats.get("decode", {}),
                "valid": bool(n_segments > 0),
                "rtf_best": round(audio_seconds / min(times), 2),
                "runs_s": [round(t, 2) for t in times],
                "ms_per_decode_step": round(ms_per_step, 3),
                "decode_window_tokens_per_s": round(tokens_per_s, 1),
                "decode_batch": cfg.transcription.batch_size,
            }
        )
    )


if __name__ == "__main__":
    main()
