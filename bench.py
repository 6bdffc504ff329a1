"""End-to-end pipeline benchmark on the local accelerator.

Measures the BASELINE.json north-star metric: full-pipeline realtime
factor (audio-hours per wall-hour per chip) with large-v3-turbo-shaped
Whisper + diarization. The timed region covers the complete compute path
of AudioPipeline.run (SURVEY.md §3.1 steps 3-6):

  DSP preprocess (denoise -> peak -> LUFS -> silence) -> energy VAD ->
  mel -> encoder -> beam-5 KV-cached decode (fixed 112-token budget per
  30 s window ~= dense-speech decode length, no data-dependent early
  exit) -> diarization embeddings + clustering.

Weights are random (zero-egress environment — shapes and compute are
identical to converted checkpoints); one warmup pass excludes XLA
compiles. Prints exactly one JSON line:
  {"metric": ..., "value": RTF, "unit": ..., "vs_baseline": RTF/50}
(baseline = the 50x-realtime-per-chip target; the reference publishes no
numbers of its own — BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

AUDIO_MINUTES = 8.0
SR = 16000
DECODE_TOKENS = 112
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
    import jax

    from modular_audio_pipeline_tpu.config import PipelineConfig
    from modular_audio_pipeline_tpu.diarizer import SpeakerDiarizer
    from modular_audio_pipeline_tpu.models.whisper.decode import (
        DecodeOptions,
        decode_windows,
    )
    from modular_audio_pipeline_tpu.ops.mel import log_mel
    from modular_audio_pipeline_tpu.preprocessor import AudioPreprocessor
    from modular_audio_pipeline_tpu.runtime import enable_persistent_cache
    from modular_audio_pipeline_tpu.transcriber import JaxWhisperBackend
    from modular_audio_pipeline_tpu.vad import SileroVADFilter

    enable_persistent_cache()
    log(f"devices: {jax.devices()}")

    audio_seconds = AUDIO_MINUTES * 60.0
    audio = make_audio(audio_seconds)

    cfg = PipelineConfig(media_dir="/tmp/bench_media")
    pre = AudioPreprocessor.from_config(cfg)
    vad = SileroVADFilter(sampling_rate=SR)

    backend = JaxWhisperBackend(
        MODEL,
        language="en",
        beam_size=BEAM,
        weights_path="random:0",
        batch_size=16,
        max_decode_tokens=DECODE_TOKENS,
    )
    log(f"loading {MODEL} (random weights)...")
    backend.load()
    diarizer = SpeakerDiarizer(lazy_load=False)

    import jax.numpy as jnp

    opts = DecodeOptions(
        language="en",
        beam_size=BEAM,
        max_tokens=DECODE_TOKENS,
        timestamps=True,
    )

    stage_t: dict = {}

    def tick(name, t0):
        stage_t[name] = stage_t.get(name, 0.0) + time.perf_counter() - t0
        return time.perf_counter()

    def run_once() -> int:
        stage_t.clear()
        t0 = time.perf_counter()
        # --- DSP preprocessing chain (one fused device program) ---
        x, _stats = pre.preprocess_chain_array(audio, SR)
        t0 = tick("dsp", t0)
        from modular_audio_pipeline_tpu.ops.silence import remove_silence

        x, _, changed = remove_silence(x, SR)
        t0 = tick("silence", t0)

        # --- VAD (probabilities + hysteresis) ---
        timestamps = vad._timestamps(x, SR)
        if timestamps:
            pieces = [
                x[int(t["start"] * SR) : int(t["end"] * SR)] for t in timestamps
            ]
            x = np.concatenate(pieces)
        t0 = tick("vad", t0)

        # --- transcription: windows -> mel -> encode -> beam decode ---
        from modular_audio_pipeline_tpu.models.whisper.decode import (
            decode_windows_async,
            finalize_decode,
        )

        windows = backend._windows(x)
        n_tokens = 0
        pending = []
        for start in range(0, windows.shape[0], backend.batch_size):
            batch = windows[start : start + backend.batch_size]
            if batch.shape[0] < backend.batch_size:
                pad = np.zeros(
                    (backend.batch_size - batch.shape[0], batch.shape[1]), np.float32
                )
                batch = np.concatenate([batch, pad])
            mel = log_mel(jnp.asarray(batch), n_mels=backend.dims.n_mels)
            pending.append(
                decode_windows_async(
                    backend.params, backend.dims, backend.tokenizer, mel, opts
                )
            )
        for p in pending:
            n_tokens += int(finalize_decode(p).lengths.sum())
        t0 = tick("transcribe", t0)

        # --- diarization: embeddings + clustering ---
        spans = diarizer._subsegments(x, SR)
        if spans:
            embs = diarizer._embed_all(x, SR, spans)
            from modular_audio_pipeline_tpu.models.diarization.clustering import (
                cluster_embeddings,
            )

            cluster_embeddings(embs, 1, 5)
        tick("diarize", t0)
        return n_tokens

    log("warmup (compiles)...")
    t0 = time.perf_counter()
    n_tokens = run_once()
    log(f"warmup done in {time.perf_counter() - t0:.1f}s ({n_tokens} tokens)")

    times = []
    for i in range(RUNS):
        t0 = time.perf_counter()
        run_once()
        dt = time.perf_counter() - t0
        times.append(dt)
        log(
            f"run {i + 1}/{RUNS}: {dt:.2f}s ({audio_seconds / dt:.1f}x realtime) "
            f"stages={ {k: round(v, 2) for k, v in stage_t.items()} }"
        )

    wall = float(np.median(times))
    rtf = audio_seconds / wall
    print(
        json.dumps(
            {
                "metric": f"full_pipeline_rtf_{MODEL}_beam{BEAM}_plus_diarization",
                "value": round(rtf, 2),
                "unit": "audio_hours_per_hour_per_chip",
                "vs_baseline": round(rtf / BASELINE_RTF, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
