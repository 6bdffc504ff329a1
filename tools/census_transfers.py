"""Host<->device transfer census for one parity-path pipeline run.

VERDICT r3 #10: the stage-by-stage AudioPipeline made ~30 link
round-trips per run (one per stage dispatch/fetch) vs serving's ~10; on
a tunneled TPU each round-trip costs ~26 ms + payload, so the census is
the code-side metric that survives relay-health variance. The target is
<=10 round-trips.

Runs the full pipeline on a synthetic 2-min WAV in a subprocess with
``JAX_TRANSFER_GUARD=log`` and counts the logged transfers, classified
h2d / d2h. Works on any backend (the guard fires on the CPU client
too), so the census runs without a TPU.

Usage: python tools/census_transfers.py [--minutes 2] [--serving]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_INNER = """
import json, sys
import numpy as np
sys.path.insert(0, {repo!r})

# The environment's sitecustomize force-registers the TPU backend, which
# wins over JAX_PLATFORMS — override in-process (tests/conftest.py note).
if {cpu!r}:
    import jax
    jax.config.update("jax_platforms", "cpu")

from modular_audio_pipeline_tpu import PipelineConfig
from modular_audio_pipeline_tpu.audio_io import write_wav

rng = np.random.default_rng(0)
sr = 16000
minutes = {minutes}
t = np.arange(int(minutes * 60) * sr) / sr
# speech-ish: AM tone bursts + noise floor + leading noise-only second
x = (0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
     * (np.sin(2 * np.pi * 0.15 * t) > 0)).astype(np.float32)
x += 0.01 * rng.standard_normal(len(t)).astype(np.float32)
x[: sr] = 0.01 * rng.standard_normal(sr).astype(np.float32)

wav = {tmp!r} + "/census_input.wav"
write_wav(wav, x, sr)

cfg = PipelineConfig()
cfg.media_dir = {tmp!r}
cfg.temp_dir = {tmp!r} + "/temp"
cfg.results_dir = {tmp!r} + "/results"
cfg.transcription.model = "test-tiny"
if {cpu!r}:
    # XLA CPU's DotThunk rejects bf16 x bf16 (ROADMAP environment note)
    cfg.transcription.compute_type = "float32"
cfg.checkpoint_enabled = False
cfg.__post_init__()

# Two runs: the first warms lazy model loads + compiles (weights
# upload once per process); only the second, steady-state run is counted.
if {serving!r}:
    from modular_audio_pipeline_tpu.serving import ServingPipeline
    sp = ServingPipeline(cfg)
    sp.process(wav)
    print("RUN2_START", file=sys.stderr, flush=True)
    res = sp.process(wav)
    n = len(res.segments)
else:
    from modular_audio_pipeline_tpu.pipeline import AudioPipeline
    pipe = AudioPipeline(cfg)
    r1 = pipe.run(wav)
    assert r1.success, r1.error
    print("RUN2_START", file=sys.stderr, flush=True)
    res = pipe.run(wav)
    n = len(res.segments)
    assert res.success, res.error
print("SEGMENTS", n, file=sys.stderr)
"""


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--minutes", type=float, default=2.0)
    ap.add_argument("--serving", action="store_true")
    ap.add_argument("--backend", choices=("cpu", "tpu"), default="cpu")
    ap.add_argument("--keep-log", action="store_true",
                    help="print the raw transfer log lines")
    args = ap.parse_args()

    repo = str(Path(__file__).resolve().parent.parent)
    with tempfile.TemporaryDirectory() as tmp:
        code = _INNER.format(repo=repo, minutes=args.minutes, tmp=tmp,
                             serving=bool(args.serving),
                             cpu=args.backend == "cpu")
        env = dict(os.environ)
        env["JAX_TRANSFER_GUARD"] = "log"
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            env=env, timeout=3600,
        )
    if proc.returncode != 0:
        print(proc.stderr[-3000:], file=sys.stderr)
        sys.exit(1)

    h2d = d2h = d2d = pre = 0
    lines = []
    started = False
    for ln in proc.stderr.splitlines():
        if "RUN2_START" in ln:
            started = True
            continue
        low = ln.lower()
        if "transfer:" not in low:
            continue
        if not started:
            pre += 1
            continue
        lines.append(ln)
        if "host-to-device" in low:
            h2d += 1
        elif "device-to-host" in low:
            d2h += 1
        elif "device-to-device" in low:
            d2d += 1
    if args.keep_log:
        for ln in lines:
            print(ln, file=sys.stderr)
    seg = re.search(r"SEGMENTS (\d+)", proc.stderr)
    print(json.dumps({
        "path": "serving" if args.serving else "pipeline",
        "backend": args.backend,
        "minutes": args.minutes,
        "h2d": h2d,
        "d2h": d2h,
        "d2d": d2d,
        "round_trips": h2d + d2h,
        "warmup_transfers": pre,
        "segments": int(seg.group(1)) if seg else None,
    }))


if __name__ == "__main__":
    main()
