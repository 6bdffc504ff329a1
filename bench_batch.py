"""BASELINE config 5: 50x1-hr multi-speaker batch with interrupt/resume.

Synthesizes N speech-like hour-long WAVs, runs the checkpointed serving
batch driver (``main.py --batch --serving``) in a subprocess, SIGINTs it
mid-run, then reruns to completion — measuring aggregate throughput
(audio-hours per wall-hour per chip) and asserting resume correctness
(completed files are skipped, the remainder processes cleanly).

    python bench_batch.py [--files 50] [--minutes 60] [--interrupt-after 15]

Prints one JSON line with the aggregate metric; detail goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

SR = 16000
BASELINE_RTF = 50.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def synth_file(path: Path, minutes: float, seed: int) -> None:
    """Speech-like multi-speaker hour: alternating voiced turns + pauses,
    written chunk-wise as mono 16-bit PCM (memory stays bounded)."""
    import wave

    rng = np.random.default_rng(seed)
    total = int(minutes * 60 * SR)
    chunk = 60 * SR  # 1-minute generation blocks
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        written = 0
        while written < total:
            n = min(chunk, total - written)
            t = (np.arange(n) + written) / SR
            # per-minute "speaker": distinct f0 register + prosody rates
            f0 = rng.uniform(100, 250) + 40 * np.sin(2 * np.pi * rng.uniform(0.2, 0.8) * t)
            sig = sum(
                (0.3 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / SR)
                for k in range(1, 5)
            )
            env = (np.sin(2 * np.pi * rng.uniform(0.8, 1.6) * t) > -0.5).astype(np.float32)
            out = (sig * env * 0.3).astype(np.float32)
            out += 0.002 * rng.standard_normal(n).astype(np.float32)
            w.writeframes(
                np.clip(out * 32768.0, -32768, 32767).astype("<i2").tobytes()
            )
            written += n


def count_done(status_path: Path) -> int:
    if not status_path.exists():
        return 0
    try:
        ledger = json.loads(status_path.read_text())
    except Exception:
        return 0
    return sum(1 for v in ledger.values() if v.get("success"))


def run_batch(media_dir: Path, results_dir: Path, model: str,
              interrupt_after: int | None) -> dict:
    """One driver invocation; optionally SIGINT once N files complete."""
    cmd = [
        sys.executable, "main.py", "--batch", "--serving",
        "--media-dir", str(media_dir), "--output-dir", str(results_dir),
        "--model", model, "--weights-dir", "random:0", "--language", "en",
        "--no-cleanup", "--verbose",
    ]
    env = dict(os.environ, MAP_TPU_ALLOW_RANDOM_WEIGHTS="1")
    t0 = time.perf_counter()
    proc = subprocess.Popen(cmd, env=env, cwd=os.path.dirname(os.path.abspath(__file__)))
    status_path = results_dir / "batch_status.json"
    interrupted = False
    while proc.poll() is None:
        time.sleep(2.0)
        if interrupt_after is not None and not interrupted:
            done = count_done(status_path)
            if done >= interrupt_after:
                log(f"--- SIGINT after {done} completed files ---")
                proc.send_signal(signal.SIGINT)
                interrupted = True
    wall = time.perf_counter() - t0
    return {"rc": proc.returncode, "wall_s": wall,
            "done": count_done(status_path), "interrupted": interrupted}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--files", type=int, default=50)
    ap.add_argument("--minutes", type=float, default=60.0)
    ap.add_argument("--interrupt-after", type=int, default=15)
    ap.add_argument("--model", default="large-v3-turbo")
    ap.add_argument("--media-dir", default="/tmp/bench_batch_media")
    ap.add_argument("--results-dir", default="/tmp/bench_batch_results")
    ap.add_argument("--fresh", action="store_true",
                    help="regenerate WAVs and clear the ledger")
    args = ap.parse_args()

    media = Path(args.media_dir)
    results = Path(args.results_dir)
    media.mkdir(parents=True, exist_ok=True)
    if args.fresh and results.exists():
        import shutil

        shutil.rmtree(results)
    results.mkdir(parents=True, exist_ok=True)

    log(f"synthesizing {args.files} x {args.minutes:.0f}-min WAVs in {media} ...")
    t0 = time.perf_counter()
    for i in range(args.files):
        path = media / f"meeting_{i:03d}.wav"
        expected = 44 + 2 * int(args.minutes * 60 * SR)
        if args.fresh or not path.exists() or path.stat().st_size != expected:
            synth_file(path, args.minutes, seed=i)
    log(f"dataset ready in {time.perf_counter() - t0:.0f}s")

    audio_hours = args.files * args.minutes / 60.0

    # Phase 1: run until ~1/3 done, then Ctrl-C.
    p1 = run_batch(media, results, args.model, args.interrupt_after)
    log(f"phase 1 (interrupted): {p1}")
    done_after_interrupt = p1["done"]

    # Phase 2: resume to completion.
    p2 = run_batch(media, results, args.model, None)
    log(f"phase 2 (resume): {p2}")

    total_done = p2["done"]
    resume_ok = (
        p2["rc"] == 0
        and total_done == args.files
        and 0 < done_after_interrupt < args.files
    )

    total_wall = p1["wall_s"] + p2["wall_s"]
    rtf = audio_hours * 3600.0 / total_wall
    print(json.dumps({
        "metric": f"batch_{args.files}x{args.minutes:.0f}min_serving_rtf_{args.model}",
        "value": round(rtf, 2),
        "unit": "audio_hours_per_hour_per_chip",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
        "files": args.files,
        "done_at_interrupt": done_after_interrupt,
        "resume_ok": resume_ok,
        "wall_s": round(total_wall, 1),
    }))


if __name__ == "__main__":
    main()
