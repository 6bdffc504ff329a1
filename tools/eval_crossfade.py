"""Measure the serving path's cut-point crossfade divergence (VERDICT r3 #4).

The reference crossfades 20 ms at every silence cut
(``/root/reference/audio_pipeline/preprocessor.py:349-358``); the
device-resident serving gather skips them (hard cuts on a 1 ms block
grid, ``serving.py`` divergence list). This harness quantifies the
assertion "inaudible to ASR": synthesize long-form held-out streams with
real silence gaps, strip silence two ways from the SAME detected ranges —
(a) 20 ms linear crossfades (stage-by-stage semantics) and (b) hard cuts
(serving semantics) — decode both through the production batched beam
path on the trained proxy checkpoint, and report paired WERs.

Run on CPU for deterministic numbers::

    JAX_PLATFORMS=cpu python tools/eval_crossfade.py --minutes 2 --streams 3
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.eval_longform import BUNDLE, make_stream  # noqa: E402


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def strip_silence(x: np.ndarray, sr: int, crossfade_ms: int) -> np.ndarray:
    """remove_silence's exact chunk construction with a chosen crossfade."""
    from modular_audio_pipeline_tpu.ops.silence import (
        _FULL_SCALE,
        _crossfade_concat,
        detect_nonsilent_ranges,
    )

    spms = sr // 1000
    seg_len_ms = len(x) // spms
    sq = np.square(x.astype(np.float64) * _FULL_SCALE)
    mean_sq = sq.mean() if len(sq) else 0.0
    clip_dbfs = (
        10.0 * np.log10(mean_sq / _FULL_SCALE**2) if mean_sq > 0 else -np.inf
    )
    ranges = detect_nonsilent_ranges(x, sr, 250, clip_dbfs - 40.0)
    if not ranges:
        return x
    chunks, xfs = [], []
    for i, (start_ms, end_ms) in enumerate(ranges):
        s = max(0, start_ms - 100)
        e = min(seg_len_ms, end_ms + 100)
        chunks.append(x[s * spms : e * spms])
        if i:
            xfs.append(crossfade_ms)
    return _crossfade_concat(chunks, xfs, sr)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--minutes", type=float, default=2.0)
    ap.add_argument("--streams", type=int, default=3)
    ap.add_argument("--beam", type=int, default=5)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from modular_audio_pipeline_tpu.evaluation.metrics import wer
    from modular_audio_pipeline_tpu.training.synth_asr import SR
    from modular_audio_pipeline_tpu.transcriber import WhisperTranscriber

    rng = np.random.default_rng(910_000)
    tr = WhisperTranscriber(
        model_name="tiny", language="en", beam_size=args.beam,
        weights_path=str(BUNDLE), word_timestamps=False,
        max_decode_tokens=224,
    )
    tr._backend.compute_dtype = "float32"  # CPU DotThunk rejects bf16

    rows = []
    for i in range(args.streams):
        audio, text, _starts = make_stream(args.minutes, rng)
        pair = {}
        for name, xf in (("crossfade_20ms", 20), ("hard_cut", 0)):
            stripped = strip_silence(audio, SR, xf)
            out = tr._backend.transcribe_array(stripped, SR)
            pair[name] = wer(text, out.get("text", ""))["wer"]
        rows.append(pair)
        log(f"stream {i}: crossfade={pair['crossfade_20ms']:.4f} "
            f"hard={pair['hard_cut']:.4f}")

    agg = {
        k: round(float(np.mean([r[k] for r in rows])), 4)
        for k in rows[0]
    }
    agg["max_abs_delta"] = round(
        max(abs(r["crossfade_20ms"] - r["hard_cut"]) for r in rows), 4
    )
    print(json.dumps({"minutes": args.minutes, "streams": args.streams,
                      "beam": args.beam, **agg}))


if __name__ == "__main__":
    main()
