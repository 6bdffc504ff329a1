"""Long-form WER proxy through the production windowed decode paths.

VERDICT r3 #3: the single-sentence proxy eval never exercised the
multi-window paths every real file takes. This harness synthesizes
multi-minute streams of held-out tone-language sentences (same
generator as training/synth_asr, disjoint RNG stream), decodes them
through BOTH production paths of ``WhisperTranscriber.transcribe`` —
the batched fixed-window path (serving default) and the sequential
seek loop (whisper's transcribe loop: seek advance by last timestamp,
condition-on-previous-text, temperature ladder armed) — and reports
WER + cross-window timestamp monotonicity.

Run on CPU for deterministic numbers (ROADMAP environment note)::

    JAX_PLATFORMS=cpu python tools/eval_longform.py --minutes 2.5 --streams 3
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BUNDLE = (
    Path(__file__).resolve().parent.parent
    / "modular_audio_pipeline_tpu/weights/whisper-tiny-synth-proxy"
)
SEED_STREAM = 900_000  # disjoint from train (0) and single-sentence eval (500k)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_stream(minutes: float, rng: np.random.Generator,
                min_words: int = 12, max_words: int = 26):
    """Concatenated held-out sentences with inter-sentence pauses.

    Returns (audio, truth_text, sentence_starts_s)."""
    from modular_audio_pipeline_tpu.training.synth_asr import (
        SR, VOCAB, synth_sentence,
    )

    target = minutes * 60.0 * SR
    parts, words_all, starts = [], [], []
    pos = 0
    while pos < target:
        k = int(rng.integers(min_words, max_words + 1))
        words = rng.integers(0, len(VOCAB), size=k)
        sent = synth_sentence(list(words), rng)
        pause = np.zeros(int(rng.uniform(0.4, 0.9) * SR), np.float32)
        starts.append(pos / SR)
        parts.extend([sent, pause])
        words_all.extend(VOCAB[w] for w in words)
        pos += len(sent) + len(pause)
    return np.concatenate(parts), " ".join(words_all), starts


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--minutes", type=float, default=2.5)
    ap.add_argument("--streams", type=int, default=3)
    ap.add_argument("--paths", default="batched,sequential")
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--weights", default=str(BUNDLE))
    ap.add_argument("--model", default="tiny",
                    help="whisper dims of the proxy under test (a base-dims "
                    "proxy is the VERDICT r4 #2 capacity lever)")
    ap.add_argument("--min-words", type=int, default=8)
    ap.add_argument("--max-words", type=int, default=20,
                    help="long-form sentence lengths; default matches the "
                    "long-form training crops (make_longform_dataset)")
    ap.add_argument("--max-tokens", type=int, default=440,
                    help="decode budget; byte tokens need ~7/word, so a "
                    "full 30 s window of tone-words runs past 224")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from modular_audio_pipeline_tpu.audio_io import write_wav
    from modular_audio_pipeline_tpu.evaluation.metrics import wer
    from modular_audio_pipeline_tpu.training.synth_asr import SR
    from modular_audio_pipeline_tpu.transcriber import WhisperTranscriber

    import tempfile

    rng = np.random.default_rng(SEED_STREAM)
    streams = [
        make_stream(args.minutes, rng, args.min_words, args.max_words)
        for _ in range(args.streams)
    ]
    tmp = tempfile.mkdtemp(prefix="longform_")
    paths = []
    for i, (audio, _text, _st) in enumerate(streams):
        p = f"{tmp}/stream_{i}.wav"
        write_wav(p, audio, SR)
        paths.append(p)
    log(f"{args.streams} streams of ~{args.minutes} min written to {tmp}")

    results = {}
    for mode in args.paths.split(","):
        tr = WhisperTranscriber(
            model_name=args.model,
            language="en",
            beam_size=args.beam,
            weights_path=args.weights,
            word_timestamps=False,
            max_decode_tokens=args.max_tokens,
        )
        tr._backend.chunking = mode
        # XLA CPU's DotThunk rejects bf16 x bf16 at batched shapes
        tr._backend.compute_dtype = "float32"
        if mode == "sequential":
            # conditioning prompt + budget must fit n_text_ctx (448)
            tr._backend.max_decode_tokens = min(args.max_tokens, 216)
        total_w, total_e, mono_ok = 0, 0.0, True
        t0 = time.perf_counter()
        for p, (audio, text, _st) in zip(paths, streams):
            out = tr.transcribe(p)
            m = wer(text, out.get("text", ""))
            total_w += m["ref_words"]
            total_e += m["wer"] * m["ref_words"]
            segs = out["segments"]
            for a, b in zip(segs, segs[1:]):
                if b["start"] < a["start"] - 1e-6:
                    mono_ok = False
            last_end = max((s["end"] for s in segs), default=0.0)
            log(f"  [{mode}] {Path(p).name}: wer={m['wer']:.3f} "
                f"segs={len(segs)} last_end={last_end:.1f}s "
                f"dur={len(audio)/SR:.1f}s")
        results[mode] = {
            "wer": round(total_e / max(total_w, 1), 4),
            "ref_words": total_w,
            "monotonic": mono_ok,
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        log(f"[{mode}] aggregate WER {results[mode]['wer']:.4f} "
            f"over {total_w} words, monotonic={mono_ok}")

    print(json.dumps({"minutes": args.minutes, "streams": args.streams,
                      "beam": args.beam, **results}))


if __name__ == "__main__":
    main()
