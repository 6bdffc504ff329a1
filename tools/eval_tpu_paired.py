"""On-TPU decode quality, pinned with per-sentence paired data (VERDICT r3 #4).

Round 3 reported held-out proxy WER 0.21 on CPU but 0.32 (ancestry
kernel) / 0.46 (physical reorder) on TPU, waved off as noise. This
harness produces the per-sentence evidence: each held-out sentence is
decoded through production beam-5 on
  (a) CPU (the recorded reference),
  (b) TPU with the ancestry Pallas kernel (default), and
  (c) TPU with the physical cache reorder,
and the JSON output carries per-sentence WERs plus paired deltas, so
systematic drift separates from beam near-tie noise.

CPU decoding runs in THIS process with the backend forced to CPU is not
possible once the TPU client exists, so the CPU pass runs in a
subprocess (the ROADMAP determinism rule).

Usage: python tools/eval_tpu_paired.py [--weights DIR] [--limit N]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BUNDLE = (
    Path(__file__).resolve().parent.parent
    / "modular_audio_pipeline_tpu/weights/whisper-tiny-synth-proxy"
)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_eval_set(n: int):
    from modular_audio_pipeline_tpu.training.synth_asr import (
        SR, VOCAB, synth_sentence,
    )

    rng = np.random.default_rng(500_000)  # the held-out eval stream
    out = []
    for _ in range(n):
        k = int(rng.integers(12, 27))
        words = rng.integers(0, len(VOCAB), size=k)
        out.append((" ".join(VOCAB[w] for w in words),
                    synth_sentence(list(words), rng)))
    return out, SR


def decode_all(weights: str, ancestry: bool, device: str, limit: int):
    """Per-sentence texts through production beam-5 on this process's
    backend."""
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from modular_audio_pipeline_tpu.models.whisper.config import WHISPER_DIMS
    from modular_audio_pipeline_tpu.models.whisper.convert import load_params
    from modular_audio_pipeline_tpu.models.whisper.decode import (
        DecodeOptions, decode_windows,
    )
    from modular_audio_pipeline_tpu.models.whisper.tokenizer import (
        load_tokenizer,
    )
    from modular_audio_pipeline_tpu.ops.mel import log_mel

    data, sr = build_eval_set(limit)
    dims = WHISPER_DIMS["tiny"]
    dtype = "float32" if device == "cpu" else "bfloat16"
    if device == "cpu":
        params = jax.tree.map(jnp.asarray, load_params(weights, dtype=dtype))
    else:
        # Round-5 finding: the relay can zero UPLOADS too (an all-NUL
        # decode whose d2h checksums verified). Verify the param and
        # window uploads so a corrupted link fails loudly, never as a
        # quietly-degenerate WER number.
        from modular_audio_pipeline_tpu.runtime.integrity import (
            put_verified_tree,
        )

        params = put_verified_tree(
            load_params(weights, dtype=dtype), name="whisper"
        )
    tok = load_tokenizer(weights, dims.n_vocab)
    opts = DecodeOptions(language="en", beam_size=5, max_tokens=128,
                         timestamps=True, kv_int8=True, ancestry=ancestry)

    texts = []
    bs = 8
    win = 30 * sr
    for i in range(0, len(data), bs):
        batch = data[i : i + bs]
        wins = np.zeros((len(batch), win), np.float32)
        for j, (_t, wav) in enumerate(batch):
            wins[j, : min(len(wav), win)] = wav[:win]
        if device == "cpu":
            wins_dev = jnp.asarray(wins)
        else:
            from modular_audio_pipeline_tpu.runtime.integrity import (
                put_verified,
            )

            (wins_dev,) = put_verified([wins], ["windows"])
        mel = log_mel(wins_dev, n_mels=dims.n_mels)
        res = decode_windows(params, dims, tok, mel, opts)
        for j in range(len(batch)):
            toks = [int(t) for t in res.tokens[j]
                    if int(t) < tok.timestamp_begin and int(t) != tok.eot]
            texts.append(tok.decode(toks).strip())
    return [t for t, _ in data], texts


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", default=str(BUNDLE))
    ap.add_argument("--limit", type=int, default=48)
    ap.add_argument("--inner", choices=("cpu", "tpu_anc", "tpu_phys"),
                    default=None)
    args = ap.parse_args()

    if args.inner:
        device = "cpu" if args.inner == "cpu" else "tpu"
        refs, hyps = decode_all(
            args.weights, ancestry=args.inner != "tpu_phys",
            device=device, limit=args.limit,
        )
        print(json.dumps({"refs": refs, "hyps": hyps}))
        return

    from modular_audio_pipeline_tpu.evaluation.metrics import wer

    results = {}
    for mode in ("cpu", "tpu_anc", "tpu_phys"):
        log(f"decoding ({mode})...")
        proc = subprocess.run(
            [sys.executable, __file__, "--weights", args.weights,
             "--limit", str(args.limit), "--inner", mode],
            capture_output=True, text=True, timeout=3600,
        )
        if proc.returncode != 0:
            log(f"{mode} FAILED: {proc.stderr[-400:]}")
            continue
        results[mode] = json.loads(proc.stdout.strip().splitlines()[-1])

    refs = results["cpu"]["refs"]
    per = {m: [wer(r, h)["wer"] for r, h in zip(refs, results[m]["hyps"])]
           for m in results}
    agg = {m: round(float(np.average(
        per[m], weights=[len(r.split()) for r in refs])), 4) for m in per}
    out = {"aggregate_wer": agg, "n_sentences": len(refs)}
    for m in ("tpu_anc", "tpu_phys"):
        if m in per:
            deltas = [round(a - c, 4) for a, c in zip(per[m], per["cpu"])]
            out[f"{m}_minus_cpu"] = {
                "mean": round(float(np.mean(deltas)), 4),
                "n_worse": int(sum(d > 0 for d in deltas)),
                "n_better": int(sum(d < 0 for d in deltas)),
                "n_equal": int(sum(d == 0 for d in deltas)),
                "max_abs": round(float(np.max(np.abs(deltas))), 4),
                "per_sentence": deltas,
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
