"""Zero-egress WER proxy: train Whisper ``test-tiny`` on synthetic
tone-words, then measure WER end-to-end through the real transcriber.

The reference inherits Whisper's WER from pretrained checkpoints
(``/root/reference/audio_pipeline/transcriber.py:165,362-366``); this
environment cannot download them, so the strongest available proof that
the whole model/decode/eval loop produces *learned* text is a scratch
model on a task we can label offline: a 24-word "tone language" where
each word is a deterministic tri-tone audio signature. A model that
transcribes held-out utterances exercises the exact same code path a
converted real checkpoint would (mel -> encoder -> beam decode ->
tokenizer -> WER harness).

Run offline (writes WAVs + manifests, trains, evaluates)::

    python -m modular_audio_pipeline_tpu.training.synth_asr \
        --out modular_audio_pipeline_tpu/weights --epochs 40
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "VOCAB", "synth_word", "make_dataset", "make_longform_dataset",
    "make_midstream_dataset", "train_proxy", "evaluate_wer",
]

SR = 16000

# NATO-style vocabulary: byte-tokenizable, unambiguous after text normalize.
VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
    "golf", "hotel", "india", "juliett", "kilo", "lima",
    "mike", "november", "oscar", "papa", "quebec", "romeo",
    "sierra", "tango", "uniform", "victor", "whiskey", "zulu",
]

_WORD_S = 0.35  # per-word duration
_GAP_S = 0.12  # inter-word gap

# Tone grid: each word w maps to a unique ordered tri-tone
# (f_a, f_b, f_c) drawn from disjoint frequency banks, so signatures are
# separable on an 80-bin mel spectrogram.
_BANK_A = np.array([320.0, 440.0, 600.0, 810.0])
_BANK_B = np.array([1100.0, 1450.0, 1900.0])
_BANK_C = np.array([2500.0, 3200.0])


def _word_freqs(idx: int) -> Tuple[float, float, float]:
    a = _BANK_A[idx % 4]
    b = _BANK_B[(idx // 4) % 3]
    c = _BANK_C[(idx // 12) % 2]
    return float(a), float(b), float(c)


def synth_word(idx: int, rng: np.random.Generator, sr: int = SR) -> np.ndarray:
    """One word token: three sequential tones with speech-like envelope,
    small per-utterance jitter (gain, phase, frequency, noise) so the
    model must generalise rather than memorise waveforms."""
    n = int(_WORD_S * sr)
    seg = n // 3
    t = np.arange(seg) / sr
    out = np.zeros(n, dtype=np.float32)
    for k, f in enumerate(_word_freqs(idx)):
        f = f * rng.uniform(0.985, 1.015)
        tone = np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
        tone += 0.25 * np.sin(2 * np.pi * 2 * f * t + rng.uniform(0, 2 * np.pi))
        env = np.minimum(1.0, np.minimum(np.arange(seg), seg - np.arange(seg)) / (0.01 * sr))
        out[k * seg : (k + 1) * seg] = tone * env
    out *= rng.uniform(0.25, 0.6)
    out += rng.uniform(0.002, 0.01) * rng.standard_normal(n).astype(np.float32)
    return out.astype(np.float32)


def synth_sentence(
    words: List[int], rng: np.random.Generator, sr: int = SR
) -> np.ndarray:
    gap = np.zeros(int(_GAP_S * sr), dtype=np.float32)
    parts: List[np.ndarray] = [np.zeros(int(rng.uniform(0.05, 0.2) * sr), np.float32)]
    for w in words:
        parts.append(synth_word(w, rng, sr))
        parts.append(gap)
    return np.concatenate(parts)


def make_dataset(
    data_dir: str,
    n_train: int = 480,
    n_eval: int = 48,
    min_words: int = 12,
    max_words: int = 26,
    seed: int = 0,
) -> Tuple[str, str]:
    """Write train/eval WAVs + JSONL manifests; returns manifest paths.

    Eval sentences come from a disjoint RNG stream (fresh jitter, unseen
    word orderings)."""
    from ..audio_io import write_wav

    root = Path(data_dir)
    (root / "wav").mkdir(parents=True, exist_ok=True)
    manifests = []
    for split, count, stream in (("train", n_train, 0), ("eval", n_eval, 500_000)):
        rng = np.random.default_rng(seed + stream)
        lines = []
        for i in range(count):
            k = int(rng.integers(min_words, max_words + 1))
            words = rng.integers(0, len(VOCAB), size=k)
            text = " ".join(VOCAB[w] for w in words)
            path = root / "wav" / f"{split}_{i:04d}.wav"
            wave_out = synth_sentence(list(words), rng)
            write_wav(str(path), wave_out, SR)
            lines.append(json.dumps({
                "audio": str(path), "text": text,
                "duration": round(len(wave_out) / SR, 3),
            }))
        mpath = root / f"{split}.jsonl"
        mpath.write_text("\n".join(lines) + "\n")
        manifests.append(str(mpath))
    logger.info("Dataset: %d train / %d eval sentences in %s", n_train, n_eval, root)
    return manifests[0], manifests[1]


def make_longform_dataset(
    data_dir: str,
    n_train: int = 480,
    n_eval: int = 12,
    min_words: int = 8,
    max_words: int = 20,
    seed: int = 0,
) -> Tuple[str, str]:
    """30 s multi-sentence window crops teaching the long-form grammar.

    Whisper learns its seek-loop behaviour from 30 s training crops that
    contain several timestamped segments, sometimes end mid-segment (the
    paper's rule: predict only the straddler's start time), and are
    conditioned on previous text half the time. The single-sentence
    dataset (:func:`make_dataset`) never exercises any of that — round 3's
    proxy therefore free-ran poorly on multi-minute streams (WER 0.71
    batched / 0.91 sequential, VERDICT r3 #3). Each example here:

    - sentences of ``min_words..max_words`` packed with 0.3-0.9 s pauses;
    - ~35 % of windows end after a completed sentence (trailing end
      timestamp -> "whole window consumed" at decode);
    - the rest overflow: the straddling sentence's audio is cropped at
      30 s and the target carries only its start timestamp;
    - 50 % carry a previous-text conditioning prompt (random held-out
      word sequences, loss-masked).
    """
    from ..audio_io import write_wav

    root = Path(data_dir)
    (root / "wav").mkdir(parents=True, exist_ok=True)
    win = 30 * SR
    manifests = []
    for split, count, stream in (("train", n_train, 0), ("eval", n_eval, 500_000)):
        rng = np.random.default_rng(seed + 77_000 + stream)
        lines = []
        for i in range(count):
            parts: List[np.ndarray] = [
                np.zeros(int(rng.uniform(0.05, 0.3) * SR), np.float32)
            ]
            pos = len(parts[0])
            segments: List[Dict[str, float]] = []
            tail_start = None
            while True:
                k = int(rng.integers(min_words, max_words + 1))
                words = rng.integers(0, len(VOCAB), size=k)
                text = " ".join(VOCAB[w] for w in words)
                sent = synth_sentence(list(words), rng)
                start = round(pos / SR / 0.02) * 0.02
                if pos + len(sent) > win:
                    # straddler: crop the audio, predict only its start
                    tail_start = start
                    parts.append(sent[: win - pos])
                    pos = win
                    break
                parts.append(sent)
                end = round((pos + len(sent)) / SR / 0.02) * 0.02
                segments.append({"start": start, "end": end, "text": text})
                pos += len(sent)
                pause = np.zeros(int(rng.uniform(0.3, 0.9) * SR), np.float32)
                if pos + len(pause) >= win:
                    break
                parts.append(pause)
                pos += len(pause)
                if segments and rng.random() < 0.25:
                    break  # completed-final-segment form (trailing end ts)
            audio = np.concatenate(parts)[:win]
            path = root / "wav" / f"lf_{split}_{i:04d}.wav"
            write_wav(str(path), audio, SR)
            prompt = ""
            if rng.random() < 0.5:
                m = int(rng.integers(4, 16))
                prompt = " ".join(
                    VOCAB[w] for w in rng.integers(0, len(VOCAB), size=m)
                )
            lines.append(json.dumps({
                "audio": str(path),
                "text": " ".join(s["text"] for s in segments),
                "duration": round(len(audio) / SR, 3),
                "segments": segments,
                "tail_start": tail_start,
                "prompt": prompt,
            }))
        mpath = root / f"longform_{split}.jsonl"
        mpath.write_text("\n".join(lines) + "\n")
        manifests.append(str(mpath))
    logger.info(
        "Long-form dataset: %d train / %d eval windows in %s",
        n_train, n_eval, root,
    )
    return manifests[0], manifests[1]


def make_midstream_dataset(
    data_dir: str,
    n_train: int = 480,
    n_eval: int = 12,
    min_words: int = 8,
    max_words: int = 20,
    seed: int = 0,
) -> Tuple[str, str]:
    """30 s crops that START mid-stream at arbitrary offsets.

    :func:`make_longform_dataset` windows always begin at a stream
    boundary with a short fresh lead-in — but the windows the production
    paths actually decode do not: the batched fixed-stride path slices
    every subsequent window wherever 30 s lands (often mid-sentence),
    and the seek loop resumes inside an inter-sentence pause. The
    round-4 long-form failure mode (segment merging, then repetition
    collapse past ~2 sentences — VERDICT r4 #2) is exactly the
    distribution this generator covers:

    - each crop is cut from a longer continuous stream at a uniformly
      random offset, so ~60 % begin inside a sentence;
    - a leading PARTIAL sentence is excluded from the target entirely
      (the model must learn to skip un-transcribable audio rather than
      hallucinate — whisper's crop rule for segments that start before
      the window);
    - a straddler at the window end carries only its start timestamp
      (same rule as make_longform_dataset);
    - 50 % of crops carry the TRUE preceding sentences as the
      conditioning prompt — the seek loop passes the actually-decoded
      previous text (condition_on_previous_text), not random words, so
      training with real context teaches the model to use it without
      copying it (the random-word prompts of make_longform_dataset
      train prompt-robustness; both forms are mixed).
    """
    from ..audio_io import write_wav

    root = Path(data_dir)
    (root / "wav").mkdir(parents=True, exist_ok=True)
    win = 30 * SR
    manifests = []
    for split, count, stream in (("train", n_train, 0), ("eval", n_eval, 500_000)):
        rng = np.random.default_rng(seed + 311_000 + stream)
        lines = []
        for i in range(count):
            # Continuous stream ~48-70 s so a 30 s crop can start anywhere
            # in the first ~18-40 s.
            sents: List[Dict[str, object]] = []  # start/end samples + text
            parts: List[np.ndarray] = [
                np.zeros(int(rng.uniform(0.05, 0.3) * SR), np.float32)
            ]
            pos = len(parts[0])
            target_len = int(rng.uniform(48.0, 70.0) * SR)
            while pos < target_len:
                k = int(rng.integers(min_words, max_words + 1))
                words = rng.integers(0, len(VOCAB), size=k)
                text = " ".join(VOCAB[w] for w in words)
                sent = synth_sentence(list(words), rng)
                sents.append({"s": pos, "e": pos + len(sent), "text": text})
                parts.append(sent)
                pos += len(sent)
                pause = np.zeros(int(rng.uniform(0.3, 0.9) * SR), np.float32)
                parts.append(pause)
                pos += len(pause)
            audio_full = np.concatenate(parts)
            crop0 = int(rng.uniform(0, max(1, len(audio_full) - win)))
            audio = audio_full[crop0 : crop0 + win]
            if len(audio) < win:
                audio = np.pad(audio, (0, win - len(audio)))

            segments: List[Dict[str, float]] = []
            tail_start = None
            prev_text: List[str] = []
            for s_ in sents:
                if s_["e"] <= crop0:
                    prev_text.append(str(s_["text"]))
                    continue
                if s_["s"] < crop0:
                    continue  # leading partial: skipped, never transcribed
                start = round((s_["s"] - crop0) / SR / 0.02) * 0.02
                if s_["s"] - crop0 >= win:
                    break
                if s_["e"] - crop0 > win:
                    tail_start = start  # straddles the window end
                    break
                end = round((s_["e"] - crop0) / SR / 0.02) * 0.02
                segments.append({"start": start, "end": end,
                                 "text": str(s_["text"])})

            path = root / "wav" / f"ms_{split}_{i:04d}.wav"
            write_wav(str(path), audio, SR)
            prompt = ""
            if prev_text and rng.random() < 0.5:
                # true context: the most recent sentences, capped at a
                # production-prompt-sized word budget
                prompt = " ".join(" ".join(prev_text[-2:]).split()[-24:])
            lines.append(json.dumps({
                "audio": str(path),
                "text": " ".join(s["text"] for s in segments),
                "duration": 30.0,
                "segments": segments,
                "tail_start": tail_start,
                "prompt": prompt,
            }))
        mpath = root / f"midstream_{split}.jsonl"
        mpath.write_text("\n".join(lines) + "\n")
        manifests.append(str(mpath))
    logger.info(
        "Mid-stream dataset: %d train / %d eval crops in %s",
        n_train, n_eval, root,
    )
    return manifests[0], manifests[1]


def train_proxy(
    manifest: str,
    out_dir: str,
    epochs: int = 40,
    batch_size: int = 16,
    seq_len: int = 192,
    lr: float = 3e-4,
    seed: int = 0,
    model_name: str = "tiny",
    save_dtype: str = "float16",
    init_from: Optional[str] = None,  # checkpoint dir: fine-tune instead
) -> Dict[str, float]:
    """Train ``model_name`` from scratch on the manifest; save the
    checkpoint (transcriber-loadable ``params.npz``) to ``out_dir``.

    Round-2's 2-layer d=64 ``test-tiny`` proxy reached teacher-forced
    loss 0.03 but free-ran poorly (WER 0.878 — exposure bias on long
    sentences); the real 4-layer d=384 "tiny" dims close that gap
    (VERDICT r2 item 1)."""
    import jax
    import optax

    from ..models.whisper.config import WHISPER_DIMS
    from ..models.whisper.convert import save_params
    from ..transcriber import JaxWhisperBackend
    from .data import TranscriptDataset
    from .whisper_train import make_train_step

    backend = JaxWhisperBackend(
        model_name,
        weights_path=init_from if init_from else f"random:{seed}",
        compute_dtype="float32",
    )
    backend.load()
    dims = WHISPER_DIMS[model_name]
    # Timestamp-grammar training: the production decoder forces the
    # first generated token to be a timestamp (whisper's rule), so the
    # proxy model must be trained on the same format.
    dataset = TranscriptDataset.from_manifest(
        manifest, backend.tokenizer, dims,
        language="en", batch_size=batch_size, seq_len=seq_len,
        timestamps=True, cache_mels=True,
    )

    steps_per_epoch = len(dataset)  # __len__ = number of batches
    total_steps = epochs * steps_per_epoch
    warmup = min(100, total_steps // 10)
    schedule = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, total_steps)
    init_state, train_step = make_train_step(
        dims, optimizer=optax.adamw(schedule, weight_decay=0.01)
    )
    state = init_state(backend.params)
    step = jax.jit(train_step, donate_argnums=(0,))

    t0 = time.time()
    mean_loss = float("nan")
    for epoch in range(epochs):
        losses = []
        for mel, tokens, targets in dataset.batches(epoch=epoch):
            state, loss = step(state, mel, tokens, targets)
            losses.append(float(loss))
        mean_loss = float(np.mean(losses))
        if epoch % 5 == 0 or epoch == epochs - 1:
            logger.info(
                "epoch %d/%d mean loss %.4f (%.1fs)",
                epoch, epochs, mean_loss, time.time() - t0,
            )

    cast = np.float16 if save_dtype == "float16" else np.float32
    host = jax.tree.map(
        lambda x: np.asarray(x).astype(cast)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else np.asarray(x),
        state.params,
    )
    save_params(host, out_dir)
    # Mark the checkpoint as byte-tokenized so load_tokenizer picks the
    # byte-identity tokenizer deliberately (it's what training used).
    (Path(out_dir) / "byte_tokenizer.json").write_text(
        json.dumps({"tokenizer": "byte-identity", "trained_on": "synth_asr"})
    )
    logger.info("Saved WER-proxy checkpoint to %s", out_dir)
    return {"final_loss": mean_loss, "epochs": epochs}


def evaluate_wer(
    weights_dir: str,
    eval_manifest: str,
    beam_size: int = 5,
    limit: Optional[int] = None,
    model_name: str = "tiny",
) -> Dict[str, float]:
    """Decode held-out WAVs through the production transcriber path
    (batched windows, beam search, fallback ladder) and aggregate WER.

    Also counts zero-length segments (``end <= start``) — the round-2
    beam failure mode was degenerate zero-length timestamp pairs; a
    healthy checkpoint must produce none (VERDICT r2 item 1)."""
    from ..evaluation.metrics import wer
    from ..transcriber import WhisperTranscriber

    tr = WhisperTranscriber(
        model_name=model_name, language="en", beam_size=beam_size,
        weights_path=weights_dir, word_timestamps=False,
    )

    examples = [
        json.loads(line)
        for line in Path(eval_manifest).read_text().splitlines()
        if line.strip()
    ]
    if limit:
        examples = examples[:limit]

    total_words = 0
    total_errs = 0.0
    zero_len = 0
    n_segments = 0
    for ex in examples:
        out = tr.transcribe(ex["audio"])
        m = wer(ex["text"], out.get("text", ""))
        total_words += m["ref_words"]
        total_errs += m["wer"] * m["ref_words"]
        for seg in out.get("segments", []):
            n_segments += 1
            if seg["end"] <= seg["start"]:
                zero_len += 1
    score = total_errs / max(total_words, 1)
    logger.info(
        "WER %.4f over %d sentences (%d ref words, %d/%d zero-length segments)",
        score, len(examples), total_words, zero_len, n_segments,
    )
    return {
        "wer": round(score, 4),
        "sentences": len(examples),
        "ref_words": total_words,
        "segments": n_segments,
        "zero_length_segments": zero_len,
    }


def main() -> None:
    import argparse
    import os

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.environ.get(
        "MAP_TPU_WEIGHTS",
        os.path.join(os.path.expanduser("~"), ".cache", "map_tpu"),
    ))
    ap.add_argument("--data-dir", default="/tmp/map_tpu_synth_asr")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--n-train", type=int, default=960)
    ap.add_argument("--n-eval", type=int, default=48)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--model", default="tiny",
        help="whisper dims to train (tiny = the real 4-layer d=384 dims)",
    )
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--init-from", default=None,
                    help="fine-tune from an existing checkpoint dir "
                    "instead of random init")
    ap.add_argument("--beam-size", type=int, default=5)
    ap.add_argument(
        "--longform", action="store_true",
        help="mix 30 s multi-sentence crops into training so the model "
        "learns whisper's long-form grammar (segment pairs, straddler "
        "start-only timestamps, previous-text conditioning)",
    )
    ap.add_argument("--n-longform", type=int, default=480)
    ap.add_argument(
        "--midstream", action="store_true",
        help="also mix 30 s crops that start mid-stream at arbitrary "
        "offsets (leading partial sentences skipped, true-context "
        "conditioning prompts) — the distribution the batched "
        "fixed-stride and mid-file seek windows actually see",
    )
    ap.add_argument("--n-midstream", type=int, default=480)
    args = ap.parse_args()

    # distinct bundle name so a user's real converted whisper-tiny is
    # never shadowed by the synthetic proxy
    bundle = (
        "whisper-test-tiny"
        if args.model == "test-tiny"
        else f"whisper-{args.model}-synth-proxy"
    )
    dst = str(Path(args.out) / bundle)
    train_m, eval_m = make_dataset(
        args.data_dir, n_train=args.n_train, n_eval=args.n_eval, seed=args.seed
    )
    seq_len = 192
    extra_parts = []
    if args.longform:
        lf_train, _lf_eval = make_longform_dataset(
            args.data_dir, n_train=args.n_longform, seed=args.seed
        )
        extra_parts.append(Path(lf_train).read_text())
    if args.midstream:
        ms_train, _ms_eval = make_midstream_dataset(
            args.data_dir, n_train=args.n_midstream, seed=args.seed
        )
        extra_parts.append(Path(ms_train).read_text())
    if extra_parts:
        mixed = Path(args.data_dir) / "train_mixed.jsonl"
        mixed.write_text(Path(train_m).read_text() + "".join(extra_parts))
        train_m = str(mixed)
        seq_len = 448  # byte tokenizer: multi-sentence windows + prompts
    if not args.eval_only:
        train_proxy(
            train_m, dst, epochs=args.epochs, lr=args.lr, seed=args.seed,
            model_name=args.model, batch_size=args.batch_size,
            seq_len=seq_len, init_from=args.init_from,
        )
    print(json.dumps(evaluate_wer(
        dst, eval_m, model_name=args.model, beam_size=args.beam_size
    )))


if __name__ == "__main__":
    main()
