"""Training recipes for the learned diarization stack (zero-egress).

The reference delegates diarization to pyannote 3.1's pretrained
segmentation + embedding models (``/root/reference/audio_pipeline/
diarizer.py:104-113``). No checkpoints can be downloaded here, so this
module trains the first-party models on synthetic voices
(:mod:`.voices`):

- :func:`train_embedder` — AAM-softmax speaker classification over a
  seeded population of synthetic speakers; the classifier head is
  discarded and the 192-d unit-norm embedding trunk saved.
- :func:`train_segmentation` — permutation-invariant powerset
  cross-entropy on synthetic overlapping scenes (pyannote-3.1-style
  objective) for :class:`~..models.diarization.segmentation.SegmentationNet`.
- :func:`calibrate_threshold` — sweeps the AHC cut distance on held-out
  synthetic conversations and records the best value in
  ``calibration.json`` next to the embedder checkpoint.

Run offline::

    python -m modular_audio_pipeline_tpu.training.diarization \
        --out ~/.cache/map_tpu --steps 600
"""

from __future__ import annotations

import json
import logging
import time
from functools import partial
from itertools import permutations
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from .voices import SR, sample_voice, synth_conversation, synth_utterance

logger = logging.getLogger(__name__)

__all__ = [
    "train_embedder",
    "train_segmentation",
    "calibrate_threshold",
    "calibrate_single_cutoff",
    "evaluate_der",
]

_SUBSEG = int(1.5 * SR)  # embedder input: 1.5 s, matching diarizer spans


# --------------------------------------------------------------------------
# Embedder: AAM-softmax speaker classification
# --------------------------------------------------------------------------


def _speaker_pool(n_speakers: int, seed: int):
    rng = np.random.default_rng(seed)
    return [sample_voice(rng) for _ in range(n_speakers)], rng


def _embedder_batch(
    voices, rng: np.random.Generator, batch_speakers: int, utts: int,
    augment: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Augmentation mirrors the deployment corruptions: additive noise
    (held-out benchmark uses up to 0.008), random gain, and a low-level
    interfering background speaker (overlapped-speech robustness)."""
    spk_ids = rng.choice(len(voices), size=batch_speakers, replace=False)
    audio = np.zeros((batch_speakers * utts, _SUBSEG), dtype=np.float32)
    labels = np.zeros(batch_speakers * utts, dtype=np.int32)
    i = 0
    for s in spk_ids:
        for _ in range(utts):
            x = synth_utterance(voices[s], 1.5, rng, pause_prob=0.1)
            if augment:
                x = x * rng.uniform(0.4, 1.4)
                if rng.random() < 0.3:  # background speaker at -12..-6 dB
                    other = int(rng.integers(len(voices)))
                    if other != s:
                        bg = synth_utterance(voices[other], 1.5, rng)
                        x = x + rng.uniform(0.25, 0.5) * bg[: len(x)]
                x = x + rng.uniform(0.0, 0.012) * rng.standard_normal(
                    len(x)
                ).astype(np.float32)
            audio[i] = x[:_SUBSEG]
            labels[i] = s
            i += 1
    return audio, labels


def train_embedder(
    out_dir: str,
    n_speakers: int = 192,
    steps: int = 1200,
    batch_speakers: int = 16,
    utts_per_speaker: int = 4,
    lr: float = 1e-3,
    margin: float = 0.3,
    scale: float = 30.0,
    seed: int = 0,
) -> Dict[str, float]:
    """Train ConvEmbedder with additive-angular-margin softmax; save to
    ``out_dir/params.npz``. Returns final train metrics."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.diarization.embedding import ConvEmbedder
    from ..models.whisper.convert import save_params

    voices, rng = _speaker_pool(n_speakers, seed)
    net = ConvEmbedder(seed=seed)

    k = jax.random.PRNGKey(seed + 1)
    params = {
        "net": net.params,
        "cls": jax.random.normal(k, (ConvEmbedder.OUT, n_speakers)) * 0.05,
    }

    tx = optax.adam(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(params)

    def loss_fn(params, audio, labels):
        emb = net._forward(params["net"], audio)  # [B, 192] unit-norm
        w = params["cls"]
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-8)
        cos = emb @ w  # [B, S]
        theta = jnp.arccos(jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7))
        onehot = jax.nn.one_hot(labels, w.shape[1])
        logits = scale * jnp.where(onehot > 0, jnp.cos(theta + margin), cos)
        ce = optax.softmax_cross_entropy(logits, onehot).mean()
        acc = (jnp.argmax(cos, axis=-1) == labels).mean()
        return ce, acc

    @jax.jit
    def step(params, opt_state, audio, labels):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, audio, labels
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    t0 = time.time()
    loss = acc = 0.0
    for i in range(steps):
        audio, labels = _embedder_batch(voices, rng, batch_speakers, utts_per_speaker)
        params, opt_state, loss_d, acc_d = step(
            params, opt_state, jnp.asarray(audio), jnp.asarray(labels)
        )
        if i % 50 == 0 or i == steps - 1:
            loss, acc = float(loss_d), float(acc_d)
            logger.info(
                "embedder step %d/%d loss=%.4f acc=%.3f (%.1fs)",
                i, steps, loss, acc, time.time() - t0,
            )

    host = jax.tree.map(np.asarray, params["net"])
    save_params(host, out_dir)
    logger.info("Saved embedder checkpoint to %s", out_dir)
    return {"loss": loss, "train_acc": acc, "steps": steps}


# --------------------------------------------------------------------------
# Segmentation: permutation-invariant powerset training
# --------------------------------------------------------------------------

_SCENE_S = 10.0
_HOP = SR // 100  # 10 ms label grid, matching the MFCC frontend
_PERMS = list(permutations(range(3)))
# activity triple (a, b, c) -> powerset class id
_CLASS_OF = {
    (0, 0, 0): 0, (1, 0, 0): 1, (0, 1, 0): 2, (0, 0, 1): 3,
    (1, 1, 0): 4, (1, 0, 1): 5, (0, 1, 1): 6,
}


def _synth_scene(
    rng: np.random.Generator, n_frames: int
) -> Tuple[np.ndarray, np.ndarray]:
    """One 10 s scene -> (mix [n], activity [n_frames, 3]).

    1-3 speakers each place 1-3 utterances at random starts; frame labels
    come from per-speaker track energy (so intra-utterance pauses are
    labelled silent, like real annotation)."""
    n = int(_SCENE_S * SR)
    n_spk = int(rng.integers(1, 4))
    tracks = np.zeros((3, n), dtype=np.float32)
    for s in range(n_spk):
        voice = sample_voice(rng)
        for _ in range(int(rng.integers(1, 4))):
            dur = float(rng.uniform(1.0, 4.0))
            start = int(rng.uniform(0.0, max(0.1, _SCENE_S - dur)) * SR)
            utt = synth_utterance(voice, dur, rng)
            tracks[s, start : start + len(utt)] += utt

    mix = tracks.sum(axis=0)
    if rng.random() < 0.5:
        mix = mix + rng.uniform(0.001, 0.01) * rng.standard_normal(n).astype(
            np.float32
        )
    peak = np.abs(mix).max()
    if peak > 0.95:
        mix = mix / peak * 0.95

    # frame activity from track energy on the 10 ms grid
    usable = (n // _HOP) * _HOP
    frame_rms = np.sqrt(
        (tracks[:, :usable] ** 2).reshape(3, -1, _HOP).mean(axis=-1)
    )  # [3, n//hop]
    act = (frame_rms > 0.01).astype(np.int32).T  # [n_frames_raw, 3]
    # trim/pad to the MFCC frame count
    if act.shape[0] >= n_frames:
        act = act[:n_frames]
    else:
        act = np.pad(act, ((0, n_frames - act.shape[0]), (0, 0)))
    # powerset covers <=2 simultaneous speakers: drop the weakest third
    over = act.sum(axis=1) > 2
    if over.any():
        rms_t = frame_rms.T[:n_frames]
        rms_t = np.pad(rms_t, ((0, act.shape[0] - rms_t.shape[0]), (0, 0)))
        weakest = np.argmin(np.where(act > 0, rms_t, np.inf), axis=1)
        act[over, weakest[over]] = 0
    return mix.astype(np.float32), act


def _perm_class_labels(act: np.ndarray) -> np.ndarray:
    """activity [T, 3] -> class labels per permutation [6, T]."""
    out = np.zeros((len(_PERMS), act.shape[0]), dtype=np.int32)
    for pi, perm in enumerate(_PERMS):
        permuted = act[:, list(perm)]
        out[pi] = [_CLASS_OF[tuple(row)] for row in permuted]
    return out


def train_segmentation(
    out_dir: str,
    steps: int = 400,
    batch: int = 8,
    lr: float = 8e-4,
    seed: int = 0,
) -> Dict[str, float]:
    """Train SegmentationNet with permutation-invariant powerset CE; save
    to ``out_dir/params.npz``."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.diarization.features import mfcc_batch
    from ..models.diarization.segmentation import SegmentationNet
    from ..models.whisper.convert import save_params

    rng = np.random.default_rng(seed)
    net = SegmentationNet(seed=seed)
    params = net.params

    # frame count of the MFCC frontend for a 10 s scene
    n = int(_SCENE_S * SR)
    n_frames = (n - int(SR * 0.025)) // _HOP + 1

    tx = optax.adam(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(params)

    features = jax.jit(
        partial(mfcc_batch, sr=SR, n_mfcc=40, n_mels=40)
    )

    def loss_fn(params, mel, perm_labels):
        logits = SegmentationNet.apply(params, mel)  # [B, T, 7]
        logp = jax.nn.log_softmax(logits, axis=-1)
        # CE per permutation: gather target logprob [B, 6, T]
        gathered = jnp.take_along_axis(
            logp[:, None], perm_labels[..., None], axis=-1
        )[..., 0]
        ce = -gathered.mean(axis=-1)  # [B, 6]
        loss = ce.min(axis=-1).mean()  # PIT: best permutation per scene
        best = ce.argmin(axis=-1)
        labels = jnp.take_along_axis(
            perm_labels, best[:, None, None], axis=1
        )[:, 0]
        acc = (logits.argmax(-1) == labels).mean()
        return loss, acc

    @jax.jit
    def step(params, opt_state, mel, perm_labels):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mel, perm_labels
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    t0 = time.time()
    loss = acc = 0.0
    for i in range(steps):
        mixes = np.zeros((batch, n), dtype=np.float32)
        labels = np.zeros((batch, len(_PERMS), n_frames), dtype=np.int32)
        for b in range(batch):
            mix, act = _synth_scene(rng, n_frames)
            mixes[b, : len(mix)] = mix[:n]
            labels[b] = _perm_class_labels(act)
        mel = features(jnp.asarray(mixes))
        params, opt_state, loss_d, acc_d = step(
            params, opt_state, mel, jnp.asarray(labels)
        )
        if i % 50 == 0 or i == steps - 1:
            loss, acc = float(loss_d), float(acc_d)
            logger.info(
                "segmentation step %d/%d loss=%.4f frame_acc=%.3f (%.1fs)",
                i, steps, loss, acc, time.time() - t0,
            )

    save_params(jax.tree.map(np.asarray, params), out_dir)
    logger.info("Saved segmentation checkpoint to %s", out_dir)
    return {"loss": loss, "frame_acc": acc, "steps": steps}


# --------------------------------------------------------------------------
# Threshold calibration + DER evaluation on held-out synthetic speech
# --------------------------------------------------------------------------


def _held_out_conversations(seed: int, count: int = 12):
    """Conversations from voices OUTSIDE the training pool (seed offset),
    1-4 speakers, overlap + noise — the 'hard' synthetic benchmark."""
    rng = np.random.default_rng(seed + 10_000)
    convs = []
    for c in range(count):
        n_spk = int(rng.integers(1, 5))
        voices = [sample_voice(rng) for _ in range(n_spk)]
        n_turns = int(rng.integers(4, 9))
        turns = [
            (int(rng.integers(0, n_spk)), float(rng.uniform(2.0, 5.0)))
            for _ in range(n_turns)
        ]
        audio, truth = synth_conversation(
            voices, turns, rng,
            overlap_prob=0.3, max_overlap_s=1.0,
            noise_level=float(rng.uniform(0.0, 0.008)),
        )
        convs.append((audio, truth, n_spk))
    return convs


def evaluate_der(
    diarizer, tmp_dir: str, seed: int = 0, count: int = 12
) -> float:
    """Mean DER of ``diarizer`` over the held-out synthetic benchmark."""
    from ..audio_io import write_wav
    from ..evaluation import der

    Path(tmp_dir).mkdir(parents=True, exist_ok=True)
    total = 0.0
    for i, (audio, truth, n_spk) in enumerate(
        _held_out_conversations(seed, count)
    ):
        path = str(Path(tmp_dir) / f"cal_{i}.wav")
        write_wav(path, audio, SR)
        hyp = [
            (s.speaker, s.start, s.end)
            for s in diarizer.diarize(path, 1, 5)
        ]
        total += der(truth, hyp)["der"]
    return total / count


def calibrate_single_cutoff(
    weights_dir: str, seed: int = 0, count: int = 6
) -> float:
    """Calibrate the single-speaker homogeneity cutoff for the trained
    embedder: the 90th-pct raw cosine distance separates single-speaker
    recordings (same-voice variation only) from two-speaker ones; pick
    the midpoint and record it in ``calibration.json``.

    Replaces the hard-coded 0.10 in clustering.cluster_embeddings with a
    per-embedder value measured on held-out voices."""
    from scipy.spatial.distance import pdist

    from ..diarizer import SpeakerDiarizer

    diar = SpeakerDiarizer(weights_path=weights_dir, lazy_load=True)
    diar.load_model()
    rng = np.random.default_rng(seed + 20_000)

    def p90(n_spk: int) -> List[float]:
        vals = []
        for _ in range(count):
            voices = [sample_voice(rng) for _ in range(n_spk)]
            turns = [
                (int(rng.integers(0, n_spk)), float(rng.uniform(2.0, 5.0)))
                for _ in range(6)
            ]
            audio, _truth = synth_conversation(
                voices, turns, rng, noise_level=float(rng.uniform(0.0, 0.008))
            )
            spans = diar._subsegments(audio, SR)
            if len(spans) < 3:
                continue
            emb = diar._embed_all(audio, SR, spans)
            d = pdist(emb.astype(np.float64), metric="cosine")
            vals.append(float(np.percentile(d, 90)))
        return vals

    single_hi = max(p90(1) or [0.05])
    multi_lo = min(p90(2) or [0.15])
    if multi_lo > single_hi:
        # 25% of the way up the gap: a false "single" verdict merges all
        # speakers (catastrophic), a false "multi" only splits one voice,
        # so bias toward multi.
        cutoff = single_hi + 0.25 * (multi_lo - single_hi)
    else:  # distributions overlap: stay conservative, just above single
        cutoff = single_hi * 1.05
    cutoff = float(np.clip(cutoff, 0.03, 0.4))
    logger.info(
        "single-speaker cutoff: p90(1spk) max=%.3f, p90(2spk) min=%.3f -> %.3f",
        single_hi, multi_lo, cutoff,
    )

    cal_path = Path(weights_dir) / "calibration.json"
    cal = json.loads(cal_path.read_text()) if cal_path.exists() else {}
    cal["single_speaker_cutoff"] = round(cutoff, 4)
    cal_path.write_text(json.dumps(cal, indent=2))
    return cutoff


def calibrate_threshold(
    weights_dir: str,
    thresholds: Optional[List[float]] = None,
    seed: int = 0,
    tmp_dir: str = "/tmp/map_tpu_calib",
) -> Dict[str, float]:
    """Sweep the AHC cut distance with the trained embedder on held-out
    conversations; write the best to ``weights_dir/calibration.json``."""
    from ..diarizer import SpeakerDiarizer

    thresholds = thresholds or [0.85, 1.0, 1.1, 1.2, 1.3, 1.45]
    best_t, best_der = None, float("inf")
    for t in thresholds:
        diar = SpeakerDiarizer(weights_path=weights_dir, lazy_load=True)
        diar.ahc_threshold = t
        # Two disjoint held-out seed streams: the sweep is noticeably
        # threshold-sensitive, and 12 conversations of one stream is not
        # enough signal to pick a cut that transfers.
        mean_der = 0.5 * (
            evaluate_der(diar, tmp_dir, seed=seed)
            + evaluate_der(diar, tmp_dir, seed=seed + 500)
        )
        logger.info("AHC threshold %.2f -> DER %.3f", t, mean_der)
        if mean_der < best_der:
            best_t, best_der = t, mean_der

    cal_path = Path(weights_dir) / "calibration.json"
    out = json.loads(cal_path.read_text()) if cal_path.exists() else {}
    out.update(ahc_threshold=best_t, held_out_der=round(best_der, 4))
    cal_path.write_text(json.dumps(out, indent=2))
    logger.info("Calibration saved: %s", out)
    return out


def main() -> None:
    import argparse
    import os

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.environ.get(
        "MAP_TPU_WEIGHTS",
        os.path.join(os.path.expanduser("~"), ".cache", "map_tpu"),
    ))
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--seg-steps", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-embedder", action="store_true")
    ap.add_argument("--skip-segmentation", action="store_true")
    ap.add_argument("--skip-calibration", action="store_true")
    args = ap.parse_args()

    emb_dir = os.path.join(args.out, "diarization-embedding")
    seg_dir = os.path.join(args.out, "diarization-segmentation")
    if not args.skip_embedder:
        train_embedder(emb_dir, steps=args.steps, seed=args.seed)
    if not args.skip_segmentation:
        train_segmentation(seg_dir, steps=args.seg_steps, seed=args.seed)
    if not args.skip_calibration:
        # Calibration inference is tiny; run it in a CPU subprocess so the
        # numbers are deterministic and independent of whatever
        # accelerator backend this process trained on (and of chip
        # contention from other jobs).
        import subprocess
        import sys

        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "import logging; logging.basicConfig(level=logging.INFO)\n"
            "from modular_audio_pipeline_tpu.training.diarization import (\n"
            "    calibrate_threshold, calibrate_single_cutoff)\n"
            f"calibrate_threshold({emb_dir!r}, seed={args.seed})\n"
            f"calibrate_single_cutoff({emb_dir!r}, seed={args.seed})\n"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run([sys.executable, "-c", code], env=env, check=True)


if __name__ == "__main__":
    main()
