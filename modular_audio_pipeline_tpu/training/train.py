"""Whisper fine-tuning driver.

    python -m modular_audio_pipeline_tpu.training.train \
        --manifest train.jsonl --model tiny --weights ~/.cache/map_tpu/whisper-tiny \
        --out ./finetuned --epochs 3 --batch-size 8 [--devices 8 --tp 2]

Runs the DP(xTP) train step from :mod:`.whisper_train` over
:class:`.data.TranscriptDataset`; checkpoints land as the same
``params.npz`` format the transcriber loads, so a fine-tuned model drops
straight into the pipeline via ``--weights-dir``.
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np

logger = logging.getLogger(__name__)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--manifest", required=True, help="JSONL: {audio, text} per line")
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--weights", default=None,
                    help="initial checkpoint dir ('random:SEED' to train from scratch)")
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    ap.add_argument("--language", default="en")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=224)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--devices", type=int, default=0, help="mesh size (0 = all)")
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel degree")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..config import TPUConfig
    from ..models.whisper.config import WHISPER_DIMS
    from ..models.whisper.convert import save_params
    from ..parallel.mesh import build_mesh
    from ..parallel.sharding import shard_params
    from ..runtime import enable_persistent_cache
    from ..transcriber import JaxWhisperBackend
    from . import make_train_step
    from .data import TranscriptDataset

    enable_persistent_cache()

    backend = JaxWhisperBackend(
        args.model, language=args.language,
        weights_path=args.weights, compute_dtype="float32",
    )
    backend.load()
    dims = WHISPER_DIMS[args.model]

    dataset = TranscriptDataset.from_manifest(
        args.manifest, backend.tokenizer, dims,
        language=args.language, batch_size=args.batch_size, seq_len=args.seq_len,
    )

    n_dev = args.devices or len(jax.devices())
    data_par = max(1, n_dev // args.tp)
    mesh = build_mesh(TPUConfig(mesh_shape={"data": data_par, "model": args.tp}))

    with mesh:
        params = shard_params(backend.params, mesh)
        init_state, train_step = make_train_step(
            dims, optimizer=optax.adamw(args.lr, weight_decay=0.01)
        )
        state = init_state(params)
        step = jax.jit(train_step, donate_argnums=(0,))

        mel_sh = NamedSharding(mesh, P("data", None, None))
        tok_sh = NamedSharding(mesh, P("data", None))

        global_step = 0
        for epoch in range(args.epochs):
            t0 = time.perf_counter()
            losses = []
            for mel, tokens, targets in dataset.batches(epoch=epoch):
                # pad the batch to the data axis (padded rows are fully
                # masked via IGNORE_INDEX, so they contribute zero loss)
                pad = (-mel.shape[0]) % data_par
                if pad:
                    from .whisper_train import IGNORE_INDEX

                    mel = np.concatenate(
                        [mel, np.zeros((pad,) + mel.shape[1:], mel.dtype)]
                    )
                    tokens = np.concatenate(
                        [tokens, np.zeros((pad,) + tokens.shape[1:], tokens.dtype)]
                    )
                    targets = np.concatenate(
                        [targets,
                         np.full((pad,) + targets.shape[1:], IGNORE_INDEX,
                                 targets.dtype)]
                    )
                state, loss = step(
                    state,
                    jax.device_put(mel, mel_sh),
                    jax.device_put(tokens, tok_sh),
                    jax.device_put(targets, tok_sh),
                )
                losses.append(float(loss))
                global_step += 1
                if global_step % 50 == 0:
                    logger.info("step %d loss %.4f", global_step, losses[-1])
            logger.info(
                "epoch %d: mean loss %.4f (%.1fs)",
                epoch, float(np.mean(losses)), time.perf_counter() - t0,
            )

        host_params = jax.tree.map(np.asarray, state.params)
        save_params(host_params, args.out)
        logger.info("Saved fine-tuned checkpoint to %s", args.out)


if __name__ == "__main__":
    main()
