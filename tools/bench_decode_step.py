"""Beam-decode step-time microbench (the ROADMAP perf lever tracker).

Measures the production decode shape in isolation: large-v3-turbo random
weights, B=16 windows x beam 5 (BK=80), 224-token budget, timestamp
grammar + patience pool, int8 KV cache per the serving default. Reports
wall for the full decode and the derived ms/step (random weights never
EOT, so steps == budget).

Usage: python tools/bench_decode_step.py [--runs 5] [--tokens 224]
       [--no-int8] [--model large-v3-turbo] [--batch 16] [--beam 5]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parent.parent))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--tokens", type=int, default=224)
    ap.add_argument("--model", default="large-v3-turbo")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--no-int8", action="store_true")
    ap.add_argument("--no-ancestry", action="store_true",
                    help="physically permute the KV cache on beam reorder "
                         "(the pre-ancestry baseline path)")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="write a jax.profiler trace of one run to DIR")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from modular_audio_pipeline_tpu.models.whisper import WHISPER_DIMS
    from modular_audio_pipeline_tpu.models.whisper.decode import (
        DecodeOptions,
        decode_windows_async,
        encode_audio_kv,
        finalize_decode,
    )
    from modular_audio_pipeline_tpu.models.whisper.model import init_params
    from modular_audio_pipeline_tpu.models.whisper.tokenizer import (
        load_tokenizer,
    )
    from modular_audio_pipeline_tpu.runtime import enable_persistent_cache

    enable_persistent_cache()
    log(f"devices: {jax.devices()}")

    dims = WHISPER_DIMS[args.model]
    params = init_params(dims, seed=0, dtype=jnp.bfloat16)
    tok = load_tokenizer(None, n_vocab=dims.n_vocab)

    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, dims.n_mels, 3000), dtype=np.float32
        )
    )
    xa_k, xa_v = encode_audio_kv(params, dims, mel)
    xa_k.block_until_ready()

    opts = DecodeOptions(
        beam_size=args.beam,
        max_tokens=args.tokens,
        timestamps=True,
        kv_int8=not args.no_int8,
        ancestry=not args.no_ancestry,
    )

    def run_once() -> float:
        t0 = time.perf_counter()
        pending = decode_windows_async(
            params, dims, tok, None, opts, audio_kv=(xa_k, xa_v)
        )
        finalize_decode(pending)  # host sync via np.asarray fetches
        return time.perf_counter() - t0

    log("warmup (compiles)...")
    t0 = time.perf_counter()
    run_once()
    log(f"warmup {time.perf_counter() - t0:.1f}s")

    if args.profile:
        with jax.profiler.trace(args.profile):
            run_once()
        log(f"trace written to {args.profile}")

    times = []
    for i in range(args.runs):
        dt = run_once()
        times.append(dt)
        log(f"run {i + 1}/{args.runs}: {dt:.3f}s "
            f"({dt / args.tokens * 1000:.2f} ms/step)")

    med = float(np.median(times))
    import json

    print(json.dumps({
        "metric": f"beam_decode_{args.model}_bk{args.batch * args.beam}_"
                  f"{args.tokens}tok" + ("" if args.no_int8 else "_int8kv")
                  + ("" if args.no_ancestry else "_anc"),
        "wall_s": round(med, 3),
        "ms_per_step": round(med / args.tokens * 1000, 3),
    }))


if __name__ == "__main__":
    main()
