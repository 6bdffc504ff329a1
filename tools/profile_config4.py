"""Per-phase wall profile of BASELINE config 4 (large-v3 + auto separation).

Times each phase of the serving path separately on the live chip so the
next perf lever is chosen from data, not guesswork:

  music-analyze | separation | DSP+gain | gather | per-batch (mel,
  encoder-KV, decode, align) | total

Usage: python tools/profile_config4.py [--runs 2] [--compute-type int8]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from tools.bench_configs import build, log  # noqa: E402

SR = 16000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--compute-type", default=None)
    args = ap.parse_args()

    import jax

    from modular_audio_pipeline_tpu.runtime import enable_persistent_cache
    from modular_audio_pipeline_tpu.serving import ServingPipeline

    enable_persistent_cache()
    log(f"devices: {jax.devices()}")

    cfg, audio, label = build(4)
    if args.compute_type:
        cfg.transcription.compute_type = args.compute_type
    pipe = ServingPipeline(cfg)
    pipe.backend.load()

    # Phase A: music analysis + separation, timed on their own. Mirror
    # serving's resolution (ADVICE r3): device MaskUNet when a checkpoint
    # exists, host backend otherwise — so the reported phase is the one
    # config 4 actually pays.
    import jax.numpy as jnp

    from modular_audio_pipeline_tpu.ops.music import analyze_audio_content
    from modular_audio_pipeline_tpu.separator import (
        get_device_separation,
        get_separation_backend,
    )

    dev_net = get_device_separation(cfg.vocal_separation.model)
    sep_fn = None if dev_net is not None else get_separation_backend(
        cfg.vocal_separation.model
    )
    for run in range(args.runs + 1):  # +1 warmup
        tag = "warmup" if run == 0 else f"run {run}"
        t0 = time.perf_counter()
        analysis = analyze_audio_content(audio, SR)
        t1 = time.perf_counter()
        chunk = int(cfg.vocal_separation.chunk_minutes * 60 * SR)
        chunk = max(min(chunk, len(audio)), 1)
        if dev_net is not None:
            dev = jnp.asarray(audio)
            pieces = []
            for s in range(0, len(audio), chunk):
                seg = dev[s : s + chunk]
                if seg.shape[0] < chunk:
                    seg = jnp.pad(seg, (0, chunk - seg.shape[0]))
                pieces.append(dev_net.separate_device(seg))
            out = jnp.concatenate(pieces)[: len(audio)]
            out.block_until_ready()
            vocals = np.asarray(out)
        else:
            vocals = np.concatenate(
                [sep_fn(audio[s : s + chunk], SR)[0]
                 for s in range(0, len(audio), chunk)]
            ).astype(np.float32)
        t2 = time.perf_counter()
        log(f"[{tag}] analyze {t1 - t0:.2f}s  separation {t2 - t1:.2f}s"
            f"  (device={dev_net is not None},"
            f" has_music={analysis.get('has_music')})")

    # Phase B: the rest of the serving path with separation pre-applied
    cfg.vocal_separation.enabled = False
    pipe2 = ServingPipeline(cfg)
    pipe2.backend.load()

    # monkey-time the decode internals by running process() under a
    # phase-tagged tracer: wrap log_mel / encode_audio_kv / decode fns
    from modular_audio_pipeline_tpu.models.whisper import decode as dec

    acc = {}

    def timed(name, fn, sync=None):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            if sync is not None:
                sync(out)
            acc[name] = acc.get(name, 0.0) + time.perf_counter() - t0
            return out
        return wrap

    import jax.numpy as jnp

    orig = (dec.decode_windows_async, dec.finalize_decode, dec.encode_audio_kv)

    def block(x):
        jax.tree_util.tree_map(
            lambda y: y.block_until_ready() if hasattr(y, "block_until_ready") else y,
            x,
        )

    for run in range(args.runs + 1):
        acc.clear()
        dec.decode_windows_async = timed("decode_launch", orig[0])
        serving_mod_finalize = timed("decode_wait", orig[1])
        dec.finalize_decode = serving_mod_finalize
        dec.encode_audio_kv = timed("encoder_kv", orig[2], sync=block)
        t0 = time.perf_counter()
        out = pipe2.process(vocals, SR)
        total = time.perf_counter() - t0
        dec.decode_windows_async, dec.finalize_decode, dec.encode_audio_kv = orig
        tag = "warmup" if run == 0 else f"run {run}"
        other = total - sum(acc.values())
        log(f"[{tag}] total {total:.2f}s  "
            + "  ".join(f"{k} {v:.2f}s" for k, v in sorted(acc.items()))
            + f"  other(dsp+gather+align+host) {other:.2f}s"
            + f"  segments={len(out['segments'])}")


if __name__ == "__main__":
    main()
