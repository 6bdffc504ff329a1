"""Speaker embeddings.

Two extractors with one interface (``embed(subsegments [B, N]) -> [B, D]``):

- :class:`StatsEmbedder` — weight-free: per-subsegment MFCC mean/std
  statistics (+ deltas), L2-normalised. Classic speaker-clustering
  features; works with no checkpoint, which matters in this zero-egress
  environment.
- :class:`ConvEmbedder` — x-vector-style conv net over MFCCs with
  statistics pooling, for converted-checkpoint quality parity with
  pyannote's embedding model (reference ``diarizer.py:109-113``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .features import mfcc_batch

__all__ = ["StatsEmbedder", "ConvEmbedder"]


class StatsEmbedder:
    """MFCC mean/std/delta statistics, L2-normalised."""

    def __init__(self, sr: int = 16000, n_mfcc: int = 20):
        self.sr = sr
        self.n_mfcc = n_mfcc
        self._embed = jax.jit(partial(self._embed_impl, sr=sr, n_mfcc=n_mfcc))

    @staticmethod
    def _embed_impl(audio: jnp.ndarray, sr: int, n_mfcc: int) -> jnp.ndarray:
        m = mfcc_batch(audio, sr=sr, n_mfcc=n_mfcc)  # [B, T, K]
        # drop c0 (energy — captures loudness, not voice identity)
        m = m[..., 1:]
        delta = m[:, 1:] - m[:, :-1]
        feats = [
            jnp.mean(m, axis=1),
            jnp.std(m, axis=1),
            jnp.mean(delta, axis=1),
            jnp.std(delta, axis=1),
        ]
        emb = jnp.concatenate(feats, axis=-1)
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb / jnp.maximum(norm, 1e-8)

    def embed(self, subsegments: np.ndarray) -> np.ndarray:
        """[B, N] float32 -> [B, D] unit-norm embeddings."""
        return np.asarray(self._embed(jnp.asarray(subsegments)))

    # -- frame-wise fast path ------------------------------------------------

    def frame_features(self, audio: np.ndarray, sr: int) -> np.ndarray:
        """MFCC frames (c1..c19) over the whole signal: [T, 19].

        One device pass + one small download; per-span statistics then
        come from host cumulative sums (:meth:`embed_spans`) instead of
        uploading every (overlapping) subsegment — the subsegment batches
        duplicate ~2x the audio and dominate diarization wall time on
        slow host<->device links.
        """
        from ...ops.bucketing import pad_to_bucket

        frame_len = int(sr * 0.025)
        hop = int(sr * 0.010)
        n_valid = max(0, (len(audio) - frame_len) // hop + 1)
        padded, _ = pad_to_bucket(np.asarray(audio, np.float32), sr)
        m = np.asarray(mfcc_batch(jnp.asarray(padded)[None], sr=sr, n_mfcc=self.n_mfcc))
        return m[0, :n_valid, 1:]

    def embed_spans(
        self, frames: np.ndarray, spans: np.ndarray, sr: int
    ) -> np.ndarray:
        """Embeddings for sample spans [N, 2] from global MFCC frames.

        Statistics over a global 10 ms frame grid instead of per-subsegment
        frames (alignment differs by <10 ms; the stats are insensitive).
        """
        hop = int(sr * 0.010)
        t = frames.shape[0]
        delta = np.diff(frames, axis=0)

        def cum(x):
            return np.concatenate([np.zeros((1, x.shape[1])), np.cumsum(x, axis=0)])

        c1, c2 = cum(frames), cum(frames**2)
        d1, d2 = cum(delta), cum(delta**2)

        f_start = np.clip(spans[:, 0] // hop, 0, max(t - 1, 0))
        f_end = np.clip(spans[:, 1] // hop, f_start + 1, t)
        n = (f_end - f_start).astype(np.float64)[:, None]

        mean = (c1[f_end] - c1[f_start]) / n
        var = np.maximum((c2[f_end] - c2[f_start]) / n - mean**2, 0.0)

        de = np.clip(f_end - 1, 1, max(t - 1, 1))
        ds = np.minimum(f_start, de - 1)
        dn = np.maximum(de - ds, 1).astype(np.float64)[:, None]
        dmean = (d1[de] - d1[ds]) / dn
        dvar = np.maximum((d2[de] - d2[ds]) / dn - dmean**2, 0.0)

        emb = np.concatenate([mean, np.sqrt(var), dmean, np.sqrt(dvar)], axis=1)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        return (emb / np.maximum(norm, 1e-8)).astype(np.float32)


class ConvEmbedder:
    """Conv x-vector-style embedder (checkpoint-driven path)."""

    HIDDEN = 256
    OUT = 192

    def __init__(self, params: Optional[Dict[str, Any]] = None, sr: int = 16000, seed: int = 0):
        self.sr = sr
        params = params if params is not None else self.init_params(seed)
        # Device-resident params (npz numpy leaves re-upload per call)
        self.params = jax.tree.map(jnp.asarray, params)
        self._embed = jax.jit(self._forward)

    @classmethod
    def init_params(cls, seed: int = 0) -> Dict[str, Any]:
        k = jax.random.split(jax.random.PRNGKey(seed), 5)
        h = cls.HIDDEN

        def conv(key, cin, cout, width):
            scale = (cin * width) ** -0.5
            return {
                "w": jax.random.normal(key, (cout, cin, width)) * scale,
                "b": jnp.zeros((cout,)),
            }

        return {
            "conv1": conv(k[0], 19, h, 5),
            "conv2": conv(k[1], h, h, 3),
            "conv3": conv(k[2], h, h, 3),
            "proj": {
                "w": jax.random.normal(k[3], (2 * h, cls.OUT)) * (2 * h) ** -0.5,
                "b": jnp.zeros((cls.OUT,)),
            },
        }

    def _forward(self, params, audio: jnp.ndarray) -> jnp.ndarray:
        m = mfcc_batch(audio, sr=self.sr)[..., 1:]  # [B, T, 19]
        x = m.transpose(0, 2, 1)  # [B, C, T]
        for name, dil in (("conv1", 1), ("conv2", 2), ("conv3", 3)):
            p = params[name]
            width = p["w"].shape[-1]
            pad = (width - 1) * dil // 2
            x = jax.lax.conv_general_dilated(
                x, p["w"], (1,), ((pad, pad),),
                rhs_dilation=(dil,),
                dimension_numbers=("NCT", "OIT", "NCT"),
            ) + p["b"][None, :, None]
            x = jax.nn.relu(x)
        # statistics pooling
        mean = jnp.mean(x, axis=-1)
        std = jnp.std(x, axis=-1)
        stats = jnp.concatenate([mean, std], axis=-1)
        emb = stats @ params["proj"]["w"] + params["proj"]["b"]
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb / jnp.maximum(norm, 1e-8)

    def embed(self, subsegments: np.ndarray) -> np.ndarray:
        return np.asarray(self._embed(self.params, jnp.asarray(subsegments)))
