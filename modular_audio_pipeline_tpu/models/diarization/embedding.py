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


class ConvEmbedder:
    """Conv x-vector-style embedder (checkpoint-driven path)."""

    HIDDEN = 256
    OUT = 192

    def __init__(self, params: Optional[Dict[str, Any]] = None, sr: int = 16000, seed: int = 0):
        self.sr = sr
        self.params = params if params is not None else self.init_params(seed)
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
