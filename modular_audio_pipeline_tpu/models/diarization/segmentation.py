"""Powerset speaker-segmentation model (pyannote-3.1-class).

pyannote's diarization pipeline runs a segmentation model over sliding
10 s windows producing per-frame *powerset* classes over up to 3 local
speakers (none / A / B / C / AB / AC / BC), then extracts embeddings per
local speaker and clusters globally (reference ``diarizer.py:104-113``).

This is the first-party equivalent: a conv + transformer encoder over
mel features with a 7-way powerset head, batched over windows
(``segmentation_batch_size`` parity), plus the powerset decoding and
window-overlap aggregation. With a converted checkpoint it provides
fine speech boundaries and **overlapped-speech detection**; the
weight-free diarizer path (energy VAD + stats embeddings) remains the
default when no checkpoint exists.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SegmentationNet", "powerset_decode", "sliding_windows", "aggregate_windows"]

# powerset classes over 3 local speakers
_CLASSES = ((), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2))
N_CLASSES = len(_CLASSES)
N_SPEAKERS = 3

WINDOW_S = 10.0
STEP_S = 1.0
_N_MELS = 40


class SegmentationNet:
    """mel [B, T, 40] -> powerset logits [B, T, 7]."""

    D = 128
    LAYERS = 2
    HEADS = 4

    def __init__(self, params: Optional[Dict[str, Any]] = None, seed: int = 0):
        params = params if params is not None else self.init_params(seed)
        # Device-resident params (npz numpy leaves re-upload per call)
        self.params = jax.tree.map(jnp.asarray, params)
        self._apply = jax.jit(self.apply)
        self._marginals = jax.jit(self.marginals)

    @classmethod
    def init_params(cls, seed: int = 0) -> Dict[str, Any]:
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 4 + 4 * cls.LAYERS)
        d = cls.D

        def mat(k, din, dout):
            return jax.random.normal(k, (din, dout)) * din**-0.5

        params: Dict[str, Any] = {
            "inp": {"w": mat(ks[0], _N_MELS, d), "b": jnp.zeros((d,))},
            "head": {"w": mat(ks[1], d, N_CLASSES), "b": jnp.zeros((N_CLASSES,))},
        }
        blocks = []
        for i in range(cls.LAYERS):
            k0, k1, k2, k3 = ks[2 + 4 * i : 6 + 4 * i]
            blocks.append(
                {
                    "qkv": mat(k0, d, 3 * d),
                    "o": mat(k1, d, d),
                    "ln1": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
                    "fc1": mat(k2, d, 4 * d),
                    "fc2": mat(k3, 4 * d, d),
                    "ln2": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
                }
            )
        params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        return params

    @staticmethod
    def apply(params: Dict[str, Any], mel: jnp.ndarray) -> jnp.ndarray:
        d = SegmentationNet.D
        h = SegmentationNet.HEADS
        x = mel @ params["inp"]["w"] + params["inp"]["b"]

        def ln(x, p):
            mean = x.mean(-1, keepdims=True)
            var = ((x - mean) ** 2).mean(-1, keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5) * p["g"] + p["b"]

        def block(x, p):
            y = ln(x, p["ln1"])
            qkv = y @ p["qkv"]
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def split(t):
                b, s, _ = t.shape
                return t.reshape(b, s, h, d // h).transpose(0, 2, 1, 3)

            # Pallas flash attention (XLA einsum fallback off-TPU): the
            # materialised [B, H, 1000, 1000] score tensor is ~0.5 GB per
            # batch-32 window pass and made segmentation memory-bound
            # (~930 ms/pass profiled); the fused kernel never writes it.
            from ...ops.attention import flash_attention

            o = flash_attention(split(q), split(k), split(v))
            o = o.transpose(0, 2, 1, 3).reshape(x.shape)
            x = x + o @ p["o"]
            y = ln(x, p["ln2"])
            x = x + jax.nn.gelu(y @ p["fc1"]) @ p["fc2"]
            return x, None

        x, _ = jax.lax.scan(block, x, params["blocks"])
        return x @ params["head"]["w"] + params["head"]["b"]

    def activities(self, mel: np.ndarray) -> np.ndarray:
        """mel [B, T, 40] -> per-speaker activity [B, T, 3] in [0, 1]."""
        logits = np.asarray(self._apply(self.params, jnp.asarray(mel)))
        return powerset_decode(logits)

    @staticmethod
    def marginals(params: Dict[str, Any], mel: jnp.ndarray) -> jnp.ndarray:
        """Device-side :func:`powerset_decode`: mel [B, T, 40] ->
        per-speaker marginal activity [B, T, 3] float16.

        Folding the softmax + class-membership sum into the forward pass
        shrinks the D2H transfer 7/3 x AND ships float16 (the activities
        are probabilities in [0, 1]; 10-bit mantissa is plenty for the
        >0.5 speech test and overlap averaging)."""
        logits = SegmentationNet.apply(params, mel)
        probs = jax.nn.softmax(logits, axis=-1)
        member = jnp.asarray(
            [[1.0 if s in m else 0.0 for s in range(N_SPEAKERS)] for m in _CLASSES],
            dtype=probs.dtype,
        )
        return jnp.einsum("btc,cs->bts", probs, member).astype(jnp.float16)


def powerset_decode(logits: np.ndarray) -> np.ndarray:
    """Powerset logits [..., 7] -> marginal per-speaker activity [..., 3]."""
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    out = np.zeros(logits.shape[:-1] + (N_SPEAKERS,), dtype=np.float32)
    for cls_idx, members in enumerate(_CLASSES):
        for spk in members:
            out[..., spk] += probs[..., cls_idx]
    return out


def sliding_windows(
    n_samples: int, sr: int, window_s: float = WINDOW_S, step_s: float = STEP_S
) -> List[Tuple[int, int]]:
    """Sample spans of the sliding segmentation windows (pyannote layout)."""
    win = int(window_s * sr)
    step = int(step_s * sr)
    if n_samples <= win:
        return [(0, n_samples)]
    spans = [(s, s + win) for s in range(0, n_samples - win + 1, step)]
    if spans[-1][1] < n_samples:
        spans.append((n_samples - win, n_samples))
    return spans


def aggregate_windows(
    window_acts: np.ndarray,  # [n_windows, T, 3]
    spans: List[Tuple[int, int]],
    n_samples: int,
    sr: int,
) -> np.ndarray:
    """Overlap-average window activities onto the global frame grid.

    Frames are 10 ms; speakers are aligned between overlapping windows by
    best-overlap permutation against the running aggregate (pyannote's
    stitching idea in its simplest consistent form)."""
    from itertools import permutations

    hop = sr // 100
    n_frames = n_samples // hop
    acc = np.zeros((n_frames, N_SPEAKERS), dtype=np.float64)
    weight = np.zeros((n_frames, 1), dtype=np.float64)

    for (start, _end), acts in zip(spans, window_acts):
        f0 = start // hop
        t = min(acts.shape[0], n_frames - f0)
        if t <= 0:
            continue
        seg = acts[:t]
        prev = acc[f0 : f0 + t] / np.maximum(weight[f0 : f0 + t], 1e-9)
        has_prev = weight[f0 : f0 + t].sum() > 0
        if has_prev:
            best, best_score = None, -np.inf
            for perm in permutations(range(N_SPEAKERS)):
                score = float((prev * seg[:, perm]).sum())
                if score > best_score:
                    best, best_score = perm, score
            seg = seg[:, best]
        acc[f0 : f0 + t] += seg
        weight[f0 : f0 + t] += 1.0
    return (acc / np.maximum(weight, 1e-9)).astype(np.float32)
