"""Trainable spectrogram-masking U-Net for vocal separation.

The checkpoint-driven quality path (REPET stays the weight-free default):
a compact encoder/decoder with skip connections predicts a per-bin vocal
mask over the magnitude STFT — the classic Spleeter/Open-Unmix-style
formulation, which lowers to dense MXU convolutions on TPU (unlike
Demucs's long 1-D waveform convs, which tile poorly).

Weights load from a converted ``params.npz`` (flat tree, see
whisper.convert) and train with optax against (mix, vocals) pairs via
:func:`masking_loss`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.stft import istft, stft

__all__ = ["MaskUNet", "masking_loss", "dual_stem_loss"]

_N_FFT = 2048
_HOP = 512
_LEVELS = 4
_BASE = 32  # channel width; 16-wide r1 checkpoints are no longer loadable


def _conv(p, x, stride=(1, 1), transpose=False):
    dn = ("NCHW", "OIHW", "NCHW")
    if transpose:
        y = jax.lax.conv_transpose(
            x, p["w"].transpose(2, 3, 1, 0), strides=stride, padding="SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
        )
    else:
        y = jax.lax.conv_general_dilated(
            x, p["w"], stride, "SAME", dimension_numbers=dn
        )
    return y + p["b"][None, :, None, None]


class MaskUNet:
    """[B, F, T] magnitude -> [B, F, T] vocal mask in (0, 1)."""

    def __init__(self, params: Optional[Dict[str, Any]] = None, seed: int = 0):
        params = params if params is not None else self.init_params(seed)
        # Device-resident params (npz numpy leaves re-upload per call)
        self.params = jax.tree.map(jnp.asarray, params)
        self._apply = jax.jit(self.apply)

    @classmethod
    def init_params(cls, seed: int = 0) -> Dict[str, Any]:
        key = jax.random.PRNGKey(seed)
        params: Dict[str, Any] = {}

        def conv_p(k, cin, cout, kh=3, kw=3):
            scale = (cin * kh * kw) ** -0.5
            return {
                "w": jax.random.normal(k, (cout, cin, kh, kw)) * scale,
                "b": jnp.zeros((cout,)),
            }

        keys = jax.random.split(key, 2 * _LEVELS + 2)
        cin = 2  # log-magnitude + frequency coordinate
        for lvl in range(_LEVELS):
            cout = _BASE * (2**lvl)
            params[f"down{lvl}"] = conv_p(keys[lvl], cin, cout)
            cin = cout
        params["mid"] = conv_p(keys[_LEVELS], cin, cin)
        for lvl in reversed(range(_LEVELS)):
            cout = _BASE * (2**lvl)
            skip = _BASE * (2**lvl)
            params[f"up{lvl}"] = conv_p(keys[_LEVELS + 1 + lvl], cin + skip, cout)
            cin = cout
        params["head"] = conv_p(keys[-1], cin, 1, kh=1, kw=1)
        return params

    @staticmethod
    def apply(params: Dict[str, Any], mag: jnp.ndarray) -> jnp.ndarray:
        """mag [B, F, T] (log-compressed inside) -> mask [B, F, T]."""
        x = jnp.log1p(mag)[:, None]  # [B, 1, F, T]
        f, t = x.shape[-2], x.shape[-1]
        # Frequency-coordinate channel: convs are translation-invariant,
        # but "is this bin vocal or accompaniment" depends on absolute
        # frequency (harmonic ranges, bass register). CoordConv-style.
        freq = jnp.linspace(-1.0, 1.0, f, dtype=x.dtype)
        x = jnp.concatenate(
            [x, jnp.broadcast_to(freq[None, None, :, None], x.shape)], axis=1
        )
        # pad spatial dims to a 2^LEVELS multiple
        mult = 2**_LEVELS
        fp = (-f) % mult
        tp = (-t) % mult
        x = jnp.pad(x, ((0, 0), (0, 0), (0, fp), (0, tp)))

        skips = []
        for lvl in range(_LEVELS):
            x = jax.nn.relu(_conv(params[f"down{lvl}"], x, stride=(2, 2)))
            skips.append(x)
        x = jax.nn.relu(_conv(params["mid"], x))
        for lvl in reversed(range(_LEVELS)):
            x = jnp.concatenate([x, skips[lvl]], axis=1)
            x = jax.nn.relu(
                _conv(params[f"up{lvl}"], x, stride=(2, 2), transpose=True)
            )
        mask = jax.nn.sigmoid(_conv(params["head"], x))
        return mask[:, 0, :f, :t]

    def separate(self, audio: np.ndarray, sr: int) -> Tuple[np.ndarray, np.ndarray]:
        """(vocals, accompaniment) via masked STFT resynthesis."""
        x = jnp.asarray(audio, dtype=jnp.float32)
        spec = stft(x, n_fft=_N_FFT, hop=_HOP)  # [F, T]
        mag = jnp.abs(spec)
        mask = self._apply(self.params, mag[None])[0]
        vocal_spec = spec * mask.astype(spec.dtype)
        music_spec = spec * (1.0 - mask).astype(spec.dtype)
        vocals = istft(vocal_spec, n_fft=_N_FFT, hop=_HOP, length=len(audio))
        music = istft(music_spec, n_fft=_N_FFT, hop=_HOP, length=len(audio))
        return np.asarray(vocals, np.float32), np.asarray(music, np.float32)

    def separate_device(self, x: jnp.ndarray) -> jnp.ndarray:
        """Device-resident vocal stem: [n] f32 on device -> [n] f32 on
        device, one fused jitted program (STFT -> mask -> iSTFT).

        The serving path uses this so the audio never round-trips the
        host for separation (the host `separate` costs two ~30 MB
        transfers per 8-min file on a tunneled chip); numerics are the
        same masked resynthesis as `separate` over the same chunk."""
        return _separate_device_jit(self.params, x)


@jax.jit
def _separate_device_jit(params, x: jnp.ndarray) -> jnp.ndarray:
    spec = stft(x, n_fft=_N_FFT, hop=_HOP)
    mag = jnp.abs(spec)
    mask = MaskUNet.apply(params, mag[None])[0]
    return istft(spec * mask.astype(spec.dtype), n_fft=_N_FFT, hop=_HOP,
                 length=x.shape[0])


def masking_loss(params, mix_mag: jnp.ndarray, vocal_mag: jnp.ndarray) -> jnp.ndarray:
    """L1 between masked mixture and target vocal magnitudes (trainable
    with optax; see training/)."""
    mask = MaskUNet.apply(params, mix_mag)
    return jnp.mean(jnp.abs(mask * mix_mag - vocal_mag))


def dual_stem_loss(
    params,
    mix_mag: jnp.ndarray,
    vocal_mag: jnp.ndarray,
    music_mag: jnp.ndarray,
) -> jnp.ndarray:
    """L1 on BOTH stems: ``mask*mix ≈ vocals`` and ``(1-mask)*mix ≈ music``
    (Demucs-style multi-stem supervision — the accompaniment term pushes
    the mask to zero where music dominates rather than merely not-one)."""
    mask = MaskUNet.apply(params, mix_mag)
    vocal_term = jnp.mean(jnp.abs(mask * mix_mag - vocal_mag))
    music_term = jnp.mean(jnp.abs((1.0 - mask) * mix_mag - music_mag))
    return vocal_term + music_term
