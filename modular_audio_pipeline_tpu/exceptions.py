"""Typed exception hierarchy for the TPU-native audio pipeline.

Mirrors the error contract of the reference implementation
(``/root/reference/audio_pipeline/exceptions.py:30-96``): a single base class
carrying a human message plus optional debug details, with one subclass per
pipeline stage so callers can catch errors at the right granularity.
"""

from __future__ import annotations

from typing import Optional

__all__ = [
    "AudioPipelineError",
    "MediaNotFoundError",
    "MediaConversionError",
    "AudioProcessingError",
    "VocalSeparationError",
    "TranscriptionError",
    "DiarizationError",
    "VADError",
    "ConfigurationError",
    "ModelLoadError",
    "FileValidationError",
    "ShardingError",
]


class AudioPipelineError(Exception):
    """Base class for every error raised by the pipeline.

    Parameters
    ----------
    message:
        Short human-readable description.
    details:
        Optional longer diagnostic text (stderr tails, shape dumps, ...),
        appended to ``str(exc)`` on its own line.
    """

    def __init__(self, message: str, details: Optional[str] = None):
        self.message = message
        self.details = details
        super().__init__(message)

    def __str__(self) -> str:  # reference parity: exceptions.py:43-46
        if self.details:
            return f"{self.message}\nDetails: {self.details}"
        return self.message


class MediaNotFoundError(AudioPipelineError):
    """No usable media file was found (discovery stage)."""


class MediaConversionError(AudioPipelineError):
    """Decoding / conversion of the input media failed."""


class AudioProcessingError(AudioPipelineError):
    """A DSP preprocessing stage (denoise / normalize / silence) failed."""


class VocalSeparationError(AudioPipelineError):
    """The vocal separation stage failed."""


class TranscriptionError(AudioPipelineError):
    """Speech-to-text failed."""


class DiarizationError(AudioPipelineError):
    """Speaker diarization failed."""


class VADError(AudioPipelineError):
    """Voice activity detection failed."""


class ConfigurationError(AudioPipelineError):
    """The pipeline configuration is invalid."""


class ModelLoadError(AudioPipelineError):
    """A model (weights, tokenizer, compiled fn) could not be loaded."""


class FileValidationError(AudioPipelineError):
    """A file failed existence / extension / size validation."""


class ShardingError(AudioPipelineError):
    """Mesh construction or sharding specification failed (TPU-specific)."""
