"""Typed failure taxonomy for the TPU-native audio pipeline.

One exception class per pipeline stage (error contract compatible with
``/root/reference/audio_pipeline/exceptions.py:30-96``), extended with
machine-readable metadata the batch driver and retry logic consume:

- ``stage``: which pipeline stage the failure belongs to,
- ``retryable``: whether an automatic retry is likely to help (transient
  IO / device conditions, not config or validation errors),
- ``to_dict()``: structured form for batch ledgers and logs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

__all__ = [  # the reference's public error surface + ShardingError
    "AudioPipelineError", "MediaNotFoundError", "MediaConversionError",
    "AudioProcessingError", "VocalSeparationError", "TranscriptionError",
    "DiarizationError", "VADError", "ConfigurationError", "ModelLoadError",
    "FileValidationError", "ShardingError",
]


class AudioPipelineError(Exception):
    """Base class for every pipeline failure.

    Carries a short human message plus optional diagnostic ``details``
    (stderr tails, shape dumps, ...) appended on its own line by
    ``str()`` — the same wire format downstream tooling parses from the
    reference implementation.
    """

    stage: str = "pipeline"
    retryable: bool = False

    def __init__(self, message: str, details: Optional[str] = None):
        self.message = message
        self.details = details
        super().__init__(message)

    def __str__(self) -> str:
        return f"{self.message}\nDetails: {self.details}" if self.details else self.message

    def to_dict(self) -> Dict[str, Any]:
        """Structured form for batch ledgers / JSON logs."""
        return {
            "type": type(self).__name__,
            "stage": self.stage,
            "retryable": self.retryable,
            "message": self.message,
            "details": self.details,
        }


class MediaNotFoundError(AudioPipelineError):
    """Discovery found no usable media file."""
    stage = "discovery"


class MediaConversionError(AudioPipelineError):
    """Decoding or conversion of the input media failed."""
    stage = "convert"
    retryable = True  # subprocess/IO hiccups


class AudioProcessingError(AudioPipelineError):
    """A DSP preprocessing stage (denoise / normalize / silence) failed."""
    stage = "preprocess"


class VocalSeparationError(AudioPipelineError):
    """Vocal separation failed."""
    stage = "separate"
    retryable = True


class TranscriptionError(AudioPipelineError):
    """Speech-to-text failed."""
    stage = "transcribe"
    retryable = True  # device-level failures fall back / retry


class DiarizationError(AudioPipelineError):
    """Speaker diarization failed."""
    stage = "diarize"
    retryable = True


class VADError(AudioPipelineError):
    """Voice-activity detection failed."""
    stage = "vad"


class ConfigurationError(AudioPipelineError):
    """The pipeline configuration is invalid (never retryable)."""
    stage = "config"


class ModelLoadError(AudioPipelineError):
    """Model weights / tokenizer / compiled program could not be loaded."""
    stage = "model-load"


class FileValidationError(AudioPipelineError):
    """A file failed existence / extension / size validation."""
    stage = "validate"


class ShardingError(AudioPipelineError):
    """Mesh construction or sharding specification failed (TPU-specific)."""
    stage = "sharding"


class FetchIntegrityError(AudioPipelineError):
    """A device->host fetch failed checksum verification (TPU-specific).

    Raised when a critical device buffer (decoded tokens, beam logprobs)
    repeatedly fetches bytes that disagree with the checksum computed on
    device from the same buffer — seen on degraded tunneled-TPU links,
    which can return all-zero fetch buffers with no error. Callers
    should retry the run in a fresh process rather than trust the data.
    """
    stage = "fetch"
