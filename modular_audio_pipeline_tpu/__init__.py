"""modular_audio_pipeline_tpu — a TPU-native audio transcription framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
AndersonGACFilho/Modular-Audio-Pipeline: media ingest, DSP preprocessing
(denoise / normalize / loudness / silence), vocal separation, VAD, Whisper
transcription, speaker diarization, redundancy filtering, segment merging,
timestamp preservation and LLM post-processing — exported under the same
public names the reference ships (``audio_pipeline/__init__.py:90-158``),
so reference users can switch imports and keep their code.

Example:
    from modular_audio_pipeline_tpu import AudioPipeline, PipelineConfig

    config = PipelineConfig(media_dir="./recordings")
    pipeline = AudioPipeline(config)
    result = pipeline.run()
    if result.success:
        print(f"Transcription saved to: {result.output_file}")

TPU-specific extensions live under ``parallel`` (mesh/sharding/batch
drivers), ``ops`` (DSP kernels), and ``models`` (JAX model stacks).
"""

from .config import (
    DEFAULT_PROMPTS,
    AudioConfig,
    DiarizationConfig,
    LLMConfig,
    NoiseReductionConfig,
    PipelineConfig,
    RedundancyConfig,
    RetryConfig,
    SegmentMergingConfig,
    TPUConfig,
    TranscriptionConfig,
    VADConfig,
    VocalSeparationConfig,
    get_default_config,
)
from .diarizer import NoOpDiarizer, SpeakerDiarizer
from .exceptions import (
    AudioPipelineError,
    AudioProcessingError,
    ConfigurationError,
    DiarizationError,
    FileValidationError,
    MediaConversionError,
    MediaNotFoundError,
    ModelLoadError,
    ShardingError,
    TranscriptionError,
    VADError,
    VocalSeparationError,
)
from .media_handler import MediaHandler
from .pipeline import AudioPipeline, PipelineResult
from .preprocessor import AudioPreprocessor
from .protocols import (
    AudioBuffer,
    DiarizationSegment,
    DiarizerProtocol,
    MediaHandlerProtocol,
    PreprocessorProtocol,
    ProcessingResult,
    RedundancyRemoverProtocol,
    TimestampMapping,
    TranscriberProtocol,
    TranscriptionSegment,
    VADProtocol,
    VocalSeparatorProtocol,
)
from .redundancy import NoOpRedundancyRemover, RedundancyRemover
from .segment_merger import SegmentMerger
from .separator import NoOpVocalSeparator, VocalSeparator
from .streaming import StreamingSession
from .transcriber import FasterWhisperTranscriber, WhisperTranscriber
from .utils import (
    CheckpointManager,
    ensure_directory,
    format_timestamp,
    get_audio_duration,
    get_file_hash,
    parse_timestamp,
    retry_with_backoff,
    validate_file,
)
from .vad import NoOpVADFilter, SileroVADFilter, VADFilter

__version__ = "2.0.0"

__all__ = [
    # Main classes
    "AudioPipeline",
    "PipelineResult",
    # Configuration
    "PipelineConfig",
    "AudioConfig",
    "VADConfig",
    "NoiseReductionConfig",
    "VocalSeparationConfig",
    "TranscriptionConfig",
    "DiarizationConfig",
    "RedundancyConfig",
    "RetryConfig",
    "SegmentMergingConfig",
    "LLMConfig",
    "TPUConfig",
    "DEFAULT_PROMPTS",
    "get_default_config",
    # Protocols
    "MediaHandlerProtocol",
    "PreprocessorProtocol",
    "VocalSeparatorProtocol",
    "VADProtocol",
    "TranscriberProtocol",
    "DiarizerProtocol",
    "RedundancyRemoverProtocol",
    # Data classes
    "TranscriptionSegment",
    "DiarizationSegment",
    "TimestampMapping",
    "ProcessingResult",
    "AudioBuffer",
    # Exceptions
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
    # Implementations
    "MediaHandler",
    "AudioPreprocessor",
    "VocalSeparator",
    "NoOpVocalSeparator",
    "VADFilter",
    "SileroVADFilter",
    "NoOpVADFilter",
    "WhisperTranscriber",
    "FasterWhisperTranscriber",
    "StreamingSession",
    "SpeakerDiarizer",
    "NoOpDiarizer",
    "RedundancyRemover",
    "NoOpRedundancyRemover",
    "SegmentMerger",
    # Utilities
    "retry_with_backoff",
    "validate_file",
    "CheckpointManager",
    "get_file_hash",
    "ensure_directory",
    "get_audio_duration",
    "format_timestamp",
    "parse_timestamp",
]
