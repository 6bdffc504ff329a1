"""First-party JAX model implementations.

Replaces the reference pipeline's model dependencies (SURVEY.md §2):
``whisper`` (openai-whisper / faster-whisper+CTranslate2), the Silero VAD
TorchScript net, pyannote's segmentation/embedding models, and Demucs.
Weights are loaded from offline-converted checkpoints; every model also has
a deterministic random-init path for testing.
"""
