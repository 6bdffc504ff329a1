"""JAX Whisper: encoder/decoder, KV-cached decoding, tokenizer, conversion.

This is the compute core the reference delegates to CTranslate2
(``/root/reference/audio_pipeline/transcriber.py:362-366,421-427``), rebuilt
TPU-first: bf16 matmuls on the MXU, static shapes everywhere (30 s windows
-> 1500 encoder positions, 448-token decode bound), layers stacked and
scanned to keep XLA compile times flat across model sizes, and batched
beam/greedy decoding under ``lax.while_loop``.
"""

from .config import WhisperDims, WHISPER_DIMS
from .model import WhisperModel, init_params
from .tokenizer import WhisperTokenizer, DummyTokenizer, load_tokenizer

__all__ = [
    "WhisperDims",
    "WHISPER_DIMS",
    "WhisperModel",
    "init_params",
    "WhisperTokenizer",
    "DummyTokenizer",
    "load_tokenizer",
]
