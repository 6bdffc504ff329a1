"""Decoder-only language models for local LLM post-processing.

The reference's local backend loads HF causal LMs by VRAM budget
(Mistral-7B / Phi-3-mini / TinyLlama,
``post_processing_hybrid.py:161-179``); here the same capability is a
first-party llama-architecture JAX implementation (RMSNorm, RoPE, GQA,
SwiGLU) with offline checkpoint conversion and a KV-cached generation
loop, so meeting analysis runs on the same TPU as transcription.
"""

from .llama import LlamaConfig, LlamaLM, LLAMA_CONFIGS

__all__ = ["LlamaConfig", "LlamaLM", "LLAMA_CONFIGS"]
