"""Speaker diarization models: embeddings + clustering.

Replaces pyannote.audio 3.1 (reference ``diarizer.py:104-113``) with a
first-party stack:

- :mod:`.features`  — batched MFCC extraction on TPU (mel -> DCT matmul).
- :mod:`.embedding` — speaker embeddings: a weight-free MFCC-statistics
  embedder that genuinely separates speakers, and a trainable conv
  x-vector-style net for checkpoint-driven quality parity.
- :mod:`.clustering` — host-side agglomerative clustering with
  min/max-speaker constraints (pyannote's AHC analog).
"""
