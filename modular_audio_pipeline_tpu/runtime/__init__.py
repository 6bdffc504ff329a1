"""Host runtime: compilation caching, device staging, native shims.

- :mod:`.compile_cache` — persistent XLA compilation cache setup (the
  backend's first compiles are expensive; see the project verify skill).
- :mod:`.prefetch` — double-buffered host->device staging for the batch
  driver.
- ``libmap_audio`` (C++, built via ``setup.py``) — fast WAV parse and
  sample-format conversion; Python falls back to the NumPy codec when the
  extension is absent.
"""

from .compile_cache import enable_persistent_cache

__all__ = ["enable_persistent_cache"]
