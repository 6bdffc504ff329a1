"""Incremental (streaming) transcription sessions.

The reference is strictly file-at-a-time (``pipeline.run()``, reference
pipeline.py:294); long-running capture — live meeting audio, a pipe from
a recorder — has to be chunked by the caller. :class:`StreamingSession`
accepts audio a chunk at a time and emits *finalized* segments as soon as
whisper's seek grammar completes them, using the exact sequential
seek-decode step of :class:`~.transcriber.JaxWhisperBackend` (advance by
last paired timestamp, condition on previous text, no-speech gating), so
a streamed session produces the same segments as an offline sequential
run over the concatenated audio.

Usage::

    backend = JaxWhisperBackend("large-v3-turbo", language="en")
    with StreamingSession(backend) as session:
        for chunk in microphone():        # arbitrary chunk sizes / rates
            for seg in session.feed(chunk, sr):
                print(seg["start"], seg["text"])   # final, never revised
        result = session.finish()          # drains the tail

Finalization rule: a 30 s window is decoded only once fully buffered
(or at ``finish()``), and only segments whisper itself marks complete
(paired timestamps) are emitted — the remainder is re-decoded with more
context in the next window, exactly like offline seek decoding.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["StreamingSession"]

_SR = 16000
_WINDOW_S = 30.0


class StreamingSession:
    """Chunk-at-a-time ingest over a loaded ``JaxWhisperBackend``."""

    def __init__(self, backend, language: Optional[str] = None):
        self.backend = backend
        self._buf: List[np.ndarray] = []
        self._buffered = 0  # samples currently buffered (after _seek)
        self._seek = 0  # absolute sample position of buffer start
        self._all_tokens: List[int] = []
        self._segments: List[Dict[str, Any]] = []
        self._opts = None
        self._language = language
        self._finished = False

    # -- lifecycle -----------------------------------------------------------

    @classmethod
    def from_config(cls, config) -> "StreamingSession":
        """Build a session from a :class:`~.config.PipelineConfig`
        (same factory convention as the pipeline components)."""
        from .transcriber import FasterWhisperTranscriber

        tr = FasterWhisperTranscriber.from_config(config)
        return cls(tr._backend, language=config.transcription.language)

    def __enter__(self) -> "StreamingSession":
        return self

    def __exit__(self, *exc) -> None:
        if not self._finished:
            self.finish()

    def _ensure_opts(self, first_window: np.ndarray) -> None:
        if self._opts is not None:
            return
        self.backend.load()
        language = self._language or self.backend.language
        if language in (None, "", "auto"):
            import jax.numpy as jnp

            from .models.whisper.decode import detect_language
            from .ops.mel import log_mel

            win = int(_WINDOW_S * _SR)
            padded = np.zeros(win, dtype=np.float32)
            padded[: len(first_window)] = first_window[:win]
            mel = log_mel(
                jnp.asarray(padded[None, :]), n_mels=self.backend.dims.n_mels
            )
            language, _ = detect_language(
                self.backend.params, self.backend.dims,
                self.backend.tokenizer, mel,
            )
            logger.info("Streaming session language: %s", language)
        self._language = language
        self._opts = self.backend._decode_options(language)

    # -- ingest ---------------------------------------------------------------

    def feed(self, chunk: np.ndarray, sr: int = _SR) -> List[Dict[str, Any]]:
        """Append audio; return any segments finalized by this chunk.

        Chunks may be any length and (uniform) sample rate; int16 input is
        rescaled, non-16 kHz input is resampled on the host.
        """
        if self._finished:
            raise RuntimeError("StreamingSession already finished")
        chunk = np.asarray(chunk)
        if chunk.dtype == np.int16:
            chunk = chunk.astype(np.float32) * (1.0 / 32768.0)
        else:
            chunk = chunk.astype(np.float32, copy=False)
        if sr != _SR:
            from .audio_io import resample_poly

            chunk = resample_poly(chunk, sr, _SR)
        if chunk.size == 0:
            return []
        self._buf.append(chunk)
        self._buffered += len(chunk)
        return self._drain(final=False)

    def finish(self) -> Dict[str, Any]:
        """Flush the remaining tail; return the full result dict
        (same shape as ``transcribe_array``)."""
        if not self._finished:
            self._drain(final=True)
            self._finished = True
        text = " ".join(s["text"] for s in self._segments if s["text"])
        return {
            "text": text,
            "segments": self._segments,
            "language": self._language or self.backend.language,
            "duration": (self._seek + self._buffered) / _SR,
        }

    # -- internals --------------------------------------------------------------

    def _window(self) -> np.ndarray:
        """First ``<=30 s`` of the buffer as one contiguous array."""
        win = int(_WINDOW_S * _SR)
        if len(self._buf) > 1:
            self._buf = [np.concatenate(self._buf)]
        return self._buf[0][:win]

    def _consume(self, n: int) -> None:
        self._buf = [self._buf[0][n:]] if self._buf else []
        self._buffered -= n
        self._seek += n

    def _drain(self, final: bool) -> List[Dict[str, Any]]:
        """Decode full windows (all remaining audio when ``final``)."""
        win = int(_WINDOW_S * _SR)
        emitted: List[Dict[str, Any]] = []
        while self._buffered >= win or (final and self._buffered > 0):
            chunk = self._window()
            self._ensure_opts(chunk)
            # seek_decode_step emits only whisper-completed segments; the
            # incomplete remainder is re-decoded with more context once the
            # next window fills (or on the final drain).
            segs, advance, self._all_tokens = self.backend.seek_decode_step(
                chunk, self._seek, self._opts, self._all_tokens
            )
            emitted.extend(segs)
            self._consume(min(advance, self._buffered))
        self._segments.extend(emitted)
        return emitted
