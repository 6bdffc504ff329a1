"""Speech-to-text transcribers backed by the JAX Whisper stack.

Public surface mirrors the reference
(``/root/reference/audio_pipeline/transcriber.py``): two classes —
``WhisperTranscriber`` and ``FasterWhisperTranscriber`` — with the same
constructor signatures, ``from_config``, lazy loading,
``load_model``/``unload_model``/``is_loaded``, retry on transient errors,
and the same result dict shape::

    {"text": str, "segments": [{"start","end","text","confidence"}, ...],
     "language": str, "duration": float}

Both classes run the same TPU-native backend (mel frontend -> encoder ->
KV-cached batched decode); ``FasterWhisperTranscriber`` keeps the
reference's extra semantics (built-in VAD gating, device fallback chain —
here TPU -> CPU instead of CUDA -> CPU -> openai-whisper).

Long audio is transcribed by batching 30 s windows across the device
(sharded across chips by the parallel layer), replacing the reference's
sequential seek loop; window-relative timestamp tokens are re-based onto
the file timeline.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .audio_io import get_buffer, read_wav, resample_poly
from .config import PipelineConfig, RetryConfig
from .exceptions import ModelLoadError, TranscriptionError
from .models.whisper.config import MODEL_INFO, WHISPER_DIMS, WhisperDims
from .models.whisper.decode import DecodeOptions, decode_windows
from .models.whisper.model import init_params
from .models.whisper.tokenizer import WhisperTokenizer, load_tokenizer
from .utils import retry_with_backoff

logger = logging.getLogger(__name__)

__all__ = ["WhisperTranscriber", "FasterWhisperTranscriber", "JaxWhisperBackend"]

_WINDOW_S = 30.0
_SR = 16000
_BATCH_BUCKETS = (1, 2, 4, 8, 16)


def _window_batch_device(dev, start: int, bucket: int, win: int):
    """Rows [start, start+bucket) of the device waveform's 30 s window
    view, zero-padded past the end — one jitted program with STATIC
    indices (eager slicing uploads its start index as a scalar, one link
    round-trip per batch)."""
    import functools

    import jax

    @functools.lru_cache(maxsize=128)
    def build(start, bucket, win, n_total):
        import jax.numpy as jnp

        @jax.jit
        def run(x):
            wins = x.reshape(-1, win)
            if start + bucket <= wins.shape[0]:
                return wins[start : start + bucket]
            pad = start + bucket - wins.shape[0]
            return jnp.concatenate(
                [wins[start:], jnp.zeros((pad, win), x.dtype)]
            )

        return run

    return build(start, bucket, win, int(dev.shape[-1]))(dev)


def _retry_rng(temp_idx: int):
    """Device-cached PRNG key per ladder temperature (a fresh PRNGKey is
    one scalar upload per retry call)."""
    import functools

    @functools.lru_cache(maxsize=8)
    def build(temp_idx):
        import jax

        return jax.random.PRNGKey(1000 + temp_idx)

    return build(temp_idx)


def _read_stage_input(input_wav: str):
    """Previous stage's published buffer when present, else the file."""
    buf = get_buffer(input_wav)
    if buf is not None:
        return buf.as_host(), buf.sr
    return read_wav(input_wav)


def _mesh_from_config(config: PipelineConfig):
    """Build the window-sharding mesh when the config declares one."""
    shape = config.tpu.mesh_shape
    if not shape or max(shape.values()) <= 1:
        return None
    from .parallel.mesh import build_mesh

    return build_mesh(config.tpu)


def default_weights_dir(model_name: str) -> str:
    """First search root holding a converted ``whisper-<name>`` bundle;
    falls back to the conversion CLI's default write location."""
    from .utils import find_weights_bundle, weights_search_roots

    found = find_weights_bundle(f"whisper-{model_name}")
    if found is not None:
        return str(found)
    return str(weights_search_roots()[-1] / f"whisper-{model_name}")


class JaxWhisperBackend:
    """Shared engine: params + tokenizer + batched window decoding."""

    def __init__(
        self,
        model_name: str,
        language: str = "en",
        task: str = "transcribe",
        temperature: float = 0.0,
        beam_size: int = 5,
        prompt: str = "",
        weights_path: Optional[str] = None,
        compute_dtype: str = "bfloat16",
        batch_size: int = 16,
        max_decode_tokens: int = 224,
        timestamps: bool = True,
        word_timestamps: bool = False,  # cross-attention DTW word alignment
        mesh=None,  # jax.sharding.Mesh: shard window batches on its 'data' axis
        temperature_fallback: bool = True,  # whisper's quality-retry ladder
        chunking: str = "batched",  # "batched" | "sequential" (seek loop)
        no_speech_threshold: Optional[float] = 0.6,
        logprob_threshold: Optional[float] = -1.0,
        compression_ratio_threshold: Optional[float] = 2.4,
        patience: Optional[float] = None,  # beam finished-pool factor
        kv_cache_dtype: str = "int8",  # "int8" | "bfloat16" decode KV cache
        condition_on_previous_text: bool = True,  # seek-loop conditioning
    ):
        self.condition_on_previous_text = condition_on_previous_text
        self.patience = patience
        self.kv_cache_dtype = kv_cache_dtype
        self.word_timestamps = word_timestamps
        self.temperature_fallback = temperature_fallback
        self.fallback_temperatures = (0.2, 0.4, 0.6, 0.8, 1.0)
        self.chunking = chunking
        self.no_speech_threshold = no_speech_threshold
        self.logprob_threshold = logprob_threshold
        self.compression_ratio_threshold = compression_ratio_threshold
        if model_name not in WHISPER_DIMS:
            raise ModelLoadError(f"Unknown Whisper model: {model_name}")
        self.mesh = mesh
        self.model_name = model_name
        self.dims: WhisperDims = WHISPER_DIMS[model_name]
        self.language = language
        self.task = task
        self.temperature = temperature
        self.beam_size = beam_size
        self.prompt = prompt or ""
        self.weights_path = weights_path
        self.compute_dtype = compute_dtype
        self.batch_size = batch_size
        self.max_decode_tokens = max_decode_tokens
        self.timestamps = timestamps

        self.params = None
        self.tokenizer: Optional[WhisperTokenizer] = None

        # Fail-fast signal: with lazy loading the reference only discovers a
        # missing checkpoint AFTER all preprocessing has run; warn upfront.
        resolved = self.weights_path or default_weights_dir(model_name)
        if (
            not str(resolved).startswith("random")
            and not Path(resolved, "params.npz").exists()
            and os.environ.get("MAP_TPU_ALLOW_RANDOM_WEIGHTS") != "1"
        ):
            logger.warning(
                "No converted checkpoint at %s — transcription will fail at "
                "load time unless one is converted first", resolved,
            )

    # -- lifecycle ---------------------------------------------------------

    def load(self) -> None:
        if self.params is not None:
            return
        import jax.numpy as jnp

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}.get(
            self.compute_dtype, jnp.bfloat16
        )  # "int8" loads bf16 then quantizes the decoder below
        path = self.weights_path or default_weights_dir(self.model_name)

        if str(path).startswith("random"):
            seed = int(str(path).partition(":")[2] or 0)
            logger.warning(
                "Initialising %s with RANDOM weights (seed %d) — test/bench mode",
                self.model_name, seed,
            )
            self.params = init_params(self.dims, seed=seed, dtype=dtype)
            self.tokenizer = load_tokenizer(None, n_vocab=self.dims.n_vocab)
            self._maybe_quantize()
            self._place_params()
            # Quality gates are meaningless on random weights: every window
            # would walk the whole retry ladder.
            self.temperature_fallback = False
            return

        if Path(path, "params.npz").exists():
            from .models.whisper.convert import load_params

            import jax

            host = load_params(path, dtype=self.compute_dtype)
            if jax.default_backend() != "cpu":
                # Verified upload: this relay can zero h2d transfers as
                # well as d2h ones (all-NUL decodes whose d2h checksums
                # verified, round 5) — see runtime/integrity.put_verified.
                from .runtime.integrity import put_verified_tree

                self.params = put_verified_tree(host, name="whisper")
            else:
                self.params = jax.tree.map(jnp.asarray, host)
            self.tokenizer = load_tokenizer(path, n_vocab=self.dims.n_vocab)
            self._maybe_quantize()
            self._place_params()
            logger.info("Loaded Whisper %s from %s", self.model_name, path)
            return

        if os.environ.get("MAP_TPU_ALLOW_RANDOM_WEIGHTS") == "1":
            logger.warning(
                "No checkpoint at %s; falling back to random weights "
                "(MAP_TPU_ALLOW_RANDOM_WEIGHTS=1)", path,
            )
            self.params = init_params(self.dims, seed=0, dtype=dtype)
            self.tokenizer = load_tokenizer(None, n_vocab=self.dims.n_vocab)
            self._place_params()
            return

        raise ModelLoadError(
            f"No converted Whisper checkpoint for '{self.model_name}'",
            details=(
                f"Expected params.npz under {path}. Convert one offline with:\n"
                "  python -m modular_audio_pipeline_tpu.models.whisper.convert "
                f"--src <hf-or-openai-ckpt> --dst {path} --model {self.model_name}"
            ),
        )

    def _maybe_quantize(self) -> None:
        if self.compute_dtype == "int8":
            from .ops.quant import quantize_decoder

            self.params = quantize_decoder(self.params)
            logger.info("Decoder quantized to weight-only int8")

    def _place_params(self) -> None:
        """Shard params over the mesh (Megatron TP on the 'model' axis,
        replicated otherwise); no-op without a mesh."""
        if self.mesh is None:
            return
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.sharding import shard_params

        try:
            self.params = shard_params(self.params, self.mesh, model_axis="model")
        except Exception as exc:
            # e.g. the int8-quantized decoder tree has no TP spec table:
            # replicate — DP over the 'data' axis still engages.
            logger.warning("TP param sharding unavailable (%s); replicating", exc)
            repl = NamedSharding(self.mesh, P())
            self.params = jax.tree.map(
                lambda leaf: jax.device_put(leaf, repl), self.params
            )

    def unload(self) -> None:
        self.params = None  # device buffers freed by GC

    # -- audio -> windows ---------------------------------------------------

    @staticmethod
    def _windows(audio: np.ndarray) -> np.ndarray:
        """Pad to a whole number of 30 s windows -> [n_windows, 480000]."""
        win = int(_WINDOW_S * _SR)
        n = max(1, int(np.ceil(len(audio) / win)))
        padded = np.zeros(n * win, dtype=np.float32)
        padded[: len(audio)] = audio
        return padded.reshape(n, win)

    def _prompt_tokens(self) -> tuple:
        if not self.prompt or self.tokenizer is None:
            return ()
        ids = self.tokenizer.encode(" " + self.prompt.strip())
        # whisper caps the conditioning prompt at half the text context
        return tuple(ids[-(self.dims.n_text_ctx // 2 - 1):])

    @staticmethod
    def _compression_ratio(text: str) -> float:
        """zlib compression ratio — whisper's repetition-loop detector."""
        import zlib

        data = text.encode("utf-8")
        if not data:
            return 0.0
        return len(data) / len(zlib.compress(data))

    def _needs_fallback(self, result, tokens_row, text: str) -> bool:
        """Whisper's quality gates: failed windows retry at higher
        temperature (openai-whisper decode heuristics; the reference
        inherits them via its backends and faster-whisper exposes the
        thresholds as options — so do we)."""
        if result is None:
            return True
        cr = self.compression_ratio_threshold
        lp = self.logprob_threshold
        return (
            (cr is not None and self._compression_ratio(text) > cr)
            or (lp is not None and float(result) < lp)
        )

    def _should_skip_window(self, no_speech_prob: float, avg_logprob: float) -> bool:
        """Whisper's no-speech gate: drop the window as silence when
        no_speech_prob is high, unless the decode is confident anyway
        (avg_logprob above logprob_threshold)."""
        if self.no_speech_threshold is None:
            return False
        should_skip = no_speech_prob > self.no_speech_threshold
        if (
            self.logprob_threshold is not None
            and avg_logprob > self.logprob_threshold
        ):
            should_skip = False
        return should_skip

    # -- decoding ------------------------------------------------------------

    def _decode_options(self, language: str) -> "DecodeOptions":
        return DecodeOptions(
            language=language,
            task=self.task,
            beam_size=self.beam_size,
            temperature=self.temperature,
            max_tokens=self.max_decode_tokens,
            timestamps=self.timestamps,
            prompt_tokens=self._prompt_tokens(),
            patience=self.patience,
            kv_int8=self.kv_cache_dtype == "int8",
        )

    def transcribe_buffer(self, buf) -> Dict[str, Any]:
        """Transcribe a device-resident stage buffer: the 30 s windows are
        sliced on device, so the kept waveform never crosses the link
        (VERDICT r3 #10). Falls back to the host path when the buffer has
        no device view, needs resampling, or uses sequential chunking."""
        win = int(_WINDOW_S * _SR)
        if (
            buf.device is None
            or buf.sr != _SR
            or self.chunking == "sequential"
            or int(buf.device.shape[-1]) % win
        ):
            return self.transcribe_array(buf.as_host(), buf.sr)
        return self.transcribe_array(
            None, _SR, _dev=buf.device, _n_valid=buf.n_valid
        )

    def transcribe_array(
        self, audio: Optional[np.ndarray], sr: int, _dev=None, _n_valid=None
    ) -> Dict[str, Any]:
        import jax.numpy as jnp

        from .ops.mel import log_mel

        self.load()
        win = int(_WINDOW_S * _SR)
        if _dev is None:
            if sr != _SR:
                audio = resample_poly(audio, sr, _SR)
            duration = len(audio) / _SR
            windows = self._windows(audio)
            n_win = windows.shape[0]
        else:
            duration = _n_valid / _SR
            windows = None
            n_win = max(1, -(-_n_valid // win))

        language = self.language
        if language in (None, "", "auto"):
            from .models.whisper.decode import detect_language

            first_win = (
                _window_batch_device(_dev, 0, 1, win)
                if _dev is not None
                else jnp.asarray(windows[:1])
            )
            first_mel = log_mel(first_win, n_mels=self.dims.n_mels)
            language, _ = detect_language(
                self.params, self.dims, self.tokenizer, first_mel
            )
            logger.info("Detected language: %s", language)

        opts = self._decode_options(language)

        if self.chunking == "sequential":
            if _dev is not None:  # seek loop is host-driven; materialise
                audio = np.asarray(_dev, dtype=np.float32)[:_n_valid]
            return self._transcribe_sequential(audio, duration, opts, language)

        segments: List[Dict[str, Any]] = []
        texts: List[str] = []

        n_data = 1
        if self.mesh is not None and "data" in self.mesh.axis_names:
            n_data = self.mesh.shape["data"]

        from .models.whisper.decode import decode_windows_async, finalize_decode

        def dispatch(start: int):
            """Launch one window batch (async); returns finalize context."""
            b = min(self.batch_size, n_win - start)
            # Bucket the batch dim so jit compiles a bounded set of shapes;
            # on a mesh the bucket must divide evenly across the data axis.
            bucket = next(
                (c for c in _BATCH_BUCKETS if c >= b and c % n_data == 0),
                ((b + n_data - 1) // n_data) * n_data,
            )
            if _dev is not None:
                padded = _window_batch_device(_dev, start, bucket, win)
            elif bucket > b:
                padded = np.concatenate(
                    [windows[start : start + b],
                     np.zeros((bucket - b, windows.shape[1]), np.float32)]
                )
            else:
                padded = windows[start : start + b]
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                import jax

                batch_dev = jax.device_put(
                    padded, NamedSharding(self.mesh, P("data", None))
                )
            else:
                batch_dev = jnp.asarray(padded)
            mel = log_mel(batch_dev, n_mels=self.dims.n_mels)

            audio_kv = None
            if self.word_timestamps:
                from .models.whisper.decode import encode_audio_kv

                audio_kv = encode_audio_kv(self.params, self.dims, mel)

            pending = decode_windows_async(
                self.params, self.dims, self.tokenizer, mel, opts,
                audio_kv=audio_kv,
            )
            return start, b, pending, audio_kv, mel

        def collect(ctx) -> None:
            start, b, pending, audio_kv, mel = ctx
            result = finalize_decode(pending)
            tokens_rows = {i: result.tokens[i] for i in range(b)}
            avg_lp = {i: float(result.avg_logprobs[i]) for i in range(b)}
            no_speech = {i: float(result.no_speech_probs[i]) for i in range(b)}

            # Temperature-fallback ladder (whisper decode heuristics):
            # windows with a repetition loop or low avg logprob retry at
            # increasing sampling temperatures.
            if self.temperature_fallback and opts.temperature == 0.0:
                failing = []
                for i in range(b):
                    text = self.tokenizer.decode(
                        [t for t in tokens_rows[i] if t < self.tokenizer.eot]
                    )
                    if self._needs_fallback(avg_lp[i], tokens_rows[i], text):
                        failing.append(i)
                if failing:
                    retried = self._retry_windows(mel, failing, opts)
                    for i, (toks, lp) in retried.items():
                        tokens_rows[i] = toks
                        avg_lp[i] = lp

            align_jobs: List[tuple] = []
            for i in range(b):
                if self._should_skip_window(no_speech[i], avg_lp[i]):
                    continue  # whisper drops silent/music windows entirely
                offset = (start + i) * _WINDOW_S
                win_dur = min(_WINDOW_S, duration - offset)
                segs = self._parse_window(
                    tokens_rows[i], avg_lp[i], offset, win_dur
                )
                if self.word_timestamps and segs:
                    align_jobs.append((segs, tokens_rows[i], i, offset))
                segments.extend(segs)
                texts.extend(s["text"] for s in segs)
            self._attach_words_batch(align_jobs, audio_kv, opts)

        # Keep up to `depth` batches in flight: JAX dispatch is async, so
        # the device crunches batch k+1 while the host parses batch k.
        depth = 1 if self.word_timestamps else 2  # audio_kv is large
        in_flight: List[Any] = []
        for start in range(0, n_win, self.batch_size):
            in_flight.append(dispatch(start))
            if len(in_flight) > depth:
                collect(in_flight.pop(0))
        for ctx in in_flight:
            collect(ctx)

        return {
            "text": " ".join(t for t in texts if t),
            "segments": segments,
            "language": language,
            "duration": duration,
        }

    def _transcribe_sequential(
        self, audio: np.ndarray, duration: float, opts, language: str
    ) -> Dict[str, Any]:
        """Seek-based long-form decoding (whisper's transcribe loop; the
        reference inherits it via its backends at transcriber.py:421-439).

        Each 30 s window is conditioned on previously decoded text
        (condition_on_previous_text) and the seek pointer advances by the
        last emitted timestamp — segments that straddle a fixed 30 s
        boundary are re-decoded from their true start instead of being
        split. Windows failing the no-speech gate are skipped whole.
        Slower than batched mode — use for accuracy-sensitive files."""
        win = int(_WINDOW_S * _SR)
        n_samples = len(audio)
        segments: List[Dict[str, Any]] = []
        texts: List[str] = []
        all_tokens: List[int] = []  # decoded text tokens for conditioning

        seek = 0
        while seek < n_samples:
            chunk = audio[seek : seek + win]
            segs, advance, all_tokens = self.seek_decode_step(
                chunk, seek, opts, all_tokens
            )
            segments.extend(segs)
            texts.extend(s["text"] for s in segs)
            seek += advance

        return {
            "text": " ".join(t for t in texts if t),
            "segments": segments,
            "language": language,
            "duration": duration,
        }

    def seek_decode_step(
        self,
        chunk: np.ndarray,
        seek: int,
        opts,
        all_tokens: List[int],
    ) -> Tuple[List[Dict[str, Any]], int, List[int]]:
        """Decode ONE seek window (<= 30 s of audio at sample offset
        ``seek``), conditioned on previously consumed text tokens.

        Returns ``(segments, advance_samples, all_tokens)`` — the shared
        step of the sequential loop and the streaming session
        (:mod:`.streaming`). ``advance_samples`` is always > 0.
        """
        from dataclasses import replace

        import jax.numpy as jnp

        from .models.whisper.decode import decode_windows
        from .ops.mel import log_mel

        win = int(_WINDOW_S * _SR)
        base_prompt = list(self._prompt_tokens())
        cap = self.dims.n_text_ctx // 2 - 1
        space = self.tokenizer.encode(" ")
        pad_tok = space[0] if space else 220

        win_dur = len(chunk) / _SR
        padded = np.zeros(win, dtype=np.float32)
        padded[: len(chunk)] = chunk

        if self.condition_on_previous_text:
            prompt = (base_prompt + all_tokens)[-cap:]
        else:
            prompt = base_prompt[-cap:]
        # Fixed prompt length after the first window: one compiled
        # prefill shape instead of one per conditioning length.
        if prompt:
            prompt = [pad_tok] * (cap - len(prompt)) + prompt
        w_opts = replace(opts, prompt_tokens=tuple(prompt))
        mel = log_mel(jnp.asarray(padded[None, :]), n_mels=self.dims.n_mels)
        result = decode_windows(
            self.params, self.dims, self.tokenizer, mel, w_opts
        )
        avg_lp = float(result.avg_logprobs[0])
        no_speech = float(result.no_speech_probs[0])
        tokens_row = result.tokens[0]

        if self.temperature_fallback and w_opts.temperature == 0.0:
            text = self.tokenizer.decode(
                [t for t in tokens_row if t < self.tokenizer.eot]
            )
            if self._needs_fallback(avg_lp, tokens_row, text):
                retried = self._retry_windows(mel, [0], w_opts)
                if 0 in retried:
                    tokens_row, avg_lp = retried[0]

        if self._should_skip_window(no_speech, avg_lp):
            return [], len(chunk), all_tokens  # silent window: move on

        segs, advance_s, consumed = self._parse_window_seek(
            tokens_row, avg_lp, seek / _SR, win_dur
        )
        if advance_s <= 0:  # degenerate grammar output: force progress
            advance_s = win_dur
        return segs, int(round(advance_s * _SR)), all_tokens + consumed

    def _parse_window_seek(
        self, tokens, avg_logprob: float, offset: float, win_dur: float
    ):
        """openai-whisper's segment slicing for the seek loop.

        Returns ``(segments, advance_seconds, consumed_text_tokens)``:
        when the window ends mid-segment (last timestamps form a pair),
        only completed segments are emitted and the seek advances to the
        last paired timestamp; a single trailing timestamp means the whole
        window was consumed.
        """
        tok = self.tokenizer
        content: List[int] = []
        for t in tokens:
            t = int(t)
            if t == tok.eot:
                break
            content.append(t)
        if not content:
            return [], win_dur, []

        is_ts = [tok.is_timestamp(t) for t in content]
        single_ts_ending = len(content) >= 2 and not is_ts[-2] and is_ts[-1]
        consecutive = [
            i + 1 for i in range(len(content) - 1) if is_ts[i] and is_ts[i + 1]
        ]

        def emit(sub: List[int], out: List[Dict[str, Any]]):
            start_ts = tok.timestamp_to_seconds(sub[0])
            end_ts = tok.timestamp_to_seconds(sub[-1])
            if start_ts >= win_dur:
                return
            text = tok.decode([t for t in sub if not tok.is_timestamp(t)]).strip()
            if not text:
                return
            out.append({
                "start": round(offset + start_ts, 3),
                "end": round(offset + min(end_ts, win_dur), 3),
                "text": text,
                "confidence": avg_logprob,
            })

        out: List[Dict[str, Any]] = []
        if consecutive:
            slices = list(consecutive)
            if single_ts_ending:
                slices.append(len(content))
            last = 0
            for cur in slices:
                emit(content[last:cur], out)
                last = cur
            if single_ts_ending:
                advance = win_dur  # whole window consumed
            else:
                # seek to the end of the last completed segment
                advance = tok.timestamp_to_seconds(content[last - 1])
            consumed = [t for t in content[:last] if not tok.is_timestamp(t)]
            return out, advance, consumed

        # no completed pair: one segment spanning to the last timestamp
        dur = win_dur
        ts_list = [t for t in content if tok.is_timestamp(t)]
        if ts_list and ts_list[-1] != tok.timestamp_begin:
            dur = min(win_dur, tok.timestamp_to_seconds(ts_list[-1]))
        text = tok.decode(
            [t for t in content if not tok.is_timestamp(t)]
        ).strip()
        if text:
            out.append({
                "start": round(offset, 3),
                "end": round(offset + dur, 3),
                "text": text,
                "confidence": avg_logprob,
            })
        consumed = [t for t in content if not tok.is_timestamp(t)]
        return out, win_dur, consumed

    def _retry_windows(self, mel, failing: List[int], opts) -> Dict[int, tuple]:
        """Re-decode failing windows through the temperature ladder.

        Returns {window_index: (tokens, avg_logprob)} for windows whose
        retry passed the quality gates (or the last attempt otherwise —
        whisper keeps the final ladder result even when imperfect).
        """
        import jax
        import jax.numpy as jnp

        from .models.whisper.decode import decode_windows
        from dataclasses import replace

        out: Dict[int, tuple] = {}
        remaining = list(failing)
        # fixed-shape retry batch: bucket the failing subset
        for temp_idx, temp in enumerate(self.fallback_temperatures):
            if not remaining:
                break
            bucket = next((c for c in _BATCH_BUCKETS if c >= len(remaining)),
                          len(remaining))
            rows = (remaining + [remaining[-1]] * bucket)[:bucket]
            sub_mel = mel[jnp.asarray(rows, dtype=jnp.int32)]
            retry_opts = replace(opts, temperature=float(temp), beam_size=1)
            result = decode_windows(
                self.params, self.dims, self.tokenizer, sub_mel, retry_opts,
                rng=_retry_rng(temp_idx),
            )
            still: List[int] = []
            for j, win in enumerate(remaining):
                toks = result.tokens[j]
                lp = float(result.avg_logprobs[j])
                text = self.tokenizer.decode(
                    [t for t in toks if t < self.tokenizer.eot]
                )
                if self._needs_fallback(lp, toks, text) and temp != self.fallback_temperatures[-1]:
                    still.append(win)
                else:
                    out[win] = (toks, lp)
            remaining = still
            if remaining:
                logger.debug(
                    "temperature fallback: %d windows retry at > %.1f",
                    len(remaining), temp,
                )
        return out

    def _attach_words_batch(
        self,
        jobs: List[tuple],  # (segs, tokens, window_idx, offset)
        audio_kv,
        opts,
    ) -> None:
        """DTW word alignment for a batch of windows in one (or few)
        device passes; refines segment boundaries and attaches ``words``
        to each segment. Per-window passes cost ~4 s of an 8-minute
        serving run; batched they are a few hundred ms."""
        from .models.whisper.decode import build_initial_tokens
        from .models.whisper.timestamps import align_words_batched

        if not jobs:
            return
        xa_k, xa_v = audio_kv
        prefix, _ = build_initial_tokens(self.tokenizer, opts)
        items = [
            (idx, [int(t) for t in tokens], prefix)
            for (_, tokens, idx, _) in jobs
        ]
        words_per_window = align_words_batched(
            self.params, self.dims, self.tokenizer, xa_k, xa_v, items
        )
        for (segs, _, _, offset), words in zip(jobs, words_per_window):
            self._apply_words(segs, words, offset)

    def _attach_words(
        self, segs: List[Dict[str, Any]], tokens, audio_kv, window_idx: int,
        opts, offset: float,
    ) -> None:
        """Single-window DTW word alignment (sequential seek path)."""
        from .models.whisper.decode import build_initial_tokens
        from .models.whisper.timestamps import align_words

        xa_k, xa_v = audio_kv
        prefix, _ = build_initial_tokens(self.tokenizer, opts)
        i = window_idx
        words = align_words(
            self.params, self.dims, self.tokenizer,
            xa_k[:, i : i + 1], xa_v[:, i : i + 1],
            [int(t) for t in tokens], prefix,
        )
        self._apply_words(segs, words, offset)

    @staticmethod
    def _apply_words(
        segs: List[Dict[str, Any]], words: List[Dict[str, float]], offset: float
    ) -> None:
        if not words:
            return
        for seg in segs:
            s0 = seg["start"] - offset
            s1 = seg["end"] - offset
            inside = [
                {"word": w["word"],
                 "start": round(w["start"] + offset, 3),
                 "end": round(w["end"] + offset, 3)}
                for w in words
                if s0 - 0.2 <= (w["start"] + w["end"]) / 2 <= s1 + 0.2
            ]
            if inside:
                seg["words"] = inside
                # word-level boundaries are tighter than timestamp tokens
                seg["start"] = min(seg["start"], inside[0]["start"])
                seg["end"] = max(seg["end"], inside[-1]["end"])

    def _parse_window(
        self, tokens: np.ndarray, avg_logprob: float, offset: float, win_dur: float
    ) -> List[Dict[str, Any]]:
        """Timestamp-token grammar -> segment dicts on the file timeline."""
        tok = self.tokenizer
        eot = tok.eot
        segs: List[Dict[str, Any]] = []

        if not self.timestamps:
            ids = [int(t) for t in tokens if int(t) != eot and not tok.is_timestamp(int(t))]
            text = tok.decode(ids).strip()
            if text:
                segs.append(
                    {
                        "start": round(offset, 3),
                        "end": round(offset + win_dur, 3),
                        "text": text,
                        "confidence": avg_logprob,
                    }
                )
            return segs

        cur_start: Optional[float] = None
        cur_text: List[int] = []
        for t in tokens:
            t = int(t)
            if t == eot:
                break
            if tok.is_timestamp(t):
                ts = tok.timestamp_to_seconds(t)
                if cur_start is not None and cur_text:
                    segs.append((cur_start, ts, cur_text))
                    cur_text = []
                    cur_start = None
                else:
                    cur_start = ts
            else:
                cur_text.append(t)
        if cur_start is not None and cur_text:
            segs.append((cur_start, min(_WINDOW_S, win_dur), cur_text))

        out = []
        for s, e, ids in segs:
            if s >= win_dur:
                continue
            text = tok.decode(ids).strip()
            if not text:
                continue
            out.append(
                {
                    "start": round(offset + s, 3),
                    "end": round(offset + min(e, win_dur), 3),
                    "text": text,
                    "confidence": avg_logprob,
                }
            )
        return out


class WhisperTranscriber:
    """Reference-compatible transcriber (openai-whisper backend analog).

    Constructor signature and behaviours match transcriber.py:82-113 of the
    reference, including the MODEL_INFO capability table, lazy loading and
    retry on transient runtime errors.
    """

    supports_buffers = True  # reads audio_io.AudioBuffer hand-offs
    MODEL_INFO = MODEL_INFO

    def __init__(
        self,
        model_name: str = "large-v3-turbo",
        language: str = "pt",
        prompt: str = "",
        task: str = "transcribe",
        temperature: float = 0.0,
        beam_size: int = 5,
        lazy_load: bool = True,
        weights_path: Optional[str] = None,
        batch_size: int = 16,
        mesh=None,
        word_timestamps: bool = True,
        chunking: str = "batched",
        max_decode_tokens: int = 224,
    ) -> None:
        self.model_name = model_name
        self.language = language
        self.prompt = prompt
        self.task = task
        self.temperature = temperature
        self.beam_size = beam_size

        if model_name not in self.MODEL_INFO and model_name in WHISPER_DIMS:
            logger.info("Using non-standard model: %s", model_name)
        elif model_name not in WHISPER_DIMS:
            logger.warning("Unknown model: %s. Proceeding anyway.", model_name)
        else:
            info = self.MODEL_INFO[model_name]
            logger.info(
                "Whisper model: %s (%s params, ~%dGB HBM)",
                model_name, info["params"], info["vram_gb"],
            )

        self._backend = JaxWhisperBackend(
            model_name=model_name if model_name in WHISPER_DIMS else "tiny",
            language=language,
            task=task,
            temperature=temperature,
            beam_size=beam_size,
            prompt=prompt,
            weights_path=weights_path,
            batch_size=batch_size,
            mesh=mesh,
            word_timestamps=word_timestamps,
            chunking=chunking,
            max_decode_tokens=max_decode_tokens,
        )
        if not lazy_load:
            self.load_model()

    @classmethod
    def from_config(cls, config: PipelineConfig) -> "WhisperTranscriber":
        inst = cls(
            model_name=config.transcription.model,
            language=config.transcription.language,
            prompt=config.transcription.prompt or "",
            task=config.transcription.task,
            temperature=config.transcription.temperature,
            beam_size=config.transcription.beam_size,
            lazy_load=config.lazy_load_models,
            weights_path=config.transcription.weights_path,
            batch_size=config.transcription.batch_size,
            mesh=_mesh_from_config(config),
            word_timestamps=config.transcription.word_timestamps,
            chunking=config.transcription.chunking,
            max_decode_tokens=config.transcription.max_decode_tokens,
        )
        inst._backend.no_speech_threshold = config.transcription.no_speech_threshold
        inst._backend.logprob_threshold = config.transcription.logprob_threshold
        inst._backend.compression_ratio_threshold = (
            config.transcription.compression_ratio_threshold
        )
        inst._backend.patience = config.transcription.patience
        inst._backend.kv_cache_dtype = getattr(
            config.transcription, "kv_cache_dtype", "int8"
        )
        inst._backend.condition_on_previous_text = (
            config.transcription.condition_on_previous_text
        )
        # The reference constructor has no compute_type (openai-whisper
        # handles fp16 internally, transcriber.py:82-113), so the config
        # knob plumbs straight to the backend; without this the "openai"
        # backend silently ignored transcription.compute_type.
        inst._backend.compute_dtype = {"float16": "bfloat16"}.get(
            config.transcription.compute_type, config.transcription.compute_type
        )
        return inst

    def is_loaded(self) -> bool:
        return self._backend.params is not None

    def load_model(self) -> None:
        self._backend.load()

    def unload_model(self) -> None:
        if self.is_loaded():
            self._backend.unload()
            logger.info("Whisper model unloaded")

    @retry_with_backoff(
        config=RetryConfig(max_attempts=2, initial_delay_s=2.0),
        exceptions=(RuntimeError,),
    )
    def transcribe(self, input_wav: str) -> Dict[str, Any]:
        logger.info("Transcribing: %s", input_wav)
        try:
            buf = get_buffer(input_wav)
            if buf is not None and buf.device is not None:
                result = self._backend.transcribe_buffer(buf)
            else:
                audio, sr = _read_stage_input(input_wav)
                result = self._backend.transcribe_array(audio, sr)
        except (RuntimeError,):
            raise
        except Exception as exc:
            raise TranscriptionError(
                f"Transcription failed for: {input_wav}", details=str(exc)
            )
        logger.info(
            "Transcription complete: %d segments, %d chars",
            len(result["segments"]), len(result["text"]),
        )
        return result

    def transcribe_with_options(self, input_wav: str, **kwargs) -> Dict[str, Any]:
        """Per-call option overrides (language/task/temperature/beam_size...)."""
        saved = {}
        backend = self._backend
        for key, val in kwargs.items():
            name = {"initial_prompt": "prompt"}.get(key, key)
            if hasattr(backend, name):
                saved[name] = getattr(backend, name)
                setattr(backend, name, val)
        try:
            buf = get_buffer(input_wav)
            if buf is not None and buf.device is not None:
                return backend.transcribe_buffer(buf)
            audio, sr = _read_stage_input(input_wav)
            return backend.transcribe_array(audio, sr)
        except Exception as exc:
            raise TranscriptionError("Transcription failed", details=str(exc))
        finally:
            for name, val in saved.items():
                setattr(backend, name, val)


class FasterWhisperTranscriber:
    """Optimised transcriber with device fallback (reference parity:
    transcriber.py:291-553, minus the CUDA-specific DLL recovery).

    The reference's ``vad_filter=True`` (built-in Silero) is reproduced by
    running our energy VAD over the audio before windowing, so silent
    stretches never reach the decoder.
    """

    supports_buffers = True  # reads audio_io.AudioBuffer hand-offs

    def __init__(
        self,
        model_name: str = "large-v3",
        device: str = "tpu",
        compute_type: str = "bfloat16",
        beam_size: int = 5,
        language: str = "pt",
        lazy_load: bool = True,
        weights_path: Optional[str] = None,
        batch_size: int = 16,
        vad_filter: bool = True,
        mesh=None,
        word_timestamps: bool = True,
        chunking: str = "batched",
        max_decode_tokens: int = 224,
    ):
        self.model_name = model_name
        self.device = device
        self.compute_type = compute_type
        self.beam_size = beam_size
        self.language = language
        self.vad_filter = vad_filter

        compute = {"float32": "float32", "int8": "int8"}.get(compute_type, "bfloat16")
        self._backend = JaxWhisperBackend(
            model_name=model_name,
            language=language,
            beam_size=beam_size,
            weights_path=weights_path,
            compute_dtype=compute,
            batch_size=batch_size,
            mesh=mesh,
            word_timestamps=word_timestamps,
            chunking=chunking,
            max_decode_tokens=max_decode_tokens,
        )
        if not lazy_load:
            self.load_model()

    @classmethod
    def from_config(cls, config: PipelineConfig) -> "FasterWhisperTranscriber":
        compute_type = config.transcription.compute_type
        if compute_type == "float16":  # CUDA-ism: map to bf16 on TPU
            compute_type = "bfloat16"
        inst = cls(
            model_name=config.transcription.model,
            device=config.transcription.device,
            compute_type=compute_type,
            beam_size=config.transcription.beam_size,
            language=config.transcription.language,
            lazy_load=config.lazy_load_models,
            weights_path=config.transcription.weights_path,
            batch_size=config.transcription.batch_size,
            mesh=_mesh_from_config(config),
            word_timestamps=config.transcription.word_timestamps,
            chunking=config.transcription.chunking,
            max_decode_tokens=config.transcription.max_decode_tokens,
        )
        inst._backend.no_speech_threshold = config.transcription.no_speech_threshold
        inst._backend.logprob_threshold = config.transcription.logprob_threshold
        inst._backend.compression_ratio_threshold = (
            config.transcription.compression_ratio_threshold
        )
        inst._backend.patience = config.transcription.patience
        inst._backend.kv_cache_dtype = getattr(
            config.transcription, "kv_cache_dtype", "int8"
        )
        inst._backend.condition_on_previous_text = (
            config.transcription.condition_on_previous_text
        )
        return inst

    def is_loaded(self) -> bool:
        return self._backend.params is not None

    def load_model(self) -> None:
        self._backend.load()

    def unload_model(self) -> None:
        if self.is_loaded():
            self._backend.unload()
            logger.info("FasterWhisper model unloaded")

    def _gate_silence_device(self, dev, n_valid: int, sr: int):
        """Device variant of :meth:`_gate_silence`: band stats fetched
        (two small arrays), host hangover machine, frame keep-mask applied
        on device — the waveform never crosses the link."""
        import functools

        import jax

        from .ops.vad_ops import (
            band_energies,
            flags_from_band_stats,
            hangover_segments,
        )

        frame_ms = 30
        frame_len = sr * frame_ms // 1000
        nvf = n_valid // frame_len
        if nvf == 0:
            return dev
        bands_d, db_d = band_energies(dev, sr, frame_ms)
        flags = flags_from_band_stats(
            np.asarray(bands_d)[:nvf], np.asarray(db_d)[:nvf], 1
        )
        segs = hangover_segments(flags, frame_ms, 300, 0.5, 0.9)
        if not segs:
            return dev
        keep = np.zeros(int(dev.shape[-1]) // frame_len, dtype=np.float32)
        for s, e, _ in segs:
            keep[s : e + 1] = 1.0

        @functools.lru_cache(maxsize=16)
        def build(frame_len, n_total):
            import jax.numpy as jnp

            @jax.jit
            def run(x, keep):
                return (x.reshape(-1, frame_len) * keep[:, None]).reshape(-1)

            return run

        import jax.numpy as jnp

        return build(frame_len, int(dev.shape[-1]))(dev, jnp.asarray(keep))

    def _gate_silence(self, audio: np.ndarray, sr: int) -> np.ndarray:
        """Built-in VAD gate: zero out non-speech (keeps timeline intact)."""
        from .ops.vad_ops import frame_speech_flags, hangover_segments

        frame_ms = 30
        flags = frame_speech_flags(audio, sr, frame_ms, 1)
        segs = hangover_segments(flags, frame_ms, 300, 0.5, 0.9)
        if not segs:
            return audio
        keep = np.zeros(len(audio), dtype=bool)
        spf = sr * frame_ms // 1000
        for s, e, _ in segs:
            keep[s * spf : (e + 1) * spf] = True
        gated = np.where(keep, audio, 0.0).astype(np.float32)
        return gated

    def transcribe(self, input_wav: str) -> Dict[str, Any]:
        try:
            return self._transcribe_impl(input_wav)
        except ModelLoadError:
            raise
        except Exception as exc:
            # Device-level failure: retry once on CPU (reference's CUDA->CPU
            # chain, transcriber.py:450-496).
            logger.warning(
                "Transcription failed (%s); retrying on CPU backend.", exc
            )
            try:
                import jax

                self.unload_model()
                cpu = jax.devices("cpu")[0]
                with jax.default_device(cpu):
                    return self._transcribe_impl(input_wav)
            except Exception as exc2:
                raise TranscriptionError(
                    f"Transcription failed after CPU fallback: {exc2}"
                )

    def _transcribe_impl(self, input_wav: str) -> Dict[str, Any]:
        logger.info("Transcribing (Optimized): %s", input_wav)
        self.load_model()
        buf = get_buffer(input_wav)
        frame_len = _SR * 30 // 1000
        if (
            buf is not None
            and buf.device is not None
            and buf.sr == _SR
            and int(buf.device.shape[-1]) % frame_len == 0
        ):
            dev = buf.device
            if self.vad_filter and buf.n_valid > buf.sr:
                dev = self._gate_silence_device(dev, buf.n_valid, buf.sr)
            from .audio_io import AudioBuffer

            return self._backend.transcribe_buffer(
                AudioBuffer(sr=buf.sr, n_valid=buf.n_valid, device=dev)
            )
        audio, sr = _read_stage_input(input_wav)
        if self.vad_filter and len(audio) > sr:
            audio = self._gate_silence(audio, sr)
        result = self._backend.transcribe_array(audio, sr)
        return result
