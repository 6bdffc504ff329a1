"""StreamingSession: chunked ingest == offline sequential decode."""

import numpy as np
import pytest

from modular_audio_pipeline_tpu.streaming import StreamingSession
from modular_audio_pipeline_tpu.transcriber import JaxWhisperBackend

SR = 16000


def make_audio(seconds=70.0, seed=0):
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    f0 = 140 + 30 * np.sin(2 * np.pi * 0.7 * t)
    sig = sum(
        (0.3 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / SR) for k in range(1, 5)
    )
    env = (np.sin(2 * np.pi * 1.1 * t) > -0.4).astype(np.float32)
    out = (sig * env * 0.3).astype(np.float32)
    out += 0.001 * rng.standard_normal(n).astype(np.float32)
    return out


@pytest.fixture(scope="module")
def backend():
    b = JaxWhisperBackend(
        "test-tiny", language="en", weights_path="random:0",
        beam_size=1, max_decode_tokens=24, chunking="sequential",
        word_timestamps=False, temperature_fallback=False,
        no_speech_threshold=None,  # random weights: don't gate
    )
    b.load()
    return b


class TestStreaming:
    def test_matches_offline_sequential(self, backend):
        audio = make_audio(70.0)
        offline = backend.transcribe_array(audio, SR)

        session = StreamingSession(backend)
        streamed = []
        for start in range(0, len(audio), 7 * SR):  # awkward 7 s chunks
            streamed.extend(session.feed(audio[start : start + 7 * SR], SR))
        result = session.finish()

        assert result["text"] == offline["text"]
        assert [s["text"] for s in result["segments"]] == [
            s["text"] for s in offline["segments"]
        ]
        assert [s["start"] for s in result["segments"]] == [
            s["start"] for s in offline["segments"]
        ]
        assert result["duration"] == pytest.approx(offline["duration"], abs=1e-3)
        # everything emitted mid-stream is a prefix of the final segments
        assert streamed == result["segments"][: len(streamed)]

    def test_incremental_emission_before_finish(self, backend):
        # 70 s fed in 10 s chunks: at least one full window decodes before
        # finish(), so segments arrive mid-stream.
        audio = make_audio(70.0, seed=1)
        session = StreamingSession(backend)
        mid = []
        for start in range(0, len(audio), 10 * SR):
            mid.extend(session.feed(audio[start : start + 10 * SR], SR))
        assert mid, "expected segments finalized before finish()"
        session.finish()

    def test_int16_and_resample_ingest(self, backend):
        audio = make_audio(35.0, seed=2)
        session = StreamingSession(backend)
        ref = StreamingSession(backend)

        as_int16 = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
        for start in range(0, len(audio), 5 * SR):
            session.feed(as_int16[start : start + 5 * SR], SR)
            ref.feed(audio[start : start + 5 * SR], SR)
        got, want = session.finish(), ref.finish()
        assert got["text"] == want["text"]

    def test_feed_after_finish_raises(self, backend):
        session = StreamingSession(backend)
        session.feed(make_audio(2.0), SR)
        session.finish()
        with pytest.raises(RuntimeError):
            session.feed(make_audio(1.0), SR)

    def test_context_manager_flushes(self, backend):
        audio = make_audio(35.0, seed=3)
        with StreamingSession(backend) as session:
            session.feed(audio, SR)
        assert session._finished
