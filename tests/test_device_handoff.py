"""Device-resident stage hand-off == host path (VERDICT r3 #10).

The parity pipeline's stages gained device-resident variants so the
waveform never crosses the host<->device link: silence removal cuts via a
block-gather plan (with pydub's exact 20 ms crossfades), the VAD concats
voiced islands on device, the transcriber slices 30 s windows on device,
and FasterWhisper's built-in VAD gate masks frames on device. Each must
produce the same audio/mappings/segments as the host formulation it
replaces (reference semantics anchor:
``/root/reference/audio_pipeline/preprocessor.py:290-375``, ``vad.py``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from modular_audio_pipeline_tpu.ops.bucketing import pad_to_bucket

SR = 16000


def _speechy(seconds=35, seed=0, gaps=((5.0, 8.0), (20.0, 24.0))):
    """Tone bursts with true silence gaps (ms-aligned length)."""
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    x = 0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    x = (x * (np.sin(2 * np.pi * 0.9 * t) > -0.5)).astype(np.float32)
    x += 1e-4 * rng.standard_normal(n).astype(np.float32)
    for s, e in gaps:
        x[int(s * SR) : int(e * SR)] = 0.0
    return x


def _device_buffer(x):
    from modular_audio_pipeline_tpu.audio_io import AudioBuffer

    padded, n_valid = pad_to_bucket(x, SR)
    return AudioBuffer(sr=SR, n_valid=n_valid, device=jnp.asarray(padded))


class TestDeviceSilenceRemoval:
    def test_matches_host_cut_and_mappings(self, tmp_path):
        from modular_audio_pipeline_tpu.audio_io import clear_buffers, publish_buffer
        from modular_audio_pipeline_tpu.ops.silence import remove_silence
        from modular_audio_pipeline_tpu.preprocessor import AudioPreprocessor

        x = _speechy()
        pre = AudioPreprocessor(SR, str(tmp_path))

        clear_buffers()
        publish_buffer("dev.wav", _device_buffer(x))
        out_path, mappings_dev = pre.remove_silence("dev.wav")
        from modular_audio_pipeline_tpu.audio_io import get_buffer

        buf = get_buffer(out_path)
        assert buf.device is not None  # stayed on device
        got = buf.as_host()

        want, mappings_host, changed = remove_silence(x, SR)
        assert changed
        assert got.shape == want.shape
        # identical cut points; f32 device blend vs f32 host blend
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert len(mappings_dev) == len(mappings_host)
        for a, b in zip(mappings_dev, mappings_host):
            assert a.processed_start == pytest.approx(b.processed_start)
            assert a.processed_end == pytest.approx(b.processed_end)
            assert a.original_start == pytest.approx(b.original_start)
            assert a.original_end == pytest.approx(b.original_end)

    def test_all_silent_returns_input(self, tmp_path):
        from modular_audio_pipeline_tpu.audio_io import clear_buffers, publish_buffer
        from modular_audio_pipeline_tpu.preprocessor import AudioPreprocessor

        x = np.zeros(SR * 31, dtype=np.float32)
        pre = AudioPreprocessor(SR, str(tmp_path))
        clear_buffers()
        publish_buffer("quiet.wav", _device_buffer(x))
        out_path, mappings = pre.remove_silence("quiet.wav")
        assert out_path == "quiet.wav"
        assert mappings == []


class TestDeviceVADCut:
    def test_matches_host_filter(self, tmp_path):
        from modular_audio_pipeline_tpu.audio_io import (
            clear_buffers,
            get_buffer,
            publish_buffer,
        )
        from modular_audio_pipeline_tpu.vad import SileroVADFilter

        x = _speechy()
        vad = SileroVADFilter()
        vad._load_model()
        if vad._use_energy:
            pytest.skip("no trained VAD bundle shipped")

        clear_buffers()
        publish_buffer("host.wav", _device_buffer(x))
        # force the host path by hiding the device view
        buf = get_buffer("host.wav")
        host_view = buf.as_host()
        clear_buffers()
        from modular_audio_pipeline_tpu.audio_io import AudioBuffer

        publish_buffer(
            "host.wav", AudioBuffer(sr=SR, n_valid=len(host_view), host=host_view)
        )
        host_path, maps_host = vad.filter_voice("host.wav", str(tmp_path))
        host_out = (
            get_buffer(host_path).as_host() if get_buffer(host_path) else None
        )

        clear_buffers()
        publish_buffer("dev.wav", _device_buffer(x))
        dev_path, maps_dev = vad.filter_voice("dev.wav", str(tmp_path))
        dev_buf = get_buffer(dev_path)

        if host_out is None:  # no voiced segments in both
            assert dev_path == "dev.wav"
            return
        assert dev_buf.device is not None  # stayed on device
        got = dev_buf.as_host()
        np.testing.assert_allclose(got, host_out, atol=1e-6)
        assert len(maps_dev) == len(maps_host)
        for a, b in zip(maps_dev, maps_host):
            assert a.original_start == pytest.approx(b.original_start)
            assert a.original_end == pytest.approx(b.original_end)
            assert a.processed_start == pytest.approx(b.processed_start)
            assert a.processed_end == pytest.approx(b.processed_end)


class TestDeviceTranscribe:
    def test_buffer_matches_array(self):
        from modular_audio_pipeline_tpu.transcriber import JaxWhisperBackend

        x = _speechy(seconds=40)
        backend = JaxWhisperBackend(
            model_name="test-tiny", weights_path="random:0", language="en",
            beam_size=1, batch_size=2, max_decode_tokens=32,
            compute_dtype="float32", word_timestamps=False,
        )
        res_host = backend.transcribe_array(x.copy(), SR)

        buf = _device_buffer(x)
        res_dev = backend.transcribe_buffer(buf)
        assert res_dev["duration"] == pytest.approx(res_host["duration"])
        # padded device windows beyond the file add all-zero windows; the
        # host path windows exactly ceil(n/win).  Segments from real
        # windows must agree.
        host_segs = [
            (s["start"], s["end"], s["text"]) for s in res_host["segments"]
        ]
        dev_segs = [
            (s["start"], s["end"], s["text"])
            for s in res_dev["segments"]
            if s["start"] < res_host["duration"]
        ]
        assert dev_segs[: len(host_segs)] == host_segs


class TestDeviceGateSilence:
    def test_matches_host_gate(self):
        from modular_audio_pipeline_tpu.transcriber import FasterWhisperTranscriber

        x = _speechy()
        tr = FasterWhisperTranscriber(
            model_name="test-tiny", weights_path="random:0", lazy_load=True,
        )
        want = tr._gate_silence(x, SR)

        padded, n_valid = pad_to_bucket(x, SR)
        got_dev = tr._gate_silence_device(jnp.asarray(padded), n_valid, SR)
        got = np.asarray(got_dev)[:n_valid]
        np.testing.assert_allclose(got, want, atol=1e-6)
