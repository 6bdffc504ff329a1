"""DSP kernel tests: JAX/XLA ops vs NumPy/SciPy oracles.

Each oracle re-derives the reference pipeline's third-party math
(noisereduce / pyloudnorm / pydub / webrtcvad semantics per SURVEY.md §3)
in plain NumPy, and the TPU ops must match it numerically.
"""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from modular_audio_pipeline_tpu.ops import dynamics, framing, iir, loudness, mel
from modular_audio_pipeline_tpu.ops import music, noise_detect, silence, stft, vad_ops
from modular_audio_pipeline_tpu.ops.spectral_gate import spectral_gate_stationary


SR = 16000


class TestFraming:
    def test_frame_signal_matches_stride_view(self, rng):
        x = rng.standard_normal(1000).astype(np.float32)
        frames = np.asarray(framing.frame_signal(jnp.asarray(x), 100, 40))
        expected = np.lib.stride_tricks.sliding_window_view(x, 100)[::40]
        np.testing.assert_allclose(frames, expected)

    def test_hann_matches_scipy_periodic(self):
        win = np.asarray(framing.hann_window(400))
        expected = scipy.signal.get_window("hann", 400, fftbins=True)
        np.testing.assert_allclose(win, expected, atol=1e-6)


class TestSTFT:
    def test_stft_matches_numpy_oracle(self, rng):
        """Centered reflect-pad Hann STFT (librosa convention) in plain NumPy."""
        x = rng.standard_normal(SR).astype(np.float32)
        n_fft, hop = 1024, 256
        ours = np.asarray(stft.stft(jnp.asarray(x), n_fft=n_fft, hop=hop))

        pad = np.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
        win = scipy.signal.get_window("hann", n_fft, fftbins=True)
        nf = 1 + (len(pad) - n_fft) // hop
        frames = np.stack([pad[i * hop : i * hop + n_fft] * win for i in range(nf)])
        expected = np.fft.rfft(frames, axis=-1).T  # [freq, time]

        assert ours.shape == expected.shape
        np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=1e-3)

    def test_roundtrip(self, rng):
        x = rng.standard_normal(SR // 2).astype(np.float32)
        spec = stft.stft(jnp.asarray(x), n_fft=1024, hop=256)
        back = np.asarray(stft.istft(spec, n_fft=1024, hop=256, length=len(x)))
        np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)


class TestIIR:
    def test_biquad_matches_scipy_lfilter(self, rng):
        x = rng.standard_normal(300_000).astype(np.float32)
        b = np.array([0.2, 0.1, -0.05])
        a = np.array([1.0, -0.6, 0.08])
        ours = np.asarray(iir.biquad_filter(jnp.asarray(x), b, a))
        ref = scipy.signal.lfilter(b, a, x.astype(np.float64))
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_batched(self, rng):
        x = rng.standard_normal((3, 50_000)).astype(np.float32)
        b = np.array([0.3, 0.0, 0.0])
        a = np.array([1.0, -0.5, 0.0])
        ours = np.asarray(iir.biquad_filter(jnp.asarray(x), b, a))
        for i in range(3):
            ref = scipy.signal.lfilter(b, a, x[i].astype(np.float64))
            np.testing.assert_allclose(ours[i], ref, rtol=1e-3, atol=1e-4)


def _oracle_integrated_loudness(x: np.ndarray, fs: int) -> float:
    """Plain NumPy BS.1770-4 (the math pyloudnorm implements)."""
    (b1, a1), (b2, a2) = loudness.k_weighting_coefficients(fs)
    y = scipy.signal.lfilter(b1, a1, x.astype(np.float64))
    y = scipy.signal.lfilter(b2, a2, y)
    block, step = int(0.4 * fs), int(0.1 * fs)
    if len(y) < block:
        return -np.inf
    n_blocks = 1 + (len(y) - block) // step
    z = np.array([np.mean(y[i * step : i * step + block] ** 2) for i in range(n_blocks)])
    l_blocks = -0.691 + 10 * np.log10(np.maximum(z, 1e-30))
    abs_mask = l_blocks > -70.0
    if not abs_mask.any():
        return -np.inf
    rel_gate = -0.691 + 10 * np.log10(z[abs_mask].mean()) - 10.0
    both = abs_mask & (l_blocks > rel_gate)
    if not both.any():
        return -np.inf
    return -0.691 + 10 * np.log10(z[both].mean())


class TestLoudness:
    def test_integrated_loudness_matches_oracle(self, rng):
        t = np.arange(5 * SR) / SR
        x = (0.1 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        x[2 * SR :] *= 3.0  # level change exercises gating
        ours = float(loudness.integrated_loudness(jnp.asarray(x), SR))
        ref = _oracle_integrated_loudness(x, SR)
        assert ours == pytest.approx(ref, abs=0.05)

    def test_silence_returns_neg_inf(self):
        x = np.zeros(SR, dtype=np.float32)
        assert np.isneginf(float(loudness.integrated_loudness(jnp.asarray(x), SR)))

    def test_normalize_hits_target(self):
        t = np.arange(6 * SR) / SR
        x = (0.05 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
        measured = loudness.integrated_loudness(jnp.asarray(x), SR)
        out = loudness.normalize_loudness(jnp.asarray(x), measured, target_lufs=-16.0)
        after = float(loudness.integrated_loudness(out, SR))
        assert after == pytest.approx(-16.0, abs=0.3)

    def test_limiter_prevents_clipping(self):
        t = np.arange(2 * SR) / SR
        x = (0.9 * np.sin(2 * np.pi * 100 * t)).astype(np.float32)
        out = loudness.normalize_loudness(jnp.asarray(x), jnp.asarray(-40.0), -5.0)
        assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-6


class TestDynamics:
    def test_dbfs_matches_pydub_formula(self, rng):
        x = (0.25 * rng.standard_normal(SR)).astype(np.float32)
        ours = float(dynamics.dbfs(jnp.asarray(x)))
        rms = np.sqrt(np.mean((x * 32768.0) ** 2))
        expected = 20 * np.log10(rms / 32768.0)
        assert ours == pytest.approx(expected, abs=1e-3)

    def test_peak_normalize(self):
        x = np.array([0.0, 0.25, -0.5], dtype=np.float32)
        out = np.asarray(dynamics.peak_normalize(jnp.asarray(x), headroom_db=0.1))
        assert np.max(np.abs(out)) == pytest.approx(10 ** (-0.1 / 20), rel=1e-5)

    def test_silent_input_unchanged(self):
        x = np.zeros(100, dtype=np.float32)
        out = np.asarray(dynamics.peak_normalize(jnp.asarray(x)))
        np.testing.assert_array_equal(out, x)


class TestSpectralGate:
    def test_reduces_noise_keeps_signal(self, rng):
        t = np.arange(3 * SR) / SR
        clean = 0.4 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
        noise = 0.05 * rng.standard_normal(len(t)).astype(np.float32)
        noisy = clean + noise
        noise_clip = noise[: SR // 2]

        out = np.asarray(
            spectral_gate_stationary(jnp.asarray(noisy), jnp.asarray(noise_clip), SR)
        )
        # Noise-only region energy drops substantially; signal band retained.
        silent_part = out[: SR // 4]
        assert np.std(silent_part) < np.std(noisy[: SR // 4])
        # correlation with clean stays high
        corr = np.corrcoef(out, clean)[0, 1]
        assert corr > 0.97

    def test_gain_floor_is_one_minus_prop(self, rng):
        # Pure stationary noise everywhere -> nearly everything gated to the
        # floor gain of (1 - prop_decrease).
        noise = (0.05 * rng.standard_normal(2 * SR)).astype(np.float32)
        out = np.asarray(
            spectral_gate_stationary(
                jnp.asarray(noise), jnp.asarray(noise[:SR]), SR, prop_decrease=0.8
            )
        )
        ratio = np.std(out) / np.std(noise)
        assert 0.1 < ratio < 0.45  # ~0.2 plus mask leakage


class TestSilence:
    def test_detect_nonsilent_finds_bursts(self, tone_plus_silence):
        x, sr = tone_plus_silence
        thresh = float(dynamics.dbfs(jnp.asarray(x))) - 40.0
        ranges = silence.detect_nonsilent_ranges(x, sr, 250, thresh)
        assert len(ranges) >= 1
        start_ms, end_ms = ranges[0][0], ranges[-1][1]
        assert 2500 <= start_ms <= 3300
        assert 6600 <= end_ms <= 7600

    def test_remove_silence_mappings_consistent(self, tone_plus_silence):
        x, sr = tone_plus_silence
        out, mappings, changed = silence.remove_silence(x, sr)
        assert changed and len(mappings) >= 1
        assert len(out) < len(x)
        for m in mappings:
            assert m.processed_end > m.processed_start
            assert m.original_end > m.original_start
            # chunk durations match on both timelines
            assert (m.processed_end - m.processed_start) == pytest.approx(
                m.original_end - m.original_start, abs=1e-6
            )

    def test_all_silence_passthrough(self):
        x = np.zeros(SR, dtype=np.float32)
        out, mappings, changed = silence.remove_silence(x, SR)
        assert not changed and mappings == []


class TestNoiseDetect:
    def test_matches_reference_loop_oracle(self, tone_plus_silence):
        x, sr = tone_plus_silence

        # Oracle: the reference's python loop (preprocessor.py:105-147).
        frame_length, hop = int(sr * 0.025), int(sr * 0.010)
        nf = (len(x) - frame_length) // hop + 1
        energies = np.zeros(nf)
        zcrs = np.zeros(nf)
        for i in range(nf):
            fr = x[i * hop : i * hop + frame_length]
            energies[i] = np.sqrt(np.mean(fr**2))
            zcrs[i] = np.sum(np.abs(np.diff(np.signbit(fr)))) / frame_length

        e_ours, z_ours = noise_detect.frame_energy_zcr(jnp.asarray(x), sr)
        np.testing.assert_allclose(np.asarray(e_ours), energies, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(z_ours), zcrs, rtol=1e-4, atol=1e-6)

    def test_detects_noise_in_quiet_hissy_region(self, rng):
        # Ramped hiss (realistic varying noise floor) then loud speech-like
        # tone: the quietest hiss forms a contiguous low-energy/high-ZCR run.
        sr = 16000
        ramp = np.linspace(0.0003, 0.003, 3 * sr)
        hiss = (ramp * rng.standard_normal(3 * sr)).astype(np.float32)
        t = np.arange(4 * sr) / sr
        tone = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        x = np.concatenate([hiss, tone]).astype(np.float32)

        segments = noise_detect.detect_noise_segments(x, sr)
        assert segments, "expected noise segments in the quiet hiss"
        longest = max(segments, key=lambda s: s[1] - s[0])
        mid = (longest[0] + longest[1]) / 2 / sr
        assert mid < 3.0  # inside the hiss region


class TestMusic:
    def test_steady_music_flagged(self):
        t = np.arange(5 * SR) / SR
        steady = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        res = music.analyze_audio_content(steady, SR)
        assert res["has_music"] and res["confidence"] > 0.5

    def test_bursty_speech_not_flagged(self, tone_plus_silence):
        x, sr = tone_plus_silence
        res = music.analyze_audio_content(x, sr)
        assert not res["has_music"]

    def test_too_short(self):
        res = music.analyze_audio_content(np.zeros(100, dtype=np.float32), SR)
        assert res["reason"] == "Audio too short"


class TestVADOps:
    def test_flags_follow_energy(self, tone_plus_silence):
        x, sr = tone_plus_silence
        flags = np.asarray(vad_ops.frame_speech_flags(jnp.asarray(x), sr, 30, 1))
        n = len(flags)
        # the burst occupies the middle ~40% of frames
        mid = flags[int(0.35 * n) : int(0.60 * n)]
        edge = np.concatenate([flags[: int(0.1 * n)], flags[int(0.9 * n) :]])
        assert mid.mean() > 0.5
        assert edge.mean() < 0.1

    def test_hangover_matches_reference_deque_oracle(self, rng):
        import collections

        frame_ms, padding_ms, start_th, stop_th = 30, 300, 0.5, 0.9
        flags = (rng.random(400) < 0.45).astype(np.int32)
        # make a couple of solid speech runs
        flags[50:120] = 1
        flags[200:210] = 1
        flags[300:390] = 0

        # Oracle: the reference's deque machine (vad.py:240-280).
        ring = collections.deque(maxlen=int(padding_ms / frame_ms))
        triggered = False
        oracle = []
        seg_start = None
        for i, f in enumerate(flags):
            if not triggered:
                ring.append((f, i))
                voiced = sum(1 for s, _ in ring if s)
                if voiced > start_th * ring.maxlen:
                    triggered = True
                    seg_start = ring[0][1]
                    ring.clear()
            else:
                ring.append((f, i))
                unvoiced = sum(1 for s, _ in ring if not s)
                if unvoiced > stop_th * ring.maxlen:
                    triggered = False
                    oracle.append((seg_start, i, ring[0][1] + 1))
                    ring.clear()
        if triggered:
            oracle.append((seg_start, len(flags) - 1, len(flags)))

        ours = vad_ops.hangover_segments(flags, frame_ms, padding_ms, start_th, stop_th)
        assert ours == oracle


class TestMel:
    def test_log_mel_shape_and_range(self, rng):
        audio = (0.1 * rng.standard_normal(SR * 30)).astype(np.float32)
        m = np.asarray(mel.log_mel(jnp.asarray(audio)))
        assert m.shape == (80, 3000)
        assert m.max() <= 1.01  # (log+4)/4 normalisation keeps max around <=1
        assert m.min() >= m.max() - 2.01  # floored at max-8 => range <= 2 after /4

    def test_filterbank_properties(self):
        fb = mel.mel_filterbank(80)
        assert fb.shape == (80, 201)
        assert (fb >= 0).all()
        # slaney normalisation: each filter integrates to ~2/bandwidth
        assert fb.sum() > 0

    def test_batched(self, rng):
        audio = (0.1 * rng.standard_normal((2, SR))).astype(np.float32)
        m = np.asarray(mel.log_mel(jnp.asarray(audio)))
        assert m.shape == (2, 80, 100)

    def test_matches_whisper_reference_frontend(self, rng):
        """Compare against an independent NumPy re-derivation of Whisper's
        exact preprocessing (torch.stft + librosa mel filters)."""
        audio = (0.1 * rng.standard_normal(SR * 2)).astype(np.float32)

        x = np.pad(audio, (200, 200), mode="reflect")
        win = scipy.signal.get_window("hann", 400, fftbins=True)
        nf = 1 + (len(x) - 400) // 160
        frames = np.stack([x[i * 160 : i * 160 + 400] * win for i in range(nf)])
        spec = np.fft.rfft(frames, axis=-1)
        power = (np.abs(spec) ** 2)[:-1]  # drop last frame
        fb = mel.mel_filterbank(80)
        melspec = power @ fb.T
        log_spec = np.log10(np.maximum(melspec.T, 1e-10))
        log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
        expected = (log_spec + 4.0) / 4.0

        ours = np.asarray(mel.log_mel(jnp.asarray(audio)))
        np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=1e-4)

    def test_128_mel_variant(self, rng):
        """large-v3 family uses 128 mel bins."""
        audio = (0.1 * rng.standard_normal(SR)).astype(np.float32)
        m = np.asarray(mel.log_mel(jnp.asarray(audio), n_mels=128))
        assert m.shape == (128, 100)
        assert np.isfinite(m).all()
