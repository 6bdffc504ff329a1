"""Powerset segmentation model tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modular_audio_pipeline_tpu.models.diarization.segmentation import (
    N_CLASSES,
    SegmentationNet,
    aggregate_windows,
    powerset_decode,
    sliding_windows,
)


class TestPowerset:
    def test_decode_marginals(self):
        # one-hot class {A,B} -> speakers 0 and 1 active, 2 inactive
        logits = np.full((1, N_CLASSES), -20.0)
        logits[0, 4] = 20.0  # class (0, 1)
        act = powerset_decode(logits)
        np.testing.assert_allclose(act[0], [1.0, 1.0, 0.0], atol=1e-4)

    def test_decode_none_class(self):
        logits = np.full((1, N_CLASSES), -20.0)
        logits[0, 0] = 20.0  # empty set
        act = powerset_decode(logits)
        np.testing.assert_allclose(act[0], [0.0, 0.0, 0.0], atol=1e-4)


class TestWindows:
    def test_sliding_layout(self):
        spans = sliding_windows(16000 * 25, 16000)  # 25s, 10s window, 1s step
        assert spans[0] == (0, 160000)
        assert spans[1][0] == 16000
        assert spans[-1][1] == 16000 * 25  # tail covered

    def test_short_audio_single_window(self):
        assert sliding_windows(16000 * 5, 16000) == [(0, 16000 * 5)]

    def test_aggregate_permutation_alignment(self):
        # two overlapping windows with swapped speaker channels must align
        t = 1000  # frames per window
        a = np.zeros((t, 3), np.float32)
        a[:, 0] = 1.0  # speaker in channel 0
        b = np.zeros((t, 3), np.float32)
        b[:, 1] = 1.0  # same speaker, channel 1 in the second window
        spans = [(0, 160000), (80000, 240000)]
        agg = aggregate_windows(np.stack([a, b]), spans, 240000, 16000)
        # after alignment one channel carries the speaker throughout
        peak = agg.max(axis=0)
        assert peak.max() > 0.9
        assert (agg.max(axis=-1) > 0.4).mean() > 0.9


class TestSegmentationNet:
    def test_forward_shapes(self, rng):
        net = SegmentationNet(seed=0)
        mel = rng.standard_normal((2, 200, 40)).astype(np.float32)
        acts = net.activities(mel)
        assert acts.shape == (2, 200, 3)
        assert (acts >= 0).all() and (acts <= 1).all()

    def test_checkpoint_roundtrip(self, tmp_path):
        from modular_audio_pipeline_tpu.models.whisper.convert import (
            load_params,
            save_params,
        )

        net = SegmentationNet(seed=0)
        save_params(jax.tree.map(np.asarray, net.params), str(tmp_path))
        net2 = SegmentationNet(params=load_params(str(tmp_path)))
        mel = np.ones((1, 50, 40), np.float32)
        np.testing.assert_allclose(
            net.activities(mel), net2.activities(mel), atol=1e-6
        )

    def test_diarizer_uses_segmentation_when_present(self, tmp_path, monkeypatch, rng):
        from modular_audio_pipeline_tpu.diarizer import SpeakerDiarizer
        from modular_audio_pipeline_tpu.models.whisper.convert import save_params

        net = SegmentationNet(seed=0)
        seg_dir = tmp_path / "diarization-segmentation"
        save_params(jax.tree.map(np.asarray, net.params), str(seg_dir))
        monkeypatch.setenv("MAP_TPU_WEIGHTS", str(tmp_path))

        diar = SpeakerDiarizer(lazy_load=True)
        diar.load_model()
        assert diar._segmentation is not None
        audio = (0.2 * rng.standard_normal(16000 * 12)).astype(np.float32)
        regions = diar._speech_regions(audio, 16000)
        for s, e in regions:
            assert 0 <= s < e <= len(audio)
