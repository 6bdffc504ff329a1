"""Silero VAD conversion path: state_dict mapping, shape checks, JAX graph."""

import numpy as np
import pytest

from modular_audio_pipeline_tpu.models.silero_convert import (
    EXPECTED_SHAPES,
    convert_state_dict,
    is_silero_tree,
)
from modular_audio_pipeline_tpu.models.vad_net import SileroVAD

SR = 16000


def synthetic_state_dict(seed=0):
    """State dict with the published v5 layout (stand-in for the real
    silero_vad.jit, which zero egress keeps out of this environment)."""
    rng = np.random.default_rng(seed)
    sd = {}
    for key, shape in EXPECTED_SHAPES.items():
        fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
        sd[key] = (rng.standard_normal(shape) / np.sqrt(fan_in)).astype(np.float32)
    # a plausible STFT basis: DFT atoms (real rows then imag rows)
    n_fft = 256
    k = np.arange(129)[:, None]
    n = np.arange(n_fft)[None, :]
    sd["_model.stft.forward_basis_buffer"] = np.concatenate(
        [np.cos(2 * np.pi * k * n / n_fft), -np.sin(2 * np.pi * k * n / n_fft)]
    )[:, None, :].astype(np.float32)
    return sd


class TestConversion:
    def test_tree_layout_and_shapes(self):
        tree = convert_state_dict(synthetic_state_dict())
        assert is_silero_tree(tree)
        assert tree["stft"]["basis"].shape == (258, 1, 256)
        assert tree["rnn"]["w_ih"].shape == (512, 128)
        for i in range(4):
            assert tree[f"enc{i}"]["w"].ndim == 3

    def test_missing_key_raises(self):
        sd = synthetic_state_dict()
        del sd["_model.decoder.rnn.weight_hh"]
        with pytest.raises(ValueError, match="missing key"):
            convert_state_dict(sd)

    def test_shape_mismatch_raises(self):
        sd = synthetic_state_dict()
        sd["_model.encoder.0.reparam_conv.weight"] = np.zeros(
            (64, 129, 3), np.float32
        )
        with pytest.raises(ValueError, match="shape"):
            convert_state_dict(sd)

    def test_npz_round_trip(self, tmp_path):
        from modular_audio_pipeline_tpu.models.whisper.convert import (
            save_params,
            unflatten_tree,
        )

        tree = convert_state_dict(synthetic_state_dict())
        save_params(tree, str(tmp_path))
        with np.load(tmp_path / "params.npz") as z:
            loaded = unflatten_tree({k: z[k] for k in z.files})
        assert is_silero_tree(loaded)
        np.testing.assert_array_equal(
            loaded["rnn"]["w_ih"], tree["rnn"]["w_ih"]
        )


class TestSileroGraph:
    def test_probs_shape_and_range(self):
        model = SileroVAD(convert_state_dict(synthetic_state_dict()))
        rng = np.random.default_rng(1)
        audio = (0.1 * rng.standard_normal(SR * 2)).astype(np.float32)
        probs = model.speech_probs(audio, SR)
        assert probs.shape == (SR * 2 // 512,)
        assert np.all((probs >= 0) & (probs <= 1))

    def test_streaming_state_carries(self):
        # LSTM state across chunks: the same chunk repeated must not give
        # identical probs at positions 0 and 1 (position 1 sees state)
        model = SileroVAD(convert_state_dict(synthetic_state_dict(seed=2)))
        chunk = (0.3 * np.sin(2 * np.pi * 220 * np.arange(512) / SR)).astype(
            np.float32
        )
        audio = np.tile(chunk, 4)
        probs = model.speech_probs(audio, SR)
        assert probs.shape == (4,)
        assert not np.allclose(probs[0], probs[1])

    def test_filter_picks_silero_graph(self, tmp_path):
        from modular_audio_pipeline_tpu.models.whisper.convert import save_params
        from modular_audio_pipeline_tpu.vad import SileroVADFilter

        save_params(convert_state_dict(synthetic_state_dict()), str(tmp_path))
        f = SileroVADFilter(weights_path=str(tmp_path))
        f._load_model()
        assert isinstance(f.model, SileroVAD)
