"""Fine-tuning data pipeline + a short training-loop smoke test."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modular_audio_pipeline_tpu.audio_io import write_wav
from modular_audio_pipeline_tpu.models.whisper.config import WHISPER_DIMS
from modular_audio_pipeline_tpu.models.whisper.model import init_params
from modular_audio_pipeline_tpu.models.whisper.tokenizer import DummyTokenizer
from modular_audio_pipeline_tpu.training import make_train_step
from modular_audio_pipeline_tpu.training.data import TranscriptDataset, encode_example
from modular_audio_pipeline_tpu.training.whisper_train import IGNORE_INDEX

DIMS = WHISPER_DIMS["test-tiny"]
SR = 16000


@pytest.fixture
def dataset(tmp_path):
    tok = DummyTokenizer()
    examples = []
    rng = np.random.default_rng(0)
    for i in range(5):
        path = str(tmp_path / f"clip{i}.wav")
        write_wav(path, (0.1 * rng.standard_normal(SR * 3)).astype(np.float32), SR)
        examples.append((path, f"hello world number {i}"))
    manifest = tmp_path / "train.jsonl"
    manifest.write_text(
        "\n".join(json.dumps({"audio": a, "text": t}) for a, t in examples)
    )
    return TranscriptDataset.from_manifest(
        str(manifest), tok, DIMS, batch_size=2, seq_len=32
    )


class TestEncoding:
    def test_encode_example_layout(self):
        tok = DummyTokenizer()
        tokens, targets = encode_example(tok, "hi", language="en")
        sot = tok.sot_sequence("en", timestamps=False)
        np.testing.assert_array_equal(tokens[: len(sot)], sot)
        # SOT prefix (minus the position predicting the first text token)
        # is masked
        assert (targets[: len(sot) - 1] == IGNORE_INDEX).all()
        assert targets[-1] == tok.eot  # final prediction is EOT

    def test_batches_fixed_shapes(self, dataset):
        batches = list(dataset.batches())
        assert len(batches) == 3  # 5 examples, batch 2
        for mel, tokens, targets in batches:
            assert mel.shape == (2, DIMS.n_mels, 3000)
            assert tokens.shape == (2, 32)
            assert targets.shape == (2, 32)

    def test_shuffle_changes_order(self, dataset):
        a = next(iter(dataset.batches(epoch=0)))[1]
        b = next(iter(dataset.batches(epoch=1)))[1]
        assert not np.array_equal(a, b)


class TestTrainingLoop:
    def test_loss_decreases_on_fixed_batch(self, dataset):
        params = init_params(DIMS, seed=0, dtype=jnp.float32)
        init_state, train_step = make_train_step(DIMS)
        state = init_state(params)
        step = jax.jit(train_step)

        mel, tokens, targets = next(iter(dataset.batches()))
        losses = []
        for _ in range(4):
            state, loss = step(
                state, jnp.asarray(mel), jnp.asarray(tokens), jnp.asarray(targets)
            )
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
