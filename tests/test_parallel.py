"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

This is the 'distributed without a cluster' mechanism (SURVEY.md §4):
mesh construction, Megatron-style TP param placement, DP+TP training
steps, and the driver-facing dryrun entry."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from modular_audio_pipeline_tpu.config import TPUConfig
from modular_audio_pipeline_tpu.exceptions import ShardingError
from modular_audio_pipeline_tpu.models.whisper.config import WHISPER_DIMS
from modular_audio_pipeline_tpu.models.whisper.model import init_params
from modular_audio_pipeline_tpu.parallel.mesh import build_mesh, shard_batch
from modular_audio_pipeline_tpu.parallel.sharding import shard_params
from modular_audio_pipeline_tpu.training import make_train_step

DIMS = WHISPER_DIMS["test-tiny"]


class TestMesh:
    def test_default_mesh_uses_all_devices(self):
        mesh = build_mesh(TPUConfig())
        assert mesh.shape["data"] == len(jax.devices())

    def test_explicit_shape(self):
        mesh = build_mesh(TPUConfig(mesh_shape={"data": 4, "model": 2}))
        assert mesh.shape == {"data": 4, "model": 2}

    def test_too_many_devices_raises(self):
        with pytest.raises(ShardingError):
            build_mesh(TPUConfig(mesh_shape={"data": 1024}))

    def test_shard_batch_pads_and_places(self):
        mesh = build_mesh(TPUConfig(mesh_shape={"data": 8}))
        batch = np.ones((5, 16), np.float32)
        sharded, n_valid = shard_batch(mesh, batch)
        assert n_valid == 5
        assert sharded.shape == (8, 16)  # padded to the axis size
        assert len(sharded.sharding.device_set) == 8


class TestParamSharding:
    def test_tp_placement(self):
        mesh = build_mesh(TPUConfig(mesh_shape={"data": 4, "model": 2}))
        params = init_params(DIMS, seed=0, dtype=jnp.float32)
        placed = shard_params(params, mesh)

        q_w = placed["encoder"]["blocks"]["attn"]["q_w"]
        assert len(q_w.sharding.device_set) == 8
        # column-parallel: last dim split over 'model'
        assert q_w.sharding.spec == P(None, None, "model")
        o_w = placed["decoder"]["blocks"]["attn"]["o_w"]
        assert o_w.sharding.spec == P(None, "model", None)

        # values preserved
        np.testing.assert_array_equal(
            np.asarray(q_w), np.asarray(params["encoder"]["blocks"]["attn"]["q_w"])
        )

    def test_replicated_when_no_model_axis(self):
        mesh = build_mesh(TPUConfig(mesh_shape={"data": 8}))
        params = init_params(DIMS, seed=0, dtype=jnp.float32)
        placed = shard_params(params, mesh)
        q_w = placed["encoder"]["blocks"]["attn"]["q_w"]
        assert q_w.sharding.spec == P()


class TestTrainStep:
    @pytest.mark.parametrize("mesh_shape", [{"data": 8}, {"data": 4, "model": 2}])
    def test_one_step_decreases_nothing_catastrophic(self, mesh_shape):
        mesh = build_mesh(TPUConfig(mesh_shape=mesh_shape))
        params = init_params(DIMS, seed=0, dtype=jnp.float32)
        with mesh:
            placed = shard_params(params, mesh)
            init_state, train_step = make_train_step(DIMS)
            state = init_state(placed)

            rng = np.random.default_rng(0)
            b, s = 8, 12
            mel = jax.device_put(
                rng.standard_normal((b, DIMS.n_mels, 3000)).astype(np.float32),
                NamedSharding(mesh, P("data", None, None)),
            )
            tokens = jax.device_put(
                rng.integers(0, DIMS.n_vocab, (b, s)).astype(np.int32),
                NamedSharding(mesh, P("data", None)),
            )
            step = jax.jit(train_step)
            state1, loss1 = step(state, mel, tokens, tokens)
            state2, loss2 = step(state1, mel, tokens, tokens)

        assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
        # same batch twice: adamw should reduce the loss
        assert float(loss2) < float(loss1)
        assert int(state2.step) == 2

    def test_loss_masking(self):
        from modular_audio_pipeline_tpu.training.whisper_train import (
            IGNORE_INDEX,
            cross_entropy_loss,
        )

        logits = jnp.zeros((1, 4, 10))
        targets = jnp.asarray([[1, 2, IGNORE_INDEX, IGNORE_INDEX]], dtype=jnp.int32)
        loss = cross_entropy_loss(logits, targets)
        # uniform logits -> loss = log(10) over the 2 unmasked positions
        assert float(loss) == pytest.approx(np.log(10), rel=1e-5)


class TestTPInference:
    """TP on the decode path (GSPMD regression guard for the KV-cache
    gather / one-hot beam reorder under a sharded 'model' axis)."""

    def test_sharded_beam_decode_matches_unsharded(self):
        from modular_audio_pipeline_tpu.models.whisper.decode import (
            DecodeOptions,
            decode_windows,
        )
        from modular_audio_pipeline_tpu.models.whisper.tokenizer import (
            DummyTokenizer,
        )
        from modular_audio_pipeline_tpu.ops.mel import log_mel

        tok = DummyTokenizer()
        params = init_params(DIMS, seed=0, dtype=jnp.float32)
        rng = np.random.default_rng(7)
        audio = (0.1 * rng.standard_normal((4, 16000 * 30))).astype(np.float32)
        mel_host = np.asarray(log_mel(jnp.asarray(audio), n_mels=DIMS.n_mels))
        opts = DecodeOptions(language="en", beam_size=3, max_tokens=12)

        ref = decode_windows(params, DIMS, tok, jnp.asarray(mel_host), opts)

        mesh = build_mesh(TPUConfig(mesh_shape={"data": 4, "model": 2}))
        with mesh:
            placed = shard_params(params, mesh)
            mel_sharded = jax.device_put(
                mel_host, NamedSharding(mesh, P("data", None, None))
            )
            got = decode_windows(placed, DIMS, tok, mel_sharded, opts)

        # logits-path equivalence: scores agree to float tolerance and the
        # chosen token sequences are identical
        np.testing.assert_allclose(
            got.sum_logprobs, ref.sum_logprobs, rtol=2e-3, atol=2e-3
        )
        np.testing.assert_array_equal(got.tokens, ref.tokens)
        np.testing.assert_allclose(
            got.no_speech_probs, ref.no_speech_probs, rtol=2e-3, atol=2e-3
        )


class TestBatchDriverMesh:
    """The 50x1-hr batch workload under a multi-device mesh (VERDICT r4
    #6): `BatchDriver --serving` with ``tpu.mesh_shape`` set must shard
    each file's decode windows over the 'data' axis (and params over
    'model') and produce outputs EQUAL to the unmeshed run — SURVEY §2's
    "DP over files/chunks ... replaces the reference's serial per-file
    loop" claim, exercised on the workload that makes it."""

    N_FILES = 3

    def _make_media(self, tmp_path, name):
        from modular_audio_pipeline_tpu.audio_io import write_wav

        media = tmp_path / name
        media.mkdir()
        sr = 16000
        for i in range(self.N_FILES):
            t = np.arange(int((38 + 4 * i) * sr)) / sr
            f0 = 130 + 10 * i + 30 * np.sin(2 * np.pi * 0.7 * t)
            sig = sum(
                (0.3 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / sr)
                for k in range(1, 5)
            )
            env = (np.sin(2 * np.pi * (1.0 + 0.1 * i) * t) > -0.4).astype(np.float32)
            out = (sig * env * 0.3).astype(np.float32)
            rng = np.random.default_rng(i)
            out[:sr] = 0.0008 * rng.standard_normal(sr)
            out[-sr:] = 0.0008 * rng.standard_normal(sr)
            write_wav(str(media / f"file{i}.wav"), out, sr)
        return media

    def _config(self, media_dir, results_dir, mesh_shape=None):
        from modular_audio_pipeline_tpu.config import PipelineConfig

        cfg = PipelineConfig(media_dir=str(media_dir))
        cfg.results_dir = str(results_dir)
        cfg.transcription.model = "test-tiny"
        cfg.transcription.weights_path = "random:0"
        cfg.transcription.beam_size = 2
        cfg.transcription.max_decode_tokens = 12
        cfg.transcription.language = "en"
        cfg.transcription.batch_size = 4
        cfg.transcription.word_timestamps = False
        cfg.transcription.compute_type = "float32"
        cfg.diarization.enabled = False
        if mesh_shape:
            cfg.tpu.mesh_shape = dict(mesh_shape)
        return cfg

    def test_serving_batch_under_mesh_equals_unmeshed(self, tmp_path):
        import json

        from modular_audio_pipeline_tpu.parallel.batch import BatchDriver

        media = self._make_media(tmp_path, "media")

        def run(mesh_shape, results_name):
            results = tmp_path / results_name
            cfg = self._config(media, results, mesh_shape)
            summary = BatchDriver(cfg).run(serving=True)
            assert summary["succeeded"] == self.N_FILES, summary
            assert summary["failed"] == 0
            outs = {}
            for i in range(self.N_FILES):
                path = results / f"file{i}_transcription.json"
                data = json.loads(path.read_text())
                outs[f"file{i}"] = [
                    (round(s["start"], 3), round(s["end"], 3), s["text"],
                     s.get("speaker"))
                    for s in data["segments"]
                ]
            return outs

        ref = run(None, "results_single")
        got = run({"data": 4, "model": 2}, "results_mesh")
        assert got == ref, "meshed batch outputs diverged from unmeshed"
        # the workload produced real segments (not a trivially-empty match)
        assert any(len(v) > 0 for v in ref.values())

    def test_batch_resume_ledger_under_mesh(self, tmp_path):
        """Resume semantics survive the meshed path: a second run over the
        same directory skips everything via the content-hash ledger."""
        from modular_audio_pipeline_tpu.parallel.batch import BatchDriver

        media = self._make_media(tmp_path, "media2")
        results = tmp_path / "results_resume"
        cfg = self._config(media, results, {"data": 8})
        s1 = BatchDriver(cfg).run(serving=True)
        assert s1["succeeded"] == self.N_FILES
        s2 = BatchDriver(cfg).run(serving=True)
        assert s2["skipped"] == self.N_FILES
        assert s2["succeeded"] == 0 and s2["failed"] == 0


class TestGraftEntry:
    def test_dryrun_multichip_8(self, capsys):
        import __graft_entry__ as g

        g.dryrun_multichip(8)
        assert "dryrun_multichip OK" in capsys.readouterr().out

    def test_dryrun_multichip_1(self, capsys):
        import __graft_entry__ as g

        g.dryrun_multichip(1)
        assert "dryrun_multichip OK" in capsys.readouterr().out

    def test_dryrun_names_budget_and_buckets(self, capsys):
        """The proof's tail must name the decode budget and the staged
        -context bucket ladder it covered, and state the TPU-only path
        (Pallas ancestry kernel) a CPU mesh cannot cover (VERDICT r4 #8)."""
        import __graft_entry__ as g

        g.dryrun_multichip(8)
        out = capsys.readouterr().out
        assert "budget=64" in out
        assert "stage_buckets=[" in out
        assert "kv_cache=int8" in out
        assert "pallas-ancestry-kernel" in out

    @pytest.mark.skipif(
        os.environ.get("GRAFT_DRYRUN_PRODUCTION", "") in ("", "0"),
        reason="slow production-budget dryrun; set GRAFT_DRYRUN_PRODUCTION=1",
    )
    def test_dryrun_production_budget(self, capsys):
        """Opt-in: the full 224-token budget with the complete staged
        -context bucket ladder under the 8-device mesh."""
        import __graft_entry__ as g

        g.dryrun_multichip(8)
        out = capsys.readouterr().out
        assert "budget=224 (production)" in out
        assert out.count("@") >= 3, "expected a multi-bucket ladder"
