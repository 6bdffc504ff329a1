"""Fetch-integrity defense tests (runtime/integrity.py, VERDICT r4 #1)."""

import numpy as np
import pytest

from modular_audio_pipeline_tpu.exceptions import FetchIntegrityError
from modular_audio_pipeline_tpu.runtime.integrity import (
    checksum_device,
    fetch_verified_many,
    host_checksum,
)


class TestChecksum:
    def test_host_device_agree_int32(self):
        import jax.numpy as jnp

        x = np.arange(-50, 950, dtype=np.int32).reshape(10, 100)
        chk = np.asarray(checksum_device((jnp.asarray(x),)))
        assert chk[0] == host_checksum(x)

    def test_host_device_agree_float32(self):
        import jax.numpy as jnp

        x = np.random.default_rng(0).standard_normal((7, 33)).astype(np.float32)
        chk = np.asarray(checksum_device((jnp.asarray(x),)))
        assert chk[0] == host_checksum(x)

    def test_zeroed_buffer_never_validates(self):
        # The salt guarantees a zeroed data buffer + zeroed checksum
        # fetch still mismatch: host_checksum(zeros) == salt ^ 0 != 0.
        zeros = np.zeros((4, 4), np.int32)
        assert host_checksum(zeros) != np.uint32(0)

    def test_multiple_arrays_one_program(self):
        import jax.numpy as jnp

        a = np.arange(12, dtype=np.int32)
        b = np.linspace(-1, 1, 9, dtype=np.float32)
        chk = np.asarray(checksum_device((jnp.asarray(a), jnp.asarray(b))))
        assert chk.shape == (2,)
        assert chk[0] == host_checksum(a)
        assert chk[1] == host_checksum(b)


class TestFetchVerified:
    def test_good_fetch_passes(self):
        import jax.numpy as jnp

        a = jnp.asarray(np.arange(100, dtype=np.int32))
        b = jnp.asarray(np.ones((3, 3), np.float32))
        chk = checksum_device((a, b))
        hosts = fetch_verified_many((a, b), chk, ("a", "b"))
        np.testing.assert_array_equal(hosts[0], np.arange(100, dtype=np.int32))
        np.testing.assert_array_equal(hosts[1], np.ones((3, 3), np.float32))

    def test_corrupted_fetch_raises(self):
        import jax.numpy as jnp

        a = jnp.asarray(np.arange(100, dtype=np.int32))
        # checksum computed from DIFFERENT device data = persistent
        # corruption (re-fetches return the same wrong bytes)
        wrong = checksum_device((jnp.asarray(np.zeros(100, np.int32)),))
        with pytest.raises(FetchIntegrityError):
            fetch_verified_many((a,), wrong, ("a",), retries=2)

    def test_decode_pending_carries_checksum(self):
        """decode_windows_async must attach the device checksum so
        finalize_decode fetches verified (both beam and greedy)."""
        import jax.numpy as jnp

        from modular_audio_pipeline_tpu.models.whisper.config import (
            WHISPER_DIMS,
        )
        from modular_audio_pipeline_tpu.models.whisper.decode import (
            DecodeOptions,
            decode_windows_async,
            finalize_decode,
        )
        from modular_audio_pipeline_tpu.models.whisper.model import (
            init_params,
        )
        from modular_audio_pipeline_tpu.models.whisper.tokenizer import (
            DummyTokenizer,
        )

        dims = WHISPER_DIMS["test-tiny"]
        params = init_params(dims, seed=0, dtype=jnp.float32)
        tok = DummyTokenizer(dims.n_vocab)
        mel = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (1, dims.n_mels, 3000), dtype=np.float32
            )
        )
        for beam in (1, 2):
            opts = DecodeOptions(
                language="en", beam_size=beam, max_tokens=8, timestamps=True
            )
            pending = decode_windows_async(params, dims, tok, mel, opts)
            assert pending.get("chk") is not None
            result = finalize_decode(pending)
            assert result.tokens.shape[0] == 1

class TestPutVerified:
    def test_good_upload_passes(self):
        from modular_audio_pipeline_tpu.runtime.integrity import put_verified

        a = np.arange(64, dtype=np.int32)
        b = np.random.default_rng(1).standard_normal((5, 7)).astype(np.float32)
        devs = put_verified([a, b], ["a", "b"])
        np.testing.assert_array_equal(np.asarray(devs[0]), a)
        np.testing.assert_array_equal(np.asarray(devs[1]), b)

    def test_tree_upload_roundtrips(self):
        from modular_audio_pipeline_tpu.runtime.integrity import (
            put_verified_tree,
        )

        tree = {
            "w": np.ones((4, 4), np.float32),
            "nested": {"b": np.arange(3, dtype=np.int32)},
        }
        dev = put_verified_tree(tree, name="t")
        np.testing.assert_array_equal(np.asarray(dev["w"]), tree["w"])
        np.testing.assert_array_equal(
            np.asarray(dev["nested"]["b"]), tree["nested"]["b"]
        )

    def test_corrupted_upload_raises(self, monkeypatch):
        # Simulate a link that zeroes every upload: the device checksum
        # is computed from zeros, never matching the host's.
        import jax.numpy as jnp

        from modular_audio_pipeline_tpu.runtime import integrity

        real = integrity.checksum_device

        def zeroed_checksum(arrays):
            return real([jnp.zeros_like(a) for a in arrays])

        monkeypatch.setattr(integrity, "checksum_device", zeroed_checksum)
        with pytest.raises(FetchIntegrityError):
            integrity.put_verified(
                [np.arange(16, dtype=np.int32)], ["a"], retries=1
            )

    def test_bfloat16_leaves_verify(self):
        # Model params are bf16 on TPU; host/device checksums must agree
        # for 2-byte dtypes (the halfword packing path in _chk_one).
        import jax.numpy as jnp
        import ml_dtypes

        from modular_audio_pipeline_tpu.runtime.integrity import put_verified

        a = (
            np.random.default_rng(2)
            .standard_normal((33, 5))
            .astype(ml_dtypes.bfloat16)
        )
        (dev,) = put_verified([a], ["w"])
        assert dev.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(dev).view(np.uint16), a.view(np.uint16)
        )
