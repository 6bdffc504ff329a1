"""Flash-attention kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modular_audio_pipeline_tpu.ops.attention import (
    attention_reference,
    flash_attention,
)


@pytest.mark.parametrize("s", [512, 1500])
def test_flash_matches_reference(rng, s):
    b, h, d = 2, 3, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))

    expected = np.asarray(attention_reference(q, k, v))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_padding_tail_is_masked(rng):
    # Same valid content, different amount of padding -> identical output.
    b, h, d = 1, 2, 64
    s = 700  # pads to 1024
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    expected = np.asarray(attention_reference(q, k, v))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_fallback_off_tpu(rng):
    # On CPU (tests force it), flash_attention without interpret returns
    # the XLA path and matches trivially.
    q = jnp.asarray(rng.standard_normal((1, 2, 256, 64)).astype(np.float32))
    out = flash_attention(q, q, q)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(attention_reference(q, q, q)), rtol=1e-5
    )


def test_gradients_match_reference(rng):
    # The Pallas kernel has no JVP rule; custom_vjp recomputes the
    # backward with the XLA path. Grads through the kernel (interpret
    # mode) must match grads through attention_reference.
    import jax

    b, h, s, d = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, interpret=True) ** 2).sum()

    def loss_ref(q, k, v):
        return (attention_reference(q, k, v) ** 2).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-3, atol=1e-3)


class TestAncestorAttention:
    """Pallas ancestry-indexed beam attention vs the XLA oracle.

    The kernel (interpret mode here; compiled on TPU) must match
    ops.ancestor_attention.ancestor_attention_reference bit-for-bit:
    identical bf16 products, exact one-hot selection via a flat masked
    softmax. On-TPU token-exactness against the physical-reorder beam
    path is pinned by tests/test_synth_asr_regression.py.
    """

    def _case(self, quant, seed=0):
        rng = np.random.default_rng(seed)
        BW, K, H, CTX, HD, L = 3, 5, 4, 128, 64, 2
        BK = BW * K
        q = jnp.asarray(rng.standard_normal((BK, H, 1, HD)), jnp.bfloat16)
        if quant:
            ck = jnp.asarray(rng.integers(-127, 128, (L, BK, H, CTX, HD)), jnp.int8)
            cv = jnp.asarray(rng.integers(-127, 128, (L, BK, H, CTX, HD)), jnp.int8)
            ks = jnp.asarray(rng.uniform(0.001, 0.02, (L, BK, H, CTX)), jnp.float32)
            vs = jnp.asarray(rng.uniform(0.001, 0.02, (L, BK, H, CTX)), jnp.float32)
        else:
            ck = jnp.asarray(rng.standard_normal((L, BK, H, CTX, HD)), jnp.bfloat16)
            cv = jnp.asarray(rng.standard_normal((L, BK, H, CTX, HD)), jnp.bfloat16)
            ks = vs = None
        anc = jnp.asarray(rng.integers(0, K, (BW, K, CTX)), jnp.int32)
        mask = jnp.where(jnp.arange(CTX) < 100, 0.0, -jnp.inf).astype(jnp.float32)
        return q, ck, cv, ks, vs, anc, mask

    @pytest.mark.parametrize("quant", [True, False])
    def test_kernel_matches_reference(self, quant):
        from modular_audio_pipeline_tpu.ops.ancestor_attention import (
            _pallas_ancestor_attention,
            ancestor_attention_reference,
        )

        q, ck, cv, ks, vs, anc, mask = self._case(quant)
        for layer in range(ck.shape[0]):
            ref = ancestor_attention_reference(q, ck, cv, ks, vs, layer, anc, mask)
            got = _pallas_ancestor_attention(
                q, ck, cv, ks, vs, layer, anc, mask,
                k_beams=int(anc.shape[1]), interpret=True,
            )
            np.testing.assert_array_equal(
                np.asarray(ref, np.float32), np.asarray(got, np.float32)
            )

    def test_identity_ancestry_is_plain_attention(self):
        # anc == own row everywhere => selection picks each row's own
        # K/V, i.e. ordinary masked self-attention.
        from modular_audio_pipeline_tpu.ops.ancestor_attention import (
            ancestor_attention_reference,
        )

        q, ck, cv, ks, vs, _, mask = self._case(quant=True, seed=1)
        BW, K = 3, 5
        anc_id = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, :, None], (BW, K, ck.shape[3])
        )
        got = ancestor_attention_reference(q, ck, cv, ks, vs, 0, anc_id, mask)
        qs = q  # already carries the full scale by contract
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qs, ck[0].astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * ks[0][:, :, None, :] + mask[None, None, None]
        probs = jax.nn.softmax(logits, axis=-1)
        want = jnp.einsum(
            "bhqk,bhkd->bhqd",
            (probs * vs[0][:, :, None, :]).astype(q.dtype),
            cv[0].astype(q.dtype),
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=0, atol=2e-2,
        )
