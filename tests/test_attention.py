"""Flash-attention kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

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
