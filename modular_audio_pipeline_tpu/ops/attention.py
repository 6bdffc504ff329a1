"""Pallas flash attention for the Whisper encoder.

The encoder's self-attention over 1500 positions is the pipeline's
biggest single memory consumer under plain XLA: the [B, H, S, S] logits
tensor is ~2.9 GB (f32) per layer for a 16-window large-v3-turbo batch,
all of it streamed to and from HBM. This kernel computes attention with
online softmax over key tiles, so only [TQ, TK] score tiles ever live in
VMEM and HBM traffic drops to Q/K/V/O.

Whisper-specific simplifications: no mask (full bidirectional encoder
attention), fixed sequence (1500, padded to a 128-multiple inside the
wrapper with masked tail keys), head_dim 64, whisper's hd^-0.25 scaling
applied to both operands.

``flash_attention`` falls back to the XLA einsum path off-TPU (CPU tests
run the fallback; the kernel itself is validated against it in
tests/test_attention.py via interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "attention_reference", "use_pallas_attention"]

_TQ = 256  # query tile
_TK = 512  # key tile


def use_pallas_attention() -> bool:
    """Pallas kernels only on real TPU backends (mosaic unavailable on CPU)."""
    import os

    if os.environ.get("MAP_TPU_DISABLE_PALLAS") == "1":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def attention_reference(q, k, v):
    """XLA einsum attention (whisper scaling), the fallback + test oracle."""
    scale = q.shape[-1] ** -0.25
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k * scale, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _flash_kernel(n_valid_ref, q_ref, k_ref, v_ref, o_ref):
    """One (batch*head, q-tile) program: online softmax over key tiles.

    q_ref: [TQ, D]; k_ref/v_ref: [S, D]; o_ref: [TQ, D].
    Keys at positions >= n_valid are masked out (sequence padding).
    """
    n_valid = n_valid_ref[0]
    s_padded = k_ref.shape[0]
    d = q_ref.shape[-1]

    # q/k arrive pre-scaled by true_head_dim**-0.25 (the wrapper applies
    # it; the padded lane dim here is not the real head dim).
    q = q_ref[:].astype(jnp.float32)

    n_tiles = s_padded // _TK

    def body(t, carry):
        acc, m_prev, l_prev = carry
        k_tile = k_ref[pl.ds(t * _TK, _TK), :].astype(jnp.float32)
        v_tile = v_ref[pl.ds(t * _TK, _TK), :].astype(jnp.float32)

        s = jnp.dot(q, k_tile.T, preferred_element_type=jnp.float32)  # [TQ, TK]

        k_pos = t * _TK + jax.lax.broadcasted_iota(jnp.int32, (1, _TK), 1)
        s = jnp.where(k_pos < n_valid, s, -jnp.inf)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * correction + jnp.dot(p, v_tile, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    init = (
        jnp.zeros((q.shape[0], d), jnp.float32),
        jnp.full((q.shape[0], 1), -jnp.inf, jnp.float32),
        jnp.zeros((q.shape[0], 1), jnp.float32),
    )
    acc, _, l = jax.lax.fori_loop(0, n_tiles, body, init)
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_call(q, k, v, n_valid, interpret=False):
    """q/k/v: [BH, S_padded, D]; n_valid: [1] int32."""
    bh, s, d = q.shape
    grid = (bh, s // _TQ)

    return pl.pallas_call(
        _flash_kernel_3d,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, _TQ, d), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, s, d), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, s, d), lambda b, i, *_: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, _TQ, d), lambda b, i, *_: (b, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        interpret=interpret,
    )(n_valid, q, k, v)


def _flash_kernel_3d(n_valid_ref, q_ref, k_ref, v_ref, o_ref):
    """Adapter: block specs carry a leading singleton batch dim."""
    _flash_kernel(
        n_valid_ref, q_ref.at[0], k_ref.at[0], v_ref.at[0], o_ref.at[0]
    )


def flash_attention(q, k, v, interpret: bool = False):
    """Whisper-style attention ``[B, H, S, D] -> [B, H, S, D]``.

    Pads S up to a tile multiple and masks the padded keys; falls back to
    the XLA path off-TPU unless ``interpret`` is set (tests).

    Differentiable: the Pallas kernel has no JVP rule, so the backward
    pass recomputes attention with the XLA einsum path (the standard
    flash-attention recompute strategy) via ``jax.custom_vjp`` — training
    through the encoder works on TPU with the fast forward kernel.
    """
    if not (use_pallas_attention() or interpret):
        return attention_reference(q, k, v)
    return _flash_attention_diff(q, k, v, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention_diff(q, k, v, interpret):
    return _flash_forward(q, k, v, interpret)


def _flash_attention_fwd(q, k, v, interpret):
    return _flash_forward(q, k, v, interpret), (q, k, v)


def _flash_attention_bwd(interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(attention_reference, q, k, v)
    return vjp(g)


_flash_attention_diff.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def _flash_forward(q, k, v, interpret: bool = False):
    b, h, s, d = q.shape
    s_pad = ((s + _TK - 1) // _TK) * _TK
    # Lane alignment: mosaic tiles the last dim in units of 128; whisper's
    # head_dim 64 is zero-padded (exact for QK^T, V-padding sliced off).
    d_pad = ((d + 127) // 128) * 128
    pad = [(0, 0), (0, 0), (0, s_pad - s), (0, d_pad - d)]
    scale = d**-0.25  # whisper scaling by the TRUE head dim
    q_p = jnp.pad(q * scale, pad)
    k_p = jnp.pad(k * scale, pad)
    v_p = jnp.pad(v, pad)

    qf = q_p.reshape(b * h, s_pad, d_pad)
    kf = k_p.reshape(b * h, s_pad, d_pad)
    vf = v_p.reshape(b * h, s_pad, d_pad)
    n_valid = jnp.asarray([s], jnp.int32)

    out = _flash_call(qf, kf, vf, n_valid, interpret=interpret)
    return out.reshape(b, h, s_pad, d_pad)[:, :, :s, :d]
