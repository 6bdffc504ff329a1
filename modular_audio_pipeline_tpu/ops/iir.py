"""Parallel IIR (biquad) filtering on TPU via associative scan.

IIR filters are serial by definition — the reference's loudness metering
runs them through scipy inside ``pyloudnorm``. A per-sample ``lax.scan``
would leave the TPU's vector units idle, so we reformulate the order-2
recurrence as an *affine* recurrence and evaluate it with
``jax.lax.associative_scan`` (Blelloch scan): O(n) work at full VPU width
instead of n sequential steps.

    y[n] = f[n] - a1*y[n-1] - a2*y[n-2],   f = FIR part (b0,b1,b2 taps)

    s[n] = [y[n], y[n-1]]^T = M @ s[n-1] + [f[n], 0]^T
    M = [[-a1, -a2], [1, 0]]

Composition of affine maps (A2,c2)∘(A1,c1) = (A2@A1, A2@c1 + c2) is
associative, so prefix states come from one associative scan. Long signals
are chunked; the carried 2-state crosses chunk boundaries through a tiny
``lax.scan``, keeping peak memory bounded while the inside of each chunk
stays fully parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["biquad_filter", "sosfilt"]

_CHUNK = 1 << 20  # samples per parallel block (fewer sequential chunk steps)


def _fir_part(x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """f[n] = b0*x[n] + b1*x[n-1] + b2*x[n-2] with zero initial conditions."""
    x1 = jnp.concatenate([jnp.zeros_like(x[..., :1]), x[..., :-1]], axis=-1)
    x2 = jnp.concatenate([jnp.zeros_like(x[..., :2]), x[..., :-2]], axis=-1)
    return b[0] * x + b[1] * x1 + b[2] * x2


def _affine_compose(left, right):
    """(A,c) pairs compose left-to-right along the scanned axis."""
    a_l, c_l = left
    a_r, c_r = right
    return (
        jnp.einsum("...ij,...jk->...ik", a_r, a_l),
        jnp.einsum("...ij,...j->...i", a_r, c_l) + c_r,
    )


def biquad_filter(x: jnp.ndarray, b, a) -> jnp.ndarray:
    """Apply one normalised biquad (a0 == 1) along the last axis of ``x``.

    Matches ``scipy.signal.lfilter(b, a, x)`` with zero initial state.
    """
    b = jnp.asarray(b, dtype=x.dtype)
    a = jnp.asarray(a, dtype=x.dtype)
    f = _fir_part(x, b)

    n = x.shape[-1]
    pad = (-n) % _CHUNK
    f_p = jnp.pad(f, [(0, 0)] * (f.ndim - 1) + [(0, pad)])
    chunks = f_p.reshape(f.shape[:-1] + (-1, _CHUNK))  # [..., n_chunks, C]
    n_chunks = chunks.shape[-2]

    one = jnp.asarray(1.0, dtype=x.dtype)
    zero = jnp.asarray(0.0, dtype=x.dtype)
    m = jnp.stack([jnp.stack([-a[1], -a[2]]), jnp.stack([one, zero])])  # [2,2]

    def chunk_scan(state, f_chunk):
        # state: [..., 2] carried y-history; f_chunk: [..., C]
        fc = jnp.moveaxis(f_chunk, -1, 0)  # [C, ...]
        c = jnp.stack([fc, jnp.zeros_like(fc)], axis=-1)  # [C, ..., 2]
        a_full = jnp.broadcast_to(m, c.shape + (2,))  # [C, ..., 2, 2]
        prefix_a, prefix_c = jax.lax.associative_scan(
            _affine_compose, (a_full, c), axis=0
        )
        # Apply each prefix transform to the incoming state.
        states = (
            jnp.einsum("c...ij,...j->c...i", prefix_a, state) + prefix_c
        )  # [C, ..., 2]
        y = jnp.moveaxis(states[..., 0], 0, -1)  # [..., C]
        return states[-1], y

    # Move chunk axis to the front for lax.scan.
    chunks_t = jnp.moveaxis(chunks, -2, 0)  # [n_chunks, ..., C]
    init = jnp.zeros(x.shape[:-1] + (2,), dtype=x.dtype)
    _, ys = jax.lax.scan(chunk_scan, init, chunks_t)
    y = jnp.moveaxis(ys, 0, -2).reshape(f_p.shape)
    return y[..., :n]


def sosfilt(x: jnp.ndarray, sos: np.ndarray) -> jnp.ndarray:
    """Cascade of second-order sections, each row = (b0,b1,b2,a0,a1,a2)."""
    y = x
    for row in np.asarray(sos):
        b = row[:3] / row[3]
        a = row[3:] / row[3]
        y = biquad_filter(y, b, a)
    return y
