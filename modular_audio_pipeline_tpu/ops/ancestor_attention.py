"""Pallas ancestry-indexed beam self-attention for the decode loop.

Beam search reorders hypotheses every step. The reference (CTranslate2's
beam search, via faster-whisper) physically gathers the self-attention
KV cache by the beam source map each step; our physical-reorder path
does the same as a one-hot permutation matmul. Either way that is a full
read + write of every decoder layer's K/V per emitted token — the single
largest HBM term of the decode step (~0.9 ms/step of the 3.4 ms turbo
beam step at the 224-token budget).

Ancestry-indexed attention never moves the cache. Each beam row writes
its own new K/V at ``pos`` forever; a tiny per-position ancestor table
``anc[b, k, p]`` records which beam row holds hypothesis ``k``'s token
at position ``p``. Self-attention then reads, for every query row, the
K sibling rows of its window and contracts position ``p`` against row
``anc[b, k, p]`` only. Done in pure XLA this materialises [B, K, K, H,
ctx] selection tensors in HBM and is a net LOSS (measured 5.13 vs 3.40
ms/step); this kernel keeps the selection entirely in VMEM so the only
HBM traffic is the one cache read attention already pays.

Numerics match the physical-reorder int8 path exactly up to f32
accumulation order: scores are the same bf16 products (int8 codes cast
to bf16 are exact), scales are applied identically, and the one-hot
selection sums one real term plus true zeros.

Reference parity anchor: faster-whisper/CTranslate2 beam reorder
(``/root/reference/audio_pipeline/transcriber.py:362-366`` buys this via
ct2's ``DecodingOptions(beam_size=...)``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import use_pallas_attention

__all__ = ["ancestor_attention", "ancestor_attention_reference"]


def ancestor_attention_reference(
    q_scaled: jnp.ndarray,  # [BK, H, 1, hd], already carries the full qk scale
    ck_all: jnp.ndarray,  # [L, BK, H, ctx, hd] stacked cache (bf16/int8 codes)
    cv_all: jnp.ndarray,
    ks_all: Optional[jnp.ndarray],  # [L, BK, H, ctx] int8 dequant scales
    vs_all: Optional[jnp.ndarray],
    layer,  # int32 scalar: which stacked layer to attend over
    anc: jnp.ndarray,  # [BW, K, ctx] int32 ancestor table
    mask_row: jnp.ndarray,  # [ctx] additive position mask
) -> jnp.ndarray:
    """Pure-XLA ancestry attention (fallback + test oracle).

    Correct but slower than the physical reorder on TPU: the [B, K, K,
    H, ctx] score/selection tensors round-trip HBM. CPU tests and
    non-TPU backends run this path.
    """
    ck = jax.lax.dynamic_index_in_dim(ck_all, layer, 0, keepdims=False)
    cv = jax.lax.dynamic_index_in_dim(cv_all, layer, 0, keepdims=False)
    k_scale = v_scale = None
    if ks_all is not None:
        k_scale = jax.lax.dynamic_index_in_dim(ks_all, layer, 0, keepdims=False)
        v_scale = jax.lax.dynamic_index_in_dim(vs_all, layer, 0, keepdims=False)
    bw, kq, ctx = anc.shape
    h, hd = ck.shape[1], ck.shape[3]
    anc_sel = jax.nn.one_hot(anc, kq, dtype=jnp.float32, axis=2)  # [bw,k,j,p]
    qg = q_scaled[:, :, 0].reshape(bw, kq, h, hd)
    ckg = ck.astype(qg.dtype).reshape(bw, kq, h, ctx, hd)
    scores = jnp.einsum(
        "bkhd,bjhpd->bkjhp", qg, ckg, preferred_element_type=jnp.float32
    )
    if k_scale is not None:
        scores = scores * k_scale.reshape(bw, 1, kq, h, ctx)
    # Selection as an elementwise multiply + reduce, NOT a matmul: the
    # TPU's DEFAULT matmul precision would round the f32 scores to bf16
    # (measured ~1e-2 drift), breaking token-exact equivalence with the
    # physically reordered path. The J axis is tiny (K beams) and the
    # reduce fuses with the mask add.
    logits = jnp.sum(scores * anc_sel[:, :, :, None, :], axis=2)  # [bw,k,h,p]
    logits = logits + mask_row[None, None, None]
    probs = jax.nn.softmax(logits, axis=-1)  # [bw, k, h, p]
    pj = probs[:, :, None] * anc_sel[:, :, :, None, :]  # [bw, k, j, h, p]
    if v_scale is not None:
        pj = pj * v_scale.reshape(bw, 1, kq, h, ctx)
    cvg = cv.astype(q_scaled.dtype).reshape(bw, kq, h, ctx, hd)
    y = jnp.einsum(
        "bkjhp,bjhpd->bkhd", pj.astype(q_scaled.dtype), cvg,
        preferred_element_type=jnp.float32,
    ).astype(q_scaled.dtype)
    return y.reshape(bw * kq, h, 1, hd)


def _kernel(
    l_ref, q_ref, k_ref, v_ref, *rest,
    k_beams: int, has_scales: bool, ht: int, ctx: int, hd: int,
):
    """One (window, head-tile) program over flattened head-major blocks.

    Blocks slice the ORIGINAL stacked cache layout ([L, BK, H, ctx, hd]
    with BK = BW*K): the layer index arrives as a scalar-prefetch ref
    (l_ref) consumed by the block index maps, dim 1 is blocked by K (one
    window's beam rows), dim 2 by the head tile. Neither a host-side
    reshape nor a per-layer slice of the cache may appear outside this
    kernel: XLA materialises either one as a full int8 copy (profiled at
    ~0.5 ms/layer-step — twice the kernel itself), because a pallas_call
    operand, unlike an einsum operand, cannot fuse the slice away.

    l_ref:  [1] int32 scalar-prefetch (used by index maps only)
    q_ref:  [K, HT, 1, hd]           (bf16, pre-scaled by hd^-0.5)
    k_ref:  [1, K, HT, ctx, hd]      (int8 codes or bf16)
    v_ref:  [1, K, HT, ctx, hd]
    ks/vs:  [1, K, H, ctx] f32       (int8 only; full-H block, indexed
                                      by program_id — (K, HT, ctx) would
                                      be an illegal block shape)
    anc:    [1, K, ctx] int32
    mask:   [1, ctx] f32 additive
    o_ref:  [1, K, HT*hd]            (lane-flat store; Mosaic cannot
                                      shape-cast a [K, hd] vreg into a
                                      [K, 1, 1, hd] ref slice)

    All selection intermediates ([K, ctx] per head) live in VMEM; the
    HBM traffic is exactly one cache read. The K× extra QK/PV MACs are
    trivial next to the saved permute (K = beam width, 5 by default).
    """
    if has_scales:
        ks_ref, vs_ref, anc_ref, mask_ref, o_ref = rest
    else:
        anc_ref, mask_ref, o_ref = rest
    kq = k_beams

    # Flat-lane formulation: all K sibling rows of a head ride one
    # [K*ctx]-lane axis, so QK and PV are ONE matmul each per head and
    # selection is a masked softmax over the flat axis (each position
    # keeps exactly one of its K copies; the rest sit at -inf and
    # underflow to exact zeros). This avoids both per-j matmul launches
    # (5x the MXU fixed cost) and any lane-dim reshapes.
    anc = anc_ref[0]  # [K, ctx] int32
    # sel[k, j*ctx + p] == 1 where hypothesis k's position p lives in
    # row j; built by lane-concatenation, shared across heads.
    # (cast to f32 before the lane concat: Mosaic cannot concatenate
    # i1 vectors — "Invalid vector register cast")
    sel = jnp.concatenate(
        [(anc == j).astype(jnp.float32) for j in range(kq)], axis=-1
    )  # [K, K*ctx], 1.0 where selected
    mask_t = jnp.concatenate([mask_ref[:]] * kq, axis=-1)  # [1, K*ctx]

    t = pl.program_id(1)
    for h in range(ht):
        hg = t * ht + h  # global head index (for the full-H scale blocks)
        q = q_ref[:, h, 0, :]  # [K, hd] bf16
        kf = k_ref[0, :, h, :, :].reshape(kq * ctx, hd).astype(q.dtype)
        scores = jax.lax.dot_general(
            q, kf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K, K*ctx]
        if has_scales:
            ksf = jnp.concatenate(
                [ks_ref[0, j:j + 1, hg, :] for j in range(kq)], axis=-1
            )  # [1, K*ctx]
            scores = scores * ksf
        logits = jnp.where(sel > 0, scores + mask_t, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)  # [K, K*ctx] f32
        if has_scales:
            vsf = jnp.concatenate(
                [vs_ref[0, j:j + 1, hg, :] for j in range(kq)], axis=-1
            )
            probs = probs * vsf
        vf = v_ref[0, :, h, :, :].reshape(kq * ctx, hd).astype(q.dtype)
        y = jax.lax.dot_general(
            probs.astype(q.dtype), vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K, hd]
        o_ref[0, :, h * hd:(h + 1) * hd] = y.astype(o_ref.dtype)


def _head_tile(n_head: int, kq: int, ctx: int, hd: int, itemsize: int) -> int:
    """Largest divisor of n_head keeping each K or V block under ~1.5 MB
    (double-buffered by the pipeline, so ~6 MB of VMEM for both)."""
    budget = 1_536_000
    per_head = kq * ctx * hd * itemsize
    cap = max(1, budget // max(per_head, 1))
    best = 1
    for t in range(1, n_head + 1):
        if n_head % t == 0 and t <= cap:
            best = t
    return best


@functools.partial(
    jax.jit, static_argnames=("k_beams", "interpret")
)
def _pallas_ancestor_attention(
    q_scaled, ck_all, cv_all, ks_all, vs_all, layer, anc, mask_row,
    *, k_beams, interpret
):
    bw, kq, ctx = anc.shape
    assert kq == k_beams
    bk, h, _, hd = q_scaled.shape
    # The stacked cache enters UNTOUCHED — no reshape, no layer slice.
    # The layer rides in as a scalar-prefetch block index; XLA then DMAs
    # only layer `l`'s blocks straight out of the carry buffer.
    has_scales = ks_all is not None
    ht = _head_tile(h, kq, ctx, hd, ck_all.dtype.itemsize)
    grid = (bw, h // ht)

    cache_spec = pl.BlockSpec(
        (1, kq, ht, ctx, hd), lambda b, t, l: (l[0], b, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec((kq, ht, 1, hd), lambda b, t, l: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),  # q [BK, H, 1, hd]
        cache_spec,                             # k [L, BK, H, ctx, hd]
        cache_spec,                             # v
    ]
    operands = [q_scaled, ck_all, cv_all]
    if has_scales:
        # (1, K, HT, ctx) would be an illegal block (HT neither
        # 8-aligned nor full) — take the full-H block and index by
        # program_id. The ~2x redundant scale reads are ~6 MB/layer,
        # noise next to the ~92 MB cache read.
        sspec = pl.BlockSpec(
            (1, kq, h, ctx), lambda b, t, l: (l[0], b, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs += [sspec, sspec]
        operands += [ks_all, vs_all]
    in_specs += [
        pl.BlockSpec((1, kq, ctx), lambda b, t, l: (b, 0, 0),
                     memory_space=pltpu.VMEM),        # anc
        pl.BlockSpec((1, ctx), lambda b, t, l: (0, 0),
                     memory_space=pltpu.VMEM),        # mask
    ]
    operands += [anc, mask_row.reshape(1, ctx)]

    kernel = functools.partial(
        _kernel, k_beams=kq, has_scales=has_scales, ht=ht, ctx=ctx, hd=hd
    )
    cache_bytes = 2 * bk * h * ctx * hd * ck_all.dtype.itemsize
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, kq, ht * hd), lambda b, t, l: (b, 0, t),
            memory_space=pltpu.VMEM,
        ),
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bw, kq, h * hd), q_scaled.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bk * kq * h * ctx * hd,
            bytes_accessed=cache_bytes,
            transcendentals=bk * h * ctx,
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)
    # The output reshape is a 205 KB bf16 tensor — unlike the cache,
    # relayout cost is noise.
    return y.reshape(bk, h, 1, hd)


def ancestor_attention(
    q_scaled: jnp.ndarray,
    ck_all: jnp.ndarray,
    cv_all: jnp.ndarray,
    ks_all: Optional[jnp.ndarray],
    vs_all: Optional[jnp.ndarray],
    layer,
    anc: jnp.ndarray,
    mask_row: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Beam self-attention over an UN-permuted stacked KV cache.

    ``layer`` selects the [L, ...] cache layer (a traced scalar — the
    caller's scan counter). Routes to the fused Pallas kernel on TPU
    backends (or under ``interpret=True`` anywhere, for tests);
    pure-XLA fallback otherwise.
    """
    if interpret or use_pallas_attention():
        return _pallas_ancestor_attention(
            q_scaled, ck_all, cv_all, ks_all, vs_all, layer, anc, mask_row,
            k_beams=anc.shape[1], interpret=interpret,
        )
    return ancestor_attention_reference(
        q_scaled, ck_all, cv_all, ks_all, vs_all, layer, anc, mask_row
    )
