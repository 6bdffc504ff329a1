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
    new_k: Optional[jnp.ndarray] = None,  # [BK, H, 1, hd] this step's rows
    new_v: Optional[jnp.ndarray] = None,  # (codes or bf16), NOT yet in cache
    new_ks: Optional[jnp.ndarray] = None,  # [BK, H, 1] their scales
    new_vs: Optional[jnp.ndarray] = None,
    pos=None,  # int32 scalar: cache position of the new rows
) -> jnp.ndarray:
    """Pure-XLA ancestry attention (fallback + test oracle).

    Correct but slower than the physical reorder on TPU: the [B, K, K,
    H, ctx] score/selection tensors round-trip HBM. CPU tests and
    non-TPU backends run this path.

    With ``new_k``/``new_v`` the cache is the PRE-update buffer and this
    step's rows arrive separately (callers then write them into the
    cache AFTER attention, so the write can alias in place — see the
    kernel docstring for why the order matters on TPU).
    """
    ck = jax.lax.dynamic_index_in_dim(ck_all, layer, 0, keepdims=False)
    cv = jax.lax.dynamic_index_in_dim(cv_all, layer, 0, keepdims=False)
    k_scale = v_scale = None
    if ks_all is not None:
        k_scale = jax.lax.dynamic_index_in_dim(ks_all, layer, 0, keepdims=False)
        v_scale = jax.lax.dynamic_index_in_dim(vs_all, layer, 0, keepdims=False)
    if new_k is not None:
        # Oracle semantics = "as if the rows were already written".
        ck = jax.lax.dynamic_update_slice(ck, new_k, (0, 0, pos, 0))
        cv = jax.lax.dynamic_update_slice(cv, new_v, (0, 0, pos, 0))
        if k_scale is not None:
            k_scale = jax.lax.dynamic_update_slice(k_scale, new_ks, (0, 0, pos))
            v_scale = jax.lax.dynamic_update_slice(v_scale, new_vs, (0, 0, pos))
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
    y = y.reshape(bw * kq, h, 1, hd)
    if new_k is None:
        return y
    # new-rows mode returns the row-updated stacked caches (the Pallas
    # kernel writes them in place via input_output_aliases).
    ck_all = jax.lax.dynamic_update_slice(
        ck_all, new_k[None], (layer, 0, 0, pos, 0)
    )
    cv_all = jax.lax.dynamic_update_slice(
        cv_all, new_v[None], (layer, 0, 0, pos, 0)
    )
    if ks_all is not None:
        ks_all = jax.lax.dynamic_update_slice(
            ks_all, new_ks[None], (layer, 0, 0, pos)
        )
        vs_all = jax.lax.dynamic_update_slice(
            vs_all, new_vs[None], (layer, 0, 0, pos)
        )
    return y, ck_all, cv_all, ks_all, vs_all


def _kernel(
    meta_ref, q_ref, k_ref, v_ref, *rest,
    k_beams: int, has_scales: bool, has_new: bool, ht: int, ctx: int,
    hd: int,
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

    meta:   [2] int32 scalar-prefetch: [layer, pos]. layer feeds the
            block index maps; pos locates this step's rows.
    q_ref:  [K, HT, 1, hd]           (bf16, pre-scaled by hd^-0.5)
    k_ref:  [1, K, HT, ctx, hd]      (int8 codes or bf16)
    v_ref:  [1, K, HT, ctx, hd]
    ks/vs:  [1, K, H, ctx] f32       (int8 only; full-H block, indexed
                                      by program_id — (K, HT, ctx) would
                                      be an illegal block shape)
    kn/vn:  [K, HT, 1, hd]           this step's K/V rows, NOT yet in
                                      the cache (has_new only)
    kns/vns:[K, H, 1] f32            their scales (has_new + int8 only)
    anc:    [1, K, ctx] int32
    mask:   [1, ctx] f32 additive
    o_ref:  [1, K, HT*hd]            (lane-flat store; Mosaic cannot
                                      shape-cast a [K, hd] vreg into a
                                      [K, 1, 1, hd] ref slice)

    has_new mode: the cache block holds zeros at ``pos`` (the row write
    happens AFTER this kernel so it can alias in place — a pallas_call
    consumer blocks the XLA in-place fusion a plain einsum allows,
    turning each write into a full layer-slice copy, ~0.3 ms/step
    profiled). The true position-``pos`` score/value terms are patched
    in from kn/vn: the score overwrites the flat logit at the query's
    own-row column; the value term rides an elementwise add after the
    PV matmul (the cache's zero codes/scales contribute exactly 0
    there, so nothing needs zeroing).

    All selection intermediates ([K, ctx] per head) live in VMEM; the
    HBM traffic is exactly one cache read. The K× extra QK/PV MACs are
    trivial next to the saved permute (K = beam width, 5 by default).
    """
    rest = list(rest)
    ks_ref = vs_ref = kn_ref = vn_ref = kns_ref = vns_ref = None
    if has_scales:
        ks_ref, vs_ref = rest[:2]
        rest = rest[2:]
    if has_new:
        if has_scales:
            kn_ref, vn_ref, kns_ref, vns_ref = rest[:4]
            rest = rest[4:]
        else:
            kn_ref, vn_ref = rest[:2]
            rest = rest[2:]
    anc_ref, mask_ref, o_ref = rest[:3]
    rest = rest[3:]
    if has_new:
        # Aliased cache outputs: write this step's rows in-kernel
        # (instead of a dynamic_update_slice outside) so the update
        # stays in place — a DUS whose buffer also feeds a custom call
        # loses XLA's in-place fusion and copies the whole layer slice
        # (~0.3 ms/step profiled). Mosaic out blocks must be 8-sublane /
        # 128-lane aligned, so each program rewrites a small SLAB around
        # pos, re-emitting the neighbours it read from the input block.
        pos = meta_ref[1]
        ok_ref, ov_ref = rest[:2]
        rest = rest[2:]
        slab = ok_ref.shape[3]  # 8 (or ctx when ctx < 8 — never)
        base = pl.multiple_of((pos // slab) * slab, slab)
        off = pos - base
        row_sel = jax.lax.broadcasted_iota(
            jnp.int32, (1, slab, 1), 1
        ) == off  # [1, slab, 1]
        for h in range(ht):
            kslab = k_ref[0, :, h, pl.ds(base, slab), :]  # [K, slab, hd]
            vslab = v_ref[0, :, h, pl.ds(base, slab), :]
            ok_ref[0, :, h, :, :] = jnp.where(
                row_sel, kn_ref[:, h, :, :], kslab
            )
            ov_ref[0, :, h, :, :] = jnp.where(
                row_sel, vn_ref[:, h, :, :], vslab
            )
        if has_scales:
            # Scales: rewrite the full [K, H, ctx] row with the pos lane
            # swapped in — a sub-128 dynamic lane slice is unlowerable
            # ("cannot statically prove index is a multiple of 128") and
            # the full rewrite is only ~6 MB/step of extra writes.
            oks_ref, ovs_ref = rest[:2]
            rest = rest[2:]
            lane_sel = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, oks_ref.shape[3]), 2
            ) == pos  # [1, 1, ctx]
            oks_ref[0] = jnp.where(lane_sel, kns_ref[:], ks_ref[0])
            ovs_ref[0] = jnp.where(lane_sel, vns_ref[:], vs_ref[0])
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
    if has_new:
        pos = meta_ref[1]
        # flat column of each query's own new row: k*ctx + pos
        own_col = (
            jax.lax.broadcasted_iota(jnp.int32, (kq, 1), 0) * ctx + pos
        )  # [K, 1]
        flat_idx = jax.lax.broadcasted_iota(jnp.int32, (kq, kq * ctx), 1)
        own_mask = flat_idx == own_col  # [K, K*ctx]
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
        if has_new:
            kn = kn_ref[:, h, 0, :]  # [K, hd]
            # products in f32 (like the MXU's f32 accumulation of bf16
            # operands) — a bf16 multiply would round each product
            s_new = jnp.sum(
                q.astype(jnp.float32) * kn.astype(jnp.float32),
                axis=-1, keepdims=True,
            )  # [K, 1]
            if has_scales:
                s_new = s_new * kns_ref[:, pl.ds(hg, 1), 0]
            logits = jnp.where(own_mask, s_new, logits)
        probs = jax.nn.softmax(logits, axis=-1)  # [K, K*ctx] f32
        if has_new:
            p_pos = jnp.sum(
                jnp.where(own_mask, probs, 0.0), axis=-1, keepdims=True
            )  # [K, 1]
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
        if has_new:
            # the cache's zero codes/scales contributed exactly 0 at pos;
            # add the true value term (bf16 coefficient like the MXU path)
            coeff = p_pos
            if has_scales:
                coeff = coeff * vns_ref[:, pl.ds(hg, 1), 0]
            vn = vn_ref[:, h, 0, :].astype(q.dtype)
            y = y + (coeff.astype(q.dtype).astype(jnp.float32)
                     * vn.astype(jnp.float32))
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
    new_k=None, new_v=None, new_ks=None, new_vs=None, pos=None,
    *, k_beams, interpret
):
    bw, kq, ctx = anc.shape
    assert kq == k_beams
    bk, h, _, hd = q_scaled.shape
    # The stacked cache enters UNTOUCHED — no reshape, no layer slice.
    # The layer rides in as a scalar-prefetch block index; XLA then DMAs
    # only layer `l`'s blocks straight out of the carry buffer.
    has_scales = ks_all is not None
    has_new = new_k is not None
    ht = _head_tile(h, kq, ctx, hd, ck_all.dtype.itemsize)
    grid = (bw, h // ht)

    cache_spec = pl.BlockSpec(
        (1, kq, ht, ctx, hd), lambda b, t, m: (m[0], b, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (kq, ht, 1, hd), lambda b, t, m: (b, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        row_spec,                               # q [BK, H, 1, hd]
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
            (1, kq, h, ctx), lambda b, t, m: (m[0], b, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs += [sspec, sspec]
        operands += [ks_all, vs_all]
    if has_new:
        in_specs += [row_spec, row_spec]        # kn, vn [BK, H, 1, hd]
        operands += [new_k, new_v]
        if has_scales:
            nspec = pl.BlockSpec(
                (kq, h, 1), lambda b, t, m: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
            in_specs += [nspec, nspec]          # kns, vns [BK, H, 1]
            operands += [new_ks, new_vs]
    in_specs += [
        pl.BlockSpec((1, kq, ctx), lambda b, t, m: (b, 0, 0),
                     memory_space=pltpu.VMEM),        # anc
        pl.BlockSpec((1, ctx), lambda b, t, m: (0, 0),
                     memory_space=pltpu.VMEM),        # mask
    ]
    operands += [anc, mask_row.reshape(1, ctx)]

    kernel = functools.partial(
        _kernel, k_beams=kq, has_scales=has_scales, has_new=has_new,
        ht=ht, ctx=ctx, hd=hd,
    )
    cache_bytes = 2 * bk * h * ctx * hd * ck_all.dtype.itemsize
    out_specs = [pl.BlockSpec(
        (1, kq, ht * hd), lambda b, t, m: (b, 0, t),
        memory_space=pltpu.VMEM,
    )]
    out_shape = [jax.ShapeDtypeStruct((bw, kq, h * hd), q_scaled.dtype)]
    aliases = {}
    if has_new:
        # Cache tensors alias in->out; the kernel writes only the pos
        # column (k/v) / pos entry (scales), everything else stays in
        # place in the same donated buffer. Alias indices count the
        # scalar-prefetch operand (meta=0, q=1, ck=2, cv=3, ...).
        # one sublane tile of the cache dtype (int8: 32, bf16: 16), so
        # the dynamic slab base is provably tile-aligned; ctx is a
        # 64-multiple, so the slab always fits
        slab = {1: 32, 2: 16}.get(ck_all.dtype.itemsize, 8)
        kv_out = pl.BlockSpec(
            (1, kq, ht, slab, hd),
            lambda b, t, m: (m[0], b, t, m[1] // slab, 0),
            memory_space=pltpu.VMEM,
        )
        out_specs += [kv_out, kv_out]
        out_shape += [
            jax.ShapeDtypeStruct(ck_all.shape, ck_all.dtype),
            jax.ShapeDtypeStruct(cv_all.shape, cv_all.dtype),
        ]
        aliases[2] = 1  # ck_all -> out 1
        aliases[3] = 2  # cv_all -> out 2
        if has_scales:
            sspec_out = pl.BlockSpec(
                (1, kq, h, ctx), lambda b, t, m: (m[0], b, 0, 0),
                memory_space=pltpu.VMEM,
            )
            out_specs += [sspec_out, sspec_out]
            out_shape += [
                jax.ShapeDtypeStruct(ks_all.shape, ks_all.dtype),
                jax.ShapeDtypeStruct(vs_all.shape, vs_all.dtype),
            ]
            aliases[4] = 3  # ks_all -> out 3
            aliases[5] = 4  # vs_all -> out 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
    )
    meta = jnp.stack([
        jnp.asarray(layer, jnp.int32),
        jnp.asarray(pos if pos is not None else 0, jnp.int32),
    ])
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bk * kq * h * ctx * hd,
            bytes_accessed=cache_bytes,
            transcendentals=bk * h * ctx,
        ),
    )(meta, *operands)
    # The y reshape is a 205 KB bf16 tensor — unlike the cache, relayout
    # cost is noise.
    if not has_new:
        return out[0].reshape(bk, h, 1, hd)
    y = out[0].reshape(bk, h, 1, hd)
    ck_new, cv_new = out[1], out[2]
    ks_new_all = out[3] if has_scales else None
    vs_new_all = out[4] if has_scales else None
    return y, ck_new, cv_new, ks_new_all, vs_new_all


def ancestor_attention(
    q_scaled: jnp.ndarray,
    ck_all: jnp.ndarray,
    cv_all: jnp.ndarray,
    ks_all: Optional[jnp.ndarray],
    vs_all: Optional[jnp.ndarray],
    layer,
    anc: jnp.ndarray,
    mask_row: jnp.ndarray,
    new_k: Optional[jnp.ndarray] = None,
    new_v: Optional[jnp.ndarray] = None,
    new_ks: Optional[jnp.ndarray] = None,
    new_vs: Optional[jnp.ndarray] = None,
    pos=None,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Beam self-attention over an UN-permuted stacked KV cache.

    ``layer`` selects the [L, ...] cache layer (a traced scalar — the
    caller's scan counter). With ``new_k``/``new_v`` the cache is the
    PRE-update buffer; this step's rows are patched in at ``pos`` (the
    caller writes them into the cache after the call, in-place).
    Routes to the fused Pallas kernel on TPU backends (or under
    ``interpret=True`` anywhere, for tests); pure-XLA fallback otherwise.
    """
    if interpret or use_pallas_attention():
        return _pallas_ancestor_attention(
            q_scaled, ck_all, cv_all, ks_all, vs_all, layer, anc, mask_row,
            new_k, new_v, new_ks, new_vs, pos,
            k_beams=anc.shape[1], interpret=interpret,
        )
    return ancestor_attention_reference(
        q_scaled, ck_all, cv_all, ks_all, vs_all, layer, anc, mask_row,
        new_k, new_v, new_ks, new_vs, pos,
    )
