"""Llama-architecture causal LM in JAX (RMSNorm, RoPE, GQA, SwiGLU).

Covers the reference's local post-processing models (TinyLlama-1.1B,
Phi-3-mini-class, Mistral-7B — ``post_processing_hybrid.py:161-179``)
with the same TPU-first construction as the Whisper stack: stacked layers
under ``lax.scan``, bf16 MXU matmuls with f32 accumulation, preallocated
KV cache, greedy/sampled generation under ``lax.while_loop``.

Checkpoints convert offline from HF safetensors via
:func:`convert_hf_llama`; a ``test-small`` config exists for mechanics
tests with random weights.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LlamaConfig", "LLAMA_CONFIGS", "LlamaLM", "convert_hf_llama"]

Params = Dict[str, Any]


@dataclass(frozen=True)
class LlamaConfig:
    n_layers: int
    d_model: int
    n_heads: int
    n_kv_heads: int
    d_ff: int
    vocab_size: int
    max_seq: int = 2048
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


LLAMA_CONFIGS: Dict[str, LlamaConfig] = {
    "tinyllama-1.1b": LlamaConfig(22, 2048, 32, 4, 5632, 32000),
    "mistral-7b": LlamaConfig(32, 4096, 32, 8, 14336, 32000, max_seq=4096),
    "test-small": LlamaConfig(2, 64, 4, 2, 128, 512, max_seq=128),
}


def _rms_norm(x: jnp.ndarray, g: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    norm = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (norm * g.astype(jnp.float32)).astype(x.dtype)


def _rope(x: jnp.ndarray, pos: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding; x [B, H, S, D], pos [S] absolute positions."""
    d = x.shape[-1]
    inv_freq = 1.0 / (theta ** (np.arange(0, d, 2) / d))
    angles = pos[:, None].astype(jnp.float32) * jnp.asarray(inv_freq)[None, :]
    cos = jnp.cos(angles)[None, None]  # [1,1,S,D/2]
    sin = jnp.sin(angles)[None, None]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class LMCache(NamedTuple):
    k: jnp.ndarray  # [L, B, KVH, ctx, hd]
    v: jnp.ndarray
    pos: jnp.ndarray

    @staticmethod
    def zeros(cfg: LlamaConfig, batch: int, ctx: int, dtype) -> "LMCache":
        shape = (cfg.n_layers, batch, cfg.n_kv_heads, ctx, cfg.head_dim)
        return LMCache(
            jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
            jnp.zeros((), jnp.int32),
        )


def forward(
    params: Params, cfg: LlamaConfig, tokens: jnp.ndarray, cache: LMCache
) -> Tuple[jnp.ndarray, LMCache]:
    """Teacher-forced / incremental forward. tokens [B, S] -> logits [B, S, V]."""
    b, s = tokens.shape
    ctx = cache.k.shape[-2]
    pos0 = cache.pos
    h, kvh, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    groups = h // kvh

    x = params["tok_emb"][tokens].astype(params["tok_emb"].dtype)
    positions = pos0 + jnp.arange(s)

    q_pos = pos0 + jnp.arange(s)[:, None]
    k_pos = jnp.arange(ctx)[None, :]
    mask = jnp.where(k_pos <= q_pos, 0.0, -jnp.inf).astype(jnp.float32)

    def block(x, layer):
        p, ck, cv = layer
        resid = x
        y = _rms_norm(x, p["attn_norm"], cfg.rms_eps)

        def proj(name, heads):
            out = jnp.einsum(
                "bsd,df->bsf", y, p[name], preferred_element_type=jnp.float32
            ).astype(x.dtype)
            return out.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

        q = _rope(proj("wq", h), positions, cfg.rope_theta)
        k_new = _rope(proj("wk", kvh), positions, cfg.rope_theta)
        v_new = proj("wv", kvh)

        ck = jax.lax.dynamic_update_slice_in_dim(ck, k_new, pos0, axis=2)
        cv = jax.lax.dynamic_update_slice_in_dim(cv, v_new, pos0, axis=2)

        # GQA: repeat kv heads across query groups
        kk = jnp.repeat(ck, groups, axis=1)  # [B, H, ctx, hd]
        vv = jnp.repeat(cv, groups, axis=1)
        scale = hd**-0.5
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, kk, preferred_element_type=jnp.float32
        ) + mask[None, None]
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        att = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, vv, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        att = att.transpose(0, 2, 1, 3).reshape(b, s, h * hd)
        x = resid + jnp.einsum(
            "bsf,fd->bsd", att, p["wo"], preferred_element_type=jnp.float32
        ).astype(x.dtype)

        resid = x
        y = _rms_norm(x, p["mlp_norm"], cfg.rms_eps)
        gate = jnp.einsum("bsd,df->bsf", y, p["w_gate"], preferred_element_type=jnp.float32)
        up = jnp.einsum("bsd,df->bsf", y, p["w_up"], preferred_element_type=jnp.float32)
        act = (jax.nn.silu(gate) * up).astype(x.dtype)
        x = resid + jnp.einsum(
            "bsf,fd->bsd", act, p["w_down"], preferred_element_type=jnp.float32
        ).astype(x.dtype)
        return x, (ck, cv)

    x, (new_k, new_v) = jax.lax.scan(block, x, (params["blocks"], cache.k, cache.v))
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = jnp.einsum(
        "bsd,vd->bsv", x, params["lm_head"], preferred_element_type=jnp.float32
    )
    return logits, LMCache(new_k, new_v, pos0 + s)


def init_params(cfg: LlamaConfig, seed: int = 0, dtype=jnp.bfloat16) -> Params:
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, 10)
    d, ff = cfg.d_model, cfg.d_ff
    s = d**-0.5

    def mat(k, din, dout):
        return (jax.random.normal(k, (din, dout)) * s).astype(dtype)

    def block(k):
        ks = jax.random.split(k, 7)
        return {
            "attn_norm": jnp.ones((d,), dtype),
            "wq": mat(ks[0], d, cfg.n_heads * cfg.head_dim),
            "wk": mat(ks[1], d, cfg.n_kv_heads * cfg.head_dim),
            "wv": mat(ks[2], d, cfg.n_kv_heads * cfg.head_dim),
            "wo": mat(ks[3], cfg.n_heads * cfg.head_dim, d),
            "mlp_norm": jnp.ones((d,), dtype),
            "w_gate": mat(ks[4], d, ff),
            "w_up": mat(ks[5], d, ff),
            "w_down": mat(ks[6], ff, d),
        }

    blocks = [block(k) for k in jax.random.split(keys[0], cfg.n_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "tok_emb": (jax.random.normal(keys[1], (cfg.vocab_size, d)) * s).astype(dtype),
        "blocks": stacked,
        "final_norm": jnp.ones((d,), dtype),
        "lm_head": (jax.random.normal(keys[2], (cfg.vocab_size, d)) * s).astype(dtype),
    }


class LlamaLM:
    """Generation wrapper with KV cache and static-bound sampling loop."""

    def __init__(self, cfg: LlamaConfig, params: Optional[Params] = None, seed: int = 0):
        self.cfg = cfg
        self.params = params if params is not None else init_params(cfg, seed)

    def generate(
        self,
        prompt_ids: np.ndarray,  # [P] int32
        max_new_tokens: int = 256,
        temperature: float = 0.3,
        eos_id: Optional[int] = None,
        seed: int = 0,
    ) -> np.ndarray:
        cfg = self.cfg
        prompt = jnp.asarray(prompt_ids, jnp.int32)[None]
        ctx = min(cfg.max_seq, prompt.shape[1] + max_new_tokens + 1)
        eos = eos_id if eos_id is not None else -1

        @partial(jax.jit, static_argnames=("max_new",))
        def run(params, prompt, rng, max_new):
            cache = LMCache.zeros(cfg, 1, ctx, params["tok_emb"].dtype)
            logits, cache = forward(params, cfg, prompt, cache)

            out = jnp.full((max_new,), eos if eos >= 0 else 0, jnp.int32)

            def body(state):
                i, cache, out, last_logits, rng, done = state
                lp = last_logits.astype(jnp.float32)
                if temperature > 0:
                    rng, sub = jax.random.split(rng)
                    tok = jax.random.categorical(sub, lp / temperature, axis=-1)[0]
                else:
                    tok = jnp.argmax(lp, axis=-1)[0]
                tok = tok.astype(jnp.int32)
                out = out.at[i].set(tok)
                done = done | (tok == eos)
                logits, cache = forward(params, cfg, tok[None, None], cache)
                return i + 1, cache, out, logits[:, -1], rng, done

            def cond(state):
                i, _, _, _, _, done = state
                return (i < max_new) & ~done

            state = (
                jnp.asarray(0, jnp.int32), cache, out, logits[:, -1],
                jax.random.PRNGKey(seed), jnp.asarray(False),
            )
            state = jax.lax.while_loop(cond, body, state)
            return state[2], state[0]

        out, n = run(self.params, prompt, jax.random.PRNGKey(seed), max_new_tokens)
        return np.asarray(out)[: int(n)]


def convert_hf_llama(src: str, dst: str, model_name: str) -> None:
    """HF llama/mistral safetensors -> our flat npz tree (offline)."""
    from pathlib import Path

    from ..whisper.convert import save_params

    cfg = LLAMA_CONFIGS[model_name]
    src_path = Path(src)
    sd: Dict[str, np.ndarray] = {}
    from safetensors.numpy import load_file

    for f in sorted(src_path.glob("*.safetensors")):
        sd.update(load_file(str(f)))

    def g(k):
        return sd[k].astype(np.float32)

    blocks = []
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}"
        blocks.append(
            {
                "attn_norm": g(f"{p}.input_layernorm.weight"),
                "wq": g(f"{p}.self_attn.q_proj.weight").T,
                "wk": g(f"{p}.self_attn.k_proj.weight").T,
                "wv": g(f"{p}.self_attn.v_proj.weight").T,
                "wo": g(f"{p}.self_attn.o_proj.weight").T,
                "mlp_norm": g(f"{p}.post_attention_layernorm.weight"),
                "w_gate": g(f"{p}.mlp.gate_proj.weight").T,
                "w_up": g(f"{p}.mlp.up_proj.weight").T,
                "w_down": g(f"{p}.mlp.down_proj.weight").T,
            }
        )
    stacked = {}
    for key in blocks[0]:
        stacked[key] = np.stack([b[key] for b in blocks])
    params = {
        "tok_emb": g("model.embed_tokens.weight"),
        "blocks": stacked,
        "final_norm": g("model.norm.weight"),
        "lm_head": g(
            "lm_head.weight"
            if "lm_head.weight" in sd
            else "model.embed_tokens.weight"  # tied embeddings
        ),
    }
    save_params(params, dst)
