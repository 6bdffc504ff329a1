"""Whisper training step: teacher-forced cross-entropy under pjit.

Shapes are static: mel ``[B, n_mels, 3000]``, tokens ``[B, S]`` with -100
padding on ignored positions (prompt + pad). The step is a single jitted
function; with a (data, model) mesh the only communication is the DP
gradient psum and the TP block psums GSPMD derives from the param specs.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.whisper.config import WhisperDims
from ..models.whisper.model import KVCache, cross_kv, decoder_forward, encoder_forward

__all__ = ["TrainState", "make_train_step", "cross_entropy_loss"]

IGNORE_INDEX = -100


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def cross_entropy_loss(
    logits: jnp.ndarray,  # [B, S, V] f32
    targets: jnp.ndarray,  # [B, S] int32, IGNORE_INDEX = masked
) -> jnp.ndarray:
    mask = targets != IGNORE_INDEX
    safe_targets = jnp.where(mask, targets, 0)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, safe_targets[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(mask, nll, 0.0))
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count


def _forward_loss(params, dims: WhisperDims, mel, tokens, targets):
    xa = encoder_forward(params, dims, mel)
    xa_k, xa_v = cross_kv(params, dims, xa)
    cache = KVCache.zeros(
        dims, tokens.shape[0], dtype=params["decoder"]["tok_emb"].dtype,
        ctx=tokens.shape[1],
    )
    logits, _ = decoder_forward(params, dims, tokens, xa_k, xa_v, cache)
    return cross_entropy_loss(logits.astype(jnp.float32), targets)


def make_train_step(
    dims: WhisperDims,
    optimizer: Optional[optax.GradientTransformation] = None,
    donate: bool = True,
):
    """Returns (init_state, train_step).

    ``train_step(state, mel, tokens, targets) -> (state, loss)`` — jit it
    with input shardings from parallel.sharding / parallel.mesh; param and
    optimizer-state shardings follow from the placed params.
    """
    opt = optimizer or optax.adamw(1e-5, weight_decay=0.01)

    def init_state(params) -> TrainState:
        return TrainState(
            params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32)
        )

    def train_step(state: TrainState, mel, tokens, targets) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(_forward_loss)(
            state.params, dims, mel, tokens, targets
        )
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), loss

    return init_state, train_step
