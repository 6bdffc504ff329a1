"""Whisper parameter/activation sharding rules (DP + TP).

Tensor parallelism follows the Megatron pattern mapped onto GSPMD: QKV
and MLP-up project *onto* the ``model`` axis (column parallel), the
output/MLP-down projections contract *over* it (row parallel), so XLA
inserts exactly one psum per attention/MLP block over ICI. Batch
("data") shards the window batch. Everything else is replicated.

Stacked-layer leaves carry a leading ``L`` dim, so specs below have a
leading ``None``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["whisper_param_specs", "shard_params", "batch_spec"]


def _attn_specs(model_axis: str) -> Dict[str, P]:
    return {
        # column-parallel: output features sharded
        "q_w": P(None, None, model_axis),
        "q_b": P(None, model_axis),
        "k_w": P(None, None, model_axis),
        "v_w": P(None, None, model_axis),
        "v_b": P(None, model_axis),
        # row-parallel: input features sharded, psum on output
        "o_w": P(None, model_axis, None),
        "o_b": P(None),
    }


def _block_specs(model_axis: str, cross: bool) -> Dict[str, Any]:
    specs: Dict[str, Any] = {
        "attn": _attn_specs(model_axis),
        "attn_ln": {"g": P(None), "b": P(None)},
        "mlp": {
            "fc1_w": P(None, None, model_axis),
            "fc1_b": P(None, model_axis),
            "fc2_w": P(None, model_axis, None),
            "fc2_b": P(None),
        },
        "mlp_ln": {"g": P(None), "b": P(None)},
    }
    if cross:
        specs["cross"] = _attn_specs(model_axis)
        specs["cross_ln"] = {"g": P(None), "b": P(None)}
    return specs


def whisper_param_specs(model_axis: str = "model") -> Dict[str, Any]:
    """PartitionSpec tree matching the Whisper param tree layout."""
    return {
        "encoder": {
            "conv1": {"w": P(), "b": P()},
            "conv2": {"w": P(), "b": P()},
            "blocks": _block_specs(model_axis, cross=False),
            "ln_post": {"g": P(), "b": P()},
        },
        "decoder": {
            # embedding sharded over features: the logits matmul contracts
            # over the sharded dim -> one psum at the end of each step
            "tok_emb": P(None, model_axis),
            "pos_emb": P(None, model_axis),
            "blocks": _block_specs(model_axis, cross=True),
            "ln": {"g": P(), "b": P()},
        },
    }


def shard_params(params: Dict[str, Any], mesh: Mesh, model_axis: str = "model"):
    """device_put every leaf with its NamedSharding (replicates when the
    mesh has no model axis)."""
    if model_axis not in mesh.axis_names or mesh.shape[model_axis] == 1:
        specs = jax.tree.map(lambda _: P(), params)
    else:
        specs = whisper_param_specs(model_axis)

    def place(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs, is_leaf=lambda x: isinstance(x, P))


def batch_spec(mesh: Mesh, data_axis: str = "data", ndim: int = 3) -> NamedSharding:
    """Batch-leading activation sharding."""
    axis = data_axis if data_axis in mesh.axis_names else None
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))
