"""Offline Whisper checkpoint conversion: HF / OpenAI -> our param tree.

The reference downloads CTranslate2 or OpenAI checkpoints at runtime
(``/root/reference/audio_pipeline/transcriber.py:165,362-366``); this
environment is zero-egress, so conversion is an explicit offline step:

    python -m modular_audio_pipeline_tpu.models.whisper.convert \
        --src /path/to/hf-whisper-dir --dst ~/.cache/map_tpu/whisper-tiny

Supports HuggingFace ``WhisperForConditionalGeneration`` layouts
(``model.safetensors`` / ``pytorch_model.bin``) and OpenAI ``.pt`` files.
Output: one ``params.npz`` with flat ``/``-joined keys (loadable without
torch) plus copied tokenizer assets (vocab.json / merges.txt) when present.
"""

from __future__ import annotations

import argparse
import logging
import shutil
from pathlib import Path
from typing import Any, Dict

import numpy as np

from ...exceptions import ModelLoadError
from .config import WHISPER_DIMS, WhisperDims

logger = logging.getLogger(__name__)

__all__ = ["convert_checkpoint", "save_params", "load_params", "flatten_tree", "unflatten_tree"]


def flatten_tree(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(flatten_tree(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(params: Dict[str, Any], dst: str) -> None:
    Path(dst).mkdir(parents=True, exist_ok=True)
    np.savez(Path(dst) / "params.npz", **flatten_tree(params))


def load_params(src: str, dtype=None) -> Dict[str, Any]:
    path = Path(src) / "params.npz"
    if not path.exists():
        raise ModelLoadError(
            f"No converted checkpoint at {src}",
            details="Run modular_audio_pipeline_tpu.models.whisper.convert first.",
        )
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    if dtype is not None:
        import ml_dtypes  # bundled with jax

        np_dtype = np.dtype(dtype) if dtype != "bfloat16" else ml_dtypes.bfloat16
        flat = {k: v.astype(np_dtype) if v.dtype.kind == "f" else v for k, v in flat.items()}

    # Pad the embedding table to a lane multiple (see model.padded_vocab).
    emb_key = "decoder/tok_emb"
    if emb_key in flat:
        from .model import padded_vocab

        emb = flat[emb_key]
        target = padded_vocab(emb.shape[0])
        if target > emb.shape[0]:
            pad = np.zeros((target - emb.shape[0], emb.shape[1]), dtype=emb.dtype)
            flat[emb_key] = np.concatenate([emb, pad], axis=0)
    return unflatten_tree(flat)


def _torch_state_dict(src: Path) -> Dict[str, np.ndarray]:
    """Load an HF or OpenAI torch checkpoint into numpy arrays."""
    def to_np(t):
        import torch

        return t.detach().to(torch.float32).cpu().numpy()

    st = src / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        return load_file(str(st))
    for name in ("pytorch_model.bin", "whisper.pt"):
        p = src / name
        if p.exists():
            import torch

            sd = torch.load(str(p), map_location="cpu", weights_only=True)
            if "model_state_dict" in sd:  # openai layout
                sd = sd["model_state_dict"]
            return {k: to_np(v) for k, v in sd.items()}
    if src.suffix == ".pt":
        import torch

        ckpt = torch.load(str(src), map_location="cpu", weights_only=True)
        sd = ckpt.get("model_state_dict", ckpt)
        return {k: to_np(v) for k, v in sd.items()}
    raise ModelLoadError(f"No recognised checkpoint in {src}")


def _from_hf(sd: Dict[str, np.ndarray], dims: WhisperDims) -> Dict[str, Any]:
    """Map HuggingFace WhisperForConditionalGeneration names to our tree."""
    g = lambda k: sd[k]  # noqa: E731

    def block(prefix: str, cross: bool) -> Dict[str, Any]:
        p = {
            "attn": {
                "q_w": g(f"{prefix}.self_attn.q_proj.weight").T,
                "q_b": g(f"{prefix}.self_attn.q_proj.bias"),
                "k_w": g(f"{prefix}.self_attn.k_proj.weight").T,
                "v_w": g(f"{prefix}.self_attn.v_proj.weight").T,
                "v_b": g(f"{prefix}.self_attn.v_proj.bias"),
                "o_w": g(f"{prefix}.self_attn.out_proj.weight").T,
                "o_b": g(f"{prefix}.self_attn.out_proj.bias"),
            },
            "attn_ln": {
                "g": g(f"{prefix}.self_attn_layer_norm.weight"),
                "b": g(f"{prefix}.self_attn_layer_norm.bias"),
            },
            "mlp": {
                "fc1_w": g(f"{prefix}.fc1.weight").T,
                "fc1_b": g(f"{prefix}.fc1.bias"),
                "fc2_w": g(f"{prefix}.fc2.weight").T,
                "fc2_b": g(f"{prefix}.fc2.bias"),
            },
            "mlp_ln": {
                "g": g(f"{prefix}.final_layer_norm.weight"),
                "b": g(f"{prefix}.final_layer_norm.bias"),
            },
        }
        if cross:
            p["cross"] = {
                "q_w": g(f"{prefix}.encoder_attn.q_proj.weight").T,
                "q_b": g(f"{prefix}.encoder_attn.q_proj.bias"),
                "k_w": g(f"{prefix}.encoder_attn.k_proj.weight").T,
                "v_w": g(f"{prefix}.encoder_attn.v_proj.weight").T,
                "v_b": g(f"{prefix}.encoder_attn.v_proj.bias"),
                "o_w": g(f"{prefix}.encoder_attn.out_proj.weight").T,
                "o_b": g(f"{prefix}.encoder_attn.out_proj.bias"),
            }
            p["cross_ln"] = {
                "g": g(f"{prefix}.encoder_attn_layer_norm.weight"),
                "b": g(f"{prefix}.encoder_attn_layer_norm.bias"),
            }
        return p

    def stack(blocks):
        out = {}
        for key in blocks[0]:
            if isinstance(blocks[0][key], dict):
                out[key] = stack([b[key] for b in blocks])
            else:
                out[key] = np.stack([b[key] for b in blocks])
        return out

    enc_blocks = [
        block(f"model.encoder.layers.{i}", cross=False)
        for i in range(dims.n_audio_layer)
    ]
    dec_blocks = [
        block(f"model.decoder.layers.{i}", cross=True)
        for i in range(dims.n_text_layer)
    ]
    return {
        "encoder": {
            "conv1": {
                "w": g("model.encoder.conv1.weight"),
                "b": g("model.encoder.conv1.bias"),
            },
            "conv2": {
                "w": g("model.encoder.conv2.weight"),
                "b": g("model.encoder.conv2.bias"),
            },
            "blocks": stack(enc_blocks),
            "ln_post": {
                "g": g("model.encoder.layer_norm.weight"),
                "b": g("model.encoder.layer_norm.bias"),
            },
        },
        "decoder": {
            "tok_emb": g("model.decoder.embed_tokens.weight"),
            "pos_emb": g("model.decoder.embed_positions.weight"),
            "blocks": stack(dec_blocks),
            "ln": {
                "g": g("model.decoder.layer_norm.weight"),
                "b": g("model.decoder.layer_norm.bias"),
            },
        },
    }


def _from_openai(sd: Dict[str, np.ndarray], dims: WhisperDims) -> Dict[str, Any]:
    """Map OpenAI whisper names (encoder.blocks.N.attn.query ...)."""
    g = lambda k: sd[k]  # noqa: E731

    def block(prefix: str, cross: bool) -> Dict[str, Any]:
        p = {
            "attn": {
                "q_w": g(f"{prefix}.attn.query.weight").T,
                "q_b": g(f"{prefix}.attn.query.bias"),
                "k_w": g(f"{prefix}.attn.key.weight").T,
                "v_w": g(f"{prefix}.attn.value.weight").T,
                "v_b": g(f"{prefix}.attn.value.bias"),
                "o_w": g(f"{prefix}.attn.out.weight").T,
                "o_b": g(f"{prefix}.attn.out.bias"),
            },
            "attn_ln": {
                "g": g(f"{prefix}.attn_ln.weight"),
                "b": g(f"{prefix}.attn_ln.bias"),
            },
            "mlp": {
                "fc1_w": g(f"{prefix}.mlp.0.weight").T,
                "fc1_b": g(f"{prefix}.mlp.0.bias"),
                "fc2_w": g(f"{prefix}.mlp.2.weight").T,
                "fc2_b": g(f"{prefix}.mlp.2.bias"),
            },
            "mlp_ln": {
                "g": g(f"{prefix}.mlp_ln.weight"),
                "b": g(f"{prefix}.mlp_ln.bias"),
            },
        }
        if cross:
            p["cross"] = {
                "q_w": g(f"{prefix}.cross_attn.query.weight").T,
                "q_b": g(f"{prefix}.cross_attn.query.bias"),
                "k_w": g(f"{prefix}.cross_attn.key.weight").T,
                "v_w": g(f"{prefix}.cross_attn.value.weight").T,
                "v_b": g(f"{prefix}.cross_attn.value.bias"),
                "o_w": g(f"{prefix}.cross_attn.out.weight").T,
                "o_b": g(f"{prefix}.cross_attn.out.bias"),
            }
            p["cross_ln"] = {
                "g": g(f"{prefix}.cross_attn_ln.weight"),
                "b": g(f"{prefix}.cross_attn_ln.bias"),
            }
        return p

    def stack(blocks):
        out = {}
        for key in blocks[0]:
            if isinstance(blocks[0][key], dict):
                out[key] = stack([b[key] for b in blocks])
            else:
                out[key] = np.stack([b[key] for b in blocks])
        return out

    enc = [block(f"encoder.blocks.{i}", False) for i in range(dims.n_audio_layer)]
    dec = [block(f"decoder.blocks.{i}", True) for i in range(dims.n_text_layer)]
    return {
        "encoder": {
            "conv1": {"w": g("encoder.conv1.weight"), "b": g("encoder.conv1.bias")},
            "conv2": {"w": g("encoder.conv2.weight"), "b": g("encoder.conv2.bias")},
            "blocks": stack(enc),
            "ln_post": {"g": g("encoder.ln_post.weight"), "b": g("encoder.ln_post.bias")},
        },
        "decoder": {
            "tok_emb": g("decoder.token_embedding.weight"),
            "pos_emb": g("decoder.positional_embedding"),
            "blocks": stack(dec),
            "ln": {"g": g("decoder.ln.weight"), "b": g("decoder.ln.bias")},
        },
    }


def convert_checkpoint(src: str, dst: str, model_name: str) -> None:
    """Convert a downloaded checkpoint directory/file to ``dst``."""
    dims = WHISPER_DIMS[model_name]
    src_path = Path(src)
    sd = _torch_state_dict(src_path)
    if any(k.startswith("model.encoder") for k in sd):
        params = _from_hf(sd, dims)
    else:
        params = _from_openai(sd, dims)
    save_params(params, dst)
    # Carry tokenizer assets along when the source ships them.
    src_dir = src_path if src_path.is_dir() else src_path.parent
    for asset in ("vocab.json", "merges.txt", "tokenizer.json", "normalizer.json"):
        p = src_dir / asset
        if p.exists():
            shutil.copy(p, Path(dst) / asset)
    logger.info("Converted %s -> %s", src, dst)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--model", required=True, choices=sorted(WHISPER_DIMS))
    args = ap.parse_args()
    convert_checkpoint(args.src, args.dst, args.model)


if __name__ == "__main__":
    main()
