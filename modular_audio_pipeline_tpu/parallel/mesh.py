"""Device mesh construction and named shardings.

One mesh per process, built from ``TPUConfig.mesh_shape``. Axes:

- ``data``  — shards batches of 30 s windows (DP); collectives: none in
  inference, gradient psum in training.
- ``model`` — shards attention heads / MLP columns (TP); collectives:
  psum over ICI on the attention/MLP outputs, inserted by XLA GSPMD from
  the shardings below.

On a single chip the mesh degenerates gracefully (everything replicated),
so the same code path runs from laptop CPU to a v5e pod slice.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TPUConfig
from ..exceptions import ShardingError

logger = logging.getLogger(__name__)

__all__ = ["build_mesh", "data_sharding", "replicated", "shard_batch"]


def build_mesh(cfg: Optional[TPUConfig] = None, devices=None) -> Mesh:
    """Build a Mesh from config; defaults to all devices on one 'data' axis."""
    cfg = cfg or TPUConfig()
    devices = devices if devices is not None else jax.devices()

    shape: Dict[str, int] = dict(cfg.mesh_shape)
    if not shape:
        shape = {cfg.data_axis: len(devices)}

    total = int(np.prod(list(shape.values())))
    if total > len(devices):
        raise ShardingError(
            f"Mesh shape {shape} needs {total} devices, have {len(devices)}"
        )
    if total < len(devices):
        devices = devices[:total]

    axis_names = tuple(shape.keys())
    dev_array = np.asarray(devices).reshape(tuple(shape.values()))
    mesh = Mesh(dev_array, axis_names)
    logger.info("Mesh: %s over %d device(s)", dict(shape), total)
    return mesh


def data_sharding(mesh: Mesh, axis: str = "data", ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim on ``axis``; replicate the rest."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Pad the leading dim to the axis size and shard it across the mesh."""
    import jax.numpy as jnp

    n_shards = mesh.shape[axis]
    b = batch.shape[0]
    pad = (-b) % n_shards
    if pad:
        batch = np.concatenate(
            [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)]
        )
    sharding = data_sharding(mesh, axis, batch.ndim)
    return jax.device_put(jnp.asarray(batch), sharding), b
