"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are exercised on CPU via
``xla_force_host_platform_device_count`` (the TPU in this environment is a
single chip; the driver separately dry-runs the multi-chip path).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the TPU backend at
# interpreter start, which wins over the env var — override it here.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tone_plus_silence(rng):
    """10 s @16 kHz: 3 s silence, 4 s speech-like tone bursts, 3 s silence."""
    sr = 16000
    t = np.arange(4 * sr) / sr
    burst = 0.3 * np.sin(2 * np.pi * 220 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
    # amplitude-modulate to look speech-like (high energy variance)
    env = (np.sin(2 * np.pi * 1.5 * t) > -0.2).astype(np.float32)
    burst = (burst * env).astype(np.float32)
    quiet = (0.0005 * rng.standard_normal(3 * sr)).astype(np.float32)
    return np.concatenate([quiet, burst, quiet]).astype(np.float32), sr
