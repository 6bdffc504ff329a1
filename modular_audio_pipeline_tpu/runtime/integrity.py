"""Fetch-integrity defense for device->host transfers on flaky links.

This environment's tunneled TPU relay can return ALL-ZERO buffers from
device fetches, nondeterministically per process, with no error raised
(ROADMAP.md "Environment notes": identical serving decodes parsed 62
segments in one process and 0 in another; the controlled same-process
comparison was bit-identical). A zeroed token fetch silently parses to
zero segments and drops the DTW word-attachment work from a benchmark's
timed region, producing hollow headlines (VERDICT r4 weak #1).

Defense: the producing dispatch also computes a device-side checksum of
each critical buffer *from the device copy* (one extra tiny program, one
extra 4*n-byte fetch). The host recomputes the checksum from the fetched
bytes and compares; on mismatch it re-fetches through a fresh device
program (bypassing the Array's cached host copy) and ultimately raises
:class:`~..exceptions.FetchIntegrityError` so callers can retry in a
fresh process rather than record garbage.

Checksum: wrap-around uint32 sum of the buffer's 32-bit words, XORed
with a nonzero salt. XOR-ing the salt means a zeroed checksum fetch can
never validate a zeroed data fetch (0 != sum ^ salt unless the true sum
equals the salt, and the salt is chosen far from small-token sums).
Addition is exact and order-independent in modular arithmetic, so host
and device agree bit-for-bit regardless of reduction order.
"""

from __future__ import annotations

import logging
from typing import Sequence

import numpy as np

from ..exceptions import FetchIntegrityError

logger = logging.getLogger(__name__)

# Golden-ratio constant; any fixed nonzero value works (see module doc).
_SALT = np.uint32(0x9E3779B9)


def _words_u32(x: np.ndarray) -> np.ndarray:
    """Reinterpret a fetched host buffer as uint32 words."""
    a = np.ascontiguousarray(x)
    if a.dtype.itemsize == 4:
        return a.view(np.uint32).ravel()
    # Pad odd-sized dtypes out to a whole number of words.
    raw = a.tobytes()
    pad = (-len(raw)) % 4
    if pad:
        raw += b"\0" * pad
    return np.frombuffer(raw, dtype=np.uint32)


def host_checksum(x: np.ndarray) -> np.uint32:
    w = _words_u32(np.asarray(x))
    total = np.uint32(0) if w.size == 0 else np.bitwise_and(
        np.sum(w.astype(np.uint64)), np.uint64(0xFFFFFFFF)
    ).astype(np.uint32)
    return np.bitwise_xor(total, _SALT)


def checksum_device(arrays: Sequence) -> "jax.Array":
    """Dispatch one tiny program computing the checksum of each array.

    Returns a device ``uint32[n]``; fetch it alongside the data arrays
    and verify with :func:`fetch_verified_many`. Must be called while
    the arrays are still device-resident (same process, same buffers).
    """
    import jax

    return _chk_jit(tuple(arrays))


def _chk_one(x):
    import jax.numpy as jnp
    from jax import lax

    if x.dtype.itemsize == 4:
        w = lax.bitcast_convert_type(x, jnp.uint32)
    elif x.dtype.itemsize == 2:
        w = lax.bitcast_convert_type(x, jnp.uint16).astype(jnp.uint32)
        # Match the host's little-endian word packing: even-indexed
        # halfwords are the low 16 bits of each word.
        w = w.reshape(-1, 2) if w.size % 2 == 0 else jnp.concatenate(
            [w.reshape(-1), jnp.zeros((1,), jnp.uint32)]
        ).reshape(-1, 2)
        w = w[:, 0] + (w[:, 1] << 16)
    else:  # 1-byte dtypes
        w = x.reshape(-1).astype(jnp.uint32)
        pad = (-w.size) % 4
        if pad:
            w = jnp.concatenate([w, jnp.zeros((pad,), jnp.uint32)])
        w = w.reshape(-1, 4)
        w = w[:, 0] + (w[:, 1] << 8) + (w[:, 2] << 16) + (w[:, 3] << 24)
    return jnp.bitwise_xor(jnp.sum(w.reshape(-1), dtype=jnp.uint32),
                           jnp.uint32(_SALT))


def _chk_impl(arrays):
    import jax.numpy as jnp

    return jnp.stack([_chk_one(a) for a in arrays])


_chk_jit_cache = {}


def _chk_jit(arrays):
    import jax

    key = tuple((a.shape, str(a.dtype)) for a in arrays)
    fn = _chk_jit_cache.get(key)
    if fn is None:
        fn = jax.jit(_chk_impl)
        _chk_jit_cache[key] = fn
    return fn(arrays)


def put_verified(
    host_arrays: Sequence[np.ndarray],
    names: Sequence[str],
    retries: int = 3,
):
    """Upload arrays and verify the DEVICE copies against host checksums.

    The round-5 paired-WER run exposed the other direction of the relay
    pathology: a whole decode produced all-NUL token buffers whose
    device-side checksums VERIFIED — the corruption happened on the
    host->device upload (zeroed param/mel buffers), so the device
    faithfully computed garbage and the d2h defense had nothing to catch.
    This is the mirror defense: checksum each uploaded buffer on device
    (one tiny program) and compare against the host-computed checksum;
    re-upload mismatches; raise :class:`FetchIntegrityError` when the
    link keeps corrupting.

    Returns the list of verified device arrays (same order as input).
    Cost: one extra device program over the uploaded buffers + one
    4*n-byte fetch — negligible against model-weight uploads, which is
    the intended use (verify params once per process, not per step).
    """
    import jax.numpy as jnp

    hosts = [np.asarray(a) for a in host_arrays]
    expected = np.array([host_checksum(h) for h in hosts], np.uint32)
    devs = [jnp.asarray(h) for h in hosts]
    for attempt in range(retries + 1):
        got = np.asarray(checksum_device(devs)).astype(np.uint32)
        bad = [i for i in range(len(devs)) if got[i] != expected[i]]
        if not bad:
            if attempt:
                logger.warning(
                    "upload integrity recovered after %d re-upload(s)",
                    attempt,
                )
            return devs
        if attempt == retries:
            break
        logger.warning(
            "upload integrity mismatch on %s (attempt %d/%d) — "
            "re-uploading", [names[i] for i in bad], attempt + 1, retries,
        )
        for i in bad:
            devs[i] = jnp.asarray(np.ascontiguousarray(hosts[i]))
    raise FetchIntegrityError(
        "host->device upload failed checksum verification after "
        f"{retries} re-uploads",
        details=f"buffers: {[names[i] for i in bad]}; "
        "the relay link is corrupting (typically zeroing) uploads — "
        "retry in a fresh process",
    )


def put_verified_tree(tree, name: str = "params", retries: int = 3):
    """:func:`put_verified` over a pytree (e.g. a model-param dict)."""
    import jax

    leaves, treedef = jax.tree.flatten(tree)
    names = [f"{name}[{i}]" for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, put_verified(leaves, names, retries))


def _refetch(dev_array) -> np.ndarray:
    """Force a FRESH device->host transfer (bypass the cached host copy).

    ``np.asarray`` on a jax Array caches the host bytes; a corrupted
    first fetch would be returned forever. Running the buffer through a
    trivial device program yields a new Array with no cached copy.
    """
    import jax
    import jax.numpy as jnp

    fresh = jax.jit(lambda a: jnp.bitwise_xor(
        jnp.bitwise_xor(a, a), a) if jnp.issubdtype(a.dtype, jnp.integer)
        else a * 1)(dev_array)
    return np.asarray(fresh)


def fetch_verified_many(
    dev_arrays: Sequence,
    dev_chk,
    names: Sequence[str],
    retries: int = 3,
):
    """Fetch arrays + their device checksums; verify; retry; raise.

    Returns the list of verified host ndarrays. Raises
    :class:`FetchIntegrityError` if any buffer still fails after
    ``retries`` fresh re-fetches — callers should treat that as a
    degraded link and retry the whole run in a fresh process.
    """
    hosts = [np.asarray(a) for a in dev_arrays]
    chk_host = np.asarray(dev_chk).astype(np.uint32)
    for attempt in range(retries + 1):
        expected = np.array([host_checksum(h) for h in hosts], np.uint32)
        bad = [i for i in range(len(hosts)) if expected[i] != chk_host[i]]
        if not bad:
            if attempt:
                logger.warning(
                    "fetch integrity recovered after %d re-fetch(es)", attempt
                )
            return hosts
        if attempt == retries:
            break
        logger.warning(
            "fetch integrity mismatch on %s (attempt %d/%d) — re-fetching "
            "through fresh device programs",
            [names[i] for i in bad], attempt + 1, retries,
        )
        for i in bad:
            hosts[i] = _refetch(dev_arrays[i])
        chk_host = _refetch(dev_chk).astype(np.uint32)
    raise FetchIntegrityError(
        "device fetch failed checksum verification after "
        f"{retries} re-fetches",
        details=f"buffers: {[names[i] for i in bad]}; "
        "the relay link is returning corrupted (typically all-zero) "
        "buffers — retry in a fresh process",
    )
