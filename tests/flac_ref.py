"""Minimal FLAC *encoder* (test oracle for the native C++ decoder).

Spec-conformant for the features it emits: 16-bit mono/stereo, CONSTANT /
VERBATIM / FIXED(0-4) / LPC subframes, rice + rice2 residual coding with
partition orders and escape codes, independent / left-side / right-side /
mid-side stereo, wasted bits, frame CRC-8/CRC-16. Test-only — the
production decode path is runtime/native/flac_decode.cc.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class BitWriter:
    def __init__(self) -> None:
        self.bytes = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        assert nbits >= 0
        value &= (1 << nbits) - 1 if nbits else 0
        self._acc = (self._acc << nbits) | value
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self.bytes.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded frame/sample number."""
    if n < 0x80:
        return bytes([n])
    # continuation count for standard UTF-8 payload capacities
    caps = [(1, 0x7FF), (2, 0xFFFF), (3, 0x1FFFFF), (4, 0x3FFFFFF),
            (5, 0x7FFFFFFF), (6, 0xFFFFFFFFF)]
    conts = next(c for c, cap in caps if n <= cap)
    lead_ones = conts + 1
    lead = (0xFF << (8 - lead_ones)) & 0xFF
    lead |= (n >> (6 * conts)) & ((1 << (7 - lead_ones)) - 1)
    body = [0x80 | ((n >> (6 * (conts - 1 - i))) & 0x3F) for i in range(conts)]
    return bytes([lead] + body)


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, 2 * r, -2 * r - 1).astype(np.int64)


def _rice_cost(z: np.ndarray, k: int) -> int:
    return int((z >> k).sum()) + len(z) * (k + 1)


def _write_residual(
    bw: BitWriter,
    res: np.ndarray,
    order: int,
    blocksize: int,
    partition_order: int = 0,
    method: int = 0,
    force_escape: bool = False,
) -> None:
    bw.write(method, 2)  # 0 = 4-bit rice, 1 = 5-bit rice2
    bw.write(partition_order, 4)
    plen = 4 if method == 0 else 5
    escape = 0x0F if method == 0 else 0x1F
    nparts = 1 << partition_order
    idx = 0
    for part in range(nparts):
        count = (blocksize >> partition_order) - (order if part == 0 else 0)
        chunk = res[idx : idx + count]
        idx += count
        z = _zigzag(chunk)
        if force_escape:
            raw = int(max(2, (int(np.abs(chunk).max(initial=0)).bit_length() + 1)))
            bw.write(escape, plen)
            bw.write(raw, 5)
            for v in chunk:
                bw.write_signed(int(v), raw)
            continue
        best_k = min(range(15 if method == 0 else 31), key=lambda k: _rice_cost(z, k))
        bw.write(best_k, plen)
        for u in z:
            bw.write_unary(int(u) >> best_k)
            if best_k:
                bw.write(int(u) & ((1 << best_k) - 1), best_k)


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _lpc_coefs(x: np.ndarray, order: int, precision: int = 12):
    xf = x.astype(np.float64)
    if np.allclose(xf, 0):
        return None
    ac = np.correlate(xf, xf, mode="full")[len(xf) - 1 : len(xf) + order]
    if ac[0] == 0:
        return None
    # Levinson-Durbin
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(a[:i], ac[i:0:-1][:i])
        k = acc / err if err > 0 else 0.0
        a[: i + 1] = np.concatenate([a[:i] - k * a[:i][::-1], [k]])
        err *= 1 - k * k
        if err <= 0:
            break
    cmax = np.abs(a).max()
    if cmax == 0:
        return None
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = int(np.clip(shift, 1, 15))
    q = np.round(a * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    q = np.clip(q, -lim, lim - 1)
    return q, shift, precision


def _encode_subframe(
    bw: BitWriter,
    x: np.ndarray,
    bps: int,
    subframe: str,
    partition_order: int = 0,
    rice_method: int = 0,
    force_escape: bool = False,
    wasted: int = 0,
) -> None:
    blocksize = len(x)
    if wasted:
        assert (x & ((1 << wasted) - 1) == 0).all()
        x = x >> wasted

    if subframe == "constant":
        assert (x == x[0]).all()
        bw.write(0, 1); bw.write(0, 6)
    elif subframe == "verbatim":
        bw.write(0, 1); bw.write(1, 6)
    elif subframe.startswith("fixed"):
        order = int(subframe[-1])
        bw.write(0, 1); bw.write(8 + order, 6)
    elif subframe.startswith("lpc"):
        order = int(subframe[3:])
        bw.write(0, 1); bw.write(31 + order, 6)
    else:
        raise ValueError(subframe)

    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)
    eff = bps - wasted

    if subframe == "constant":
        bw.write_signed(int(x[0]), eff)
    elif subframe == "verbatim":
        for v in x:
            bw.write_signed(int(v), eff)
    elif subframe.startswith("fixed"):
        order = int(subframe[-1])
        for v in x[:order]:
            bw.write_signed(int(v), eff)
        res = _fixed_residual(x, order)
        _write_residual(bw, res, order, blocksize, partition_order,
                        rice_method, force_escape)
    else:  # lpc
        order = int(subframe[3:])
        got = _lpc_coefs(x, order)
        if got is None:  # degenerate block: fall back to fixed-1 layout
            raise ValueError("LPC underdetermined on this block")
        q, shift, precision = got
        for v in x[:order]:
            bw.write_signed(int(v), eff)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in q:
            bw.write_signed(int(c), precision)
        xi = x.astype(np.int64)
        pred = np.zeros(blocksize - order, dtype=np.int64)
        for j in range(order):
            pred += q[j] * xi[order - 1 - j : blocksize - 1 - j]
        res = xi[order:] - (pred >> shift)
        _write_residual(bw, res, order, blocksize, partition_order,
                        rice_method, force_escape)


def encode_flac(
    samples: np.ndarray,
    sr: int,
    bps: int = 16,
    blocksize: int = 4096,
    subframe: str = "fixed2",
    stereo: str = "independent",  # independent|left_side|right_side|mid_side
    partition_order: int = 0,
    rice_method: int = 0,
    force_escape: bool = False,
    wasted: int = 0,
    id3_prefix: bool = False,
) -> bytes:
    """Encode int samples ``[n]`` or ``[n, 2]`` into a FLAC byte stream."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape

    out = bytearray()
    if id3_prefix:
        tag = b"JUNKTAG0"  # 8 bytes of tag body
        out += b"ID3\x04\x00\x00" + bytes(
            [(len(tag) >> 21) & 0x7F, (len(tag) >> 14) & 0x7F,
             (len(tag) >> 7) & 0x7F, len(tag) & 0x7F]
        ) + tag
    out += b"fLaC"

    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(blocksize, 16); si.write(blocksize, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(sr, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)  # md5 unset
    body = si.getvalue()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    ch_code = {1: 0}.get(channels)
    if channels == 2:
        ch_code = {"independent": 1, "left_side": 8,
                   "right_side": 9, "mid_side": 10}[stereo]

    for fi, start in enumerate(range(0, n, blocksize)):
        blk = x[start : start + blocksize]
        bs = len(blk)
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # blocksize: 16 bits at end
        bw.write(0, 4)  # sample rate: from STREAMINFO
        bw.write(ch_code, 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        bw.write(0, 1)
        for b in utf8_number(fi):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        header = bw.getvalue()
        bw.write(crc8(header), 8)

        # channel signals (+1 bit for side)
        if channels == 1 or stereo == "independent":
            sigs = [(blk[:, c], bps) for c in range(channels)]
        elif stereo == "left_side":
            sigs = [(blk[:, 0], bps), (blk[:, 0] - blk[:, 1], bps + 1)]
        elif stereo == "right_side":
            sigs = [(blk[:, 0] - blk[:, 1], bps + 1), (blk[:, 1], bps)]
        else:  # mid_side
            side = blk[:, 0] - blk[:, 1]
            mid = (blk[:, 0] + blk[:, 1]) >> 1
            sigs = [(mid, bps), (side, bps + 1)]

        # partition order must divide the (possibly partial) block
        po = partition_order
        if subframe.startswith("lpc"):
            order_guess = int(subframe[3:])
        elif subframe.startswith("fixed"):
            order_guess = int(subframe[-1])
        else:
            order_guess = 0
        while po > 0 and (bs % (1 << po) != 0 or (bs >> po) <= order_guess):
            po -= 1

        for sig, sub_bps in sigs:
            sub = subframe
            if sub == "constant" and not (sig == sig[0]).all():
                sub = "verbatim"
            if sub.startswith("lpc"):
                # pre-check: LPC is underdetermined on silent/degenerate
                # blocks (must decide BEFORE any header bits are written)
                if _lpc_coefs(sig >> wasted, int(sub[3:])) is None:
                    sub = "verbatim"
            _encode_subframe(
                bw, sig, sub_bps, sub, po, rice_method,
                force_escape, wasted,
            )
        bw.align()
        frame = bw.getvalue()
        out += frame + crc16(frame).to_bytes(2, "big")

    return bytes(out)
