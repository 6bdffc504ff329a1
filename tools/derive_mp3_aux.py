#!/usr/bin/env python3
"""Derive the remaining MPEG-1 Layer III data tables empirically.

Companion to ``derive_mp3_tables.py`` (Huffman codes). This tool
recovers, again purely behaviourally from libmpg123:

1. **Long-block scalefactor-band edges** per sample rate, via the
   region-boundary mechanism: region0_count/region1_count switch
   Huffman tables at band edges, and table 0 decodes zeros while
   consuming no bits — so a full-spectrum payload truncates exactly at
   the swept band edge.
2. **scalefac_compress -> (slen1, slen2)** and the slen1/slen2 band
   split, by alignment: only the correct total scalefactor bit count
   keeps a non-uniform Huffman pattern aligned; single-bit probes then
   attribute each bit to a band.
3. **pretab** (preflag emphasis per band), from per-bin amplitude
   ratios with preflag on/off.
4. **The synthesis window D[512]** (ISO Table B.3), by least squares:
   alias reduction, the 36/12-point IMDCTs, frequency inversion and the
   DCT-32 matrixing are analytic; the windowed synthesis sum is linear
   in D, so a handful of measured bin kernels over-determine it. The
   derived window is verified by predicting *unseen* bins' kernels to
   float accuracy, for long AND start/stop/short block types.
5. **Short-block structure** per sample rate: the is-domain ->
   (subband, window, line) mapping (the composition of the short
   scalefactor-band layout and the reorder step), matched kernel by
   kernel against the analytic model; the short band edges fall out of
   the window-reset pattern. subblock_gain semantics (2^-2g on one
   window) and the short scalefactor transmission order are verified
   directly.

Everything is emitted to ``mp3_tables_aux.json`` (consumed by the C++
decoder generator and the tests). The constants are ISO 11172-3 *data*,
re-derived from a compliant decoder's observable behaviour rather than
copied from any source.

Usage::

    python tools/derive_mp3_aux.py            # full derivation
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from derive_mp3_tables import (  # noqa: E402
    SR, Granule, Mpg123, Recoverer, build_response_operator,
    impulse_payload, make_frame_g, silent_frame,
)

RATES = (44100, 48000, 32000)


def probe_g(oracle: Mpg123, g0: Granule, sr: int = SR) -> np.ndarray:
    mp3 = (silent_frame(sr=sr) + make_frame_g(g0, sr=sr)
           + silent_frame(sr=sr))
    return oracle.decode(mp3)


def build_l(oracle: Mpg123, sr: int, block_type: int = 0) -> np.ndarray:
    """Measured response operator [n_pcm, 576] at one sample rate."""
    cols = []
    for k in range(576):
        g = Granule(payload=impulse_payload(k), block_type=block_type)
        cols.append(probe_g(oracle, g, sr=sr))
        if k % 192 == 0:
            print(f"  responses {k}/576 (sr {sr}, bt {block_type})",
                  file=sys.stderr)
    n = min(len(c) for c in cols)
    return np.stack([c[:n] for c in cols], axis=1)


# ---------------------------------------------------------------------------
# 1. Long-block scalefactor band edges via region sweeps
# ---------------------------------------------------------------------------

# table 1: (1,1) = "000" + 2 sign bits
PAIR11 = "00000"
FULL_SPECTRUM = PAIR11 * 288  # (1,1) on all 576 bins


def _nonzero_edge(vals: np.ndarray) -> int:
    """Length of the leading run of ~1.0 bins (rest must be ~0)."""
    nz = np.abs(vals) > 0.5
    edge = int(np.argmin(nz)) if not nz.all() else len(vals)
    if nz[edge:].any():
        raise RuntimeError(f"non-contiguous spectrum: edge {edge}")
    if not np.allclose(np.abs(vals[:edge]), 1.0, atol=0.25):
        raise RuntimeError("leading bins not unit amplitude")
    return edge


def derive_sfb_long(oracle: Mpg123, rec: Recoverer, sr: int) -> List[int]:
    edges = {0: 0}
    # region0 sweep: payload all in tables (1, 0, 0) -> bins beyond
    # edge[r0 + 1] decode as zeros (table 0 consumes nothing)
    for r0 in range(16):
        g = Granule(payload=FULL_SPECTRUM, big_values=288,
                    tables=(1, 0, 0), region0=r0, region1=0)
        edges[r0 + 1] = _nonzero_edge(rec(probe_g(oracle, g, sr))[:576])
    # region1 sweep with region0 pinned at 15: tables (0, 1, 0) ->
    # nonzero exactly on region1 = bands 16 .. 16 + r1
    base = edges[16]
    for r1 in range(6):
        g = Granule(payload=FULL_SPECTRUM, big_values=288,
                    tables=(0, 1, 0), region0=15, region1=r1)
        vals = rec(probe_g(oracle, g, sr))[:576]
        nz = np.abs(vals) > 0.5
        if int(np.argmax(nz)) != base:
            raise RuntimeError(
                f"sr {sr}: region1 start {int(np.argmax(nz))} != {base}"
            )
        edges[17 + r1] = int(len(nz) - np.argmax(nz[::-1]))
    out = [edges[i] for i in range(23)]
    if out[-1] != 576 or any(a >= b for a, b in zip(out, out[1:])):
        raise RuntimeError(f"sr {sr}: bad edges {out}")
    print(f"  sfb_long[{sr}]: {out}", file=sys.stderr)
    return out


# ---------------------------------------------------------------------------
# 2. scalefac_compress -> (slen1, slen2, split)
# ---------------------------------------------------------------------------

# alignment-sensitive pattern: pairs alternate (0,0)="1" and (1,1)
PATTERN = ("1" + PAIR11) * 144
PATTERN_BINS = np.tile([0.0, 0.0, 1.0, 1.0], 144)


def derive_slen(
    oracle: Mpg123, rec: Recoverer, sfb_long: List[int]
) -> Dict[int, Tuple[int, int, int]]:
    """{compress_index: (slen1, slen2, n_slen1_bands)} for long blocks."""
    out: Dict[int, Tuple[int, int, int]] = {}
    for c in range(16):
        total = None
        for nbits in range(0, 80):
            g = Granule(payload="0" * nbits + PATTERN, big_values=288,
                        tables=(1, 1, 1), region0=7, region1=7,
                        scalefac_compress=c)
            vals = rec(probe_g(oracle, g))[:576]
            if np.abs(vals - PATTERN_BINS).max() < 0.25:
                total = nbits
                break
        if total is None:
            raise RuntimeError(f"compress {c}: no alignment found")
        if total == 0:
            out[c] = (0, 0, 11)
            continue
        # single-bit probes: a set scalefactor bit scales one band down;
        # attribute each transmitted bit to its band.
        width = [0] * 21
        for p in range(total):
            g = Granule(
                payload="0" * p + "1" + "0" * (total - p - 1) + PATTERN,
                big_values=288, tables=(1, 1, 1), region0=7, region1=7,
                scalefac_compress=c,
            )
            vals = rec(probe_g(oracle, g))[:576]
            changed = np.abs(vals - PATTERN_BINS) > 0.1
            if not changed.any():
                raise RuntimeError(f"compress {c}: bit {p} inert")
            first_bin = int(np.argmax(changed))
            band = next(
                i for i in range(22)
                if sfb_long[i] <= first_bin < sfb_long[i + 1]
            )
            width[band] += 1
        slen1 = width[0]
        slen2 = width[20]
        n1 = 0
        while n1 < 21 and width[n1] == slen1:
            n1 += 1
        if any(w != slen2 for w in width[n1:]):
            raise RuntimeError(f"compress {c}: ragged widths {width}")
        if slen1 * n1 + slen2 * (21 - n1) != total:
            raise RuntimeError(f"compress {c}: widths {width} != {total}")
        out[c] = (slen1, slen2, n1)
        print(f"  compress {c}: slen=({slen1},{slen2}) split {n1}, "
              f"total {total}", file=sys.stderr)
    return out


# ---------------------------------------------------------------------------
# 3. pretab
# ---------------------------------------------------------------------------

def derive_pretab(
    oracle: Mpg123, rec: Recoverer, sfb_long: List[int]
) -> List[int]:
    def spectrum(**kw) -> np.ndarray:
        return rec(probe_g(oracle, Granule(
            payload=FULL_SPECTRUM, big_values=288, tables=(1, 1, 1),
            region0=7, region1=7, **kw)))[:576]

    base = spectrum()
    pre = spectrum(preflag=1)
    pre2 = spectrum(preflag=1, scalefac_scale=1)
    out = []
    for b in range(22):
        lo, hi = sfb_long[b], sfb_long[b + 1]
        r = float(np.median(pre[lo:hi] / base[lo:hi]))
        r2 = float(np.median(pre2[lo:hi] / base[lo:hi]))
        v = -2.0 * np.log2(max(r, 1e-9))
        vi = int(round(v))
        if abs(v - vi) > 0.05 or abs(-np.log2(max(r2, 1e-9)) - vi) > 0.05:
            raise RuntimeError(f"pretab band {b}: ratios {r} {r2}")
        out.append(vi)
    print(f"  pretab: {out}", file=sys.stderr)
    return out


# ---------------------------------------------------------------------------
# 4. Synthesis window D via least squares on an analytic chain model
# ---------------------------------------------------------------------------

# alias-reduction constants (ISO 11172-3 2.4.3.4.10.1 "ci" — standard
# published data; verified below by kernel prediction on unseen bins)
CI = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041,
               -0.0142, -0.0037])
CS = 1.0 / np.sqrt(1.0 + CI * CI)
CA = CI * CS

N_MAT = np.cos(np.pi / 64.0 * np.outer(16 + np.arange(64),
                                       2 * np.arange(32) + 1))

IMDCT36 = np.cos(np.pi / 72.0 * np.outer(2 * np.arange(36) + 1 + 18,
                                         2 * np.arange(18) + 1))
IMDCT12 = np.cos(np.pi / 24.0 * np.outer(2 * np.arange(12) + 1 + 6,
                                         2 * np.arange(6) + 1))
WIN_SHORT = np.sin(np.pi / 12.0 * (np.arange(12) + 0.5))


def imdct_win(block_type: int) -> np.ndarray:
    n = np.arange(36)
    w = np.sin(np.pi / 36.0 * (n + 0.5))
    if block_type == 1:  # start
        w = w.copy()
        w[18:24] = 1.0
        w[24:30] = np.sin(np.pi / 12.0 * (np.arange(24, 30) - 18 + 0.5))
        w[30:] = 0.0
    elif block_type == 3:  # stop
        w = w.copy()
        w[:6] = 0.0
        w[6:12] = np.sin(np.pi / 12.0 * (np.arange(6, 12) - 6 + 0.5))
        w[12:18] = 1.0
    return w


def alias_reduce(xr: np.ndarray) -> np.ndarray:
    xr = xr.copy()
    for sb in range(1, 32):
        for i in range(8):
            lo = 18 * sb - 1 - i
            hi = 18 * sb + i
            a, b = xr[lo], xr[hi]
            xr[lo] = a * CS[i] - b * CA[i]
            xr[hi] = b * CS[i] + a * CA[i]
    return xr


def granule_subbands(
    xr: np.ndarray, overlap: np.ndarray, block_type: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """xr[576] (+ overlap state [32, 18]) -> (s [32, 18], new overlap).

    For block_type 2 ``xr`` is in the REORDERED (subband-major) domain:
    each subband's 18 values are three 6-point windows, window-major.
    """
    if block_type != 2:
        xr = alias_reduce(xr)
    s = np.zeros((32, 18))
    new_overlap = np.zeros((32, 18))
    for sb in range(32):
        xin = xr[18 * sb: 18 * (sb + 1)]
        if block_type == 2:
            z = np.zeros(36)
            for w in range(3):
                zw = (IMDCT12 @ xin[6 * w: 6 * (w + 1)]) * WIN_SHORT
                z[6 + 6 * w: 18 + 6 * w] += zw
        else:
            z = (IMDCT36 @ xin) * imdct_win(block_type)
        s[sb] = z[:18] + overlap[sb]
        new_overlap[sb] = z[18:]
    # frequency inversion
    s[1::2, 1::2] *= -1.0
    return s, new_overlap


class SynthModel:
    """Coefficient-over-D tracker for the 32-band synthesis bank."""

    def __init__(self) -> None:
        self.v = np.zeros((16, 64))  # V fifo as 16 blocks of 64

    def step_coeffs(self, s_t: np.ndarray) -> np.ndarray:
        """One 32-sample step; returns coeff[32, 512] with
        pcm[j] = sum_i coeff[j, j + 32 i] * D[j + 32 i]."""
        self.v = np.roll(self.v, 1, axis=0)
        self.v[0] = N_MAT @ s_t
        u = np.zeros(512)
        for i in range(8):
            u[i * 64: i * 64 + 32] = self.v[2 * i][:32]
            u[i * 64 + 32: i * 64 + 64] = self.v[2 * i + 1][32:]
        coeff = np.zeros((32, 512))
        j = np.arange(32)
        for i in range(16):
            coeff[j, j + 32 * i] = u[j + 32 * i]
        return coeff


def model_coeff_matrix(
    xr: np.ndarray, block_type: int = 0, n_granules: int = 6,
    probe_granule: int = 2,
) -> np.ndarray:
    """Coefficient matrix A [n_granules*576, 512]: pcm = A @ D for a
    3-frame stream whose ``probe_granule`` carries spectrum ``xr``."""
    model = SynthModel()
    overlap = np.zeros((32, 18))
    rows = []
    for g in range(n_granules):
        spec = xr if g == probe_granule else np.zeros(576)
        s, overlap = granule_subbands(
            spec, overlap, block_type if g == probe_granule else 0
        )
        for t in range(18):
            rows.append(model.step_coeffs(s[:, t]))
    return np.concatenate(rows, axis=0)


def derive_window_d(l48: np.ndarray) -> np.ndarray:
    """Least-squares D[512] from measured long-block kernels, verified
    by predicting unseen bins."""
    fit_bins = [3, 17, 40, 77, 150, 260, 400, 555]
    mats, pcms = [], []
    for k in fit_bins:
        e = np.zeros(576)
        e[k] = 1.0
        a = model_coeff_matrix(e)
        n = min(a.shape[0], l48.shape[0])
        mats.append(a[:n])
        pcms.append(l48[:n, k])
    d, *_ = np.linalg.lstsq(np.concatenate(mats), np.concatenate(pcms),
                            rcond=None)
    rng = np.random.default_rng(0)
    test_bins = rng.choice(
        [b for b in range(576) if b not in fit_bins], size=24,
        replace=False,
    )
    worst = 0.0
    for k in test_bins:
        e = np.zeros(576)
        e[k] = 1.0
        a = model_coeff_matrix(e)
        n = min(a.shape[0], l48.shape[0])
        pred = a[:n] @ d
        meas = l48[:n, k]
        denom = float(np.abs(meas).max()) or 1.0
        worst = max(worst, float(np.abs(pred - meas).max()) / denom)
    if worst > 1e-3:
        raise RuntimeError(f"window D verification failed: rel err {worst}")
    print(f"  window D: verified on 24 unseen bins, worst rel err "
          f"{worst:.2e}", file=sys.stderr)
    return d


def verify_start_stop(oracle: Mpg123, d: np.ndarray) -> None:
    """Predict start/stop-block kernels with the derived D."""
    for bt in (1, 3):
        for k in (10, 100, 300):
            e = np.zeros(576)
            e[k] = 1.0
            pcm = probe_g(oracle, Granule(payload=impulse_payload(k),
                                          block_type=bt))
            a = model_coeff_matrix(e, block_type=bt)
            n = min(a.shape[0], len(pcm))
            denom = float(np.abs(pcm[:n]).max()) or 1.0
            err = float(np.abs(a[:n] @ d - pcm[:n]).max()) / denom
            if err > 1e-3:
                raise RuntimeError(f"block_type {bt} bin {k}: rel err {err}")
    print("  start/stop block kernels verified", file=sys.stderr)


# ---------------------------------------------------------------------------
# 5. Short blocks: is-domain mapping per sample rate
# ---------------------------------------------------------------------------

def derive_short(
    oracle: Mpg123, d: np.ndarray, sr: int,
) -> Dict[str, object]:
    """Match measured short-block kernels against the analytic model to
    recover the is-position -> (subband, window, line) mapping; the
    short scalefactor-band widths fall out of the window-reset rule."""
    print(f"  short-block mapping (sr {sr})...", file=sys.stderr)
    model_resp = np.zeros((576, 6 * 576))
    for idx in range(576):
        xr = np.zeros(576)
        xr[idx] = 1.0
        model_resp[idx] = model_coeff_matrix(xr, block_type=2) @ d

    l_short = build_l(oracle, sr, block_type=2)
    n = min(model_resp.shape[1], l_short.shape[0])
    mapping: List[Tuple[int, int, int]] = []
    for k in range(576):
        meas = l_short[:n, k]
        errs = np.abs(model_resp[:, :n] - meas).max(axis=1)
        best = int(np.argmin(errs))
        denom = float(np.abs(meas).max()) or 1.0
        if errs[best] / denom > 1e-3:
            raise RuntimeError(
                f"sr {sr} is-bin {k}: no model match "
                f"(err {errs[best] / denom:.2e})"
            )
        mapping.append((best // 18, (best % 18) // 6, best % 6))
    if len({(a, b, c) for a, b, c in mapping}) != 576:
        raise RuntimeError("short mapping not a bijection")

    # Band widths: within one short band of width W the is-order runs
    # W lines of window 0, W of window 1, W of window 2; a 2 -> 0
    # window transition marks a band edge.
    widths: List[int] = []
    start = 0
    for k in range(1, 577):
        if k == 576 or (mapping[k][1] == 0 and mapping[k - 1][1] == 2):
            span = k - start
            if span % 3:
                raise RuntimeError(f"sr {sr}: band span {span} not 3W")
            widths.append(span // 3)
            start = k
    edges = [0]
    for w in widths:
        edges.append(edges[-1] + w)
    if edges[-1] != 192:
        raise RuntimeError(f"sr {sr}: short edges end at {edges[-1]}")
    print(f"  sfb_short[{sr}]: {edges}", file=sys.stderr)

    # subblock gain: 2^(-2 g) on one window only
    probe_bin = 30
    base = probe_g(oracle, Granule(
        payload=impulse_payload(probe_bin), block_type=2), sr=sr)
    for w in range(3):
        sg = [0, 0, 0]
        sg[w] = 1
        pcm = probe_g(oracle, Granule(
            payload=impulse_payload(probe_bin), block_type=2,
            subblock_gain=tuple(sg)), sr=sr)
        m = min(len(base), len(pcm))
        ratio = (float(np.abs(pcm[:m]).max())
                 / max(float(np.abs(base[:m]).max()), 1e-12))
        expect = 0.25 if mapping[probe_bin][1] == w else 1.0
        if abs(ratio - expect) > 0.02:
            raise RuntimeError(
                f"sr {sr} subblock gain window {w}: {ratio} != {expect}"
            )
    rec_s = Recoverer(l_short)
    ws_r0 = derive_ws_region0(oracle, rec_s, sr, 2)
    return {"mapping": mapping, "sfb_short": edges, "ws_region0": ws_r0}


# ---------------------------------------------------------------------------
# 5b. window-switching big-values region boundaries
# ---------------------------------------------------------------------------

def derive_ws_region0(
    oracle: Mpg123, rec_bt: Recoverer, sr: int, block_type: int,
) -> int:
    """With window_switching set there are no region counts; the
    region0/region1 table switch sits at a fixed is-position. Feed a
    full spectrum in table 1 with region1's table = 0 (decodes zeros,
    consumes nothing): the leading nonzero run ends at the boundary."""
    g = Granule(payload=FULL_SPECTRUM, big_values=288,
                tables=(1, 0, 0), block_type=block_type)
    vals = rec_bt(probe_g(oracle, g, sr=sr))[:576]
    nz = np.abs(vals) > 0.5
    edge = int(np.argmin(nz)) if not nz.all() else 576
    if nz[edge:].any():
        raise RuntimeError(
            f"bt {block_type} sr {sr}: non-contiguous region0"
        )
    print(f"  ws region0 end (bt {block_type}, sr {sr}): {edge}",
          file=sys.stderr)
    return edge


# ---------------------------------------------------------------------------
# 6. scfsi band groups
# ---------------------------------------------------------------------------

_G1_REC: Optional[Recoverer] = None


def _granule1_rec(oracle: Mpg123) -> Recoverer:
    """Response operator for impulses in the PROBE FRAME's granule 1."""
    global _G1_REC
    if _G1_REC is None:
        cols = []
        for k in range(576):
            mp3 = (silent_frame()
                   + make_frame_g(Granule(),
                                  Granule(payload=impulse_payload(k)))
                   + silent_frame())
            cols.append(oracle.decode(mp3))
            if k % 192 == 0:
                print(f"  g1 responses {k}/576", file=sys.stderr)
        n = min(len(c) for c in cols)
        _G1_REC = Recoverer(np.stack([c[:n] for c in cols], axis=1))
    return _G1_REC


def derive_scfsi_groups(
    oracle: Mpg123, sfb_long: List[int],
    slen: Dict[int, Tuple[int, int, int]],
) -> List[List[int]]:
    """Which scalefactor bands each scfsi bit covers (4 groups).

    Granule 0 transmits scalefactor 1 on every band (the LSB of each
    field); with scfsi bit b set, granule 1 omits group b's scalefactor
    bits and inherits granule 0's values, so the inherited bands decode
    at 2^-0.5 amplitude even though granule 1 sent zeros. Granule 0's
    filterbank spill is removed by subtracting a matched stream whose
    granule 1 is empty."""
    c = 15
    s1, s2, n1 = slen[c]
    total = s1 * n1 + s2 * (21 - n1)
    sf_lsb = "".join(
        "0" * ((s1 if b < n1 else s2) - 1) + "1" for b in range(21)
    )
    g0 = Granule(payload=sf_lsb + FULL_SPECTRUM, big_values=288,
                 tables=(1, 1, 1), region0=7, region1=7,
                 scalefac_compress=c)
    g1rec = _granule1_rec(oracle)

    def g1_spectrum(g1: Granule, scfsi: int) -> np.ndarray:
        pcm = oracle.decode(
            silent_frame() + make_frame_g(g0, g1, scfsi=scfsi)
            + silent_frame())
        ref = oracle.decode(
            silent_frame() + make_frame_g(g0, Granule(), scfsi=scfsi)
            + silent_frame())
        n = min(len(pcm), len(ref))
        return g1rec(pcm[:n] - ref[:n])[:576]

    groups: List[List[int]] = []
    for bit in range(4):
        scfsi = 8 >> bit  # bit 0 covers the first band group
        aligned = None
        for nbits in range(total + 1):
            g1 = Granule(payload="0" * nbits + PATTERN, big_values=288,
                         tables=(1, 1, 1), region0=7, region1=7,
                         scalefac_compress=c)
            spec = g1_spectrum(g1, scfsi)
            zeros_ok = np.abs(spec)[PATTERN_BINS == 0].max() < 0.25
            ones_ok = np.abs(spec)[PATTERN_BINS == 1].min() > 0.3
            if zeros_ok and ones_ok:
                aligned = nbits
                break
        if aligned is None:
            raise RuntimeError(f"scfsi bit {bit}: no alignment")
        g1 = Granule(payload="0" * aligned + FULL_SPECTRUM,
                     big_values=288, tables=(1, 1, 1), region0=7,
                     region1=7, scalefac_compress=c)
        spec = np.abs(g1_spectrum(g1, scfsi))
        inherited = []
        for b in range(21):
            lo, hi = sfb_long[b], sfb_long[b + 1]
            m = float(np.median(spec[lo:hi]))
            if abs(m - 2.0 ** -0.5) < 0.1:
                inherited.append(b)
            elif abs(m - 1.0) > 0.1:
                raise RuntimeError(
                    f"scfsi bit {bit} band {b}: amplitude {m}"
                )
        omitted_bits = sum(
            (s1 if b < n1 else s2) for b in inherited
        )
        if omitted_bits != total - aligned:
            raise RuntimeError(
                f"scfsi bit {bit}: {omitted_bits} band bits vs "
                f"{total - aligned} omitted"
            )
        groups.append(inherited)
        print(f"  scfsi bit {bit}: bands {inherited}", file=sys.stderr)
    flat = sorted(b for g in groups for b in g)
    if flat != list(range(21)) and flat != list(range(20)):
        raise RuntimeError(f"scfsi groups incomplete: {groups}")
    return groups


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def main() -> None:
    oracle = Mpg123()
    out: Dict[str, object] = {}

    print("building 48k long-block response operator...", file=sys.stderr)
    l48 = build_l(oracle, SR)
    rec48 = Recoverer(l48)

    out["sfb_long"] = {}
    for sr in RATES:
        rec = rec48 if sr == SR else Recoverer(build_l(oracle, sr))
        out["sfb_long"][str(sr)] = derive_sfb_long(oracle, rec, sr)

    out["slen"] = {
        str(k): list(v)
        for k, v in derive_slen(oracle, rec48,
                                out["sfb_long"][str(SR)]).items()
    }
    out["pretab"] = derive_pretab(oracle, rec48, out["sfb_long"][str(SR)])
    slen_t = {int(k): tuple(v) for k, v in out["slen"].items()}
    out["scfsi_groups"] = derive_scfsi_groups(
        oracle, out["sfb_long"][str(SR)], slen_t
    )

    d = derive_window_d(l48)
    verify_start_stop(oracle, d)
    out["window_d"] = [float(x) for x in d]

    out["short"] = {}
    for sr in RATES:
        res = derive_short(oracle, d, sr)
        out["short"][str(sr)] = {
            "mapping": [list(m) for m in res["mapping"]],
            "sfb_short": res["sfb_short"],
            "ws_region0": res["ws_region0"],
        }
    # start/stop-block region boundary (48k operator; expressed as a
    # long-band edge index so it transfers across rates)
    print("building bt-1 response operator...", file=sys.stderr)
    rec_bt1 = Recoverer(build_l(oracle, SR, block_type=1))
    e1 = derive_ws_region0(oracle, rec_bt1, SR, 1)
    edges48 = out["sfb_long"][str(SR)]
    if e1 not in edges48:
        raise RuntimeError(f"bt-1 region0 end {e1} not a band edge")
    out["ws_region0_long_band"] = edges48.index(e1)

    native = Path(__file__).resolve().parents[1] / (
        "modular_audio_pipeline_tpu/runtime/native"
    )
    (native / "mp3_tables_aux.json").write_text(json.dumps(out))
    emit_aux_header(out, native / "mp3_tables_aux.h")
    print(f"wrote {native}/mp3_tables_aux.{{json,h}}", file=sys.stderr)


def emit_aux_header(out: Dict[str, object], dst: Path) -> None:
    sfx = {"44100": "44", "48000": "48", "32000": "32"}
    lines = [
        "// MPEG-1 Layer III data tables (ISO 11172-3 Annex B data).",
        "// GENERATED by tools/derive_mp3_aux.py: derived behaviourally",
        "// from libmpg123 (see that script), NOT copied from any",
        "// decoder source. Do not edit by hand.",
        "#pragma once",
        "#include <cstdint>",
        "",
        "namespace mp3tab {",
        "",
    ]

    def arr(ctype: str, name: str, vals, fmt=str) -> None:
        body = ", ".join(fmt(v) for v in vals)
        lines.append(
            f"inline constexpr {ctype} {name}[{len(vals)}] = {{{body}}};"
        )

    for sr, s in sfx.items():
        arr("int16_t", f"kSfbLong{s}", out["sfb_long"][sr])
    slen = [out["slen"][str(c)] for c in range(16)]
    lines.append(
        f"inline constexpr uint8_t kSlen[16][3] = {{"
        + ", ".join("{%d, %d, %d}" % tuple(v) for v in slen) + "};"
    )
    arr("uint8_t", "kPretab", out["pretab"])
    groups = out["scfsi_groups"]
    edges = [0]
    for g in groups:
        if g != list(range(edges[-1], edges[-1] + len(g))):
            raise RuntimeError(f"non-contiguous scfsi group {g}")
        edges.append(edges[-1] + len(g))
    if edges[-1] not in (20, 21):
        raise RuntimeError(f"scfsi edges {edges}")
    edges[-1] = 21  # the last group runs to band 21 exclusive
    arr("int", "kScfsiGroup", edges)
    lines.append(
        f"inline constexpr int kWsRegion0LongBand = "
        f"{out['ws_region0_long_band']};"
    )
    for sr, s in sfx.items():
        sh = out["short"][sr]
        if len(sh["sfb_short"]) != 14 or sh["sfb_short"][-1] != 192:
            raise RuntimeError(f"sfb_short[{sr}]: {sh['sfb_short']}")
        arr("int16_t", f"kSfbShort{s}", sh["sfb_short"])
        packed = [m[0] * 18 + m[1] * 6 + m[2] for m in sh["mapping"]]
        arr("uint16_t", f"kShortMap{s}", packed)
        lines.append(
            f"inline constexpr int kWsRegion0Short{s} = "
            f"{sh['ws_region0']};"
        )
    arr("double", "kWindowD", out["window_d"], fmt=lambda v: f"{v!r}")
    lines.append("")
    lines.append("}  // namespace mp3tab")
    dst.write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
