"""Behavioural derivation of the MPEG-2/2.5 (LSF) Layer III tables + the
intensity-stereo ratio tables (VERDICT r3 #8).

Round 3 derived every MPEG-1 constant behaviourally from libmpg123 with
crafted probe frames (tools/derive_mp3_tables.py, derive_mp3_aux.py);
this extends the method to the pieces the round-3 decoder rejected:

1. **LSF frame crafting** — MPEG-2/2.5 headers (one granule, 8-bit
   main_data_begin, 9-bit scalefac_compress, no scfsi/preflag bits).
2. **LSF band tables** per rate (22.05/24/16 and 11.025/12/8 kHz):
   long edges via the same region0/region1 sweeps, short edges + the
   is-order reorder map via kernel matching — derive_mp3_aux's own
   functions, re-pointed at the LSF frame builder (the IMDCT/synthesis
   model is rate-independent).
3. **MPEG-1 intensity-stereo ratios** — stereo frames with a silent
   right channel (zero part at bin 0) and right-channel scalefactors
   sweeping is_position; the left/right output ratios ARE the table.
4. **LSF intensity ratios** for intensity_scale 0/1 the same way.

Emits runtime/native/mp3_tables_lsf.h on stdout.

Usage: python tools/derive_mp3_lsf.py > .../mp3_tables_lsf.h
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

import derive_mp3_aux as aux  # noqa: E402
from derive_mp3_tables import (  # noqa: E402
    Bits,
    Granule,
    Mpg123,
    impulse_payload,
)

LSF_BITRATE_INDEX = {
    8: 1, 16: 2, 24: 3, 32: 4, 40: 5, 48: 6, 56: 7, 64: 8,
    80: 9, 96: 10, 112: 11, 128: 12, 144: 13, 160: 14,
}
SR_INDEX_V2 = {22050: 0, 24000: 1, 16000: 2}
SR_INDEX_V25 = {11025: 0, 12000: 1, 8000: 2}
BITRATE = 160
LSF_RATES = (22050, 24000, 16000, 11025, 12000, 8000)


def lsf_frame_bytes(sr: int, bitrate: int = BITRATE) -> int:
    return 72 * bitrate * 1000 // sr


def lsf_granule_side(b: Bits, g: Granule, scalefac_compress: int) -> None:
    """LSF granule side info: 9-bit scalefac_compress, no preflag bit."""
    b.put(len(g.payload), 12)
    b.put(g.big_values, 9)
    b.put(g.global_gain, 8)
    b.put(scalefac_compress, 9)
    if g.block_type == 0:
        b.put(0, 1)
        for t in g.tables:
            b.put(t, 5)
        b.put(g.region0, 4)
        b.put(g.region1, 3)
    else:
        b.put(1, 1)
        b.put(g.block_type, 2)
        b.put(g.mixed_block, 1)
        for t in g.tables[:2]:
            b.put(t, 5)
        for sg in g.subblock_gain:
            b.put(sg, 3)
    b.put(g.scalefac_scale, 1)
    b.put(g.count1table, 1)


def make_lsf_frame(
    g0: Granule,
    sr: int,
    bitrate: int = BITRATE,
    sc0: int = 0,
    g1: Optional[Granule] = None,
    sc1: int = 0,
    mode: int = 1,
    mode_ext: int = 0,
) -> bytes:
    version = 0b10 if sr in SR_INDEX_V2 else 0b00
    sr_idx = (SR_INDEX_V2 if version == 0b10 else SR_INDEX_V25)[sr]
    stereo = g1 is not None
    b = Bits()
    b.put(0x7FF, 11)
    b.put(version, 2)
    b.put(0b01, 2)  # Layer III
    b.put(1, 1)  # no CRC
    b.put(LSF_BITRATE_INDEX[bitrate], 4)
    b.put(sr_idx, 2)
    b.put(0, 1)  # padding
    b.put(0, 1)  # private
    b.put(mode if stereo else 3, 2)
    b.put(mode_ext if stereo else 0, 2)
    b.put(0, 1)
    b.put(0, 1)
    b.put(0, 2)
    b.put(0, 8)  # main_data_begin (LSF: 8 bits)
    b.put(0, 2 if stereo else 1)  # private bits
    lsf_granule_side(b, g0, sc0)
    if stereo:
        lsf_granule_side(b, g1, sc1)
    b.put_str(g0.payload)
    if stereo:
        b.put_str(g1.payload)
    return b.bytes(pad_to=lsf_frame_bytes(sr, bitrate))


def silent_lsf(sr: int) -> bytes:
    return make_lsf_frame(Granule(), sr)


def probe_lsf(oracle: Mpg123, g0: Granule, sr: int) -> np.ndarray:
    mp3 = silent_lsf(sr) + make_lsf_frame(g0, sr) + silent_lsf(sr)
    return oracle.decode(mp3)


# ---------------------------------------------------------------------------
# MPEG-1 stereo frames (for the intensity-ratio probes)
# ---------------------------------------------------------------------------

from derive_mp3_tables import _BITRATE_INDEX, _SR_INDEX, frame_bytes  # noqa: E402


def make_mpeg1_stereo(
    g0: Tuple[Granule, Granule],
    g1: Tuple[Granule, Granule],
    sr: int = 48000,
    bitrate: int = 320,
    mode_ext: int = 1,
) -> bytes:
    b = Bits()
    b.put(0x7FF, 11)
    b.put(0b11, 2)  # MPEG-1
    b.put(0b01, 2)
    b.put(1, 1)
    b.put(_BITRATE_INDEX[bitrate], 4)
    b.put(_SR_INDEX[sr], 2)
    b.put(0, 1)
    b.put(0, 1)
    b.put(0b01, 2)  # joint stereo
    b.put(mode_ext, 2)
    b.put(0, 1)
    b.put(0, 1)
    b.put(0, 2)
    b.put(0, 9)  # main_data_begin
    b.put(0, 3)  # private (stereo)
    b.put(0, 4)  # scfsi ch0
    b.put(0, 4)  # scfsi ch1
    for gr in (g0, g1):
        for ch in range(2):
            gr[ch].side_info(b)
    for gr in (g0, g1):
        for ch in range(2):
            b.put_str(gr[ch].payload)
    return b.bytes(pad_to=frame_bytes(sr, bitrate))


def silent_mpeg1_stereo(sr: int = 48000) -> bytes:
    g = lambda: (Granule(), Granule())  # noqa: E731
    return make_mpeg1_stereo(g(), g(), sr=sr, mode_ext=0)


# ---------------------------------------------------------------------------
# Intensity-ratio probes
# ---------------------------------------------------------------------------

def derive_mpeg1_is_ratios(oracle: Mpg123) -> List[Tuple[float, float]]:
    """(kl, kr) per is_position 0..7 measured from mpg123's output.

    Probe: joint-stereo frame, mode_ext=1 (IS on, MS off). Left channel
    carries a count1 impulse at bin 0; right channel is silent with
    big_values=0 and part2 consisting only of scalefactors (sc=13 ->
    slen 3,3) all set to the probed position. The right channel's zero
    part starts at bin 0, so every band is an intensity band. The
    absolute synthesis gain divides out against a mode_ext=0 reference
    of the same frame."""
    sc = 13  # slen1 = 3, slen2 = 3 (derived round 3: kSlen)

    def probe(p: int, mode_ext: int) -> np.ndarray:
        sf_bits = format(p, "03b") * 21
        g0 = (Granule(payload=impulse_payload(0), count1table=1),
              Granule(payload=sf_bits, scalefac_compress=sc))
        g1 = (Granule(), Granule())
        mp3 = (silent_mpeg1_stereo() +
               make_mpeg1_stereo(g0, g1, mode_ext=mode_ext) +
               silent_mpeg1_stereo())
        return oracle.decode(mp3).reshape(-1, 2)[1152: 1152 + 1152]

    base = probe(0, 0)
    base_amp = float(np.abs(base[:, 0]).max())
    assert base_amp > 1e-4, "reference probe silent"
    out = []
    for p in range(8):
        seg = probe(p, 1)
        kl = float(np.abs(seg[:, 0]).max()) / base_amp
        kr = float(np.abs(seg[:, 1]).max()) / base_amp
        out.append((round(kl, 10), round(kr, 10)))
    return out


def lsf_int_sf_bits(p: int, sc: int) -> str:
    """Right-channel scalefactor bits for an LSF intensity probe.

    In LSF intensity mode the right channel's 9-bit scalefac_compress is
    interpreted through the intensity variant: intensity_scale = sc & 1,
    s = sc >> 1, and for s < 180: slen = (s//36, (s%36)//6, s%6, 0) with
    long-block partitions (7, 7, 7, 0). The probe VERIFIES this layout:
    a wrong hypothesis misaligns the bits and the measured ratios come
    out inconsistent (non-monotonic / not powers of one base)."""
    s = sc >> 1
    assert s < 180
    slen = (s // 36, (s % 36) // 6, s % 6, 0)
    nsfb = (7, 7, 7, 0)
    bits = ""
    for ln, n in zip(slen, nsfb):
        for _ in range(n):
            if ln:
                bits += format(min(p, (1 << ln) - 1), f"0{ln}b")
    return bits


def derive_lsf_is_ratios(oracle: Mpg123, sr: int = 24000):
    """(kl, kr) per is_position for intensity_scale 0 and 1."""

    # the flanking frames must be stereo too: a mono->stereo format
    # change mid-feed makes mpg123 drop the stream
    sil = make_lsf_frame(Granule(), sr, g1=Granule(), mode=1, mode_ext=0)

    def probe(g1: Granule, sc1: int, mode_ext: int) -> np.ndarray:
        g0 = Granule(payload=impulse_payload(0), count1table=1)
        mp3 = (sil + make_lsf_frame(g0, sr, g1=g1, sc1=sc1, mode=1,
                                    mode_ext=mode_ext) + sil)
        pcm = oracle.decode(mp3)
        if len(pcm) == 0:
            raise RuntimeError("oracle rejected LSF stereo probe frame")
        return pcm.reshape(-1, 2)[576: 576 + 1152]

    base = probe(Granule(), 0, 0)
    base_amp = float(np.abs(base[:, 0]).max())
    assert base_amp > 1e-4, "LSF reference probe silent"
    tables = []
    for is_scale in (0, 1):
        sc = (108 << 1) | is_scale  # slen = (3, 0, 0, 0): 3-bit positions
        rows = []
        for p in range(8):
            seg = probe(Granule(payload=lsf_int_sf_bits(p, sc)), sc, 1)
            kl = float(np.abs(seg[:, 0]).max()) / base_amp
            kr = float(np.abs(seg[:, 1]).max()) / base_amp
            rows.append((round(kl, 10), round(kr, 10)))
        tables.append(rows)
    return tables


# ---------------------------------------------------------------------------
# Emit
# ---------------------------------------------------------------------------

def emit_header(results: Dict) -> None:
    print("// GENERATED by tools/derive_mp3_lsf.py — MPEG-2/2.5 (LSF)")
    print("// Layer III tables + intensity-stereo ratios, derived")
    print("// behaviourally from libmpg123 probe frames. Do not edit.")
    print("#pragma once")
    print("#include <cstdint>")
    print()
    print("namespace mp3tab {")
    for sr, edges in results["sfb_long"].items():
        name = str(sr).replace("050", "05")
        print(f"constexpr int16_t kSfbLongLsf{name}[23] = "
              "{" + ", ".join(str(e) for e in edges) + "};")
    for sr, d in results["short"].items():
        name = str(sr).replace("050", "05")
        edges = d["sfb_short"]
        print(f"constexpr int16_t kSfbShortLsf{name}[14] = "
              "{" + ", ".join(str(e) for e in edges) + "};")
        m = d["mapping"]
        vals = [sb * 18 + w * 6 + ln for sb, w, ln in m]
        print(f"constexpr uint16_t kShortMapLsf{name}[576] = {{")
        for i in range(0, 576, 16):
            print("    " + ", ".join(str(v) for v in vals[i:i + 16]) + ",")
        print("};")
        print(f"constexpr int kWsRegion0ShortLsf{name} = "
              f"{d['ws_region0']};")
    for sr, e in results["ws_long"].items():
        name = str(sr).replace("050", "05")
        print(f"constexpr int kWsRegion0LongLsf{name} = {e};")
    m1 = results["is_mpeg1"]
    print("// MPEG-1 intensity stereo: (kl, kr) per is_position 0..7;")
    print("// position 7 is illegal (channels pass through unchanged).")
    print("constexpr double kIsRatioL1[8] = {"
          + ", ".join(f"{kl:.10f}" for kl, _ in m1) + "};")
    print("constexpr double kIsRatioR1[8] = {"
          + ", ".join(f"{kr:.10f}" for _, kr in m1) + "};")
    lsf0, lsf1 = results["is_lsf"]
    print("// LSF intensity stereo: (kl, kr) per is_position, indexed by")
    print("// intensity_scale (sc & 1).")
    for name, rows in (("0", lsf0), ("1", lsf1)):
        print(f"constexpr double kIsLsfL{name}[8] = {{"
              + ", ".join(f"{kl:.10f}" for kl, _ in rows) + "};")
        print(f"constexpr double kIsLsfR{name}[8] = {{"
              + ", ".join(f"{kr:.10f}" for _, kr in rows) + "};")
    print("}  // namespace mp3tab")


def main() -> None:
    import json

    oracle = Mpg123()
    results: Dict = {"sfb_long": {}, "short": {}, "ws_long": {},
                     "is_mpeg1": None, "is_lsf": None}

    print("deriving intensity ratio tables...", file=sys.stderr)
    results["is_mpeg1"] = derive_mpeg1_is_ratios(oracle)
    print(f"  mpeg1 IS: {results['is_mpeg1']}", file=sys.stderr)
    results["is_lsf"] = derive_lsf_is_ratios(oracle)
    print(f"  lsf IS scale0: {results['is_lsf'][0]}", file=sys.stderr)
    print(f"  lsf IS scale1: {results['is_lsf'][1]}", file=sys.stderr)

    # synthesis window (rate-independent) from the MPEG-1 responses
    print("deriving synthesis window (MPEG-1 48k)...", file=sys.stderr)
    l48 = aux.build_l(oracle, 48000)
    d = aux.derive_window_d(l48)

    # Repoint the aux machinery at LSF frames. LSF probe files are 3
    # frames x 576 samples; the analytic kernel model expects the
    # MPEG-1 layout (probe granule at sample 1152), so prepend 576
    # zeros — the synthesis state before the probe granule is zero in
    # both layouts.
    aux.probe_g = lambda orc, g0, sr=48000: np.concatenate(
        [np.zeros(576, np.float32), probe_lsf(orc, g0, sr)]
    )

    from derive_mp3_tables import Recoverer

    for sr in LSF_RATES:
        print(f"LSF rate {sr}:", file=sys.stderr)
        l_long = aux.build_l(oracle, sr, block_type=0)
        rec = Recoverer(l_long)
        results["sfb_long"][sr] = aux.derive_sfb_long(oracle, rec, sr)
        rec_bt1 = Recoverer(aux.build_l(oracle, sr, block_type=1))
        results["ws_long"][sr] = aux.derive_ws_region0(oracle, rec_bt1, sr, 1)
        results["short"][sr] = aux.derive_short(oracle, d, sr)

    native = Path(__file__).resolve().parents[1] / (
        "modular_audio_pipeline_tpu/runtime/native"
    )
    (native / "mp3_tables_lsf.json").write_text(json.dumps({
        "sfb_long": {str(k): v for k, v in results["sfb_long"].items()},
        "ws_long": {str(k): v for k, v in results["ws_long"].items()},
        "short": {
            str(k): {
                "mapping": [list(m) for m in v["mapping"]],
                "sfb_short": v["sfb_short"],
                "ws_region0": v["ws_region0"],
            } for k, v in results["short"].items()
        },
        "is_mpeg1": results["is_mpeg1"],
        "is_lsf": results["is_lsf"],
    }))
    emit_header(results)


if __name__ == "__main__":
    main()
