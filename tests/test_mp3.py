"""First-party MP3 decoder vs the libmpg123 oracle.

The native decoder (``runtime/native/mp3_decode.cc``) is built from
behaviourally-derived ISO tables; these tests prove it reproduces a
reference decoder's output on real LAME-encoded streams — the same
encoder family that produced most MP3s in the wild. Reference anchor:
the pipeline's primary ingest is MP3 via FFmpeg
(``/root/reference/audio_pipeline/media_handler.py:219-233``); here the
decode is first-party (VERDICT r2 item 5).
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np
import pytest

from modular_audio_pipeline_tpu.runtime.native_lib import (
    have_native,
    native_mp3_decode,
)


def _load_lame():
    try:
        return ctypes.CDLL("libmp3lame.so.0")
    except OSError:
        return None


def _load_mpg123():
    try:
        return ctypes.CDLL("libmpg123.so.0")
    except OSError:
        return None


_LAME = _load_lame()
_MPG = _load_mpg123()

needs_codecs = pytest.mark.skipif(
    not (have_native() and _LAME and _MPG),
    reason="native lib, libmp3lame or libmpg123 unavailable",
)


def lame_encode(
    samples: np.ndarray, sr: int, *, kbps: int = 128, vbr: bool = False,
    joint_stereo: bool = True,
) -> bytes:
    """Encode float samples ([n] mono or [n, 2] stereo) with LAME."""
    lame = _LAME
    lame.lame_init.restype = ctypes.c_void_p
    gfp = ctypes.c_void_p(lame.lame_init())
    nch = 1 if samples.ndim == 1 else samples.shape[1]
    lame.lame_set_in_samplerate(gfp, sr)
    lame.lame_set_out_samplerate(gfp, sr)
    lame.lame_set_num_channels(gfp, nch)
    if nch == 1:
        lame.lame_set_mode(gfp, 3)  # mono
    elif joint_stereo:
        lame.lame_set_mode(gfp, 1)  # joint stereo
    else:
        lame.lame_set_mode(gfp, 0)  # stereo
    if vbr:
        lame.lame_set_VBR(gfp, 4)  # vbr_default
        lame.lame_set_VBR_q(gfp, 4)
    else:
        lame.lame_set_brate(gfp, kbps)
    assert lame.lame_init_params(gfp) >= 0
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype(np.int16)
    if nch == 1:
        left = right = np.ascontiguousarray(pcm)
        n = len(pcm)
    else:
        left = np.ascontiguousarray(pcm[:, 0])
        right = np.ascontiguousarray(pcm[:, 1])
        n = pcm.shape[0]
    buf = ctypes.create_string_buffer(n * 5 // 4 + 7200)
    m = lame.lame_encode_buffer(
        gfp,
        left.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        right.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        n, buf, len(buf),
    )
    assert m >= 0
    out = buf.raw[:m]
    m = lame.lame_encode_flush(gfp, buf, len(buf))
    out += buf.raw[:m]
    lame.lame_close(gfp)
    return out


def mpg123_decode(mp3: bytes) -> tuple[np.ndarray, int, int]:
    """Oracle decode -> (interleaved float32, sr, channels)."""
    lib = _MPG
    lib.mpg123_init()
    lib.mpg123_new.restype = ctypes.c_void_p
    h = ctypes.c_void_p(lib.mpg123_new(None, None))
    try:
        lib.mpg123_format_none(h)
        for rate in (32000, 44100, 48000, 16000, 22050, 24000,
                     8000, 11025, 12000):
            lib.mpg123_format(h, ctypes.c_long(rate), 3, 0x200)
        assert lib.mpg123_open_feed(h) == 0
        assert lib.mpg123_feed(h, mp3, len(mp3)) == 0
        buf = ctypes.create_string_buffer(1 << 20)
        done = ctypes.c_size_t(0)
        out = b""
        while True:
            r = lib.mpg123_read(h, buf, len(buf), ctypes.byref(done))
            out += buf.raw[: done.value]
            if r in (0, -11):  # OK / NEW_FORMAT
                continue
            break
        rate = ctypes.c_long(0)
        ch = ctypes.c_int(0)
        enc = ctypes.c_int(0)
        lib.mpg123_getformat(h, ctypes.byref(rate), ctypes.byref(ch),
                             ctypes.byref(enc))
        return (np.frombuffer(out, np.float32).copy(), int(rate.value),
                int(ch.value))
    finally:
        lib.mpg123_delete(h)


def assert_matches_oracle(mp3: bytes, *, tol: float = 2e-4) -> None:
    """Native decode must match mpg123 sample-for-sample after alignment.

    mpg123 may trim LAME gapless padding; alignment is recovered by
    cross-correlation before comparing the overlap.
    """
    ours, sr_a = native_mp3_decode(mp3)
    ref, sr_b, ch_b = mpg123_decode(mp3)
    ch_a = ours.shape[1]
    assert sr_a == sr_b
    assert ch_a == ch_b
    mine = ours.reshape(-1)  # interleaved
    n = min(len(mine), len(ref))
    assert n > 1000
    a = mine[:n].astype(np.float64)
    b = ref[:n].astype(np.float64)
    # alignment via cross-correlation on the first channel
    am = a[::ch_a][:20000]
    bm = b[::ch_a][:20000]
    corr = np.correlate(am, bm, mode="full")
    lag = int(np.argmax(corr)) - (len(bm) - 1)
    if lag > 0:
        a = a[lag * ch_a:]
    elif lag < 0:
        b = b[-lag * ch_a:]
    m = min(len(a), len(b))
    scale = max(float(np.abs(b[:m]).max()), 1e-9)
    err = float(np.abs(a[:m] - b[:m]).max()) / scale
    assert err < tol, f"max rel err {err} (lag {lag})"


def tone(sr: int, seconds: float = 1.2, f: float = 440.0) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    return (0.6 * np.sin(2 * np.pi * f * t)
            + 0.2 * np.sin(2 * np.pi * 3.1 * f * t)).astype(np.float32)


def speechy(sr: int, seconds: float = 1.5, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    f0 = 130 + 40 * np.sin(2 * np.pi * 1.3 * t)
    sig = sum((0.3 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / sr)
              for k in range(1, 6))
    sig *= 0.5 + 0.5 * np.sin(2 * np.pi * 2.7 * t)
    sig += 0.01 * rng.standard_normal(n)
    return (0.7 * sig / np.abs(sig).max()).astype(np.float32)


def transient(sr: int, seconds: float = 1.2) -> np.ndarray:
    """Click train — forces LAME onto short blocks."""
    n = int(sr * seconds)
    sig = np.zeros(n, dtype=np.float32)
    step = sr // 13
    for i in range(0, n - 400, step):
        sig[i:i + 64] = np.hanning(64) * 0.9
        sig[i + 64:i + 400] += (0.3 * np.sin(
            2 * np.pi * 3000 * np.arange(336) / sr
        ) * np.exp(-np.arange(336) / 80.0)).astype(np.float32)
    return sig


@needs_codecs
class TestNativeMp3:
    @pytest.mark.parametrize("sr", [44100, 48000, 32000])
    def test_mono_cbr_tone(self, sr):
        assert_matches_oracle(lame_encode(speechy(sr), sr, kbps=128))

    def test_mono_low_bitrate(self):
        assert_matches_oracle(lame_encode(speechy(44100), 44100, kbps=48))

    def test_mono_high_bitrate(self):
        assert_matches_oracle(lame_encode(speechy(44100), 44100, kbps=320))

    def test_short_blocks(self):
        assert_matches_oracle(lame_encode(transient(44100), 44100, kbps=128))

    def test_vbr(self):
        assert_matches_oracle(lame_encode(speechy(44100), 44100, vbr=True))

    def test_joint_stereo_ms(self):
        sr = 44100
        left = speechy(sr, seed=1)
        right = 0.7 * left + 0.3 * tone(sr, seconds=1.5)[: len(left)]
        st = np.stack([left, right[: len(left)]], axis=1)
        assert_matches_oracle(lame_encode(st, sr, kbps=192))

    def test_plain_stereo(self):
        sr = 48000
        st = np.stack([speechy(sr, seed=2), tone(sr, 1.5)], axis=1)
        assert_matches_oracle(
            lame_encode(st, sr, kbps=256, joint_stereo=False)
        )

    def test_id3_tags_skipped(self):
        mp3 = lame_encode(speechy(44100), 44100)
        # ID3v2 header (empty 64-byte tag) + stream + ID3v1 trailer
        id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 64]) + b"\x00" * 64
        id3v1 = b"TAG" + b"\x00" * 125
        wrapped = id3v2 + mp3 + id3v1
        ours, sr = native_mp3_decode(wrapped)
        plain, _ = native_mp3_decode(mp3)
        assert sr == 44100
        assert abs(len(ours) - len(plain)) <= 1152

    def test_garbage_rejected(self):
        with pytest.raises(ValueError):
            native_mp3_decode(b"\x00not an mp3 stream" * 100)

    def test_truncated_stream_decodes_prefix(self):
        mp3 = lame_encode(speechy(44100, seconds=2.0), 44100)
        ours_full, _ = native_mp3_decode(mp3)
        ours_cut, _ = native_mp3_decode(mp3[: len(mp3) // 2])
        assert len(ours_cut) >= len(ours_full) // 3


@needs_codecs
def test_media_handler_converts_mp3(tmp_path):
    from modular_audio_pipeline_tpu.audio_io import read_wav
    from modular_audio_pipeline_tpu.config import get_default_config
    from modular_audio_pipeline_tpu.media_handler import MediaHandler

    sr = 44100
    sig = speechy(sr, seconds=2.0)
    mp3_path = tmp_path / "recording.mp3"
    mp3_path.write_bytes(lame_encode(sig, sr))

    cfg = get_default_config()
    cfg.media_dir = str(tmp_path)
    cfg.temp_dir = str(tmp_path / "temp")
    cfg.results_dir = str(tmp_path / "results")
    handler = MediaHandler.from_config(cfg)
    out = handler.convert_to_wav(str(mp3_path))
    samples, out_sr = read_wav(out)
    assert out_sr == cfg.audio.sample_rate
    assert abs(len(samples) / out_sr - 2.0) < 0.25  # duration preserved
    assert float(np.abs(samples).max()) > 0.05


@needs_codecs
class TestLsfRates:
    """MPEG-2/2.5 low-sample-rate extension vs the libmpg123 oracle
    (VERDICT r3 #8): one granule per frame, 8-bit main_data_begin,
    9-bit scalefac_compress partition layouts — derived/verified
    behaviourally (tools/derive_mp3_lsf.py)."""

    @pytest.mark.parametrize("sr", [24000, 22050, 16000])
    def test_mpeg2_mono(self, sr):
        assert_matches_oracle(lame_encode(speechy(sr), sr, kbps=48))

    @pytest.mark.parametrize("sr", [12000, 11025, 8000])
    def test_mpeg25_mono(self, sr):
        assert_matches_oracle(lame_encode(speechy(sr), sr, kbps=24))

    def test_lsf_stereo_joint(self):
        mono = speechy(22050)
        st = np.stack([mono, np.roll(mono, 331) * 0.8], axis=1)
        assert_matches_oracle(lame_encode(st, 22050, kbps=64))

    def test_lsf_short_blocks(self):
        assert_matches_oracle(lame_encode(transient(16000), 16000, kbps=56))

    def test_lsf_vbr(self):
        assert_matches_oracle(lame_encode(speechy(24000), 24000, vbr=True))

    def test_lsf_low_bitrate_8k(self):
        assert_matches_oracle(lame_encode(speechy(8000), 8000, kbps=8))


def _tools():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import derive_mp3_lsf as lsf
    import derive_mp3_tables as tab

    return lsf, tab


def _spread_payload(tab, nq: int, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    return "".join(
        tab.quad_code_b(*[int(x) for x in rng.integers(0, 2, 4)])
        for _ in range(nq)
    )


def _lsf_int_sf_bits(s_val: int, f: int) -> str:
    """Right-channel scalefactor bits for the LSF intensity layouts
    (blocknumbers 3/4/5, measured in tools/derive_mp3_lsf.py)."""
    if s_val < 180:
        slen = (s_val // 36, (s_val % 36) // 6, s_val % 6, 0)
        nsfb = (7, 7, 7, 0)
    elif s_val < 244:
        m = s_val - 180
        slen = (m // 16, (m % 16) // 4, m % 4, 0)
        nsfb = (6, 6, 6, 3)
    else:
        m = s_val - 244
        slen = (m // 3, m % 3, 0, 0)
        nsfb = (8, 8, 5, 0)
    bits = ""
    j = 0
    for ln, n in zip(slen, nsfb):
        for _ in range(n):
            if ln:
                bits += format((j + f) % (1 << ln), f"0{ln}b")
            j += 1
    return bits


@needs_codecs
class TestIntensityStereo:
    """Intensity stereo vs libmpg123 on crafted joint-stereo frames.

    LAME never emits intensity stereo, so coverage comes from
    hand-built frames (the round-3 probe-frame machinery): the left
    channel carries count1 spectra, the right channel's scalefactors
    sweep is_positions (including the illegal 7) with varying zero-part
    boundaries. Measured laws: MPEG-1 kl = tan(p*pi/12)/(1+tan);
    LSF powers of 2^-1/4 (or 2^-1/2 with intensity_scale); intensity
    starts at the band AFTER the last truly nonzero right-channel line.
    """

    def _compare(self, mp3: bytes, tol: float = 1e-5) -> None:
        ours, _sr = native_mp3_decode(mp3)
        ref, _sr2, _ch = mpg123_decode(mp3)
        mine = ours.reshape(-1)
        n = min(len(mine), len(ref))
        assert n > 500
        scale = max(float(np.abs(ref[:n]).max()), 1e-9)
        err = float(
            np.abs(mine[:n].astype(np.float64)
                   - ref[:n].astype(np.float64)).max()
        ) / scale
        assert err < tol, f"max rel err {err}"

    def _mpeg1_stream(self, mode_ext: int, block_type: int = 0,
                      nframes: int = 4) -> bytes:
        lsf, tab = _tools()
        frames = []
        n_sf = 36 if block_type == 2 else 21
        for f in range(nframes):
            sf_bits = "".join(
                format((j + f) % 8, "03b") for j in range(n_sf)
            )
            ch1 = sf_bits + (tab.quad_code_b(1, 0, 1, 0) + "00") * (
                3 if f % 2 else 0
            )
            g0 = (
                tab.Granule(payload=_spread_payload(tab, 40, f),
                            count1table=1, global_gain=204 + f,
                            block_type=block_type),
                tab.Granule(payload=ch1, scalefac_compress=13,
                            count1table=1, block_type=block_type),
            )
            g1 = (
                tab.Granule(payload=_spread_payload(tab, 25, f + 50),
                            count1table=1, block_type=block_type),
                tab.Granule(payload=sf_bits, scalefac_compress=13,
                            block_type=block_type),
            )
            frames.append(lsf.make_mpeg1_stereo(g0, g1, mode_ext=mode_ext))
        return b"".join(frames)

    def _lsf_stream(self, s_val: int, sr: int, mode_ext: int = 1,
                    block_type: int = 0, nframes: int = 4) -> bytes:
        lsf, tab = _tools()
        frames = []
        for f in range(nframes):
            if block_type == 2:
                # blocknumber-3 short layout: 12 values per partition
                sfb = "".join(format((j + f) % 8, "03b") for j in range(12))
            else:
                sfb = _lsf_int_sf_bits(s_val, f)
            ch1 = sfb + (tab.quad_code_b(1, 0, 0, 0) + "0") * (
                2 if f % 2 else 0
            )
            g0 = tab.Granule(payload=_spread_payload(tab, 40, f),
                             count1table=1, global_gain=205 + f,
                             block_type=block_type)
            g1 = tab.Granule(payload=ch1, count1table=1,
                             block_type=block_type)
            frames.append(lsf.make_lsf_frame(
                g0, sr, g1=g1, sc1=(s_val << 1) | (f % 2), mode=1,
                mode_ext=mode_ext,
            ))
        return b"".join(frames)

    def test_mpeg1_is(self):
        self._compare(self._mpeg1_stream(1))

    def test_mpeg1_ms_plus_is(self):
        self._compare(self._mpeg1_stream(3))

    def test_mpeg1_short_block_is(self):
        self._compare(self._mpeg1_stream(1, block_type=2))

    def test_lsf_is_scales(self):
        # alternating intensity_scale via (s << 1) | (f % 2)
        self._compare(self._lsf_stream(108, 24000))

    def test_lsf_ms_plus_is(self):
        self._compare(self._lsf_stream(108, 22050, mode_ext=3))

    def test_lsf_short_block_is(self):
        self._compare(self._lsf_stream(108, 24000, block_type=2))

    def test_lsf_blocknumber4(self):
        self._compare(self._lsf_stream(180 + 27, 16000))

    def test_lsf_blocknumber5(self):
        self._compare(self._lsf_stream(244 + 7, 16000))

    def test_lsf_4bit_positions(self):
        self._compare(self._lsf_stream(150, 16000))

    def test_mpeg25_is(self):
        self._compare(self._lsf_stream(108, 12000))
        self._compare(self._lsf_stream(108, 8000))
