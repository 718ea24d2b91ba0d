"""Property tests for the multimodal byte-layout probes
(operators/multimodal.py) against INDEPENDENTLY-constructed files.

The existing unit tests decode fixtures built by the module's own
``png_bytes``/``wav_bytes``/``mp4_bytes`` synthesizers — probe∘synth
shares assumptions.  These tests rebuild each container in the test
file directly from the public specifications (RFC 2083 PNG, GIF89a
LSD, BITMAPINFOHEADER, ISO/IEC 10918 markers, canonical RIFF/WAVE,
ISO/IEC 14496-12 boxes) with hypothesis-random planted values and
ADVERSARIAL structure the synthesizers never emit:

- JPEG: random APPn/COM segments whose payloads contain 0xFF bytes
  and byte patterns that LOOK like SOF markers — the scanner must
  skip by segment length, never pattern-scan.
- WAV: junk chunks with ODD sizes before and after fmt/data (RIFF
  word alignment), data chunk not last, extra chunks with arbitrary
  ids.
- MP4: unknown boxes interleaved at every level, moov wrapped in a
  64-bit largesize header (size==1), final box in to-end form
  (size==0), mvhd in both v0 and v1 layouts, multiple traks.

Pure-Python probe calls — no SparkSession — so examples are cheap;
the Spark-side plumbing (mapInPandas schema/batching) is pinned by
tests/test_operators.py and the partition-invariance sweep.
"""

from __future__ import annotations

import struct
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import multimodal as mm

# --------------------------------------------------------------------------
# PNG (RFC 2083: 8-byte signature, IHDR must be first chunk)
# --------------------------------------------------------------------------
_PNG_COLOR_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png(width, height, bit_depth, color_type, trailing):
    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0
    )
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    return b"\x89PNG\r\n\x1a\n" + chunk + trailing


@settings(max_examples=80, deadline=None)
@given(
    st.integers(min_value=1, max_value=2**31 - 1),
    st.integers(min_value=1, max_value=2**31 - 1),
    st.sampled_from([1, 2, 4, 8, 16]),
    st.sampled_from([0, 2, 3, 4, 6]),
    st.binary(max_size=40),
)
def test_png_probe_extracts_planted_ihdr(w, h, depth, ctype, trailing):
    fmt, gw, gh, gd, gc = mm.probe_image(_png(w, h, depth, ctype, trailing))
    assert (fmt, gw, gh, gd, gc) == (
        "png", w, h, depth, _PNG_COLOR_CHANNELS[ctype]
    )


# --------------------------------------------------------------------------
# GIF (GIF87a/89a logical screen descriptor)
# --------------------------------------------------------------------------
@settings(max_examples=80, deadline=None)
@given(
    st.sampled_from([b"GIF87a", b"GIF89a"]),
    st.integers(min_value=1, max_value=0xFFFF),
    st.integers(min_value=1, max_value=0xFFFF),
    st.integers(min_value=0, max_value=255),  # packed LSD byte
    st.binary(max_size=40),
)
def test_gif_probe_extracts_lsd(sig, w, h, packed, trailing):
    payload = (
        sig
        + struct.pack("<HH", w, h)
        + bytes([packed, 0, 0])
        + trailing
    )
    fmt, gw, gh, gd, gc = mm.probe_image(payload)
    assert (fmt, gw, gh) == ("gif", w, h)
    assert gd == ((packed >> 4) & 0x7) + 1
    assert gc == 3


# --------------------------------------------------------------------------
# BMP (BITMAPFILEHEADER + BITMAPINFOHEADER; negative height = top-down)
# --------------------------------------------------------------------------
@settings(max_examples=80, deadline=None)
@given(
    st.integers(min_value=1, max_value=2**31 - 1),
    st.integers(min_value=1, max_value=2**31 - 1),
    st.booleans(),  # top-down (negative height)
    st.sampled_from([8, 24, 32]),
    st.binary(max_size=40),
)
def test_bmp_probe_extracts_infoheader(w, h, topdown, bpp, trailing):
    sh = -h if topdown else h
    payload = (
        b"BM"
        + struct.pack("<IHHI", 0, 0, 0, 54)          # file header
        + struct.pack("<IiiHH", 40, w, sh, 1, bpp)   # info header head
        + trailing
    )
    fmt, gw, gh, gd, gc = mm.probe_image(payload)
    assert (fmt, gw, gh, gd) == ("bmp", w, h, bpp)
    assert gc == {8: 1, 24: 3, 32: 4}[bpp]


# --------------------------------------------------------------------------
# JPEG (ISO/IEC 10918 marker stream): the adversarial part is segment
# payloads containing 0xFF bytes and fake SOF-looking patterns — the
# scanner must hop by the declared segment lengths.
# --------------------------------------------------------------------------
_jpeg_junk_segment = st.tuples(
    st.sampled_from(
        list(range(0xE0, 0xF0)) + [0xFE, 0xDB, 0xC4]  # APPn, COM, DQT, DHT
    ),
    st.binary(max_size=24).map(
        # plant a fake SOF0 pattern inside the payload
        lambda b: b + b"\xff\xc0\x00\x11\x08\x00\x10\x00\x10\x03"
    ),
)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(_jpeg_junk_segment, min_size=0, max_size=4),
    st.sampled_from(sorted(mm._JPEG_SOF)),
    st.integers(min_value=1, max_value=16),       # precision
    st.integers(min_value=1, max_value=0xFFFF),   # height
    st.integers(min_value=1, max_value=0xFFFF),   # width
    st.integers(min_value=1, max_value=4),        # components
)
def test_jpeg_probe_skips_segments_by_length(
    junk, sof_marker, precision, h, w, ncomp
):
    buf = b"\xff\xd8"
    for marker, payload in junk:
        buf += bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload
    sof_payload = struct.pack(">BHHB", precision, h, w, ncomp)
    buf += bytes([0xFF, sof_marker]) + struct.pack(
        ">H", len(sof_payload) + 2
    ) + sof_payload
    fmt, gw, gh, gd, gc = mm.probe_image(buf)
    assert (fmt, gw, gh, gd, gc) == ("jpeg", w, h, precision, ncomp)


# --------------------------------------------------------------------------
# WAV (canonical RIFF/WAVE): junk chunks with odd sizes around fmt and
# data exercise the word-alignment rule; data need not be last.
# --------------------------------------------------------------------------
_wav_junk_chunk = st.tuples(
    st.sampled_from([b"LIST", b"fact", b"cue ", b"junk"]),
    st.binary(min_size=0, max_size=15),  # odd sizes likely
)


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) & 1 else b""
    )


@settings(max_examples=60, deadline=None)
@given(
    st.lists(_wav_junk_chunk, min_size=0, max_size=3),
    st.lists(_wav_junk_chunk, min_size=0, max_size=3),
    st.integers(min_value=1, max_value=192_000),   # sample rate
    st.integers(min_value=1, max_value=8),         # channels
    st.lists(                                      # PCM16 samples
        st.integers(min_value=-32768, max_value=32767),
        min_size=0,
        max_size=64,
    ),
)
def test_wav_parse_with_junk_chunks(junk_before, junk_after, sr, ch, samples):
    bits = 16
    block_align = ch * bits // 8
    byte_rate = sr * block_align
    fmt_body = struct.pack("<HHIIHH", 1, ch, sr, byte_rate, block_align, bits)
    data_body = b"".join(struct.pack("<h", s) for s in samples)
    payload = b"".join(
        [_chunk(cid, body) for cid, body in junk_before]
        + [_chunk(b"fmt ", fmt_body)]
        + [_chunk(b"data", data_body)]
        + [_chunk(cid, body) for cid, body in junk_after]
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WAVE" + payload
    got = mm.parse_wav(wav)
    assert got is not None
    assert got["sample_rate"] == sr
    assert got["channels"] == ch
    assert got["bits_per_sample"] == bits
    assert got["data_size"] == len(data_body)
    assert got["duration_ms"] == len(data_body) * 1000 // byte_rate

    # the PCM energy fingerprint equals a pure-Python mean-|amplitude|
    fp = mm._pcm16_energy_fingerprint(
        wav, got["data_off"], got["data_size"]
    )
    n = len(samples)
    if n == 0:
        assert fp == []
    else:
        k = min(mm._FP_WINDOWS, n)
        # windows = k nearly-equal slices (numpy array_split contract:
        # first n % k windows get one extra sample)
        base, extra = divmod(n, k)
        want, i = [], 0
        for wdx in range(k):
            size = base + (1 if wdx < extra else 0)
            sl = samples[i : i + size]
            i += size
            want.append(int(sum(abs(s) for s in sl) / len(sl)))
        assert fp == want, (samples, fp)


# --------------------------------------------------------------------------
# MP4 (ISO BMFF): unknown boxes at every level, largesize moov,
# to-end final box, mvhd v0/v1, multiple traks.
# --------------------------------------------------------------------------
def _box(btype: bytes, body: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return struct.pack(">I", 1) + btype + struct.pack(
            ">Q", 16 + len(body)
        ) + body
    return struct.pack(">I", 8 + len(body)) + btype + body


def _mvhd(version: int, timescale: int, duration: int) -> bytes:
    if version == 1:
        body = bytes([1, 0, 0, 0]) + struct.pack(
            ">QQIQ", 0, 0, timescale, duration
        )
    else:
        body = bytes([0, 0, 0, 0]) + struct.pack(
            ">IIII", 0, 0, timescale, duration
        )
    return _box(b"mvhd", body)


def _tkhd(width: int, height: int) -> bytes:
    # v0 tkhd: 4 (verflags) + 4*5 + 8 + 2+2+2+2 + 36 matrix, then w/h
    body = (
        bytes(4) + bytes(20) + bytes(8) + bytes(8) + bytes(36)
        + struct.pack(">II", width << 16, height << 16)
    )
    return _box(b"tkhd", body)


@settings(max_examples=60, deadline=None)
@given(
    st.sampled_from([0, 1]),                      # mvhd version
    st.integers(min_value=1, max_value=1_000_000),  # timescale
    st.integers(min_value=0, max_value=2**40),      # duration
    st.integers(min_value=1, max_value=3),          # n tracks
    st.integers(min_value=1, max_value=4096),       # width
    st.integers(min_value=1, max_value=4096),       # height
    st.booleans(),                                  # largesize moov
    st.booleans(),                                  # to-end mdat tail
    st.binary(max_size=16),                         # junk box payload
)
def test_mp4_probe_adversarial_layouts(
    ver, timescale, duration, n_tracks, w, h, largesize, to_end, junk
):
    if ver == 0:
        duration %= 2**32
    traks = b"".join(
        _box(b"trak", _box(b"free", junk) + _tkhd(w, h))
        for _ in range(n_tracks)
    )
    moov_body = _box(b"skip", junk) + _mvhd(ver, timescale, duration) + traks
    payload = (
        _box(b"ftyp", b"isom" + bytes(4) + b"isomiso2")
        + _box(b"free", junk)
        + _box(b"moov", moov_body, largesize=largesize)
    )
    if to_end:
        payload += struct.pack(">I", 0) + b"mdat" + junk
    got = mm.probe_mp4(payload)
    assert got is not None
    assert got["major_brand"] == "isom"
    assert got["timescale"] == timescale
    assert got["duration"] == duration
    assert got["duration_ms"] == duration * 1000 // timescale
    assert got["n_tracks"] == n_tracks
    assert (got["width"], got["height"]) == (w, h)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=64))
def test_probes_never_raise_on_garbage(b):
    mm.probe_image(b)
    mm.parse_wav(b)
    mm.probe_mp4(b)
    mm.parse_mp4_samples(b)
    # and with the magic prefixes glued on, truncated headers must
    # still never raise
    for prefix in (
        b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM", b"\xff\xd8",
        b"RIFF", struct.pack(">I", 16) + b"ftyp",
    ):
        mm.probe_image(prefix + b)
        mm.parse_wav(prefix + b)
        mm.probe_mp4(prefix + b)
        mm.parse_mp4_samples(prefix + b)
