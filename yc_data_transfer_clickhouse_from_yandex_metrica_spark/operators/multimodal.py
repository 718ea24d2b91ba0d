"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` payload columns
with typed metadata structs; compute-heavy decode/feature steps run as
Arrow-batched ``mapInPandas`` stages.

The header probes are REAL decoders for real formats -- PNG, GIF, BMP,
JPEG image headers, RIFF/WAVE audio (including PCM sample decode for
the energy fingerprint) and MP4/ISO-BMFF video containers
(ftyp/moov/mvhd/trak/tkhd box walk: brand, timescale, duration, track
count, presentation size) are public, stable byte layouts parsed here
with nothing but ``struct``/``zlib``/``numpy``.  Only payloads in a
format none of the probes recognize fall back to the documented
``unknown`` row (real length + CRC32, null dimensions) -- full pixel/
sample decode of compressed codecs (JPEG entropy data, H.264 frames)
would need PIL/ffmpeg, which this container does not ship; the
Spark-side contract (schemas, Arrow batch iteration, partitioning,
column pruning) is identical either way.

Byte-layout sources (public specifications):
- PNG: RFC 2083 / W3C PNG spec (8-byte signature, IHDR first chunk).
- GIF: GIF89a specification (logical screen descriptor).
- BMP: Windows BITMAPFILEHEADER + BITMAPINFOHEADER layout.
- JPEG: ISO/IEC 10918 marker segments (SOFn frame headers).
- WAV: RIFF/WAVE canonical layout (fmt / data chunks).
- MP4: ISO/IEC 14496-12 box structure (ftyp, moov/mvhd v0+v1,
  trak/tkhd incl. 64-bit largesize and to-end boxes).

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
keep payloads out of shuffle keys; repartition by size before the
Python stage so batches are even; project metadata-only downstream so
the binary column is pruned as soon as possible.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def media_from_text(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Deterministic fake media table: payload = utf-8 bytes of a text
    column.  Lets every pipeline stage run end-to-end in this
    container with real binary data (the probes classify these
    payloads as format='unknown', by design)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("synthetic").alias("source"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


# =========================================================================
# real image header probes (PNG / GIF / BMP / JPEG)
# =========================================================================

# PNG color type -> sample channels (PNG spec section 4.1.1)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG SOFn markers carrying frame dimensions (C4=DHT, C8=JPG, CC=DAC excluded)
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def probe_image(payload: bytes | None) -> tuple[str, int | None, int | None, int | None, int | None]:
    """(format, width, height, bit_depth, channels) from real header
    bytes; ('unknown', None, None, None, None) when no probe matches."""
    if not payload:
        return ("unknown", None, None, None, None)
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h, b[24], _PNG_CHANNELS.get(b[25]))
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 11:
        w, h = struct.unpack("<HH", b[6:10])
        packed = b[10]
        # color resolution: bits per primary; GIF pixels index an RGB palette
        return ("gif", w, h, ((packed >> 4) & 0x7) + 1, 3)
    if b[:2] == b"BM" and len(b) >= 30:
        w = struct.unpack("<i", b[18:22])[0]
        h = struct.unpack("<i", b[22:26])[0]  # negative => top-down rows
        bpp = struct.unpack("<H", b[28:30])[0]
        channels = 4 if bpp == 32 else (3 if bpp == 24 else 1)
        return ("bmp", w, abs(h), bpp, channels)
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone markers
                i += 2
                continue
            if i + 4 > len(b):
                break
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF and i + 10 <= len(b):
                precision = b[i + 4]
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return ("jpeg", w, h, precision, b[i + 9])
            i += 2 + seg_len
        return ("jpeg", None, None, None, None)
    return ("unknown", None, None, None, None)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("byte_checksum", T.LongType(), True),
    ]
)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched image header extraction over binary payloads:
    real PNG/GIF/BMP/JPEG probes + CRC32, unknown formats yield null
    dimensions.  mapInPandas contract: iterator of pandas batches
    in/out, output schema declared, payload column pruned after this
    stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                fmt, w, h, depth, ch = probe_image(payload)
                n = len(payload) if payload is not None else 0
                crc = zlib.crc32(bytes(payload)) if payload is not None else 0
                rows.append((mid, n, fmt, w, h, depth, ch, crc))
            out = pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "format", "width",
                    "height", "bit_depth", "channels", "byte_checksum",
                ],
            )
            out["media_id"] = out["media_id"].astype("int64")
            out["n_bytes"] = out["n_bytes"].astype("int64")
            for c in ("width", "height", "bit_depth", "channels"):
                out[c] = out[c].astype("Int32")
            out["byte_checksum"] = out["byte_checksum"].astype("int64")
            yield out

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


# =========================================================================
# real RIFF/WAVE audio probe + PCM energy fingerprint
# =========================================================================

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("fingerprint", T.ArrayType(T.LongType()), True),
    ]
)

_FP_WINDOWS = 8  # energy fingerprint resolution


def parse_wav(payload: bytes | None) -> dict | None:
    """Parse a RIFF/WAVE payload: fmt chunk fields, data chunk extent,
    duration.  None when the payload is not a WAV file."""
    b = bytes(payload or b"")
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    fmt = None
    data_off = data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        csize = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and csize >= 16 and i + 24 <= len(b):
            audio_fmt, ch, sr, byte_rate, block_align, bits = struct.unpack(
                "<HHIIHH", b[i + 8 : i + 24]
            )
            fmt = {
                "audio_format": audio_fmt,
                "channels": ch,
                "sample_rate": sr,
                "byte_rate": byte_rate,
                "block_align": block_align,
                "bits_per_sample": bits,
            }
        elif cid == b"data":
            data_off, data_size = i + 8, min(csize, len(b) - i - 8)
        i += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None:
        return None
    out = dict(fmt)
    out["data_off"] = data_off
    out["data_size"] = data_size or 0
    out["duration_ms"] = (
        out["data_size"] * 1000 // fmt["byte_rate"] if fmt["byte_rate"] else 0
    )
    return out


def _pcm16_energy_fingerprint(b: bytes, off: int, size: int) -> list[int]:
    """Mean |amplitude| per window over little-endian PCM16 samples --
    a real (if simple) acoustic energy profile, numpy-vectorized."""
    import numpy as np

    size -= size % 2
    if size <= 0:
        return []
    samples = np.frombuffer(b, dtype="<i2", count=size // 2, offset=off)
    if samples.size == 0:
        return []
    windows = np.array_split(np.abs(samples.astype(np.int64)), min(_FP_WINDOWS, samples.size))
    return [int(w.mean()) for w in windows]


def fingerprint_audio(media: DataFrame) -> DataFrame:
    """Arrow-batched audio probing over binary payloads (mapInPandas,
    same contract as extract_image_features).  RIFF/WAVE payloads get
    real fmt-chunk fields and, for PCM16, a real energy fingerprint
    over the decoded samples; anything else yields null audio fields
    and an empty fingerprint."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload) if payload is not None else 0
                wav = parse_wav(payload)
                if wav is None:
                    rows.append((mid, n, None, None, None, None, []))
                    continue
                fp = []
                if wav["audio_format"] == 1 and wav["bits_per_sample"] == 16 and wav["data_off"]:
                    fp = _pcm16_energy_fingerprint(
                        bytes(payload), wav["data_off"], wav["data_size"]
                    )
                rows.append(
                    (
                        mid, n, wav["sample_rate"], wav["channels"],
                        wav["bits_per_sample"], wav["duration_ms"], fp,
                    )
                )
            out = pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "sample_rate", "channels",
                    "bits_per_sample", "duration_ms", "fingerprint",
                ],
            )
            out["media_id"] = out["media_id"].astype("int64")
            out["n_bytes"] = out["n_bytes"].astype("int64")
            for c in ("sample_rate", "channels", "bits_per_sample"):
                out[c] = out[c].astype("Int32")
            out["duration_ms"] = out["duration_ms"].astype("Int64")
            yield out

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )


# =========================================================================
# real MP4 (ISO BMFF) container probe -- codec-free
# =========================================================================

VIDEO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("major_brand", T.StringType(), True),
        T.StructField("timescale", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_tracks", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def _iter_boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for ISO BMFF boxes in
    b[start:end].  Handles 64-bit largesize (size==1) and
    to-end-of-file (size==0) boxes; stops on malformed sizes."""
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", b[i : i + 4])[0]
        btype = b[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                return
            size = struct.unpack(">Q", b[i + 8 : i + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            return
        yield btype, i + hdr, i + size
        i += size


def probe_mp4(payload: bytes | None) -> dict | None:
    """Parse an ISO BMFF (MP4) container's structural metadata from
    the public box layouts (ISO/IEC 14496-12): ``ftyp`` major brand,
    ``moov/mvhd`` timescale + duration (version 0 and 1), ``trak``
    count, and the first track's ``tkhd`` presentation width/height
    (16.16 fixed point).  Codec-free -- no sample data is touched.
    None when the payload is not an MP4 (no leading ftyp box)."""
    b = bytes(payload or b"")
    boxes = list(_iter_boxes(b, 0, len(b)))
    if not boxes or boxes[0][0] != b"ftyp":
        return None
    _, fs, fe = boxes[0]
    out: dict = {
        "major_brand": b[fs : fs + 4].decode("ascii", "replace") if fe - fs >= 4 else None,
        "timescale": None,
        "duration": None,
        "duration_ms": None,
        "n_tracks": 0,
        "width": None,
        "height": None,
    }
    for btype, s, e in boxes:
        if btype != b"moov":
            continue
        for ctype, cs, ce in _iter_boxes(b, s, e):
            if ctype == b"mvhd" and ce - cs >= 4:
                ver = b[cs]
                if ver == 1 and ce - cs >= 28:
                    ts, dur = struct.unpack(">IQ", b[cs + 20 : cs + 32])
                elif ver == 0 and ce - cs >= 20:
                    ts, dur = struct.unpack(">II", b[cs + 12 : cs + 20])
                else:
                    continue
                out["timescale"] = ts
                out["duration"] = dur
                out["duration_ms"] = dur * 1000 // ts if ts else None
            elif ctype == b"trak":
                out["n_tracks"] += 1
                if out["width"] is not None:
                    continue
                for ttype, ts_, te_ in _iter_boxes(b, cs, ce):
                    if ttype != b"tkhd" or te_ - ts_ < 4:
                        continue
                    ver = b[ts_]
                    # width/height are the LAST 8 payload bytes (after
                    # the matrix) in both tkhd versions
                    if te_ - ts_ >= 8:
                        w16, h16 = struct.unpack(">II", b[te_ - 8 : te_])
                        if w16 or h16:
                            out["width"] = w16 >> 16
                            out["height"] = h16 >> 16
                    break
        break
    return out


def parse_mp4_samples(payload: bytes | None) -> dict | None:
    """Parse the first sample-table-bearing track of an MP4: ``mdhd``
    media timescale plus the ``stbl`` boxes -- ``stts`` (decode
    deltas), ``stsz`` (sizes), ``stsc`` (sample->chunk runs), ``stco``
    (chunk offsets) -- into per-sample (pts_units, size, byte_offset)
    arrays, the exact walk a codec-free frame extractor (or ffprobe
    -show_frames) performs.  General stsc interpretation: each run
    applies from its first_chunk until the next run's; a sample's
    offset is its chunk's stco offset plus the sizes of the samples
    before it in that chunk.  None when the payload is not MP4 or the
    track carries no sample table."""
    b = bytes(payload or b"")
    boxes = list(_iter_boxes(b, 0, len(b)))
    if not boxes or boxes[0][0] != b"ftyp":
        return None

    def child(btype: bytes, s: int, e: int):
        for t, cs, ce in _iter_boxes(b, s, e):
            if t == btype:
                return cs, ce
        return None

    for btype, s, e in boxes:
        if btype != b"moov":
            continue
        for ctype, cs, ce in _iter_boxes(b, s, e):
            if ctype != b"trak":
                continue
            mdia = child(b"mdia", cs, ce)
            if not mdia:
                continue
            mdhd = child(b"mdhd", *mdia)
            minf = child(b"minf", *mdia)
            if not minf:
                continue
            stbl = child(b"stbl", *minf)
            if not stbl:
                continue
            stts = child(b"stts", *stbl)
            stsz = child(b"stsz", *stbl)
            stsc = child(b"stsc", *stbl)
            stco = child(b"stco", *stbl)
            if not (stts and stsz and stsc and stco):
                continue
            timescale = None
            if mdhd and mdhd[1] - mdhd[0] >= 16:
                ms = mdhd[0]
                if b[ms] == 1:
                    timescale = struct.unpack(">I", b[ms + 20 : ms + 24])[0]
                else:
                    timescale = struct.unpack(">I", b[ms + 12 : ms + 16])[0]
            # stts -> per-sample pts (cumulative deltas)
            ts_s = stts[0]
            (n_runs,) = struct.unpack(">I", b[ts_s + 4 : ts_s + 8])
            pts, t = [], 0
            p = ts_s + 8
            for _ in range(n_runs):
                cnt, delta = struct.unpack(">II", b[p : p + 8])
                for _ in range(cnt):
                    pts.append(t)
                    t += delta
                p += 8
            # stsz -> sizes
            sz_s = stsz[0]
            fixed, n_samples = struct.unpack(">II", b[sz_s + 4 : sz_s + 12])
            if fixed:
                sizes = [fixed] * n_samples
            else:
                sizes = list(
                    struct.unpack(
                        f">{n_samples}I", b[sz_s + 12 : sz_s + 12 + 4 * n_samples]
                    )
                )
            # stco -> chunk offsets
            co_s = stco[0]
            (n_chunks,) = struct.unpack(">I", b[co_s + 4 : co_s + 8])
            chunk_off = list(
                struct.unpack(f">{n_chunks}I", b[co_s + 8 : co_s + 8 + 4 * n_chunks])
            )
            # stsc runs -> samples per chunk
            sc_s = stsc[0]
            (n_sc,) = struct.unpack(">I", b[sc_s + 4 : sc_s + 8])
            runs = [
                struct.unpack(">III", b[sc_s + 8 + 12 * i : sc_s + 20 + 12 * i])
                for i in range(n_sc)
            ]
            per_chunk = []
            for i, (first, spc, _desc) in enumerate(runs):
                last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
                per_chunk.extend([spc] * (last - first + 1))
            offsets, si = [], 0
            for ci, spc in enumerate(per_chunk):
                if ci >= len(chunk_off):
                    break
                base = chunk_off[ci]
                within = 0
                for _ in range(spc):
                    if si >= n_samples:
                        break
                    offsets.append(base + within)
                    within += sizes[si]
                    si += 1
            n = min(n_samples, len(pts), len(offsets))
            return {
                "timescale": timescale,
                "pts": pts[:n],
                "sizes": sizes[:n],
                "offsets": offsets[:n],
            }
        return None
    return None


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("pts_ms", T.LongType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("byte_offset", T.LongType(), True),
    ]
)


def extract_video_frames(media: DataFrame, stride: int = 1) -> DataFrame:
    """REAL frame sampling from MP4 sample tables (Arrow mapInPandas):
    every ``stride``-th sample of the first sample-table track, with
    its presentation time (mdhd-timescale-exact ms), byte size and
    file offset from the stts/stsz/stsc/stco walk -- what a decode
    stage would seek to, without the codec.  Non-MP4 / table-less
    payloads emit no rows (same contract as the image probes' unknown
    fallback, but frame rows are inherently per-sample)."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                st = parse_mp4_samples(payload)
                if st is None:
                    continue
                ts = st["timescale"]
                for i in range(0, len(st["pts"]), stride):
                    pts_ms = st["pts"][i] * 1000 // ts if ts else None
                    rows.append(
                        (mid, i, pts_ms, st["sizes"][i], st["offsets"][i])
                    )
            out = pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "pts_ms", "size", "byte_offset"],
            )
            out["media_id"] = out["media_id"].astype("int64")
            out["frame_idx"] = out["frame_idx"].astype("int32")
            for c in ("pts_ms", "size", "byte_offset"):
                out[c] = out[c].astype("Int64")
            yield out

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=VIDEO_FRAMES_SCHEMA
    )


def extract_video_features(media: DataFrame) -> DataFrame:
    """Arrow-batched MP4 container probing over binary payloads
    (mapInPandas, same contract as extract_image_features): real
    ftyp/mvhd/tkhd parsing; non-MP4 payloads yield format='unknown'
    with null container fields."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload) if payload is not None else 0
                mp4 = probe_mp4(payload)
                if mp4 is None:
                    rows.append((mid, n, "unknown", None, None, None, None, None, None))
                else:
                    rows.append(
                        (
                            mid, n, "mp4", mp4["major_brand"], mp4["timescale"],
                            mp4["duration_ms"], mp4["n_tracks"], mp4["width"],
                            mp4["height"],
                        )
                    )
            out = pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "format", "major_brand",
                    "timescale", "duration_ms", "n_tracks", "width", "height",
                ],
            )
            out["media_id"] = out["media_id"].astype("int64")
            out["n_bytes"] = out["n_bytes"].astype("int64")
            for c in ("timescale", "duration_ms"):
                out[c] = out[c].astype("Int64")
            for c in ("n_tracks", "width", "height"):
                out[c] = out[c].astype("Int32")
            yield out

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=VIDEO_FEATURES_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_n_bytes: int = 1000) -> DataFrame:
    """Codec-free frame-offset sampler: emits (media_id, frame_idx,
    offset) rows; offsets are deterministic from payload length (a
    real decoder would replace the offset arithmetic with stts/stsz
    sample tables -- see probe_mp4 for the container walk).  Pure
    built-in expressions (explode over sequence) -- the Spark-side
    shape of frame extraction without the codec."""
    n = F.coalesce(F.octet_length("payload").cast("long"), F.lit(0))
    offsets = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(every_n_bytes))
    ).otherwise(F.array().cast("array<long>"))
    return media.select(
        "media_id", F.posexplode(offsets).alias("frame_idx", "byte_offset")
    )


# =========================================================================
# deterministic real-format writers (fixture generators for the driver
# correctness gate and tests; every byte layout is the public spec)
# =========================================================================


def png_bytes(width: int, height: int, bit_depth: int = 8, color_type: int = 2) -> bytes:
    """Minimal VALID PNG: signature + IHDR + one IDAT of zlib-compressed
    zero scanlines + IEND, all chunk CRCs correct."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    channels = _PNG_CHANNELS[color_type]
    stride = (width * channels * bit_depth + 7) // 8
    raw = (b"\x00" + b"\x00" * stride) * height  # filter byte + zero pixels
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def gif_bytes(width: int, height: int, color_bits: int = 8) -> bytes:
    """GIF89a header + logical screen descriptor + global palette +
    trailer (no image data -- enough for any header probe)."""
    packed = 0x80 | ((color_bits - 1) << 4) | (color_bits - 1)
    palette = bytes(3 * (1 << color_bits))
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes([packed, 0, 0])
        + palette
        + b"\x3b"
    )


def bmp_bytes(width: int, height: int, bpp: int = 24) -> bytes:
    """BITMAPFILEHEADER + BITMAPINFOHEADER + zero pixel array (rows
    padded to 4 bytes per the spec)."""
    stride = ((width * bpp + 31) // 32) * 4
    pixels = bytes(stride * height)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(pixels), 2835, 2835, 0, 0)
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return file_header + info + pixels


def wav_bytes(sample_rate: int, channels: int, n_samples: int, bits: int = 16) -> bytes:
    """Canonical 44-byte-header RIFF/WAVE with PCM16 samples on a
    deterministic ramp (sample i = (i * 37) % 32768, same in every
    channel)."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    frames = b"".join(
        struct.pack("<h", (i * 37) % 32768) * channels for i in range(n_samples)
    )
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(frames))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, block_align, bits)
        + b"data"
        + struct.pack("<I", len(frames))
    )
    return hdr + frames


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def mp4_bytes(
    duration_units: int,
    timescale: int,
    n_tracks: int = 1,
    width: int = 0,
    height: int = 0,
    mdat_len: int = 16,
    n_samples: int = 0,
    sample_delta: int = 0,
    sample_sizes: list[int] | None = None,
) -> bytes:
    """Minimal VALID ISO BMFF container (ISO/IEC 14496-12 box
    layouts): ``ftyp`` (isom) + ``moov`` holding a version-0 ``mvhd``
    (timescale, duration) and ``n_tracks`` ``trak``/``tkhd`` boxes
    (track 1 carries the 16.16 fixed-point presentation size) + an
    ``mdat``.  With ``n_samples`` > 0, track 1 additionally carries a
    REAL sample table -- ``mdia/mdhd`` (media timescale = movie
    timescale) and ``minf/stbl`` with ``stts`` (one run of
    ``sample_delta``), ``stsz`` (per-sample sizes), ``stsc`` (one
    chunk holding all samples) and ``stco`` (chunk offset 0 --
    readers of this synthetic container treat offsets as
    mdat-payload-relative; extract_video_frames normalizes against
    stco[0] so absolute-offset files parse identically).  Codec-free
    but structurally real: any box-walking parser reads it."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mvhd = _box(
        b"mvhd",
        struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration_units)  # v0 hdr
        + struct.pack(">IHHII", 0x00010000, 0x0100, 0, 0, 0)  # rate/volume/reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24)  # pre_defined
        + struct.pack(">I", n_tracks + 1),  # next_track_ID
    )
    traks = b""
    for track_id in range(1, n_tracks + 1):
        w16 = (width << 16) if track_id == 1 else 0
        h16 = (height << 16) if track_id == 1 else 0
        tkhd = _box(
            b"tkhd",
            struct.pack(">BBBBIIIII", 0, 0, 0, 7, 0, 0, track_id, 0, duration_units)
            + bytes(8)  # reserved
            + struct.pack(">HHHH", 0, 0, 0, 0)  # layer/group/volume/reserved
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w16, h16),
        )
        mdia = b""
        if track_id == 1 and n_samples > 0:
            sizes = sample_sizes or [0] * n_samples
            mdhd = _box(
                b"mdhd",
                struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration_units)
                + struct.pack(">HH", 0x55C4, 0),  # language 'und', pre_defined
            )
            stts = _box(
                b"stts",
                struct.pack(">BxxxI", 0, 1)
                + struct.pack(">II", n_samples, sample_delta),
            )
            stsz = _box(
                b"stsz",
                struct.pack(">BxxxII", 0, 0, n_samples)
                + b"".join(struct.pack(">I", s) for s in sizes),
            )
            stsc = _box(b"stsc", struct.pack(">BxxxIIII", 0, 1, 1, n_samples, 1))
            stco = _box(b"stco", struct.pack(">BxxxII", 0, 1, 0))
            stbl = _box(b"stbl", stts + stsz + stsc + stco)
            minf = _box(b"minf", stbl)
            mdia = _box(b"mdia", mdhd + minf)
        traks += _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov + _box(b"mdat", bytes(mdat_len))


_MEDIA_SYNTH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def synth_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic mixed-format media table from an id column:
    id % 4 == 0 -> PNG, 1 -> GIF, 2 -> BMP, 3 -> unknown format
    (utf-8 text bytes behind a leading NUL byte -- no image probe
    accepts 0x00, so a text payload that happens to start with "BM"
    or "GIF8" can never be misclassified as a real format).
    Dimensions derive from the id so an oracle can recompute them in
    SQL; payload bytes are REAL format files from the writers above.
    Arrow-batched like every other media stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, txt in zip(pdf[id_col], pdf[text_col]):
                mid = int(mid)
                w, h = mid % 64 + 1, mid % 48 + 1
                sel = mid % 4
                if sel == 0:
                    payload = png_bytes(w, h)
                elif sel == 1:
                    payload = gif_bytes(w, h)
                elif sel == 2:
                    payload = bmp_bytes(w, h)
                else:
                    payload = b"\x00" + str(txt).encode("utf-8")
                rows.append((mid, "image", payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    return df.select(id_col, text_col).mapInPandas(batches, schema=_MEDIA_SYNTH_SCHEMA)


def synth_video_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic MP4 media table, every probe-visible field an
    exact integer function of the id so an oracle recomputes them in
    SQL: timescale = 1000*(1 + id%3); duration_units chosen so
    duration_ms = 500 + id%100 exactly; n_tracks = 1 + id%2;
    width/height = 16*(id%8+1) x 16*(id%6+1); track 1 carries a real
    sample table with 5 + id%10 samples at 25 fps (delta = 40*k
    media units -> pts_ms = 40*i exactly) and sizes 100 + i%7 (so
    offsets have the closed form 100*i + 21*(i div 7) + r*(r-1)/2,
    r = i%7).  id%5==4 rows carry a NUL-prefixed non-MP4 payload for
    the unknown path (no box parser accepts 0x00 as a leading size
    byte of a valid ftyp)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                if mid % 5 == 4:
                    payload = b"\x00notavideo" + str(mid).encode()
                else:
                    scale_k = 1 + mid % 3
                    ns = 5 + mid % 10
                    payload = mp4_bytes(
                        duration_units=(500 + mid % 100) * scale_k,
                        timescale=1000 * scale_k,
                        n_tracks=1 + mid % 2,
                        width=16 * (mid % 8 + 1),
                        height=16 * (mid % 6 + 1),
                        n_samples=ns,
                        sample_delta=40 * scale_k,
                        sample_sizes=[100 + i % 7 for i in range(ns)],
                    )
                rows.append((mid, "video", payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    return df.select(id_col).mapInPandas(batches, schema=_MEDIA_SYNTH_SCHEMA)


def synth_audio_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic WAV media table: sample_rate = 8000 + (id%4)*4000,
    channels = 1 + id%2, n_samples = 100 + id%50 -- all recomputable in
    oracle SQL; payloads are real RIFF/WAVE PCM16 files."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                payload = wav_bytes(8000 + (mid % 4) * 4000, 1 + mid % 2, 100 + mid % 50)
                rows.append((mid, "audio", payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    return df.select(id_col).mapInPandas(batches, schema=_MEDIA_SYNTH_SCHEMA)
