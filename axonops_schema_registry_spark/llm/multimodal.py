"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with Arrow-batched decode / feature-extraction over ``mapInPandas``.

The Spark-side contract is real and tested: schema, batching shape, UDF
signatures, partitioning notes.  Three REAL kernels ship: container
*header* decode (PNG/GIF/JPEG/WAV via stdlib struct,
:func:`decode_headers`), full PNG *pixel* decode (stdlib zlib + numpy
un-filtering of all five scanline filter types, :func:`decode_pixels`),
and WAV PCM16 *sample* decode (RIFF chunk walk + int16 deinterleave,
:func:`decode_samples`).  Only COMPRESSED audio/video decode — which
genuinely needs codec libraries (librosa/ffmpeg) absent from this
container — remains stubbed: ``decode_features(..., stub=True)`` runs a
deterministic fake derived from the payload bytes so that pipeline
shape stays end-to-end testable; ``stub=False`` raises
NotImplementedError at the exact point a codec kernel would plug in.

Scale notes: payloads stay opaque ``binary`` columns all the way to the
decode stage (no driver round-trip); decode runs ``mapInPandas`` so one
Python worker handles one Arrow batch of payloads at a time.  For 100 TB
media tables, repartition by size-class first so batches have uniform
decode cost, and keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
small enough that a batch of decoded frames fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Typed metadata carried next to every payload.
MULTIMODAL_META_DDL = ("struct<modality:string,mime:string,"
                       "source_uri:string,n_bytes:bigint>")

DECODED_SCHEMA_DDL = ("doc_id bigint, n_bytes bigint, width int, height int, "
                      "n_frames int")


def attach_payload(df: DataFrame, id_col: str, text_col: str,
                   modality: str = "image") -> DataFrame:
    """Wrap a source column as an opaque binary payload + typed metadata.

    (With real media the payload would arrive from ``spark.read.format
    ("binaryFile")`` or a parquet binary column; here the driver corpus's
    text bytes stand in.)
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.concat(F.lit("synthetic://"), F.col(id_col).cast("string"))
        .alias("source_uri"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )
    return df.select(F.col(id_col).alias("doc_id"),
                     payload.alias("payload"), meta.alias("meta"))


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/video header parse."""
    n = len(payload)
    return n % 640, (n * 7) % 480, n % 30


def decode_features(df: DataFrame, stub: bool = True) -> DataFrame:
    """Arrow-batched decode / feature extraction over payload batches.

    FULL pixel/sample kernels (PIL.Image.open / librosa.load / pyav frame
    sampling) would replace ``_fake_decode`` — the mapInPandas batching,
    schema and memory shape are exactly what they need.  Container
    *header* decode (dimensions, channels, sample rate) needs no media
    libs at all: see :func:`decode_headers`, the real kernel.
    """
    if not stub:
        raise NotImplementedError(
            "compressed audio/video decode kernels (librosa/ffmpeg) are "
            "not available in this environment; run with stub=True, or "
            "use the dependency-free real kernels: decode_headers() "
            "(container headers), decode_pixels() (PNG pixels), "
            "decode_samples() (WAV PCM16 samples)")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "n_frames": [f[2] for f in feats],
            })

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA_DDL)


# ---------------------------------------------------------------------------
# REAL header-decode kernel (no media libraries required)
# ---------------------------------------------------------------------------
#
# Container headers are plain struct-packed bytes: PNG IHDR, GIF logical
# screen descriptor, JPEG SOF0 marker scan, WAV RIFF/fmt chunks.  Parsing
# them is a genuine decode (magic sniff + binary field extraction), not a
# stub — it covers the dimension/sample-rate metadata a training-data
# pipeline filters on, leaving only pixel/sample decode behind the
# stub gate above.

HEADER_SCHEMA_DDL = ("doc_id bigint, format string, width int, height int, "
                     "channels int, sample_rate_hz int, n_samples int, "
                     "n_bytes bigint")


def parse_media_header(payload: bytes) -> dict:
    """Sniff the container magic and parse its header fields.

    Returns {"format", "width", "height", "channels", "sample_rate_hz",
    "n_samples"} with None for fields the modality lacks.  Raises
    ValueError on unrecognized or truncated containers (callers decide
    whether to quarantine or fail)."""
    import struct

    none = {"width": None, "height": None, "channels": None,
            "sample_rate_hz": None, "n_samples": None}
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # first chunk must be IHDR: len(4) type(4) data(13) crc(4)
        (length,) = struct.unpack(">I", payload[8:12])
        if payload[12:16] != b"IHDR" or length != 13:
            raise ValueError("PNG without leading IHDR")
        w, h = struct.unpack(">II", payload[16:24])
        return {**none, "format": "png", "width": int(w), "height": int(h)}
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return {**none, "format": "gif", "width": int(w), "height": int(h)}
    if payload[:2] == b"\xff\xd8":
        # scan marker segments for a start-of-frame (SOF0-SOF3)
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                raise ValueError("JPEG marker desync")
            marker = payload[i + 1]
            if marker == 0xD9:  # EOI
                break
            (seglen,) = struct.unpack(">H", payload[i + 2:i + 4])
            if 0xC0 <= marker <= 0xC3:
                h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                return {**none, "format": "jpeg",
                        "width": int(w), "height": int(h)}
            i += 2 + seglen
        raise ValueError("JPEG without SOF marker")
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # walk chunks for fmt + data
        i, fmt, data_len = 12, None, None
        while i + 8 <= len(payload):
            cid = payload[i:i + 4]
            (clen,) = struct.unpack("<I", payload[i + 4:i + 8])
            if cid == b"fmt ":
                _, ch, rate = struct.unpack("<HHI", payload[i + 8:i + 16])
                (block_align,) = struct.unpack("<H", payload[i + 20:i + 22])
                fmt = (int(ch), int(rate), int(block_align))
            elif cid == b"data":
                data_len = int(clen)
            i += 8 + clen + (clen & 1)
        if fmt is None or data_len is None:
            raise ValueError("WAV without fmt/data chunks")
        ch, rate, block_align = fmt
        return {**none, "format": "wav", "channels": ch,
                "sample_rate_hz": rate,
                "n_samples": data_len // max(block_align, 1)}
    raise ValueError(f"unrecognized container magic {payload[:8]!r}")


def decode_headers(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL header decode over (doc_id, payload) frames.

    Same partitioning/batching shape as :func:`decode_features`; the
    kernel is pure stdlib struct parsing, so it runs in any container.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                meta = parse_media_header(bytes(payload))
                rows.append({"doc_id": doc_id, **meta,
                             "n_bytes": len(payload)})
            yield pd.DataFrame(rows, columns=[
                "doc_id", "format", "width", "height", "channels",
                "sample_rate_hz", "n_samples", "n_bytes"])

    return df.mapInPandas(decode_batches, schema=HEADER_SCHEMA_DDL)


# --- deterministic payload synthesis (the encode side of the round-trip) --
#
# Written independently of the parser (struct.pack with real CRCs vs the
# parser's field extraction) so the mm2 spec is a genuine encode→decode
# round-trip whose expected values a SQL oracle derives from doc_id alone.

def synthesize_payload(doc_id: int) -> bytes:
    """Build a real container for doc_id: format cycles png → gif →
    jpeg → wav; dimensions/rates are doc_id arithmetic (the oracle's
    ground truth)."""
    import struct
    import zlib

    w = doc_id % 640 + 1
    h = doc_id % 480 + 1
    k = doc_id % 32  # filler length → n_bytes varies
    kind = doc_id % 4
    if kind == 0:  # PNG: sig + IHDR + IDAT(k filler) + IEND
        def chunk(ctype: bytes, data: bytes) -> bytes:
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data)))

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", b"\x00" * k) + chunk(b"IEND", b""))
    if kind == 1:  # GIF89a: header + LSD + filler + trailer
        return (b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"
                + b"\x00" * k + b"\x3b")
    if kind == 2:  # JPEG: SOI + APP0 + COM(k) + SOF0 + EOI
        app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
                + b"\x01\x02\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00")
        com = b"\xff\xfe" + struct.pack(">H", 2 + k) + b"\x00" * k
        sof0 = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
                + struct.pack(">HH", h, w) + b"\x03"
                + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01")
        return b"\xff\xd8" + app0 + com + sof0 + b"\xff\xd9"
    # WAV: RIFF + fmt(PCM16) + data sized for exactly doc_id%64 samples
    channels = 1 + doc_id % 2
    rate = 8000 * (1 + doc_id % 3)
    block_align = channels * 2
    data = b"\x00" * ((doc_id % 64) * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block_align,
                      block_align, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthesize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id) → (doc_id, payload binary) via an Arrow-batched synthesizer."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "payload": [synthesize_payload(int(i)) for i in pdf[id_col]],
            })

    return df.select(F.col(id_col)).mapInPandas(
        synth, schema="doc_id bigint, payload binary")


# ---------------------------------------------------------------------------
# REAL pixel-decode kernel: full PNG decode with stdlib zlib + numpy
# ---------------------------------------------------------------------------
#
# A complete 8-bit RGB PNG decode needs no media library at all: chunk
# walk → concatenated-IDAT zlib.decompress → per-scanline reversal of
# the five PNG filter types (None/Sub/Up/Average/Paeth, RFC 2083 §6).
# This replaces the last stub the engine carried; only audio/video
# sample decode (which genuinely needs codec libraries) stays gated.
# The encoder below FORWARD-filters with a doc_id-cycled filter type per
# scanline, so the decoder's un-filtering of all five types is exercised
# on every run — a genuine encode→decode round-trip whose expected pixel
# sums a SQL oracle derives from doc_id arithmetic alone.

PIXEL_SCHEMA_DDL = ("doc_id bigint, width int, height int, channels int, "
                    "n_pixels bigint, sum_r bigint, sum_g bigint, "
                    "sum_b bigint")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _pixel_value(doc_id: int, x: int, y: int) -> tuple[int, int, int]:
    """The deterministic pixel pattern — the oracle's ground truth."""
    return ((doc_id + x + 2 * y) % 256,
            (2 * doc_id + 3 * x + y) % 256,
            (3 * doc_id + x + y) % 256)


def synthesize_png_pixels(doc_id: int) -> bytes:
    """A real 8-bit RGB PNG whose pixels follow :func:`_pixel_value`,
    forward-filtered with filter type ``(doc_id + y) % 5`` per scanline
    and zlib-compressed — decodable by any PNG reader."""
    import struct
    import zlib

    w = doc_id % 16 + 1
    h = doc_id % 12 + 1
    bpp = 3
    raw_rows: list[bytes] = []
    for y in range(h):
        raw_rows.append(bytes(v for x in range(w)
                              for v in _pixel_value(doc_id, x, y)))
    out = bytearray()
    prev = bytes(w * bpp)
    for y, row in enumerate(raw_rows):
        ftype = (doc_id + y) % 5
        out.append(ftype)
        for i, v in enumerate(row):
            left = row[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                out.append(v)
            elif ftype == 1:
                out.append((v - left) % 256)
            elif ftype == 2:
                out.append((v - up) % 256)
            elif ftype == 3:
                out.append((v - (left + up) // 2) % 256)
            else:
                out.append((v - _paeth(left, up, ul)) % 256)
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    idat = zlib.compress(bytes(out))
    # split the stream into two IDAT chunks when possible: decoders must
    # concatenate IDAT payloads before inflating, so this pins that path
    mid = len(idat) // 2
    idats = (chunk(b"IDAT", idat[:mid]) + chunk(b"IDAT", idat[mid:])
             if mid else chunk(b"IDAT", idat))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + idats
            + chunk(b"IEND", b""))


def decode_png_pixels(payload: bytes) -> dict:
    """Full PNG pixel decode (stdlib zlib + numpy): chunk walk,
    inflate, un-filter all five scanline filter types, per-channel
    sums.  Supports 8-bit RGB (color type 2) and RGBA (6)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    i, ihdr, idat = 8, None, bytearray()
    while i + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[i:i + 4])
        ctype = payload[i + 4:i + 8]
        data = payload[i + 8:i + 8 + clen]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        i += 12 + clen
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, bit_depth, color_type, _, _, interlace = ihdr
    if bit_depth != 8 or color_type not in (2, 6) or interlace:
        raise ValueError("unsupported PNG variant")
    bpp = 3 if color_type == 2 else 4
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel stream length mismatch")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=y * (stride + 1) + 1).astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:
            rec = (line + prev) % 256
        else:
            rec = np.zeros(stride, dtype=np.int32)
            for i2 in range(stride):
                left = int(rec[i2 - bpp]) if i2 >= bpp else 0
                up = int(prev[i2])
                ul = int(prev[i2 - bpp]) if i2 >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                elif ftype == 4:
                    pred = _paeth(left, up, ul)
                else:
                    raise ValueError(f"bad filter type {ftype}")
                rec[i2] = (int(line[i2]) + pred) % 256
        img[y] = rec.astype(np.uint8)
        prev = img[y].astype(np.int32)
    px = img.reshape(h, w, bpp).astype(np.int64)
    return {"width": int(w), "height": int(h), "channels": bpp,
            "n_pixels": int(w) * int(h),
            "sum_r": int(px[:, :, 0].sum()),
            "sum_g": int(px[:, :, 1].sum()),
            "sum_b": int(px[:, :, 2].sum())}


def synthesize_png_media(df: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """(id) → (doc_id, payload binary) pixel-bearing PNGs."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "payload": [synthesize_png_pixels(int(i))
                            for i in pdf[id_col]],
            })

    return df.select(F.col(id_col)).mapInPandas(
        synth, schema="doc_id bigint, payload binary")


def decode_pixels(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL pixel decode over (doc_id, payload) frames —
    same mapInPandas shape as :func:`decode_headers`; payloads never
    leave the executors."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rows.append({"doc_id": doc_id,
                             **decode_png_pixels(bytes(payload))})
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "channels", "n_pixels",
                "sum_r", "sum_g", "sum_b"])

    return df.mapInPandas(decode_batches, schema=PIXEL_SCHEMA_DDL)


# ---------------------------------------------------------------------------
# REAL audio-sample decode kernel: WAV PCM16 with stdlib struct + numpy
# ---------------------------------------------------------------------------
#
# PCM inside a RIFF container is struct-packed little-endian integers —
# decoding it needs no codec library, the same way PNG needed none: RIFF
# chunk walk (with word-alignment padding), fmt parse, int16 frame
# deinterleave.  The synthesizer writes a deterministic sample pattern
# whose aggregate a SQL oracle re-derives from doc_id arithmetic alone,
# so the decoder's chunk walk, pad handling and sample math are all
# hash-pinned.  This turns the last "could be real code" stub into real
# code; only compressed audio/video (true codec territory) stays gated
# in decode_features(stub=False).

SAMPLE_SCHEMA_DDL = ("doc_id bigint, channels int, sample_rate_hz int, "
                     "n_frames bigint, sum_amp bigint, peak_amp int")


def _sample_value(doc_id: int, frame: int, ch: int) -> int:
    """The deterministic PCM16 pattern — the oracle's ground truth."""
    return ((doc_id * 7 + frame * 13 + ch * 5) % 4096) - 2048


def synthesize_wav_pcm(doc_id: int) -> bytes:
    """A real PCM16 WAV for doc_id: channels/rate/frame-count from
    doc_id arithmetic, samples from :func:`_sample_value`, plus an
    odd-sized LIST chunk before ``data`` so decoders must honor RIFF
    word-alignment padding to find the sample chunk at all."""
    import struct

    channels = 1 + doc_id % 2
    rate = 8000 * (1 + doc_id % 3)
    n_frames = doc_id % 50 + 1
    samples = b"".join(
        struct.pack("<h", _sample_value(doc_id, i, ch))
        for i in range(n_frames) for ch in range(channels))
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block_align,
                      block_align, 16)
    info = b"INFO" + b"x" * (doc_id % 7 * 2 + 1)  # odd length: pad byte
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"LIST" + struct.pack("<I", len(info)) + info + b"\x00"
            + b"data" + struct.pack("<I", len(samples)) + samples)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_samples(payload: bytes) -> dict:
    """Full WAV PCM16 sample decode (stdlib struct + numpy): RIFF chunk
    walk with word-alignment padding, fmt parse (PCM only), int16 frame
    count + exact amplitude sum + peak magnitude."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4:i + 8])
        chunk = payload[i + 8:i + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            data = chunk
        i += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV without fmt/data chunks")
    audio_format, channels, rate, _, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError("only uncompressed PCM16 is decodable here")
    if len(data) % block_align:
        raise ValueError("data chunk not frame-aligned")
    pcm = np.frombuffer(data, dtype="<i2").astype(np.int64)
    return {"channels": int(channels), "sample_rate_hz": int(rate),
            "n_frames": len(data) // block_align,
            "sum_amp": int(pcm.sum()),
            "peak_amp": int(np.abs(pcm).max()) if pcm.size else 0}


def synthesize_wav_media(df: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """(id) → (doc_id, payload binary) sample-bearing PCM16 WAVs."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "payload": [synthesize_wav_pcm(int(i))
                            for i in pdf[id_col]],
            })

    return df.select(F.col(id_col)).mapInPandas(
        synth, schema="doc_id bigint, payload binary")


def decode_samples(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL sample decode over (doc_id, payload) frames —
    the audio twin of :func:`decode_pixels`."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rows.append({"doc_id": doc_id,
                             **decode_wav_samples(bytes(payload))})
            yield pd.DataFrame(rows, columns=[
                "doc_id", "channels", "sample_rate_hz", "n_frames",
                "sum_amp", "peak_amp"])

    return df.mapInPandas(decode_batches, schema=SAMPLE_SCHEMA_DDL)
