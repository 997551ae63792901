"""Multimodal columns over REAL container formats (BMP / WAV / Y4M).

Images/audio/video are carried as `binary` columns exactly like the
pipeline's `html` column. Three real, codec-free container formats are
supported end-to-end — the payloads the source emits are byte-valid
files (`file(1)` identifies them), and the decoders are real header
parsers, not tag-sniffers:

  image  BMP   BITMAPFILEHEADER + BITMAPINFOHEADER, 8 bpp palettized,
               4-byte row stride, bottom-up OR top-down (negative
               biHeight) pixel order — the decoder normalizes both.
         PNG   (doc_id % 9 == 0) real spec-valid PNG: grayscale 8-bit,
               zlib IDAT (stored-deflate from the SQL-side source, but
               the decoder inflates ANY deflate), genuine Adler-32 and
               per-chunk CRC-32 emitted by JVM-side byte folds; the
               decoder reconstructs all five scanline filters.
  audio  WAV   RIFF/WAVE chunk list (the source interposes a junk LIST
               chunk before `data`, so the decoder must genuinely walk
               word-aligned chunks), PCM u8/s16 mono.
  video  Y4M   YUV4MPEG2 stream header (W/H/C tokens) + per-frame
               FRAME\\n markers; Cmono/C420/C422/C444 frame sizing.

Formats that genuinely need a codec (PNG/JPEG/GIF/FLAC/Ogg/MP3/MP4/
Matroska, non-WAVE RIFF forms, compressed or non-8bpp BMP, non-PCM WAV)
raise NotImplementedError — the documented boundary where a real
PIL/ffmpeg decoder would be wired on a cluster that ships codecs.

The source (`media_from_documents`) builds container bytes from
`documents.text` with pure JVM expressions (hex-string assembly ->
unhex), so a DuckDB twin can reconstruct every output bit from the text
column (operators/oracles.py). Feature extraction is numpy-vectorized
per Arrow batch inside ONE mapInPandas stage per modality. The image
op additionally emits a position-weighted pixel checksum over decoded
top-down order — bottom-up payloads only match the oracle if the row
flip is actually performed, so the driver check validates the decode
path, not just byte plumbing.

Mirrors the reference's declared-but-unbuilt OCR/media branch
(/root/reference/requirements.txt:28-30 pins pytesseract/layoutparser
with zero call sites); here the container plumbing is real and the
codec boundary is explicit. r5 adds the TEXT-recovery leg itself:
`mm_ocr_text` renders every document through a fixed 5x7 bitmap font
into byte-valid BMPs (JVM-side) and reads the text back by template-
matching glyph cells (vectorized Hamming nearest) — recovered text is
byte-identical to the source, driver-hash-checked.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import numpy as np
    import pandas as pd

# magic prefixes of real formats that require a codec we don't ship
_UNSUPPORTED_MAGIC = (
    b"\xff\xd8\xff",  # JPEG
    b"GIF8",  # GIF
    b"fLaC",  # FLAC
    b"OggS",  # Ogg
    b"ID3",  # MP3 with ID3 tag
    b"\x1aE\xdf\xa3",  # Matroska/WebM
)

_BMP_W = 8  # source image width; stride == width == 8 (already 4-aligned)
_PNG_BLOCK = 16384  # stored-DEFLATE block payload bytes (cap 65535)
_CHECKSUM_MOD = 1_000_000_007
_WAV_SR = 16000
N_FEATURE_BINS = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("media", T.BinaryType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
        T.StructField("pixel_checksum", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_sampled", T.IntegerType()),
        T.StructField("frame_checksums", T.ArrayType(T.LongType())),
        T.StructField("error", T.StringType()),
    ]
)

AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


# --- JVM-side container assembly (hex-string space, one unhex at the end) ----


def _le_hex(col: Column, nbytes: int) -> Column:
    """Little-endian hex of a non-negative integral Column."""
    col = col.cast("long")
    return F.concat(
        *[
            F.lpad(F.hex(F.shiftright(col, 8 * i) % 256), 2, "0")
            for i in range(nbytes)
        ]
    )


def _const_hex(raw: bytes) -> str:
    return raw.hex().upper()


# 256-entry grayscale palette: (B,G,R,0) per index — a constant blob
_BMP_PALETTE_HEX = "".join(f"{i:02X}" * 3 + "00" for i in range(256))
# BITMAPFILEHEADER tail + BITMAPINFOHEADER constants for 8bpp W=8
_BMP_DATA_OFFSET = 14 + 40 + 1024  # 1078
_Y4M_HDR_HEX = _const_hex(b"YUV4MPEG2 W8 H8 F25:1 Ip A1:1 Cmono\n")
_Y4M_FRAME_HDR_HEX = _const_hex(b"FRAME\n")


def _bmp_hex(h: Column, blen: Column, doc_id: Column) -> Column:
    """8bpp BMP whose pixel array is the text bytes, 8 px/row, zero-padded
    to at least one row. Even doc_ids store bottom-up (positive biHeight,
    the common real-world layout — rows reversed here so the DECODER must
    flip them back); odd doc_ids store top-down (negative biHeight)."""
    hgt = F.greatest(F.lit(1).cast("long"), F.floor(blen / _BMP_W).cast("long"))
    n_pix = hgt * _BMP_W
    # natural (top-down) pixel hex, zero-padded for bodies under one row
    pix_hex = F.substr(F.concat(h, F.lit("0" * (2 * _BMP_W))), F.lit(1), (n_pix * 2).cast("int"))
    # linear-time row reversal: split every 16 hex chars (one row), reverse.
    # A transform(sequence(...), r -> substr(pix_hex, ...)) would inline
    # pix_hex per element -> O(rows * len) (CLAUDE.md CollapseProject trap).
    bottom_up_pix = F.array_join(
        F.reverse(F.split(pix_hex, r"(?<=\G.{16})")), ""
    )
    bottom_up = doc_id % 2 == 0
    height_field = F.when(bottom_up, hgt).otherwise(F.lit(4294967296) - hgt)
    return F.concat(
        F.lit(_const_hex(b"BM")),
        _le_hex(n_pix + _BMP_DATA_OFFSET, 4),  # bfSize
        F.lit("00000000"),  # bfReserved1/2
        F.lit(_const_hex(struct.pack("<I", _BMP_DATA_OFFSET))),  # bfOffBits
        F.lit(_const_hex(struct.pack("<Ii", 40, _BMP_W))),  # biSize, biWidth
        _le_hex(height_field, 4),  # biHeight (sign = orientation)
        F.lit(_const_hex(struct.pack("<HHI", 1, 8, 0))),  # planes, bpp, BI_RGB
        _le_hex(n_pix, 4),  # biSizeImage
        F.lit(_const_hex(struct.pack("<iiII", 2835, 2835, 256, 0))),
        F.lit(_BMP_PALETTE_HEX),
        F.when(bottom_up, bottom_up_pix).otherwise(pix_hex),
    )


def _wav_hex(h: Column, blen: Column) -> Column:
    """RIFF/WAVE, PCM u8 mono 16 kHz, samples = text bytes. A 4-byte junk
    LIST chunk sits between fmt and data so a tag-sniffing fake decoder
    (fixed data offset) reads garbage — only a real chunk walk works."""
    fmt = struct.pack("<HHIIHH", 1, 1, _WAV_SR, _WAV_SR, 1, 8)
    mid = (
        _const_hex(b"WAVE")
        + _const_hex(b"fmt ")
        + _const_hex(struct.pack("<I", 16))
        + _const_hex(fmt)
        + _const_hex(b"LIST")
        + _const_hex(struct.pack("<I", 4))
        + _const_hex(b"INFO")
        + _const_hex(b"data")
    )
    # RIFF size: WAVE(4) + fmt(8+16) + LIST(8+4) + data hdr(8) + samples
    return F.concat(
        F.lit(_const_hex(b"RIFF")),
        _le_hex(blen + 48, 4),
        F.lit(mid),
        _le_hex(blen, 4),
        h,
    )


def _y4m_hex(h: Column) -> Column:
    """YUV4MPEG2 Cmono 8x8: stream header + FRAME\\n markers, 64 bytes of
    text per frame. Linear-time: text hex split into 128-char chunks first
    (partial tail dropped), FRAME header prepended per chunk."""
    frames = F.array_join(
        F.transform(
            F.filter(
                F.split(h, r"(?<=\G.{128})"), lambda x: F.length(x) == 128
            ),
            lambda x: F.concat(F.lit(_Y4M_FRAME_HDR_HEX), x),
        ),
        "",
    )
    return F.concat(F.lit(_Y4M_HDR_HEX), frames)


# CRC-32 (ISO 3309 / PNG chunk CRC) table, embedded as ONE hex-string
# literal so codegen sees a constant — 256 array elements inlined per
# fold step would explode the generated code instead
_CRC_TABLE: list[int] = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (0xEDB88320 ^ (_c >> 1)) if (_c & 1) else (_c >> 1)
    _CRC_TABLE.append(_c)
_CRC_TAB_HEX = "".join(f"{v:08X}" for v in _CRC_TABLE)
del _i, _c


def _hex_byte_arr(hx: Column) -> Column:
    """hex string -> array<long> of byte values; every lambda is
    element-local so the expansion stays linear."""
    return F.transform(
        F.filter(F.split(hx, r"(?<=\G.{2})"), lambda s: F.length(s) == 2),
        lambda s: F.conv(s, 16, 10).cast("long"),
    )


def _crc32_hex(content_hex: Column) -> Column:
    """Real CRC-32 of the bytes a hex string encodes, as 8 uppercase hex
    chars — the table-driven byte fold, run JVM-side via F.aggregate."""
    crc = F.aggregate(
        _hex_byte_arr(content_hex),
        F.lit(4294967295),
        lambda acc, b: F.conv(
            F.substr(
                F.lit(_CRC_TAB_HEX),
                (F.pmod(acc.bitwiseXOR(b), F.lit(256)) * 8 + 1).cast("int"),
                F.lit(8),
            ),
            16,
            10,
        )
        .cast("long")
        .bitwiseXOR(F.shiftright(acc, 8)),
    )
    return F.lpad(F.hex(crc.bitwiseXOR(F.lit(4294967295))), 8, "0")


def _adler32_hex(raw_arr: Column, raw_len: Column) -> Column:
    """Adler-32 over a byte array (zlib trailer), big-endian hex. The
    sequential definition collapses to two closed-form modular sums:
    s1 = 1 + sum(b_i), s2 = n + sum((n - i + 1) * b_i)."""
    s1 = (
        1 + F.aggregate(raw_arr, F.lit(0).cast("long"), lambda a, b: a + b)
    ) % 65521
    weighted = F.aggregate(
        F.zip_with(
            raw_arr,
            F.sequence(F.lit(1).cast("long"), raw_len),
            lambda b, i: (raw_len - i + 1) * b,
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    s2 = (raw_len + weighted) % 65521
    return F.lpad(F.hex(s2 * 65536 + s1), 8, "0")


def _png_hex(h: Column, blen: Column) -> Column:
    """A REAL spec-valid PNG (grayscale 8-bit, color type 0) whose image
    is the same 8-px-wide top-down pixel array as the BMP family: zlib
    stream of stored (uncompressed) DEFLATE blocks — the one zlib
    framing pure SQL can emit — plus a genuine Adler-32 trailer (zlib
    verifies it on decompress) and genuine per-chunk CRC-32s, both
    computed as JVM-side byte folds. Scanlines carry filter byte 0; the
    DECODER still implements all five PNG filters, exercised by pytest
    fixtures. The raw stream is chunked into _PNG_BLOCK-byte stored
    blocks (BFINAL on the last), so ANY text length emits a valid
    stream — stored blocks cap at 65535 bytes and a single unguarded
    block would wrap its LEN field past ~58 KiB of text."""
    hgt = F.greatest(F.lit(1).cast("long"), F.floor(blen / _BMP_W).cast("long"))
    n_pix = hgt * _BMP_W
    pix_hex = F.substr(
        F.concat(h, F.lit("0" * (2 * _BMP_W))), F.lit(1), (n_pix * 2).cast("int")
    )
    # one scanline = filter byte 0x00 + 8 pixel bytes
    raw_hex = F.array_join(
        F.transform(
            F.filter(
                F.split(pix_hex, r"(?<=\G.{16})"), lambda r: F.length(r) == 16
            ),
            lambda r: F.concat(F.lit("00"), r),
        ),
        "",
    )
    raw_len = hgt * (1 + _BMP_W)
    # stored DEFLATE blocks hold <= 65535 bytes each: chunk the raw
    # stream at _PNG_BLOCK bytes (16 KiB keeps the split's regex
    # lookbehind under Java's 65535-char bound) so ANY text length
    # emits a valid stream — a single unguarded block would wrap LEN
    # negative past ~58 KiB of text. The two-arg zip_with lambda flags
    # the FINAL block's BFINAL bit.
    blocks = F.filter(
        F.split(raw_hex, r"(?<=\G.{%d})" % (2 * _PNG_BLOCK)),
        lambda b: F.length(b) > 0,
    )
    nblk = F.size(blocks)
    block_hex = F.aggregate(
        F.zip_with(
            blocks,
            F.sequence(F.lit(1), nblk),
            lambda b, i: F.concat(
                F.when(i == nblk, F.lit("01")).otherwise(F.lit("00")),
                _le_hex((F.length(b) / 2).cast("long"), 2),
                _le_hex(65535 - (F.length(b) / 2).cast("long"), 2),
                b,
            ),
        ),
        F.lit(""),
        lambda acc, x: F.concat(acc, x),
    )
    zlib_hex = F.concat(
        F.lit("7801"),  # CMF/FLG (0x7801 % 31 == 0)
        block_hex,
        _adler32_hex(_hex_byte_arr(raw_hex), raw_len),
    )
    ihdr_content = F.concat(
        F.lit(_const_hex(b"IHDR") + "00000008"),  # width 8, big-endian
        F.lpad(F.hex(hgt), 8, "0"),  # height
        F.lit("0800000000"),  # depth 8, gray, deflate, adaptive, no interlace
    )
    idat_content = F.concat(F.lit(_const_hex(b"IDAT")), zlib_hex)
    return F.concat(
        F.lit(_const_hex(b"\x89PNG\r\n\x1a\n") + "0000000D"),
        ihdr_content,
        _crc32_hex(ihdr_content),
        # IDAT length: 2 zlib hdr + 5 per stored-block hdr + raw + 4 adler
        F.lpad(F.hex(raw_len + 6 + 5 * nblk.cast("long")), 8, "0"),
        idat_content,
        _crc32_hex(idat_content),
        F.lit("00000000" + _const_hex(b"IEND") + "AE426082"),
    )


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents: doc_id % 3 picks
    the modality; the payload is a byte-valid PNG/BMP/WAV/Y4M container
    whose data bytes are the utf-8 text. Pure JVM expressions — no
    Python. The one-split testdata parquet is repartitioned to width
    FIRST (CLAUDE.md footgun): the PNG CRC/Adler byte folds are ~12x a
    BMP row, and on a single task they serialize the whole modality
    (measured 1.7s -> 0.2s at sf0.1)."""
    par = max(spark.sparkContext.defaultParallelism, 8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(par)
    body = F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
    h = F.hex(body)
    blen = F.length(body)
    kind = F.col("doc_id") % 3
    # image ids split into two container families: doc_id % 9 == 0 ships
    # a real PNG (stored-deflate zlib, genuine Adler-32 + CRC-32), the
    # rest ship BMP (even = bottom-up, odd = top-down). Both decode to
    # the SAME top-down pixel array, so the features/checksum oracle is
    # container-independent by construction.
    payload_hex = (
        F.when(F.col("doc_id") % 9 == 0, _png_hex(h, blen))
        .when(kind == 0, _bmp_hex(h, blen, F.col("doc_id")))
        .when(kind == 1, _wav_hex(h, blen))
        .otherwise(_y4m_hex(h))
    )
    mtype = (
        F.when(kind == 0, F.lit("image"))
        .when(kind == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        "doc_id", mtype.alias("media_type"), F.unhex(payload_hex).alias("media")
    )


# --- real container decoders (numpy/struct; used inside mapInPandas) ---------


def _check_unsupported(payload: bytes) -> None:
    for magic in _UNSUPPORTED_MAGIC:
        if payload.startswith(magic):
            raise NotImplementedError(
                f"container with magic {magic!r} needs a codec this "
                "environment does not ship"
            )
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        raise NotImplementedError("ISO-BMFF (MP4/MOV) needs a codec")


def _decode_bmp(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Parse an 8bpp uncompressed BMP -> (width, height, pixels) with
    pixels flattened in TOP-DOWN row-major order regardless of how the
    file stores them (positive biHeight = bottom-up, negative = top-down).
    Row padding to the 4-byte stride is stripped."""
    import numpy as np

    _check_unsupported(payload)
    if payload[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    bi_size, width, height = struct.unpack_from("<Iii", payload, 14)
    _planes, bitcount = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bi_size < 40:
        raise ValueError(f"unsupported DIB header size {bi_size}")
    if bitcount != 8:
        raise NotImplementedError(f"{bitcount}-bpp BMP needs pixel conversion")
    if compression != 0:
        raise NotImplementedError("RLE/compressed BMP")
    nrows = abs(height)
    stride = (width + 3) & ~3
    if width <= 0 or nrows == 0:
        raise ValueError("degenerate BMP dimensions")
    if len(payload) < data_off + nrows * stride:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=nrows * stride, offset=data_off
    ).reshape(nrows, stride)[:, :width]
    if height > 0:  # bottom-up storage -> flip to top-down
        rows = rows[::-1]
    return width, nrows, np.ascontiguousarray(rows).reshape(-1)


def _decode_png(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """A real PNG decoder for grayscale 8-bit (color type 0): chunk walk,
    zlib inflate (ANY deflate stream, not just the stored blocks our
    source emits — zlib also verifies the Adler-32 trailer), and all
    FIVE scanline filters (None/Sub/Up/Average/Paeth) reconstructed per
    the spec. Chunk CRCs are parsed but not verified (the usual decoder
    posture; the pytest verifies emitted CRCs independently). Color
    types needing a palette/alpha/RGB path, non-8-bit depths and Adam7
    interlacing raise NotImplementedError — the same explicit codec
    boundary the other containers draw."""
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG (bad signature)")
    pos, idat, ihdr = 8, b"", None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        if pos + 8 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        data = payload[pos + 8 : pos + 8 + ln]
        if ctype == b"IHDR":
            ihdr = struct.unpack_from(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if color != 0:
        raise NotImplementedError(f"PNG color type {color} needs a codec path")
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit PNG needs bit unpacking")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG")
    if width <= 0 or height <= 0:
        raise ValueError("degenerate PNG dimensions")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT deflate stream: {e}") from e
    if len(raw) < height * (1 + width):
        raise ValueError("truncated PNG scanline data")
    arr = np.frombuffer(
        raw, dtype=np.uint8, count=height * (1 + width)
    ).reshape(height, 1 + width)
    ftypes, rows = arr[:, 0], arr[:, 1:].astype(np.int64)
    out = np.zeros_like(rows)
    prev = np.zeros(width, dtype=np.int64)
    for r in range(height):
        f, rec = int(ftypes[r]), rows[r].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(1, width):
                rec[x] = (rec[x] + rec[x - 1]) & 0xFF
        elif f == 2:  # Up
            rec = (rec + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(width):
                left = rec[x - 1] if x else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(width):
                a = rec[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        out[r] = rec
        prev = rec
    return width, height, out.astype(np.uint8).reshape(-1)


def _decode_image(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Container dispatch for the image modality: PNG or BMP by magic;
    anything else routes through the BMP path's unsupported-magic probe."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    return _decode_bmp(payload)


def _decode_wav(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Walk the RIFF chunk list (word-aligned) -> (sample_rate, n_samples,
    centered float64 samples). PCM u8 and s16le mono supported."""
    import numpy as np

    _check_unsupported(payload)
    if payload[:4] != b"RIFF":
        raise ValueError("not a RIFF container")
    if payload[8:12] != b"WAVE":
        raise NotImplementedError(
            f"RIFF form {payload[8:12]!r} (AVI/WebP/...) needs a codec"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are padded to even length
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, sr, _brate, _balign, bits = struct.unpack_from(
        "<HHIIHH", fmt
    )
    if audio_fmt != 1:
        raise NotImplementedError(f"WAV format tag {audio_fmt} (non-PCM)")
    if channels != 1:
        raise NotImplementedError(f"{channels}-channel WAV")
    if bits == 8:
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
    elif bits == 16:
        usable = (len(data) // 2) * 2
        x = np.frombuffer(data[:usable], dtype="<i2").astype(np.float64)
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    return sr, len(x), x


def _decode_y4m(payload: bytes) -> tuple[int, int, list["np.ndarray"]]:
    """Parse a YUV4MPEG2 stream: header tokens (W/H/C) then FRAME-marked
    planes. Frame count is discovered by walking, not read from a field."""
    import numpy as np

    _check_unsupported(payload)
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\x0a")
    if nl < 0:
        raise ValueError("unterminated stream header")
    width = height = 0
    colorspace = "420"
    for tok in payload[9:nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        if key == b"W":
            width = int(val)
        elif key == b"H":
            height = int(val)
        elif key == b"C":
            colorspace = val.decode("ascii")
    if width <= 0 or height <= 0:
        raise ValueError("missing W/H in stream header")
    if colorspace == "mono":
        frame_size = width * height
    elif colorspace.startswith("420"):
        frame_size = width * height * 3 // 2
    elif colorspace.startswith("422"):
        frame_size = width * height * 2
    elif colorspace.startswith("444"):
        frame_size = width * height * 3
    else:
        raise NotImplementedError(f"y4m colorspace {colorspace}")
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {pos}")
        fnl = payload.find(b"\x0a", pos)
        if fnl < 0:
            raise ValueError("unterminated FRAME header")
        start = fnl + 1
        if start + frame_size > len(payload):
            raise ValueError("truncated frame plane")
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=frame_size, offset=start)
        )
        pos = start + frame_size
    return width, height, frames


def _byte_histogram_features(pixels: "np.ndarray") -> list[float]:
    """8-bin L1-normalized histogram — the deterministic stand-in for a
    real embedding; one numpy pass over the decoded pixel array."""
    import numpy as np

    if pixels.size == 0:
        return [0.0] * N_FEATURE_BINS
    hist = np.bincount(pixels >> 5, minlength=N_FEATURE_BINS).astype(np.float64)
    return (hist / pixels.size).tolist()


def _pixel_checksum(pixels: "np.ndarray") -> int:
    """Position-weighted checksum over top-down pixel order: proves the
    decoder un-flipped bottom-up rows (a histogram alone is order-blind)."""
    import numpy as np

    idx = np.arange(1, pixels.size + 1, dtype=np.int64)
    return int(np.dot(idx, pixels.astype(np.int64)) % _CHECKSUM_MOD)


AHASH_GRID = 8  # grid rows; columns = _BMP_W (the image is 8 px wide)


def _ahash_bits(pixels: "np.ndarray") -> str:
    """Average-hash over the decoded top-down pixel grid, all-integer:
    block-mean each OCCUPIED (row-block, column) cell — row blocks by
    the floor rule cell_r = (row*GRID)//H, of which min(GRID, H) are
    occupied — threshold at the floor global pixel mean, emit '1'/'0'
    per cell in (cell_r, col) order. Exact-reproducible in SQL — every step is
    BIGINT floor arithmetic over the same pixel list the other mm
    twins rebuild."""
    import numpy as np

    pix = pixels.astype(np.int64)
    n = int(pix.size)
    h = n // _BMP_W
    grid = pix.reshape(h, _BMP_W)
    cell_r = (np.arange(h, dtype=np.int64) * AHASH_GRID) // h
    t = int(pix.sum()) // n
    bits = []
    # iterate the OCCUPIED row blocks in ascending id order: for
    # h < GRID the floor rule spreads h block ids non-contiguously
    # over 0..GRID-1 (h=3 -> {0,2,5}), and the SQL twin's GROUP BY
    # likewise emits only existing cells
    for r in sorted(set(cell_r.tolist())):
        rows = grid[cell_r == r]
        for c in range(_BMP_W):
            m = int(rows[:, c].sum()) // rows.shape[0]
            bits.append("1" if m > t else "0")
    return "".join(bits)


# --- operators: one fused mapInPandas stage per modality ----------------------


def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BMP/PNG decode + feature extract in ONE mapInPandas stage (binary
    in, typed struct out — the exact Arrow plumbing a PIL decoder would
    use)."""
    media = media_from_documents(spark, sf_dir).filter(
        F.col("media_type") == "image"
    )

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media"]
            ):
                payload = bytes(payload) if payload is not None else b""
                try:
                    w, hgt, pixels = _decode_image(payload)
                    out.append(
                        {
                            "doc_id": doc_id,
                            "media_type": mtype,
                            "width": w,
                            "height": hgt,
                            "n_bytes": int(pixels.size),
                            "features": _byte_histogram_features(pixels),
                            "pixel_checksum": _pixel_checksum(pixels),
                            "error": None,
                        }
                    )
                except Exception as e:  # capture, never abort the batch
                    out.append(
                        {
                            "doc_id": doc_id,
                            "media_type": mtype,
                            "width": None,
                            "height": None,
                            "n_bytes": len(payload),
                            "features": None,
                            "pixel_checksum": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash", T.StringType()),
    ]
)


def mm_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup: decode each image container
    (BMP/PNG, the same fused mapInPandas shape as mm_image_features),
    compute the all-integer average-hash of the pixel grid
    (_ahash_bits), then collapse the corpus by EXACT hash bucket —
    dedup_exact's shape with a perceptual key instead of a text
    fingerprint. Two renders of near-identical content land in one
    bucket because block means absorb small pixel edits; per image the
    op reports its bucket size, canonical representative (min doc_id)
    and a drop verdict — the image-side analogue of
    dedup_minhash_keep_canonical's keep/drop output.

    Scale shape: one Arrow-batched decode pass (no shuffle), then ONE
    shuffle on the 64-bit-equivalent hash key with a window over
    hash buckets — at 10^10 images this is the same single
    hash-aggregate profile as dedup_exact. Production packs the bit
    string into a BINARY(8) key; the readable '0'/'1' string keeps the
    DuckDB twin byte-comparable.

    The twin rebuilds the pixel list like the other mm oracles
    (container bytes ARE the text bytes by fixture construction,
    cf. mm_image_features) and replays the same floor arithmetic."""
    media = media_from_documents(spark, sf_dir).filter(
        F.col("media_type") == "image"
    )

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(payload) if payload is not None else b""
                _w, _h, pixels = _decode_image(payload)
                out.append({"doc_id": doc_id, "ahash": _ahash_bits(pixels)})
            yield pd.DataFrame(out)

    hashed = media.mapInPandas(decode, schema=AHASH_SCHEMA)
    w = Window.partitionBy("ahash")
    return hashed.select(
        "doc_id",
        "ahash",
        F.count(F.lit(1)).over(w).cast("long").alias("n_copies"),
        F.min("doc_id").over(w).cast("long").alias("canonical_doc_id"),
    ).withColumn(
        "is_dup",
        (F.col("n_copies") > 1) & (F.col("doc_id") != F.col("canonical_doc_id")),
    )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y4M frame walk + sampling: every 4th frame, per-frame additive
    checksum (numpy-vectorized)."""
    media = media_from_documents(spark, sf_dir).filter(
        F.col("media_type") == "video"
    )

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    _w, _h, frames = _decode_y4m(payload)
                    sampled = frames[::4]
                    sums = [int(f.sum(dtype=np.int64) % 65536) for f in sampled]
                    out.append(
                        {
                            "doc_id": doc_id,
                            "n_frames": len(frames),
                            "n_sampled": len(sampled),
                            "frame_checksums": sums,
                            "error": None,
                        }
                    )
                except Exception as e:  # capture, never abort the batch
                    out.append(
                        {
                            "doc_id": doc_id,
                            "n_frames": None,
                            "n_sampled": None,
                            "frame_checksums": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


def mm_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV chunk walk + numpy signal stats (RMS/peak over centered PCM).
    Same mapInPandas shape a soundfile/librosa decoder would use."""
    media = media_from_documents(spark, sf_dir).filter(
        F.col("media_type") == "audio"
    )

    def stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    sr, n, x = _decode_wav(payload)
                    rms = float(np.sqrt((x * x).mean())) if n else 0.0
                    peak = int(np.abs(x).max()) if n else 0
                    out.append(
                        {
                            "doc_id": doc_id,
                            "sample_rate": sr,
                            "n_samples": n,
                            "duration_s": n / sr if sr else 0.0,
                            "rms": rms,
                            "peak": peak,
                            "error": None,
                        }
                    )
                except Exception as e:  # capture, never abort the batch
                    out.append(
                        {
                            "doc_id": doc_id,
                            "sample_rate": None,
                            "n_samples": None,
                            "duration_s": None,
                            "rms": None,
                            "peak": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(stats, schema=AUDIO_STATS_SCHEMA)


# --- driver-contract projections (hashable frames + DuckDB-twin shapes) ------


# --- mm_ocr_text: bitmap-font render -> real container -> template OCR -------

# 5x7 bitmap font (rows top->bottom, 5-bit patterns, MSB = left column),
# covering the glyphs the op must round-trip: a-z, space, and '?' (the
# fallback every unsupported byte renders as). Classic HD44780-style
# shapes; what matters for OCR correctness is that the patterns are
# DISTINCT (asserted below), the shapes just keep the fixture images
# honest-looking.
_OCR_FONT: dict[str, tuple[int, ...]] = {
    " ": (0b00000, 0b00000, 0b00000, 0b00000, 0b00000, 0b00000, 0b00000),
    "?": (0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0b00000, 0b00100),
    "a": (0b00000, 0b00000, 0b01110, 0b00001, 0b01111, 0b10001, 0b01111),
    "b": (0b10000, 0b10000, 0b10110, 0b11001, 0b10001, 0b10001, 0b11110),
    "c": (0b00000, 0b00000, 0b01110, 0b10000, 0b10000, 0b10000, 0b01110),
    "d": (0b00001, 0b00001, 0b01101, 0b10011, 0b10001, 0b10001, 0b01111),
    "e": (0b00000, 0b00000, 0b01110, 0b10001, 0b11111, 0b10000, 0b01110),
    "f": (0b00110, 0b01001, 0b01000, 0b11100, 0b01000, 0b01000, 0b01000),
    "g": (0b00000, 0b01111, 0b10001, 0b10001, 0b01111, 0b00001, 0b01110),
    "h": (0b10000, 0b10000, 0b10110, 0b11001, 0b10001, 0b10001, 0b10001),
    "i": (0b00100, 0b00000, 0b01100, 0b00100, 0b00100, 0b00100, 0b01110),
    "j": (0b00010, 0b00000, 0b00110, 0b00010, 0b00010, 0b10010, 0b01100),
    "k": (0b10000, 0b10000, 0b10010, 0b10100, 0b11000, 0b10100, 0b10010),
    "l": (0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "m": (0b00000, 0b00000, 0b11010, 0b10101, 0b10101, 0b10001, 0b10001),
    "n": (0b00000, 0b00000, 0b11110, 0b10001, 0b10001, 0b10001, 0b10001),
    "o": (0b00000, 0b00000, 0b01110, 0b10001, 0b10001, 0b10001, 0b01110),
    "p": (0b00000, 0b00000, 0b11110, 0b10001, 0b11110, 0b10000, 0b10000),
    "q": (0b00000, 0b00000, 0b01101, 0b10011, 0b01111, 0b00001, 0b00001),
    "r": (0b00000, 0b00000, 0b10110, 0b11001, 0b10000, 0b10000, 0b10000),
    "s": (0b00000, 0b00000, 0b01110, 0b10000, 0b01110, 0b00001, 0b11110),
    "t": (0b01000, 0b01000, 0b11100, 0b01000, 0b01000, 0b01001, 0b00110),
    "u": (0b00000, 0b00000, 0b10001, 0b10001, 0b10001, 0b10011, 0b01101),
    "v": (0b00000, 0b00000, 0b10001, 0b10001, 0b10001, 0b01010, 0b00100),
    "w": (0b00000, 0b00000, 0b10001, 0b10001, 0b10101, 0b10101, 0b01010),
    "x": (0b00000, 0b00000, 0b10001, 0b01010, 0b00100, 0b01010, 0b10001),
    "y": (0b00000, 0b00000, 0b10001, 0b10001, 0b01111, 0b00001, 0b01110),
    "z": (0b00000, 0b00000, 0b11111, 0b00010, 0b00100, 0b01000, 0b11111),
}


def _ocr_cell_bytes(ch: str) -> bytes:
    """One 8x8 glyph cell: 7 font rows (5 ink columns + 3 blank) + one
    blank separator row; ink = 0xFF, background = 0x00."""
    rows = _OCR_FONT[ch]
    out = bytearray()
    for r in rows:
        for col in range(5):
            out.append(0xFF if (r >> (4 - col)) & 1 else 0x00)
        out += b"\x00\x00\x00"
    out += b"\x00" * 8
    return bytes(out)


def _ocr_tables() -> tuple[str, list[str], "bytes"]:
    """Build (render table, glyph order, glyph matrix bytes): the render
    table is ONE hex literal of 96 cells for bytes 0x20..0x7F (defined
    chars use their glyph, the rest the '?' glyph — same single-constant
    trick as the CRC table), and the matcher's template list is the
    DISTINCT font glyphs in char order."""
    cells = []
    for b in range(0x20, 0x80):
        ch = chr(b)
        cells.append(_ocr_cell_bytes(ch if ch in _OCR_FONT else "?"))
    order = sorted(_OCR_FONT)
    pats = [_ocr_cell_bytes(ch) for ch in order]
    assert len(set(pats)) == len(pats), "OCR font has duplicate glyphs"
    return "".join(c.hex().upper() for c in cells), order, b"".join(pats)


_OCR_TAB_HEX, _OCR_GLYPH_ORDER, _OCR_GLYPH_BYTES = _ocr_tables()

OCR_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("ocr_text", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def ocr_media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render every document's text into a byte-valid BMP with the
    fixed 5x7 bitmap font: one 8x8 glyph cell per character, stacked
    vertically (width 8, height 8 * n_chars) — the BMP builder reused
    verbatim, so both stored row orders are exercised (even doc_ids
    bottom-up, odd top-down). Pure JVM expressions: the glyph table is
    ONE hex literal (96 cells x 128 hex chars) probed by substr per
    byte, the CRC-table trick — no Python in the render.

    BMP-only by measurement: a glyph page's pixel array is 64x the
    text, and the PNG builder's genuine CRC-32/Adler-32 byte folds
    over that are ~200ms/row (104s for 500 rows vs 0.74s as BMP) —
    an SQL-rendered FIXTURE cost, nothing a real pipeline pays. The
    OCR kernel itself decodes PNG pages identically through the shared
    _decode_image (pytest feeds it a Python-built PNG glyph page), and
    the SQL PNG builder stays driver-checked via mm_image_features."""
    par = max(spark.sparkContext.defaultParallelism, 8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(par)
    body = F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
    bts = _hex_byte_arr(F.hex(body))
    pix_hex = F.array_join(
        F.transform(
            bts,
            lambda b: F.substr(
                F.lit(_OCR_TAB_HEX),
                (
                    F.when((b >= 0x20) & (b <= 0x7F), b - 0x20).otherwise(
                        F.lit(0x3F - 0x20)  # '?' cell
                    )
                    * 128
                    + 1
                ).cast("int"),
                F.lit(128),
            ),
        ),
        "",
    )
    blen = (F.size(bts) * 64).cast("long")
    return docs.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        F.unhex(_bmp_hex(pix_hex, blen, F.col("doc_id"))).alias("media"),
    )


def mm_ocr_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCR over the rendered pages: decode the container (the SAME real
    BMP/PNG parsers as mm_image_features — bottom-up row flip, zlib
    inflate, scanline filters), slice the pixel array into 8x8 glyph
    cells, binarize, and template-match each cell against the font —
    vectorized Hamming distance to every glyph, nearest wins (exact
    renders hit distance 0; the matcher degrades gracefully under
    noise, pytest flips pixels to prove it). Recovered text is
    byte-identical to the source for every char the font covers;
    uncovered bytes render as — and therefore read back as — '?'.

    Fills the reference's declared-never-built OCR branch
    (/root/reference/requirements.txt:28-30 pins pytesseract/
    layoutparser with zero call sites): the Spark-side plumbing a real
    OCR stage needs (binary column in, typed text out, one Arrow
    boundary, per-row error capture) is real and value-checked; the
    template matcher stands where a trained recognizer would plug in.

    Scale: one mapInPandas over payloads that never co-shuffle (scan ->
    project), numpy-vectorized per batch; the render side is pure JVM.
    """
    media = ocr_media_from_documents(spark, sf_dir)

    def ocr(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    w, hgt, n_cells, text = ocr_page(payload)
                    out.append(
                        {
                            "doc_id": doc_id,
                            "width": w,
                            "height": hgt,
                            "n_chars": n_cells,
                            "ocr_text": text,
                            "error": None,
                        }
                    )
                except Exception as e:
                    out.append(
                        {
                            "doc_id": doc_id,
                            "width": None,
                            "height": None,
                            "n_chars": None,
                            "ocr_text": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(out)

    return media.select("doc_id", "media").mapInPandas(
        ocr, schema=OCR_TEXT_SCHEMA
    )


def ocr_page(payload: bytes) -> tuple[int, int, int, str]:
    """Decode one glyph page -> (width, height_px, n_chars, text):
    container decode via the shared _decode_image (BMP or PNG),
    8x8 cell slicing, binarize, vectorized Hamming match against every
    font glyph (exact renders hit distance 0, nearest wins otherwise —
    np.argmin's first-hit tie-break is deterministic because the glyph
    list is sorted by char)."""
    import numpy as np

    glyphs = (
        np.frombuffer(_OCR_GLYPH_BYTES, dtype=np.uint8).reshape(
            len(_OCR_GLYPH_ORDER), 64
        )
        >= 128
    )
    chars = np.array(_OCR_GLYPH_ORDER)
    w, hgt, pixels = _decode_image(payload)
    if w != 8:
        raise ValueError(f"OCR page width {w} != 8")
    n_cells = hgt // 8
    if not n_cells:
        return w, hgt, 0, ""
    cells = (
        pixels.reshape(hgt, 8)[: n_cells * 8].reshape(n_cells, 64) >= 128
    )
    dists = (cells[:, None, :] != glyphs[None, :, :]).sum(axis=2)
    return w, hgt, n_cells, "".join(chars[np.argmin(dists, axis=1)])


def mm_ocr_text_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver shape for mm_ocr_text: ints widened to long."""
    df = mm_ocr_text(spark, sf_dir)
    return df.select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_chars").cast("long").alias("n_chars"),
        "ocr_text",
        "error",
    )


def mm_image_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver shape for mm_image_features: the feature array flattened to
    f0..f7 scalar doubles (count/total — exact integers through one IEEE
    division, so DuckDB reproduces each bit), the top-down pixel checksum
    (validates the bottom-up row flip), ints widened to long."""
    df = mm_image_features(spark, sf_dir)
    return df.select(
        "doc_id",
        "media_type",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "n_bytes",
        *[F.col("features")[i].alias(f"f{i}") for i in range(N_FEATURE_BINS)],
        "pixel_checksum",
        "error",
    )


def mm_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver shape for mm_frame_sample: checksums (exact ints) joined to
    one comparable string, ints widened to long."""
    df = mm_frame_sample(spark, sf_dir)
    return df.select(
        "doc_id",
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("n_sampled").cast("long").alias("n_sampled"),
        F.array_join(
            F.transform("frame_checksums", lambda c: c.cast("string")), ","
        ).alias("frame_checksums"),
        "error",
    )


def mm_audio_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver shape for mm_audio_stats: all-scalar already; ints widened
    to long (DuckDB emits BIGINT)."""
    df = mm_audio_stats(spark, sf_dir)
    return df.select(
        "doc_id",
        F.col("sample_rate").cast("long").alias("sample_rate"),
        F.col("n_samples").cast("long").alias("n_samples"),
        "duration_s",
        "rms",
        F.col("peak").cast("long").alias("peak"),
        "error",
    )


# --- video scene-cut detection -----------------------------------------------

SCENE_CUT_THR = 2000  # SAD over a 64-px frame pair; ~p95 of natural
# frame-to-frame motion on the synthetic corpus (measured at sf0.001:
# median 1828, p95 2114 — the threshold marks genuine discontinuities,
# 62/166 video docs fire, 16.6% of boundaries)

SCENE_CUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_cuts", T.IntegerType()),
        T.StructField("cut_frames", T.ArrayType(T.LongType())),
        T.StructField("max_sad", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def mm_video_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over the Y4M frame walk — the shot-boundary
    pass every video-curation pipeline runs before frame sampling
    (sampling within a shot is redundant; PySceneDetect's
    ContentDetector is this exact frame-difference rule): per adjacent
    frame pair, the sum of absolute pixel differences (SAD, int16
    numpy so uint8 wrap can't fold differences), a cut recorded at
    frame f+1 when SAD > SCENE_CUT_THR.

    Same fused mapInPandas shape as the other mm decoders (one Python
    boundary, Arrow batches, errors captured per row, never aborting
    the batch); the DuckDB twin reconstructs every SAD from
    hex(encode(text)) arithmetic over the same 64-byte frame slices
    the container carries, so the hash pins the decoder AND the
    detector. Scale: scan-side per-doc work, no shuffle; state is one
    frame pair at a time.
    """
    media = media_from_documents(spark, sf_dir).filter(
        F.col("media_type") == "video"
    )

    def cuts(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    _w, _h, frames = _decode_y4m(payload)
                    sads = [
                        int(
                            np.abs(
                                frames[f + 1].astype(np.int16)
                                - frames[f].astype(np.int16)
                            ).sum()
                        )
                        for f in range(len(frames) - 1)
                    ]
                    cut_frames = [
                        f + 1
                        for f, s in enumerate(sads)
                        if s > SCENE_CUT_THR
                    ]
                    out.append(
                        {
                            "doc_id": doc_id,
                            "n_frames": len(frames),
                            "n_cuts": len(cut_frames),
                            "cut_frames": cut_frames,
                            "max_sad": max(sads) if sads else 0,
                            "error": None,
                        }
                    )
                except Exception as e:  # capture, never abort the batch
                    out.append(
                        {
                            "doc_id": doc_id,
                            "n_frames": None,
                            "n_cuts": None,
                            "cut_frames": None,
                            "max_sad": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(cuts, schema=SCENE_CUT_SCHEMA)


def mm_video_scene_cut_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver shape for mm_video_scene_cut: cut-frame list joined to one
    comparable string, ints widened to long."""
    df = mm_video_scene_cut(spark, sf_dir)
    return df.select(
        "doc_id",
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("n_cuts").cast("long").alias("n_cuts"),
        F.array_join(
            F.transform("cut_frames", lambda c: c.cast("string")), ","
        ).alias("cut_frames"),
        "max_sad",
        "error",
    )


# --- audio activity segmentation (energy VAD) --------------------------------

VAD_WIN = 64  # samples per analysis window
VAD_THR = 135_000  # window energy sum((x-128)^2); measured at sf0.001:
# median 127k, p95 144k — 23% of windows active, 95/167 docs carry BOTH
# states and 30 split into >= 2 segments, so every branch of the
# segmenter is exercised

VAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_windows", T.IntegerType()),
        T.StructField("n_active", T.IntegerType()),
        T.StructField("n_segments", T.IntegerType()),
        T.StructField("active_frac_e6", T.LongType()),
        T.StructField("max_energy", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def mm_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-threshold activity detection over the WAV PCM — the VAD
    pass audio curation runs before ASR (webrtcvad/silero's job in its
    classical energy form; the audio twin of mm_video_scene_cut's
    frame rule): the decoded u8 signal splits into VAD_WIN-sample
    windows, a window is ACTIVE when its centered energy
    sum((x−128)²) exceeds VAD_THR, and maximal runs of active windows
    are the speech segments an ASR stage would transcribe.

    All integer: energies are exact BIGINT sums, the active fraction
    is a truncating e6 division on non-negative operands, and the
    segment count is the boundary count (active[f] AND NOT
    active[f−1]) — so the DuckDB twin replays the whole rule from
    hex(encode(text)) byte arithmetic. Same fused mapInPandas shape,
    per-row error capture. Scale: scan-side, no shuffle, O(window)
    state.
    """
    media = media_from_documents(spark, sf_dir).filter(
        F.col("media_type") == "audio"
    )

    def vad(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    # _decode_wav already centers u8 PCM at 0 (x−128 as
                    # float64 of exact integers); int64 cast is lossless
                    _sr, n, x = _decode_wav(payload)
                    n_win = n // VAD_WIN
                    c = x[: n_win * VAD_WIN].astype(np.int64)
                    en = (
                        (c * c).reshape(n_win, VAD_WIN).sum(axis=1)
                        if n_win
                        else np.zeros(0, dtype=np.int64)
                    )
                    act = en > VAD_THR
                    n_active = int(act.sum())
                    n_seg = int(
                        (act & ~np.concatenate(([False], act[:-1]))).sum()
                    )
                    out.append(
                        {
                            "doc_id": doc_id,
                            "n_windows": n_win,
                            "n_active": n_active,
                            "n_segments": n_seg,
                            "active_frac_e6": (
                                (1_000_000 * n_active) // n_win
                                if n_win
                                else 0
                            ),
                            "max_energy": int(en.max()) if n_win else 0,
                            "error": None,
                        }
                    )
                except Exception as e:  # capture, never abort the batch
                    out.append(
                        {
                            "doc_id": doc_id,
                            "n_windows": None,
                            "n_active": None,
                            "n_segments": None,
                            "active_frac_e6": None,
                            "max_energy": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(vad, schema=VAD_SCHEMA)


def mm_audio_vad_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver shape for mm_audio_vad: ints widened to long."""
    df = mm_audio_vad(spark, sf_dir)
    return df.select(
        "doc_id",
        F.col("n_windows").cast("long").alias("n_windows"),
        F.col("n_active").cast("long").alias("n_active"),
        F.col("n_segments").cast("long").alias("n_segments"),
        "active_frac_e6",
        "max_energy",
        "error",
    )
