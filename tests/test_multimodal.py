"""Multimodal over real containers: byte-valid BMP/WAV/Y4M from the
source, real header parsers on the decode side, codec boundary pinned."""

import struct

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _bmp(width, height, pixels, bottom_up=True):
    """Hand-rolled 8bpp BMP fixture (independent of the Spark source):
    pixels given TOP-DOWN row-major; storage order per bottom_up."""
    stride = (width + 3) & ~3
    rows = [
        bytes(pixels[r * width : (r + 1) * width]).ljust(stride, b"\x00")
        for r in range(height)
    ]
    if bottom_up:
        rows = rows[::-1]
    palette = b"".join(bytes([i, i, i, 0]) for i in range(256))
    off = 14 + 40 + 1024
    body = b"".join(rows)
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40,
        width,
        height if bottom_up else -height,
        1,
        8,
        0,
        len(body),
        2835,
        2835,
        256,
        0,
    )
    return hdr + dib + palette + body


def test_media_source_emits_byte_valid_containers(spark):
    from ai_ocr_spark.operators.multimodal import media_from_documents

    import zlib

    media = media_from_documents(spark, SF).toPandas()
    assert set(media["media_type"]) == {"image", "audio", "video"}
    n_png = 0
    for _, r in media.iterrows():
        b = bytes(r["media"])
        if r["media_type"] == "image" and r["doc_id"] % 9 == 0:
            # real PNG: signature, chunk CRCs verified against zlib.crc32,
            # IDAT inflates (zlib checks the Adler-32 trailer itself)
            n_png += 1
            assert b[:8] == b"\x89PNG\r\n\x1a\n"
            pos, kinds = 8, []
            while pos + 8 <= len(b):
                (ln,) = struct.unpack_from(">I", b, pos)
                ctype, data = b[pos + 4 : pos + 8], b[pos + 8 : pos + 8 + ln]
                (crc,) = struct.unpack_from(">I", b, pos + 8 + ln)
                assert crc == zlib.crc32(ctype + data), ctype
                kinds.append(ctype)
                if ctype == b"IDAT":
                    zlib.decompress(data)
                pos += 12 + ln
            assert pos == len(b) and kinds == [b"IHDR", b"IDAT", b"IEND"]
        elif r["media_type"] == "image":
            assert b[:2] == b"BM"
            (off,) = struct.unpack_from("<I", b, 10)
            assert off == 1078  # file header + DIB + 256-entry palette
        elif r["media_type"] == "audio":
            assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
            # the junk LIST chunk must be present (chunk-walk is forced)
            assert b"LIST" in b[:64]
        else:
            assert b.startswith(b"YUV4MPEG2 W8 H8")
    assert n_png > 0  # the PNG family is actually exercised


def test_bmp_decoder_flips_bottom_up_and_strips_stride():
    from ai_ocr_spark.operators.multimodal import _decode_bmp

    pix = list(range(30))  # width 6 -> stride 8, 5 rows
    for bu in (True, False):
        w, h, got = _decode_bmp(_bmp(6, 5, pix, bottom_up=bu))
        assert (w, h) == (6, 5)
        assert got.tolist() == pix  # top-down regardless of storage


def test_wav_decoder_walks_chunks_and_supports_s16():
    from ai_ocr_spark.operators.multimodal import _decode_wav

    samples = np.array([-300, 0, 300, 1000], dtype="<i2")
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc"  # odd size -> pad byte
    data = samples.tobytes()
    wav = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 3 + 1 + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + junk
        + b"\x00"  # word-alignment pad after the odd-sized chunk
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    sr, n, x = _decode_wav(wav)
    assert (sr, n) == (8000, 4)
    assert x.tolist() == [-300.0, 0.0, 300.0, 1000.0]


def test_y4m_decoder_discovers_frames_and_sizes_colorspaces():
    from ai_ocr_spark.operators.multimodal import _decode_y4m

    # C420: frame = 4*2*3/2 = 12 bytes; 2 frames, second with a param
    hdr = b"YUV4MPEG2 W4 H2 F30:1 C420\n"
    f0, f1 = bytes(range(12)), bytes(range(100, 112))
    y4m = hdr + b"FRAME\n" + f0 + b"FRAME Xparam\n" + f1
    w, h, frames = _decode_y4m(y4m)
    assert (w, h, len(frames)) == (4, 2, 2)
    assert frames[0].tolist() == list(f0)
    assert frames[1].tolist() == list(f1)
    with pytest.raises(ValueError):
        _decode_y4m(hdr + b"FRAME\n" + f0[:5])  # truncated plane


def test_real_codec_magic_raises_not_implemented():
    from ai_ocr_spark.operators.multimodal import (
        _decode_bmp,
        _decode_image,
        _decode_wav,
        _decode_y4m,
    )

    with pytest.raises(NotImplementedError):  # GIF still needs a codec
        _decode_image(b"GIF89a..........")
    with pytest.raises(NotImplementedError):
        _decode_wav(b"\xff\xd8\xff\xe0JFIF....")
    with pytest.raises(NotImplementedError):  # RIFF form that isn't WAVE
        _decode_wav(b"RIFF\x10\x00\x00\x00AVI LIST....")
    with pytest.raises(NotImplementedError):  # ISO-BMFF ftyp box
        _decode_y4m(b"\x00\x00\x00\x18ftypmp42....")
    with pytest.raises(NotImplementedError):  # 24bpp needs conversion
        bad = bytearray(_bmp(6, 5, list(range(30))))
        bad[28] = 24
        _decode_bmp(bytes(bad))


def test_malformed_container_is_a_value_error():
    from ai_ocr_spark.operators.multimodal import _decode_bmp, _decode_wav

    with pytest.raises(ValueError):
        _decode_bmp(b"BMshort")
    with pytest.raises(ValueError):
        _decode_bmp(_bmp(6, 5, list(range(30)))[:-4])  # truncated pixels
    with pytest.raises(ValueError):
        _decode_wav(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data chunks


def test_image_features_deterministic_and_normalized(spark):
    from ai_ocr_spark.operators.multimodal import mm_image_features

    a = mm_image_features(spark, SF).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = mm_image_features(spark, SF).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a["error"].isna().all()
    assert list(a["doc_id"]) == list(b["doc_id"])
    for fa, fb in zip(a["features"], b["features"]):
        assert list(fa) == list(fb)
        assert abs(sum(fa) - 1.0) < 1e-9
    assert (a["width"] == 8).all() and (a["height"] >= 1).all()
    assert (a["n_bytes"] == a["height"] * 8).all()
    assert list(a["pixel_checksum"]) == list(b["pixel_checksum"])


def test_image_checksum_is_storage_order_invariant(spark):
    """Even doc_ids store bottom-up, odd top-down; the decoded top-down
    checksum must be a pure function of the text bytes either way —
    verified by recomputing from the documents table directly."""
    import pandas as pd

    from ai_ocr_spark.operators.multimodal import (
        _CHECKSUM_MOD,
        mm_image_features,
    )

    got = mm_image_features(spark, SF).toPandas().set_index("doc_id")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter("doc_id % 3 = 0")
        .select("doc_id", "text")
        .toPandas()
    )
    for _, row in docs.head(20).iterrows():
        body = (row["text"] or "").encode("utf-8") if pd.notna(row["text"]) else b""
        hgt = max(1, len(body) // 8)
        pix = body[: hgt * 8].ljust(hgt * 8, b"\x00")
        want = sum((i + 1) * p for i, p in enumerate(pix)) % _CHECKSUM_MOD
        assert got.loc[row["doc_id"], "pixel_checksum"] == want


def test_frame_sampling_counts(spark):
    from ai_ocr_spark.operators.multimodal import mm_frame_sample

    out = mm_frame_sample(spark, SF).toPandas()
    assert out["error"].isna().all()
    assert (out["n_sampled"] == (out["n_frames"] + 3) // 4).all()
    for cs in out["frame_checksums"]:
        assert all(0 <= c < 65536 for c in cs)


def test_q_projections_match_base_ops(spark):
    from ai_ocr_spark.operators.multimodal import (
        mm_frame_sample_q,
        mm_image_features,
        mm_image_features_q,
    )

    base = mm_image_features(spark, SF).toPandas().sort_values("doc_id")
    q = mm_image_features_q(spark, SF).toPandas().sort_values("doc_id")
    assert list(base["doc_id"]) == list(q["doc_id"])
    for feats, row in zip(base["features"], q.itertuples()):
        assert list(feats) == [getattr(row, f"f{i}") for i in range(8)]
    fq = mm_frame_sample_q(spark, SF).toPandas()
    assert fq["error"].isna().all()
    assert (fq["frame_checksums"].str.count(",") + 1 >= fq["n_sampled"].clip(lower=1)).all()


def test_audio_stats_deterministic(spark):
    from ai_ocr_spark.operators.multimodal import mm_audio_stats

    a = mm_audio_stats(spark, SF).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = mm_audio_stats(spark, SF).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert a["error"].isna().all()
    assert (a["sample_rate"] == 16000).all()
    assert (a["rms"] >= 0).all()
    assert ((a["peak"] >= 0) & (a["peak"] <= 128)).all()


def _png(width, height, pixels, filters):
    """Hand-rolled grayscale-8 PNG fixture with a CHOSEN filter type per
    row (real compressed deflate, unlike the source's stored blocks) —
    independent of the Spark source."""
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    rows = [
        pixels[r * width : (r + 1) * width] for r in range(height)
    ]
    prev = [0] * width
    raw = b""
    for r, row in enumerate(rows):
        f = filters[r % len(filters)]
        if f == 0:
            enc = row[:]
        elif f == 1:
            enc = [(row[x] - (row[x - 1] if x else 0)) & 0xFF for x in range(width)]
        elif f == 2:
            enc = [(row[x] - prev[x]) & 0xFF for x in range(width)]
        elif f == 3:
            enc = [
                (row[x] - (((row[x - 1] if x else 0) + prev[x]) >> 1)) & 0xFF
                for x in range(width)
            ]
        else:  # Paeth
            enc = []
            for x in range(width):
                a = row[x - 1] if x else 0
                b, c = prev[x], (prev[x - 1] if x else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc.append((row[x] - pred) & 0xFF)
        raw += bytes([f]) + bytes(enc)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_reconstructs_all_five_filters():
    from ai_ocr_spark.operators.multimodal import _decode_png

    pixels = [(7 * i * i + 3 * i) % 256 for i in range(6 * 5)]
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        w, h, got = _decode_png(_png(6, 5, pixels, filters))
        assert (w, h) == (6, 5)
        assert got.tolist() == pixels, f"filters={filters}"


def test_png_codec_boundary():
    import zlib

    from ai_ocr_spark.operators.multimodal import _decode_png

    def with_ihdr(color=0, depth=8, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 4, 1, depth, color, 0, 0, interlace)
        crc = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + crc
        )

    with pytest.raises(NotImplementedError):  # RGB truecolor
        _decode_png(with_ihdr(color=2))
    with pytest.raises(NotImplementedError):  # 1-bit depth
        _decode_png(with_ihdr(depth=1))
    with pytest.raises(NotImplementedError):  # Adam7
        _decode_png(with_ihdr(interlace=1))
    with pytest.raises(ValueError):  # bad signature
        _decode_png(b"\x89PNX\r\n\x1a\n")
    with pytest.raises(ValueError):  # missing scanline data
        _decode_png(with_ihdr())


def test_png_multiblock_stored_deflate(spark, tmp_path):
    """A document large enough for >2 stored-DEFLATE blocks still emits
    a spec-valid PNG (chunk CRCs, zlib inflate incl. the Adler trailer,
    IDAT length accounting for per-block headers) and round-trips
    through the decoder — the corpus never exercises nblk > 1, so this
    fixture pins the chunking, the BFINAL flag and the 5*nblk length
    term."""
    import os
    import zlib

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_ocr_spark.operators.multimodal import (
        _PNG_BLOCK,
        _decode_png,
        media_from_documents,
    )

    long_text = ("lorem ipsum dolor sit amet " * 1500)[:40000]  # ~45 KB raw
    df = pd.DataFrame(
        {
            "doc_id": [0],
            "text": [long_text],
            "lang": ["en"],
            "source": ["big"],
            "n_chars": [len(long_text)],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df), os.path.join(tmp_path, "documents.parquet")
    )
    b = bytes(
        media_from_documents(spark, str(tmp_path)).collect()[0]["media"]
    )
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, []
    while pos + 8 <= len(b):
        (ln,) = struct.unpack_from(">I", b, pos)
        ctype, data = b[pos + 4 : pos + 8], b[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", b, pos + 8 + ln)
        assert crc == zlib.crc32(ctype + data), ctype
        chunks.append((ctype, data))
        pos += 12 + ln
    assert pos == len(b) and [c for c, _ in chunks] == [
        b"IHDR",
        b"IDAT",
        b"IEND",
    ]
    raw = zlib.decompress(chunks[1][1])  # verifies Adler-32 too
    hgt = max(1, len(long_text.encode()) // 8)
    assert len(raw) == hgt * 9
    assert (len(raw) + _PNG_BLOCK - 1) // _PNG_BLOCK >= 3  # really multi-block
    w, h, pix = _decode_png(b)
    want = long_text.encode()[: hgt * 8]
    assert (w, h) == (8, hgt) and bytes(pix[: len(want)]) == want


def _glyph_pixels(text):
    from ai_ocr_spark.operators.multimodal import _OCR_FONT, _ocr_cell_bytes

    return b"".join(
        _ocr_cell_bytes(ch if ch in _OCR_FONT else "?") for ch in text
    )


def test_ocr_roundtrip_spark_source(spark):
    """Full loop over the corpus: JVM-rendered glyph BMPs (both row
    orders) decode back to the exact source text — byte identity, the
    reference's OCR contract."""
    from ai_ocr_spark.operators.multimodal import mm_ocr_text

    out = mm_ocr_text(spark, SF).toPandas().set_index("doc_id")
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    assert out["error"].isna().all()
    for _, d in docs.iterrows():
        r = out.loc[d["doc_id"]]
        import re

        expect = re.sub(r"[^a-z ?]", "?", d["text"] or "")
        assert r["ocr_text"].encode() == expect.encode(), d["doc_id"]
        assert r["n_chars"] == len(expect)
        assert r["width"] == 8 and r["height"] == 8 * max(1, len(expect)) or (
            len(expect) == 0 and r["height"] == 1
        )


def test_ocr_kernel_reads_png_glyph_pages():
    """The OCR kernel is container-agnostic: a Python-built PNG glyph
    page (real zlib stream + CRCs, independent of the SQL builder)
    recovers the same text — covers the PNG leg the SQL source skips
    by measurement (see ocr_media_from_documents docstring)."""
    import zlib

    from ai_ocr_spark.operators.multimodal import ocr_page

    text = "the quick brown fox jumps over a lazy dog"
    pix = _glyph_pixels(text)
    height = len(text) * 8
    raw = b"".join(
        b"\x00" + pix[r * 8 : (r + 1) * 8] for r in range(height)
    )
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, height, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))  # real deflate, not stored
        + chunk(b"IEND", b"")
    )
    w, hgt, n, got = ocr_page(png)
    assert (w, hgt, n) == (8, height, len(text))
    assert got == text


def test_ocr_matcher_tolerates_pixel_noise():
    """Template matching, not byte plumbing: flipping up to 2 pixels of
    a rendered glyph still recovers the right char via nearest-Hamming
    (the font's minimum pairwise distance is > 4)."""
    from ai_ocr_spark.operators.multimodal import (
        _OCR_FONT,
        ocr_page,
    )

    pix = bytearray(_glyph_pixels("ocr"))
    pix[3] ^= 0xFF  # flip a pixel in 'o'
    pix[64 + 9] ^= 0xFF  # and one in 'c'
    pix[128 + 17] ^= 0xFF  # and one in 'r'
    bmp = _bmp(8, 24, bytes(pix), bottom_up=True)
    _, _, _, got = ocr_page(bmp)
    assert got == "ocr"
    # and the font genuinely separates glyphs: min pairwise Hamming >= 3
    # (a single flipped pixel sits at distance 1 from the true glyph and
    # >= 2 from every other, so nearest-match corrects it)
    cells = {ch: np.frombuffer(_glyph_pixels(ch), dtype=np.uint8) >= 128
             for ch in _OCR_FONT}
    keys = sorted(cells)
    dmin = min(
        (cells[a] != cells[b]).sum()
        for i, a in enumerate(keys)
        for b in keys[i + 1 :]
    )
    assert dmin >= 3, dmin


def test_image_ahash_buckets_and_independent_recompute(spark):
    """mm_image_ahash covers every image doc, its bucket columns are
    self-consistent (canonical = bucket min, is_dup iff a non-canonical
    member of a >1 bucket), near-identical renders actually collapse
    (the fixture's duplicated texts produce shared hashes), and the
    hash itself matches an independent numpy recompute from the source
    text (pixel array = utf-8 bytes truncated to whole rows, padded to
    one row — the same fixture identity the other mm oracles use)."""
    from ai_ocr_spark.operators.multimodal import (
        _BMP_W,
        _ahash_bits,
        mm_image_ahash,
    )

    out = mm_image_ahash(spark, SF).toPandas()
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter("doc_id % 3 = 0")
        .select("doc_id", "text")
        .toPandas()
    )
    assert set(out["doc_id"]) == set(docs["doc_id"])
    assert out["doc_id"].is_unique

    by_hash = out.groupby("ahash")
    for _, grp in by_hash:
        assert (grp["n_copies"] == len(grp)).all()
        assert (grp["canonical_doc_id"] == grp["doc_id"].min()).all()
    assert (
        out["is_dup"]
        == ((out["n_copies"] > 1) & (out["doc_id"] != out["canonical_doc_id"]))
    ).all()
    # the near-dup path fires on the fixture
    assert (out["n_copies"] > 1).any()

    text_of = dict(zip(docs["doc_id"], docs["text"]))
    hash_of = dict(zip(out["doc_id"], out["ahash"]))
    for doc_id in sorted(text_of)[:5] + sorted(text_of)[-5:]:
        body = (text_of[doc_id] or "").encode("utf-8")
        n_pix = max(1, len(body) // _BMP_W) * _BMP_W
        pix = np.frombuffer(
            (body + b"\x00" * _BMP_W)[:n_pix], dtype=np.uint8
        )
        assert hash_of[doc_id] == _ahash_bits(pix), doc_id
