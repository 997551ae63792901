"""Multimodal plumbing: schema, determinism, error capture."""

import pytest

SF = "/root/testdata/sf0.001"


def test_media_source_partitions_of_modality(spark):
    from ai_ocr_spark.operators.multimodal import media_from_documents

    media = media_from_documents(spark, SF).toPandas()
    assert set(media["media_type"]) == {"image", "audio", "video"}
    # headers are self-describing
    for _, r in media.head(12).iterrows():
        tag = bytes(r["media"])[:4].decode()
        assert tag == {"image": "IMG1", "audio": "AUD1", "video": "VID1"}[
            r["media_type"]
        ]


def test_image_features_deterministic_and_normalized(spark):
    from ai_ocr_spark.operators.multimodal import mm_image_features

    a = mm_image_features(spark, SF).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = mm_image_features(spark, SF).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a["error"].isna().all()
    assert list(a["doc_id"]) == list(b["doc_id"])
    for fa, fb in zip(a["features"], b["features"]):
        assert list(fa) == list(fb)
        assert abs(sum(fa) - 1.0) < 1e-9 or sum(fa) == 0.0
    assert (a["width"] >= 64).all() and (a["height"] >= 48).all()


def test_frame_sampling_counts(spark):
    from ai_ocr_spark.operators.multimodal import mm_frame_sample

    out = mm_frame_sample(spark, SF).toPandas()
    assert (out["n_sampled"] == (out["n_frames"] + 3) // 4).all()
    for cs in out["frame_checksums"]:
        assert all(0 <= c < 65536 for c in cs)


def test_real_codec_magic_raises_not_implemented():
    from ai_ocr_spark.operators.multimodal import _decode_header

    with pytest.raises(NotImplementedError):
        _decode_header(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        _decode_header(b"\xff\xd8\xff\xe0JFIF")


def test_malformed_header_is_captured_not_fatal():
    from ai_ocr_spark.operators.multimodal import _decode_header

    # missing ';' after the count must raise cleanly (captured per-row by
    # the operators' except blocks), never garbage-parse
    with pytest.raises(ValueError):
        _decode_header(b"VID1;12")  # no trailing ';'
    with pytest.raises(ValueError):
        _decode_header(b"AUD1;16000")  # second field unterminated


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
    assert (a["sample_rate"] == 16000).all()
    assert (a["rms"] >= 0).all()
    assert ((a["peak"] >= 0) & (a["peak"] <= 128)).all()
