"""mm_video_scene_cut invariants: an independent Python recompute of
the frame walk + SAD + threshold rule over the raw utf-8 text bytes
must match every row, the measured threshold must be meaningful (some
docs fire, some don't), and the error lane stays empty on the
by-construction-valid containers."""

SF = "/root/testdata/sf0.001"


def test_scene_cut_matches_python_and_threshold_is_meaningful(spark):
    from ai_ocr_spark.operators.multimodal import (
        SCENE_CUT_THR,
        mm_video_scene_cut_q,
    )

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter("doc_id % 3 = 2")
        .select("doc_id", "text")
        .collect()
    )
    expected = {}
    for r in rows:
        b = (r.text or "").encode("utf-8")
        n_frames = len(b) // 64
        sads = [
            sum(
                abs(x - y)
                for x, y in zip(
                    b[64 * f : 64 * f + 64], b[64 * (f + 1) : 64 * (f + 1) + 64]
                )
            )
            for f in range(n_frames - 1)
        ]
        cut = [f + 1 for f, s in enumerate(sads) if s > SCENE_CUT_THR]
        expected[r.doc_id] = (
            n_frames,
            len(cut),
            ",".join(str(c) for c in cut),
            max(sads) if sads else 0,
            None,
        )

    got = {
        r.doc_id: (r.n_frames, r.n_cuts, r.cut_frames, r.max_sad, r.error)
        for r in mm_video_scene_cut_q(spark, SF).collect()
    }
    assert got == expected
    assert got, "no video docs — vacuous"
    fired = sum(1 for v in got.values() if v[1] > 0)
    assert 0 < fired < len(got), (
        "threshold degenerate: fired on "
        f"{fired}/{len(got)} docs"
    )
