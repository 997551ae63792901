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


def test_audio_vad_matches_python_and_threshold_is_meaningful(spark):
    from ai_ocr_spark.operators.multimodal import (
        VAD_THR,
        VAD_WIN,
        mm_audio_vad_q,
    )

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter("doc_id % 3 = 1")
        .select("doc_id", "text")
        .collect()
    )
    expected = {}
    for r in rows:
        b = (r.text or "").encode("utf-8")
        n_win = len(b) // VAD_WIN
        ens = [
            sum((x - 128) * (x - 128) for x in b[VAD_WIN * w : VAD_WIN * (w + 1)])
            for w in range(n_win)
        ]
        act = [e > VAD_THR for e in ens]
        n_active = sum(act)
        n_seg = sum(
            1 for i, a in enumerate(act) if a and (i == 0 or not act[i - 1])
        )
        expected[r.doc_id] = (
            n_win,
            n_active,
            n_seg,
            (1_000_000 * n_active) // n_win if n_win else 0,
            max(ens) if ens else 0,
            None,
        )

    got = {
        r.doc_id: (
            r.n_windows,
            r.n_active,
            r.n_segments,
            r.active_frac_e6,
            r.max_energy,
            r.error,
        )
        for r in mm_audio_vad_q(spark, SF).collect()
    }
    assert got == expected
    assert got, "no audio docs — vacuous"
    active_docs = sum(1 for v in got.values() if v[1] > 0)
    multi_seg = sum(1 for v in got.values() if v[2] >= 2)
    assert 0 < active_docs < len(got), active_docs
    assert multi_seg > 0, "no doc splits into >= 2 segments"
