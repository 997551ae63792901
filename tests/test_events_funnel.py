"""events_funnel invariants: an independent Python replay of the
windowed strictly-ordered funnel must match the report exactly, the
funnel must genuinely decay (the measured window makes the constraint
bite — the unbounded variant degenerates to everyone-converts on this
event density), and no step may be empty."""

import datetime

SF = "/root/testdata/sf0.001"


def _python_funnel(spark):
    from ai_ocr_spark.operators.relational import (
        FUNNEL_STEPS,
        FUNNEL_WINDOW_MIN,
    )

    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    total = len(by_user)
    w = datetime.timedelta(minutes=FUNNEL_WINDOW_MIN)
    survivors = {u: None for u in by_user}  # user -> cutoff ts
    counts = []
    for step in FUNNEL_STEPS:
        nxt = {}
        for u, cut in survivors.items():
            cand = [
                ts
                for ts, et in by_user[u]
                if et == step
                and (cut is None or (ts > cut and ts <= cut + w))
            ]
            if cand:
                nxt[u] = min(cand)
        survivors = nxt
        counts.append(len(nxt))
    report, prev = [], total
    for i, (s, n) in enumerate(zip(FUNNEL_STEPS, counts), start=1):
        report.append(
            (
                i,
                s,
                n,
                (1_000_000 * n) // prev if prev else 0,
                (1_000_000 * n) // total if total else 0,
            )
        )
        prev = n
    return report, by_user


def test_funnel_matches_python_and_decays(spark):
    from ai_ocr_spark.operators.relational import FUNNEL_STEPS, events_funnel

    expected, by_user = _python_funnel(spark)
    got = [
        (r.step, r.event_type, r.n_users, r.conv_prev_e6, r.conv_entry_e6)
        for r in events_funnel(spark, SF).orderBy("step").collect()
    ]
    assert got == expected
    ns = [r[2] for r in got]
    assert ns == sorted(ns, reverse=True), ns
    assert ns[-1] > 0, "final step empty — vacuous fixture"
    # the window must BITE: every user holds every step's event type
    # somewhere in their history, so without the time bound the funnel
    # would be flat — the decay is the windowed semantics at work
    from ai_ocr_spark.operators.relational import FUNNEL_STEPS as STEPS

    all_types = sum(
        1
        for evs in by_user.values()
        if all(any(et == s for _, et in evs) for s in STEPS)
    )
    assert ns[1] < all_types, (ns, all_types)


def test_retention_matches_python_and_week0_is_full(spark):
    from ai_ocr_spark.operators.relational import events_retention

    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts")
        .collect()
    )
    first, weeks = {}, {}
    for r in rows:
        d = r.ts.date()
        monday = d - datetime.timedelta(days=d.weekday())
        weeks.setdefault(r.user_id, set()).add(monday)
        if r.user_id not in first or monday < first[r.user_id]:
            first[r.user_id] = min(first.get(r.user_id, monday), monday)
    cells = {}
    for u, ws in weeks.items():
        for w in ws:
            off = (w - first[u]).days // 7
            key = (str(first[u]), off)
            cells[key] = cells.get(key, 0) + 1
    sizes = {c: n for (c, off), n in cells.items() if off == 0}
    expected = {
        (c, off): (n, sizes[c], (1_000_000 * n) // sizes[c])
        for (c, off), n in cells.items()
    }
    got = {
        (r.cohort_week, r.week_offset): (
            r.n_active,
            r.cohort_size,
            r.retention_e6,
        )
        for r in events_retention(spark, SF).collect()
    }
    assert got == expected
    assert got, "empty retention matrix — vacuous"
    for (c, off), (n, size, ret) in got.items():
        assert off >= 0 and n <= size
        if off == 0:
            assert ret == 1_000_000, (c, ret)


def test_markov_matches_python_and_rows_normalize(spark):
    from ai_ocr_spark.operators.relational import events_markov_transitions

    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_id", "event_type", "ts")
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, r.event_type)
        )
    pairs = {}
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    totals = {}
    for (a, _), n in pairs.items():
        totals[a] = totals.get(a, 0) + n
    expected = {
        (a, b): (n, totals[a], (1_000_000 * n) // totals[a])
        for (a, b), n in pairs.items()
    }
    got = {
        (r.prev_type, r.next_type): (r.n, r.row_total, r.p_e6)
        for r in events_markov_transitions(spark, SF).collect()
    }
    assert got == expected
    assert got, "empty transition matrix — vacuous"
    # each row's probabilities sum to ~1e6 (truncation loses < |types|)
    by_row = {}
    for (a, _), (_, _, p) in got.items():
        by_row[a] = by_row.get(a, 0) + p
    for a, s in by_row.items():
        assert 1_000_000 - 10 <= s <= 1_000_000, (a, s)
