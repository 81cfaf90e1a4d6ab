"""Late round-5 pipeline operators: CDC snapshot diff, compaction bin
packing, Markov transition mining, canonical-URL dedup.

Same contract as test_quality_ops.py: each operator gets a semantics test
against an independent pure-Python reference or hand-built expectation
(NOT the DuckDB oracle — scripts/check_oracle.py grades that), plus a
physical-plan assertion for its scale claim."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(autouse=True)
def _clean_cache(spark):
    spark.catalog.clearCache()
    yield


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def n_nodes(p: str, name: str) -> int:
    return p.count(f"{name} (")


# ---------------------------------------------------------------------------
# cdc_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k bigint, price double, status string")


def test_cdc_diff_classifies_all_three_ops_and_null_transitions(spark):
    from apmbackend_spark.operators.cdc import cdc_diff

    old = _snap(
        spark,
        [
            (1, 10.0, "A"),  # unchanged -> dropped
            (2, 10.0, "A"),  # price change -> update
            (3, 10.0, "A"),  # deleted
            (4, None, "A"),  # NULL -> value: update (null-safe compare)
            (5, 10.0, None),  # NULL status unchanged -> dropped
            (6, 10.0, "A"),  # value -> NULL: update
        ],
    )
    new = _snap(
        spark,
        [
            (1, 10.0, "A"),
            (2, 11.0, "A"),
            (4, 7.0, "A"),
            (5, 10.0, None),
            (6, None, "A"),
            (7, 1.0, "Z"),  # inserted
        ],
    )
    out = cdc_diff(old, new, "k", ("price", "status"))
    got = {r["k"]: r.asDict() for r in out.collect()}
    assert set(got) == {2, 3, 4, 6, 7}
    assert got[2]["op"] == "update" and got[2]["price_new"] == 11.0
    assert got[3]["op"] == "delete" and got[3]["price_new"] is None
    assert got[4]["op"] == "update" and got[4]["price_old"] is None
    assert got[6]["op"] == "update" and got[6]["price_new"] is None
    assert got[7]["op"] == "insert" and got[7]["price_old"] is None


def test_cdc_orders_one_join_pruned_scans_no_python(spark):
    from apmbackend_spark.operators.cdc import cdc_orders
    from apmbackend_spark.sources.loaders import load_table

    df = cdc_orders(load_table(spark, SF_SMOKE, "orders"))
    p = plan(df)
    # exactly one join — the full-outer equi-join (tree line renders as
    # "<JoinKind>Join FullOuter (id)") — and no other join anywhere
    assert p.count("FullOuter (") == 1, p
    assert p.count("Inner (") + p.count("LeftOuter (") == 0, p
    assert "Cartesian" not in p and "NestedLoop" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # both snapshot scans prune to the 3 used columns
    assert "o_custkey" not in p and "o_orderdate" not in p, p


def test_cdc_orders_sf0001_classes_are_all_present(spark):
    from apmbackend_spark.operators.cdc import cdc_orders
    from apmbackend_spark.sources.loaders import load_table

    out = (
        cdc_orders(load_table(spark, SF_SMOKE, "orders"))
        .groupBy("op")
        .count()
        .collect()
    )
    classes = {r["op"]: r["count"] for r in out}
    assert set(classes) == {"insert", "delete", "update"}
    assert all(v > 0 for v in classes.values())


# ---------------------------------------------------------------------------
# compaction_bins


def _pack_reference(files, target):
    """Sequential cumsum-quantized packing, one partition at a time."""
    bins = {}
    by_src = {}
    for src, doc, size in sorted(files):
        by_src.setdefault(src, []).append((doc, size))
    for src, fl in by_src.items():
        cum = 0
        for doc, size in fl:
            b = cum // target
            cum += size
            key = (src, b)
            n, tot, lo, hi = bins.get(key, (0, 0, doc, doc))
            bins[key] = (n + 1, tot + size, min(lo, doc), max(hi, doc))
    return bins


def test_compaction_bins_matches_python_reference(spark):
    from apmbackend_spark.operators.layout import COMPACT_TARGET, compaction_bins

    files = [
        ("a", i, 500 + (i * 37) % 900) for i in range(40)
    ] + [("b", 100 + i, 4000 + i) for i in range(5)]
    df = spark.createDataFrame(
        [(s, d, n) for s, d, n in files], "source string, doc_id bigint, n_chars bigint"
    )
    got = {
        (r["source"], r["bin_id"]): (
            r["n_files"],
            r["total_bytes"],
            r["first_doc"],
            r["last_doc"],
        )
        for r in compaction_bins(df).collect()
    }
    assert got == _pack_reference(files, COMPACT_TARGET)


def test_compaction_bins_files_never_split_and_bytes_conserved(spark):
    from apmbackend_spark.operators.layout import compaction_bins
    from apmbackend_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    out = compaction_bins(docs).collect()
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["total_bytes"] for r in out) == total
    # per source: bins form contiguous, non-overlapping doc_id ranges
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r["bin_id"])
        for a, b in zip(rows, rows[1:]):
            assert a["last_doc"] < b["first_doc"], (src, a, b)


def test_compaction_bins_pinned_repartition_no_global_sort(spark):
    from apmbackend_spark.operators.layout import compaction_bins
    from apmbackend_spark.sources.loaders import load_table

    p = plan(compaction_bins(load_table(spark, SF_SMOKE, "documents")))
    assert "REPARTITION_BY_NUM" in p, p  # exempt from AQE byte-coalescing
    assert "rangepartitioning" not in p.lower(), p  # no global sort
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


# ---------------------------------------------------------------------------
# event_transitions


def _transitions_reference(rows, top_k=3):
    seqs = {}
    for eid, ts, uid, et in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        seqs.setdefault(uid, []).append(et)
    counts = {}
    for uid, types in seqs.items():
        for a, b in zip(types, types[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    out = set()
    prevs = {a for a, _ in counts}
    for prev in prevs:
        succ = sorted(
            ((n, b) for (a, b), n in counts.items() if a == prev),
            key=lambda x: (-x[0], x[1]),
        )
        rank, seen = 0, 0
        last_n = None
        for n, b in succ:
            seen += 1
            if n != last_n:
                rank = seen
                last_n = n
            if rank <= top_k:
                out.add((prev, b, n, rank))
    return out


def test_event_transitions_matches_python_reference_with_ties(spark):
    from apmbackend_spark.operators.sessions import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: a->b, b->a, a->b  (a->b twice)
    for et in ["a", "b", "a", "b"]:
        rows.append((eid, t0 + dt.timedelta(seconds=eid), 1, et))
        eid += 1
    # user 2: tie — a->c once, and same-timestamp pair ordered by event_id
    tie_ts = t0 + dt.timedelta(seconds=100)
    rows.append((eid, tie_ts, 2, "a")); eid += 1
    rows.append((eid, tie_ts, 2, "c")); eid += 1  # same ts: event_id breaks
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {
        (r["prev_type"], r["next_type"], r["n"], r["rnk"])
        for r in event_transitions(df).collect()
    }
    assert got == _transitions_reference(rows)
    # the tie pair (a->b n=2 vs a->c n=1) ranked deterministically
    assert ("a", "b", 2, 1) in got and ("a", "c", 1, 2) in got


def test_event_transitions_rank_ties_all_surface(spark):
    from apmbackend_spark.operators.sessions import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user streams crafted so prev 'x' has successors b,c,d each once:
    # rank() gives 1,1,1 — all surface even with top_k=2
    for uid, types in [(1, ["x", "b"]), (2, ["x", "c"]), (3, ["x", "d"])]:
        for et in types:
            rows.append((eid, t0 + dt.timedelta(seconds=eid), uid, et))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {
        (r["next_type"], r["rnk"])
        for r in event_transitions(df, top_k=2).collect()
    }
    assert got == {("b", 1), ("c", 1), ("d", 1)}


def test_event_transitions_pinned_exchanges_no_python(spark):
    from apmbackend_spark.operators.sessions import event_transitions
    from apmbackend_spark.sources.loaders import load_table

    p = plan(event_transitions(load_table(spark, SF_SMOKE, "events")))
    assert p.count("REPARTITION_BY_NUM") == 2, p  # user window + rank window
    assert "rangepartitioning" not in p.lower(), p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # pair counting is map-side combinable: partial + final HashAggregate
    assert n_nodes(p, "HashAggregate") >= 2, p


# ---------------------------------------------------------------------------
# url_canonical


@pytest.mark.parametrize(
    "raw,want",
    [
        # case + www + utm + fragment + param order, all at once
        (
            "HTTPS://WWW.Site1.Example.COM/p/2?utm_source=feed&id=4#frag",
            "https://site1.example.com/p/2?id=4",
        ),
        ("https://h.example/x?b=2&a=1", "https://h.example/x?a=1&b=2"),
        # all params are tracking -> query dropped entirely
        ("http://h.example/x?utm_a=1&utm_b=2", "http://h.example/x"),
        # no path -> normalized to "/"
        ("http://News.example", "http://news.example/"),
        # fragment alone stripped; path preserved verbatim (case-sensitive)
        ("https://h.example/CasePath#sec", "https://h.example/CasePath"),
        # utm_ prefix is a literal, not a LIKE pattern: "utmx" param stays
        ("https://h.example/x?utmx=1", "https://h.example/x?utmx=1"),
    ],
)
def test_canonical_url_rules(spark, raw, want):
    from apmbackend_spark.operators.textstats import canonical_url

    got = (
        spark.range(1)
        .select(canonical_url(F.lit(raw)).alias("c"))
        .collect()[0]["c"]
    )
    assert got == want


def test_url_canonical_collapses_variant_spellings(spark):
    from apmbackend_spark.operators.textstats import url_canonical
    from apmbackend_spark.sources.loaders import load_table

    out = url_canonical(load_table(spark, SF_SMOKE, "documents")).collect()
    # canonical targets: site{0..5} x p/{0..8} x id={0..4} = bounded set,
    # every canonical is lowercase, www- and utm- and fragment-free
    for r in out:
        c = r["canonical"]
        assert c.startswith("https://site")
        assert "utm" not in c and "#" not in c and "WWW" not in c
        assert r["n_urls"] >= r["n_variants"] >= 1
    # the corpus produces real collapses (more raw spellings than targets)
    assert sum(r["n_urls"] for r in out) == 500
    assert any(r["n_variants"] > 1 for r in out)


def test_url_canonical_zero_shuffle_until_agg_no_python(spark):
    from apmbackend_spark.operators.textstats import url_canonical
    from apmbackend_spark.sources.loaders import load_table

    p = plan(url_canonical(load_table(spark, SF_SMOKE, "documents")))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # count-distinct Expand strategy: aggregates around exchanges only —
    # canonicalization itself adds no exchange (scan-side projection)
    assert n_nodes(p, "Exchange") <= 2, p
    assert "Join" not in p, p
    # text column pruned away: only doc_id read
    assert "ReadSchema: struct<doc_id:bigint>" in p, p


# ---------------------------------------------------------------------------
# funnel_steps


def _funnel_reference(rows, steps):
    seqs = {}
    for eid, ts, uid, et in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        seqs.setdefault(uid, []).append((ts, et))
    out = {}
    for uid, evs in seqs.items():
        stage, times = 0, [None] * len(steps)
        for ts, et in evs:
            if stage < len(steps) and et == steps[stage]:
                times[stage] = int(ts.timestamp() * 1_000_000)
                stage += 1
        out[uid] = (stage, *times)
    return out


def test_funnel_steps_order_matters_and_matches_reference(spark):
    from apmbackend_spark.operators.sessions import funnel_steps

    t0 = dt.datetime(2024, 1, 1)
    steps = ("view", "click", "purchase")
    rows, eid = [], 0

    def add(uid, et, sec):
        nonlocal eid
        rows.append((eid, t0 + dt.timedelta(seconds=sec), uid, et))
        eid += 1

    # user 1: full conversion in order
    add(1, "view", 0); add(1, "click", 10); add(1, "purchase", 20)
    # user 2: purchase BEFORE view — must not count; stalls at stage 1
    add(2, "purchase", 0); add(2, "view", 10)
    # user 3: no funnel events at all
    add(3, "error", 0)
    # user 4: repeated views then click — first view's ts is kept
    add(4, "view", 0); add(4, "view", 5); add(4, "click", 9)
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {
        r["user_id"]: (r["stage"], r["t1"], r["t2"], r["t3"])
        for r in funnel_steps(df, steps).collect()
    }
    assert got == _funnel_reference(rows, steps)
    assert got[1][0] == 3 and got[2][0] == 1 and got[3][0] == 0
    # user 4 kept the FIRST view timestamp
    assert got[4][1] == int(t0.timestamp() * 1_000_000)


def test_funnel_steps_same_timestamp_breaks_by_event_id(spark):
    from apmbackend_spark.operators.sessions import funnel_steps

    ts = dt.datetime(2024, 1, 1)
    # view and click share a timestamp; event_id order makes click come
    # AFTER view, so the funnel advances through both
    df = spark.createDataFrame(
        [(10, ts, 1, "view"), (11, ts, 1, "click")],
        "event_id bigint, ts timestamp, user_id bigint, event_type string",
    )
    row = funnel_steps(df).collect()[0]
    assert row["stage"] == 2
    # reversed ids: click sorts first, funnel only reaches stage 1
    df2 = spark.createDataFrame(
        [(11, ts, 1, "view"), (10, ts, 1, "click")],
        "event_id bigint, ts timestamp, user_id bigint, event_type string",
    )
    assert funnel_steps(df2).collect()[0]["stage"] == 1


def test_funnel_steps_one_shuffle_no_python_no_join(spark):
    from apmbackend_spark.operators.sessions import funnel_steps
    from apmbackend_spark.sources.loaders import load_table

    p = plan(funnel_steps(load_table(spark, SF_SMOKE, "events")))
    assert n_nodes(p, "Exchange") == 1, p
    assert "Join" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


# ---------------------------------------------------------------------------
# winsorize


def test_winsorize_matches_python_reference(spark):
    from apmbackend_spark.functions.percentile import midpoint_percentile_py
    from apmbackend_spark.operators.robust import winsorize

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 100.0, -50.0, 7.5, 8.25, 9.0]
    rows = [(i, dt.datetime(2024, 1, 1), 1, "t", v, None) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    r = winsorize(df).collect()[0]
    s = sorted(vals)
    p_lo = midpoint_percentile_py(s, 5.0)
    p_hi = midpoint_percentile_py(s, 95.0)
    assert (r["p_lo"], r["p_hi"]) == (p_lo, p_hi)
    assert r["n_low"] == sum(1 for v in vals if v < p_lo)
    assert r["n_high"] == sum(1 for v in vals if v > p_hi)
    import math

    assert r["sum_cents"] == sum(
        math.floor(min(max(v, p_lo), p_hi) * 100.0 + 0.5) for v in vals
    )


def test_winsorize_clip_bounds_cover_all_rows(spark):
    from apmbackend_spark.operators.robust import winsorize
    from apmbackend_spark.sources.loaders import load_table

    out = winsorize(load_table(spark, SF_SMOKE, "events")).collect()
    assert len(out) == 5  # one row per event_type
    for r in out:
        assert r["p_lo"] <= r["p_hi"]
        assert r["n_low"] >= 0 and r["n_high"] >= 0
        # clipping 5% tails: each side holds under ~6% of the group
        # (fixture groups are ~200 rows; midpoint rule rounds)


def test_winsorize_one_shuffle_in_row_stats_no_rejoin(spark):
    from apmbackend_spark.operators.robust import winsorize
    from apmbackend_spark.sources.loaders import load_table

    p = plan(winsorize(load_table(spark, SF_SMOKE, "events")))
    assert n_nodes(p, "Exchange") == 1, p
    assert "Join" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


# ---------------------------------------------------------------------------
# heavy_hitters_cms


def _cms_reference(keys, depth, width, factor):
    import hashlib

    def h(seed, key):
        md = hashlib.md5(f"cms{seed}:{key}".encode()).hexdigest()
        return int(md[:15], 16) % width

    sketch = {}
    for k in keys:
        for s in range(depth):
            b = (s, h(s, k))
            sketch[b] = sketch.get(b, 0) + 1
    exact = {}
    for k in keys:
        exact[k] = exact.get(k, 0) + 1
    n, u = len(keys), len(exact)
    out = {}
    for k, xn in exact.items():
        est = min(sketch[(s, h(s, k))] for s in range(depth))
        if est > factor * (n / u):
            out[k] = (est, xn, est - xn)
    return out


def test_heavy_hitters_cms_matches_python_reference(spark):
    from apmbackend_spark.operators.profile import (
        CMS_DEPTH,
        CMS_HOT_FACTOR,
        CMS_WIDTH,
        heavy_hitters_cms,
    )

    # skewed key stream: key 7 dominates, a mid key, many singletons
    keys = [7] * 50 + [13] * 20 + list(range(100, 140))
    rows = [
        (i, dt.datetime(2024, 1, 1), k, "t", 1.0, None)
        for i, k in enumerate(keys)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    got = {
        r["key"]: (r["est"], r["exact_n"], r["overestimate"])
        for r in heavy_hitters_cms(df).collect()
    }
    assert got == _cms_reference(keys, CMS_DEPTH, CMS_WIDTH, CMS_HOT_FACTOR)
    assert 7 in got and got[7][1] == 50


def test_heavy_hitters_cms_estimate_never_undercounts(spark):
    from apmbackend_spark.operators.profile import heavy_hitters_cms
    from apmbackend_spark.sources.loaders import load_table

    out = heavy_hitters_cms(load_table(spark, SF_SMOKE, "events")).collect()
    assert len(out) >= 1
    for r in out:
        assert r["est"] >= r["exact_n"]  # CMS error is one-sided
        assert r["overestimate"] == r["est"] - r["exact_n"]


def test_heavy_hitters_cms_sketch_broadcast_no_python(spark):
    from apmbackend_spark.operators.profile import heavy_hitters_cms
    from apmbackend_spark.sources.loaders import load_table

    p = plan(heavy_hitters_cms(load_table(spark, SF_SMOKE, "events")))
    assert "BroadcastExchange" in p, p  # sketch + totals broadcast
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "SortMergeJoin" not in p, p  # probe join must not shuffle-sort


# ---------------------------------------------------------------------------
# stream_funnel (cross-batch stateful funnel)


def test_stream_funnel_state_carries_across_mid_sequence_cut(spark, tmp_path):
    """A user's 'view' lands in delivery 1 and 'click'/'purchase' in
    delivery 2: conversion REQUIRES the state-store carry. A second user
    converts entirely inside delivery 1 (the no-carry control)."""
    import datetime as dt

    from apmbackend_spark.streaming.topology import stream_funnel_gate

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view early (delivery 1), click+purchase late (delivery 2+)
        (0, t0 + dt.timedelta(hours=0), 1, "view", 1.0, None),
        (1, t0 + dt.timedelta(hours=20), 1, "click", 1.0, None),
        (2, t0 + dt.timedelta(hours=28), 1, "purchase", 1.0, None),
        # user 2: full conversion inside the first third of the range
        (3, t0 + dt.timedelta(hours=1), 2, "view", 1.0, None),
        (4, t0 + dt.timedelta(hours=2), 2, "click", 1.0, None),
        (5, t0 + dt.timedelta(hours=3), 2, "purchase", 1.0, None),
        # user 3: stalls at stage 1 — its click precedes its view
        (6, t0 + dt.timedelta(hours=5), 3, "click", 1.0, None),
        (7, t0 + dt.timedelta(hours=25), 3, "view", 1.0, None),
        # pad the time range so the 3 time cuts split the sequences
        (8, t0 + dt.timedelta(hours=30), 4, "error", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = {
        r["user_id"]: (r["stage"], r["t1"], r["t2"], r["t3"])
        for r in stream_funnel_gate(spark, sf, n_deliveries=3).collect()
    }
    us = lambda h: int((t0 + dt.timedelta(hours=h)).timestamp() * 1_000_000)
    assert got[1] == (3, us(0), us(20), us(28))  # cross-batch conversion
    assert got[2] == (3, us(1), us(2), us(3))
    assert got[3] == (1, us(25), None, None)
    assert got[4] == (0, None, None, None)


def test_stream_funnel_matches_batch_operator_on_fixture(spark):
    from apmbackend_spark.operators.sessions import funnel_steps
    from apmbackend_spark.sources.loaders import load_table
    from apmbackend_spark.streaming.topology import stream_funnel_gate

    batch = {
        tuple(r)
        for r in funnel_steps(load_table(spark, SF_SMOKE, "events")).collect()
    }
    stream = {
        tuple(r) for r in stream_funnel_gate(spark, SF_SMOKE).collect()
    }
    assert batch == stream
