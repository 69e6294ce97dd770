"""Temporal operators: as-of join edge semantics, sessionization."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from softcite_kb_spark.operators import temporal as tp


def _ts(s):
    return pd.Timestamp(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a", "a", "b"],
        "event_id": [1, 2, 3, 4],
        "ts": pd.to_datetime([
            "2026-01-01 10:00", "2026-01-01 11:00",
            "2026-01-01 09:00",   # before any right row
            "2026-01-01 10:30",   # key with no right rows at all
        ]).astype("datetime64[us]"),
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a"],
        "r_id": [10, 11],
        "r_ts": pd.to_datetime(
            ["2026-01-01 10:00", "2026-01-01 10:45"]).astype("datetime64[us]"),
    }))
    got = {r.event_id: (r.r_id, r.r_ts)
           for r in tp.asof_join(left, right, ["k"], "ts", "r_ts").collect()}
    assert got[1][0] == 10            # inclusive: equal ts matches
    assert got[2][0] == 11            # latest prior wins
    assert got[3] == (None, None)     # nothing at-or-before
    assert got[4] == (None, None)     # key absent from right


def test_asof_join_tie_deterministic(spark):
    """Two right rows with the SAME ts: the greatest payload struct wins,
    deterministically across partitionings."""
    left = spark.createDataFrame(pd.DataFrame({
        "k": ["a"], "event_id": [1],
        "ts": pd.to_datetime(["2026-01-01 10:00"]).astype("datetime64[us]")}))
    right = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a"], "r_id": [7, 9],
        "r_ts": pd.to_datetime(
            ["2026-01-01 09:00", "2026-01-01 09:00"]).astype("datetime64[us]")}))
    for rep in (right, right.repartition(5)):
        got = tp.asof_join(left, rep, ["k"], "ts", "r_ts").collect()
        assert got[0].r_id == 9


def test_asof_join_rejects_collisions(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "k": ["a"], "ts": pd.to_datetime(["2026-01-01"]).astype("datetime64[us]"),
        "v": [1]}))
    with pytest.raises(ValueError, match="collide"):
        tp.asof_join(df, df, ["k"], "ts", "ts")


def test_sessionize(spark):
    e = spark.createDataFrame(pd.DataFrame({
        "user": ["u1"] * 4 + ["u2"],
        "event_id": [1, 2, 3, 4, 5],
        "ts": pd.to_datetime([
            "2026-01-01 10:00", "2026-01-01 10:10",   # session 1
            "2026-01-01 11:30", "2026-01-01 11:40",   # session 2 (>30min gap)
            "2026-01-01 10:00",
        ]).astype("datetime64[us]"),
    }))
    s = tp.sessionize(e, ["user"], "ts", gap_seconds=1800,
                      order_tiebreak=["event_id"])
    got = {r.event_id: (r.session_idx, r.session_id) for r in s.collect()}
    assert got[1] == (1, "u1#1") and got[2] == (1, "u1#1")
    assert got[3] == (2, "u1#2") and got[4] == (2, "u1#2")
    assert got[5] == (1, "u2#1")


def test_range_join_bucketing(spark):
    """Bucketed range join: exact BETWEEN semantics regardless of where
    intervals fall relative to bucket boundaries; equi-join plan (no
    nested loop)."""
    pts = spark.createDataFrame(pd.DataFrame({
        "k": ["a"] * 4,
        "pid": [1, 2, 3, 4],
        "ts": pd.to_datetime([
            "2026-01-01 00:30",   # inside w1
            "2026-01-01 05:59",   # inside w1 (end-inclusive)
            "2026-01-01 06:01",   # just past w1
            "2026-01-02 12:00",   # inside w2 which spans a bucket boundary
        ]).astype("datetime64[us]"),
    }))
    iv = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a"],
        "wid": [10, 20],
        "w_start": pd.to_datetime(
            ["2026-01-01 00:00", "2026-01-02 03:00"]).astype("datetime64[us]"),
        "w_end": pd.to_datetime(
            ["2026-01-01 05:59", "2026-01-02 21:00"]).astype("datetime64[us]"),
    }))
    got = {(r.pid, r.wid) for r in tp.range_join(
        pts, iv, "ts", "w_start", "w_end", key_cols=["k"],
        bucket_seconds=6 * 3600).collect()}
    assert got == {(1, 10), (2, 10), (4, 20)}
    plan = tp.range_join(pts, iv, "ts", "w_start", "w_end",
                         key_cols=["k"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_hypertable_rollup_cascade_exact(spark):
    """Coarser grains re-aggregate the finer level; totals must equal a
    direct aggregation of the raw events and the raw scan happens once."""
    e = spark.createDataFrame(pd.DataFrame({
        "event_type": ["a"] * 5 + ["b"] * 3,
        "ts": pd.to_datetime([
            "2026-01-01 10:05", "2026-01-01 10:55", "2026-01-01 11:05",
            "2026-01-02 00:00", "2026-02-01 09:00",
            "2026-01-01 10:05", "2026-01-31 23:59", "2026-02-01 00:00",
        ]).astype("datetime64[us]"),
        "value": [1.0, 2.0, 4.0, 8.0, 16.0, 1.5, 2.5, 4.5],
    }))
    out = tp.hypertable_rollup(e, "ts", "value", key_cols=["event_type"])
    rows = {(r.grain, str(r.bucket), r.event_type): (r.n, r.sum_value)
            for r in out.collect()}
    assert rows[("hour", "2026-01-01 10:00:00", "a")] == (1 + 1, 3.0)
    assert rows[("day", "2026-01-01 00:00:00", "a")] == (3, 7.0)
    assert rows[("month", "2026-01-01 00:00:00", "a")] == (4, 15.0)
    assert rows[("month", "2026-02-01 00:00:00", "b")] == (1, 4.5)
    # month totals == direct aggregation of raw
    direct = {(r.event_type,): (r.n, r.s) for r in
              e.groupBy("event_type").agg(
                  F.count("*").alias("n"), F.sum("value").alias("s")).collect()}
    month_tot = {}
    for (g, _b, t), (n, s) in rows.items():
        if g == "month":
            a, b = month_tot.get((t,), (0, 0.0))
            month_tot[(t,)] = (a + n, b + s)
    assert month_tot == direct


def test_sessionize_subsecond_gap(spark):
    """Microsecond-exact gaps: a 1800.4s silence starts a new session
    (second-truncated arithmetic would floor it to exactly 1800)."""
    e = spark.createDataFrame(pd.DataFrame({
        "user": ["u1", "u1", "u1"],
        "event_id": [1, 2, 3],
        "ts": pd.to_datetime([
            "2026-01-01 10:00:00.100000",
            "2026-01-01 10:30:00.500000",   # 1800.4s later -> new session
            "2026-01-01 10:59:00.500000",   # 1740s later -> same session
        ]).astype("datetime64[us]"),
    }))
    s = tp.sessionize(e, ["user"], "ts", gap_seconds=1800)
    got = {r.event_id: r.session_idx for r in s.collect()}
    assert got == {1: 1, 2: 2, 3: 2}


def test_range_join_inverted_interval_ignored(spark):
    """An inverted interval (end < start) matches nothing and must not
    explode into a giant descending bucket sequence."""
    pts = spark.createDataFrame(pd.DataFrame({
        "k": ["a"], "pid": [1],
        "ts": pd.to_datetime(["2026-01-01 01:00"]).astype("datetime64[us]")}))
    iv = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a"], "wid": [1, 2],
        "w_start": pd.to_datetime(
            ["2026-01-01 00:00", "2026-01-01 00:00"]).astype("datetime64[us]"),
        "w_end": pd.to_datetime(
            ["1970-01-01 00:00", "2026-01-01 02:00"]).astype("datetime64[us]"),
    }))
    got = {(r.pid, r.wid) for r in tp.range_join(
        pts, iv, "ts", "w_start", "w_end", key_cols=["k"],
        bucket_seconds=3600).collect()}
    assert got == {(1, 2)}


def test_asof_join_map_payload(spark):
    """A right payload containing a MAP column (not orderable) must still
    join; the tiebreak uses the orderable columns only."""
    left = spark.createDataFrame(pd.DataFrame({
        "k": ["a"], "event_id": [1],
        "ts": pd.to_datetime(["2026-01-01 10:00"]).astype("datetime64[us]")}))
    import datetime as dt
    right = spark.createDataFrame(
        [("a", 7, dt.datetime(2026, 1, 1, 9, 0), {"x": "1"})],
        "k string, r_id long, r_ts timestamp, r_props map<string,string>")
    got = tp.asof_join(left, right, ["k"], "ts", "r_ts").collect()[0]
    assert got.r_id == 7 and got.r_props == {"x": "1"}


def test_hypertable_rollup_empty_granularities(spark):
    e = spark.createDataFrame(pd.DataFrame({
        "event_type": ["a"],
        "ts": pd.to_datetime(["2026-01-01"]).astype("datetime64[us]"),
        "value": [1.0]}))
    with pytest.raises(ValueError, match="granularity"):
        tp.hypertable_rollup(e, granularities=())


def test_asof_join_tolerance(spark):
    """pandas merge_asof tolerance analog: a latest-prior match older
    than the window is discarded (NULL right columns), an in-window one
    kept; exact-boundary matches are INCLUSIVE."""
    import pandas as pd

    from softcite_kb_spark.operators.temporal import asof_join

    ts = pd.to_datetime
    left = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a", "b"],
        "lid": [1, 2, 3],
        "ts": pd.Series(ts(["2024-01-01 10:00:00", "2024-01-01 12:00:00",
                            "2024-01-01 10:00:00"])).astype("datetime64[us]"),
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "b"],
        "rid": [10, 20],
        "rts": pd.Series(ts(["2024-01-01 09:30:00",
                             "2024-01-01 08:00:00"])).astype("datetime64[us]"),
    }))
    out = {r.lid: r.rid for r in asof_join(
        left, right, ["k"], "ts", "rts", tolerance=1800).collect()}
    assert out[1] == 10      # 30 min back, exactly at the boundary
    assert out[2] is None    # 2.5 h back, outside tolerance
    assert out[3] is None    # 2 h back on key b, outside
    # no tolerance: both match
    out2 = {r.lid: r.rid for r in asof_join(
        left, right, ["k"], "ts", "rts").collect()}
    assert out2 == {1: 10, 2: 10, 3: 20}
