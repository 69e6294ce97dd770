"""Temporal join/segmentation operators Spark's built-ins don't provide.

  * :func:`asof_join` — "latest right row at or before each left row" per
    key, WITHOUT a range cross-join: both sides union into one
    time-ordered stream and a last-non-null window carries the most
    recent right payload forward onto left rows. ONE shuffle on
    (key, ts) — the classic distributed as-of strategy; a naive
    ``l.ts >= r.ts`` join is a per-key cross product that explodes on hot
    keys at scale.
  * :func:`sessionize` — gap-based session ids via lag + running sum
    (the batch analog of a streaming session window).

Both are pure Column programs (whole-stage codegen), oracle-checkable
against DuckDB's native ASOF JOIN / window functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can use the type in an ORDER BY (maps cannot)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: float | None = None,
) -> DataFrame:
    """Backward (inclusive) as-of join: each left row gains the right row
    with the greatest ``right_ts`` <= ``left_ts`` for the same key; left
    rows with no prior right row keep NULL right columns (left-outer
    semantics — same contract as DuckDB/kdb ASOF LEFT JOIN).

    Right payload columns are carried under their own names — they must
    not collide with left column names (rename on the way in). Ties on
    ``right_ts`` within a key resolve to the greatest payload struct
    (deterministic lexicographic-on-fields tiebreak).

    ``tolerance`` (pandas merge_asof analog): a match older than
    ``left_ts - tolerance`` is discarded (NULL right columns instead).
    Units follow the ts columns — SECONDS for timestamps, plain
    difference for numeric ts. Because the as-of match is the LATEST
    eligible right row, "latest within tolerance" and "null out a
    too-old latest match" are the same rule — which is what lets a SQL
    oracle express it as a post-filter on a native ASOF join.
    """
    rpay_cols = [c for c in right.columns if c not in key_cols]
    collide = set(rpay_cols) & set(left.columns)
    if collide:
        raise ValueError(
            f"right payload columns collide with left columns: "
            f"{sorted(collide)}; rename before joining")
    lpay_cols = [c for c in left.columns if c not in key_cols]

    lt = left.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        F.struct(*lpay_cols).alias("__lpay"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{c}`:{right.schema[c].dataType.simpleString()}"
                for c in rpay_cols) + ">").alias("__rpay"),
        F.lit(1).alias("__side"),
    )
    rt = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{c}`:{left.schema[c].dataType.simpleString()}"
                for c in lpay_cols) + ">").alias("__lpay"),
        F.struct(*rpay_cols).alias("__rpay"),
        F.lit(0).alias("__side"),
    )
    # right rows sort BEFORE left rows at equal ts -> inclusive <=;
    # among equal-ts right rows the greatest ORDERABLE payload projection
    # comes last (the one last() picks). Maps (and structs/arrays holding
    # them) are not orderable in Spark — excluding them keeps payloads
    # like a raw `props` map joinable while the tiebreak stays
    # deterministic on the remaining columns.
    tie_cols = [c for c in rpay_cols
                if _orderable(right.schema[c].dataType)]
    order = [F.col("__ts"), F.col("__side")]
    if tie_cols:
        order.append(F.struct(
            *[F.col("__rpay").getField(c).alias(c) for c in tie_cols]))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).withColumn(
        "__match", F.last("__rpay", ignorenulls=True).over(w))
    if tolerance is not None:
        # ts of the matched right row: last() over the SAME window/order
        # picks from the same row as the payload last() above
        carried = carried.withColumn(
            "__mts",
            F.last(F.when(F.col("__side") == 0, F.col("__ts")),
                   ignorenulls=True).over(w))
        # numeric view of the ts: ANSI mode refuses TIMESTAMP(_NTZ) ->
        # DOUBLE casts, so timestamps go through unix_micros (the
        # NTZ->LTZ session-zone shift cancels in the difference)
        lts_type = left.schema[left_ts].dataType
        if isinstance(lts_type, (T.TimestampType, T.TimestampNTZType)):
            def as_num(c):
                return F.unix_micros(c.cast("timestamp")) / F.lit(1e6)
        else:
            def as_num(c):
                return c.cast("double")
        in_window = (
            F.col("__mts").isNotNull()
            & ((as_num(F.col("__ts")) - as_num(F.col("__mts")))
               <= float(tolerance)))
        carried = carried.withColumn(
            "__match", F.when(in_window, F.col("__match")))
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *key_cols,
            *[F.col(f"__lpay.{c}").alias(c) for c in lpay_cols],
            *[F.col(f"__match.{c}").alias(c) for c in rpay_cols],
        )
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    key_cols: list[str] | None = None,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Point-in-interval join (``start <= ts <= end``) as an EQUI-join.

    Spark plans a raw BETWEEN join as a (broadcast) nested loop — a
    per-key cross product that explodes on hot keys. Here each point maps
    to ONE time bucket and each interval explodes over the buckets it
    covers; the join is hash-equi on (keys..., bucket) with the exact
    BETWEEN as a residual filter. Each qualifying (point, interval) pair
    appears exactly once (a point's single bucket is covered once per
    interval), so no dedup pass is needed.

    ``bucket_seconds`` trades shuffle fan-out for residual selectivity:
    pick ~ the typical interval length (an interval then explodes into
    ~2 rows). Column names must be disjoint across the two sides apart
    from ``key_cols``.
    """
    key_cols = list(key_cols or [])
    pcols = [c for c in points.columns if c not in key_cols]
    icols = [c for c in intervals.columns if c not in key_cols]
    collide = set(pcols) & set(icols)
    if collide:
        raise ValueError(
            f"point/interval columns collide: {sorted(collide)}; "
            "rename before joining")

    b = F.lit(bucket_seconds)
    # an inverted interval (end < start) can never contain a point, but
    # sequence(start_bucket, end_bucket) would DESCEND across the whole
    # range (huge explode, or an over-max-array failure) — drop them
    intervals = intervals.filter(F.col(end_col) >= F.col(start_col))
    p = points.withColumn(
        "__bucket",
        F.floor(F.col(point_ts).cast("timestamp").cast("long") / b))
    i = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(
            F.floor(F.col(start_col).cast("timestamp").cast("long") / b),
            F.floor(F.col(end_col).cast("timestamp").cast("long") / b))))
    joined = p.join(i, key_cols + ["__bucket"])
    return (
        joined.filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col)))
        .drop("__bucket")
    )


def hypertable_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    granularities: tuple[str, ...] = ("hour", "day", "month"),
) -> DataFrame:
    """Cascaded time-bucketed rollups (TimescaleDB continuous-aggregate
    analog): the finest grain aggregates the raw events ONCE; every
    coarser grain re-aggregates the previous level (counts of counts,
    sums of sums) instead of rescanning the raw table — at 100 TB the raw
    scan happens exactly once regardless of how many grains you keep.

    Only re-aggregable measures (count, sum) cascade; derive avg at read
    time as sum/n. Returns the union of all levels:
    (grain, bucket, keys..., n, sum_value). ``granularities`` must go
    finest -> coarsest (each must nest into the next).
    """
    if not granularities:
        raise ValueError(
            "hypertable_rollup needs at least one granularity")
    key_cols = list(key_cols or [])
    finest = granularities[0]
    level = (
        events.groupBy(
            *key_cols, F.date_trunc(finest, ts_col).alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"),
             F.sum(value_col).alias("sum_value"))
    )
    out = level.withColumn("grain", F.lit(finest))
    for g in granularities[1:]:
        level = (
            level.groupBy(
                *key_cols, F.date_trunc(g, "bucket").alias("bucket"))
            .agg(F.sum("n").cast("long").alias("n"),
                 F.sum("sum_value").alias("sum_value"))
        )
        out = out.unionByName(level.withColumn("grain", F.lit(g)))
    return out.select("grain", "bucket", *key_cols, "n", "sum_value")


def sessionize(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts at the first event
    and after every silence longer than ``gap_seconds``. Adds
    ``session_idx`` (1-based per key) and ``session_id``
    ("<key...>#<idx>"). One shuffle on the key; lag + running sum —
    no self-join, no collect.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        events
        .withColumn("__prev_ts", F.lag(ts_col).over(w))
        .withColumn(
            "__new",
            # unix_micros, not cast-to-long: second truncation would miss
            # sub-second silences just past the gap (1800.4s floor-diffs
            # to 1800) and diverge from a fractional-epoch SQL oracle
            F.when(F.col("__prev_ts").isNull(), 1)
            .when(F.unix_micros(F.col(ts_col).cast("timestamp"))
                  - F.unix_micros(F.col("__prev_ts").cast("timestamp"))
                  > gap_seconds * 1_000_000, 1)
            .otherwise(0))
        .withColumn("session_idx",
                    F.sum("__new").over(run).cast("long"))
        .withColumn(
            "session_id",
            F.concat_ws("#", *[F.col(c).cast("string") for c in key_cols],
                        F.col("session_idx").cast("string")))
        .drop("__prev_ts", "__new")
    )
    return out
