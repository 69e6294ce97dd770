"""TableStore snapshot semantics + MERGE upsert + incremental pipeline rerun."""

import pandas as pd
from pyspark.sql import functions as F

from softcite_kb_spark import datagen
from softcite_kb_spark.plans.pipeline import KGPipeline, PipelineConfig
from softcite_kb_spark.storage import TableStore


def test_merge_upsert(spark, tmp_path):
    st = TableStore(str(tmp_path / "s"))
    base = spark.createDataFrame(pd.DataFrame(
        {"k": ["a", "b", "c"], "v": [1, 2, 3]}))
    st.write(base, "t")
    upd = spark.createDataFrame(pd.DataFrame(
        {"k": ["b", "d"], "v": [20, 4]}))
    snap = st.merge(upd, "t", ["k"])
    got = {r.k: r.v for r in st.read(spark, "t").collect()}
    assert got == {"a": 1, "b": 20, "c": 3, "d": 4}
    assert snap.properties["operation"] == "merge"
    # snapshot history: write + merge = 2 snapshots, current is the merge
    assert st.current_snapshot("t").snapshot_id == 2
    # merge into missing table = plain write
    snap2 = st.merge(upd, "t2", ["k"])
    assert snap2.row_count == 2


def test_incremental_transcripts_rerun(spark, corpus, tmp_path):
    """New conversations merged into transcripts -> pipeline re-runs and
    the KB grows; untouched conversations' triples are unchanged
    (the reference's incremental update Readme.md:261-265)."""
    st = TableStore(str(tmp_path / "kb"))
    t = corpus["transcripts"]
    first = t.filter(F.col("conv_id") < "conv-000060")
    rest = t.filter(F.col("conv_id") >= "conv-000060")
    st.write(first, "transcripts")
    for name in ("authority_entities", "authority_ids"):
        st.write(corpus[name], name)
    cfg = PipelineConfig(blacklist=tuple(datagen.BLACKLIST), min_vote_total=1)
    KGPipeline(spark, st, cfg).run()
    triples_before = {tuple(r) for r in st.read(spark, "triples").collect()}

    # incremental batch arrives
    st.merge(rest, "transcripts", ["conv_id", "turn_idx"])
    report = KGPipeline(spark, st, cfg).run()
    assert report["extract"] == "ran"  # input snapshot changed
    triples_after = {tuple(r) for r in st.read(spark, "triples").collect()}
    assert triples_before <= triples_after
    assert len(triples_after) > len(triples_before)


def test_partition_pruned_merge(spark, tmp_path):
    """Merging into a partitioned table rewrites ONLY partitions containing
    incoming keys; every untouched partition's files are carried into the
    new snapshot byte-identically (hardlinked — same inode)."""
    import os

    st = TableStore(str(tmp_path / "kb"))
    base = spark.createDataFrame(pd.DataFrame({
        "bucket": ["a"] * 3 + ["b"] * 3 + ["c"] * 3,
        "k": list(range(9)),
        "v": [f"v{i}" for i in range(9)],
    }))
    snap1 = st.write(base, "t", partition_by=["bucket"])
    assert snap1.properties["partition_by"] == ["bucket"]

    def pfiles(path, part):
        d = os.path.join(path, f"bucket={part}")
        return sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet"))

    before_b = [(p, os.stat(p).st_ino) for p in pfiles(snap1.path, "b")]

    upd = spark.createDataFrame(pd.DataFrame({
        "bucket": ["a", "a"], "k": [0, 100], "v": ["patched", "new"],
    }))
    snap2 = st.merge(upd, "t", key_cols=["bucket", "k"])
    assert snap2.properties["merge_mode"] == "pruned"
    assert snap2.properties["rewritten_partitions"] == ["a"]

    # content: upsert applied in partition a, b/c untouched
    rows = {(r.bucket, r.k): r.v for r in st.read(spark, "t").collect()}
    assert rows[("a", 0)] == "patched" and rows[("a", 100)] == "new"
    assert rows[("b", 3)] == "v3" and rows[("c", 8)] == "v8"
    assert len(rows) == 10

    # untouched partition files: identical inodes (no rewrite, no copy)
    after_b = [(p.replace(snap1.path, snap2.path), ino) for p, ino in before_b]
    for p, ino in after_b:
        assert os.stat(p).st_ino == ino

    # unaligned merge key (partition col not in key) -> safe full rewrite
    upd2 = spark.createDataFrame(pd.DataFrame(
        {"bucket": ["b"], "k": [3], "v": ["again"]}))
    snap3 = st.merge(upd2, "t", key_cols=["k"])
    assert snap3.properties["merge_mode"] == "full-rewrite"
    rows3 = {(r.bucket, r.k): r.v for r in st.read(spark, "t").collect()}
    assert rows3[("b", 3)] == "again" and len(rows3) == 10


def test_merge_and_append_null_and_typed_partitions(spark, tmp_path):
    """Review regressions: (a) NULL partition values in the incoming df
    must not silently drop existing NULL-partition rows (safe full-rewrite
    fallback); (b) append on a partitioned table must keep the appended
    rows readable; (c) string partition values like '01' must round-trip
    (no bigint inference)."""
    st = TableStore(str(tmp_path / "kb"))
    base = spark.createDataFrame(pd.DataFrame({
        "bucket": ["01", "2", None, None],
        "k": [1, 2, 3, 4],
        "v": ["a", "b", "c", "d"],
    }))
    st.write(base, "t", partition_by=["bucket"])
    # (c) string partition round-trip
    got = {(r.bucket, r.k): r.v for r in st.read(spark, "t").collect()}
    assert ("01", 1) in got and (None, 3) in got

    # (a) incoming NULL partition -> full rewrite, nothing lost
    upd = spark.createDataFrame(pd.DataFrame(
        {"bucket": [None], "k": [3], "v": ["patched"]}))
    snap = st.merge(upd, "t", key_cols=["bucket", "k"])
    assert snap.properties["merge_mode"] == "full-rewrite"
    got = {(r.bucket, r.k): r.v for r in st.read(spark, "t").collect()}
    assert got[(None, 3)] == "patched" and got[(None, 4)] == "d"
    assert got[("01", 1)] == "a" and len(got) == 4

    # (b) append keeps partition layout and the new rows
    extra = spark.createDataFrame(pd.DataFrame(
        {"bucket": ["2"], "k": [9], "v": ["appended"]}))
    snap2 = st.append(extra, "t")
    got = {(r.bucket, r.k): r.v for r in st.read(spark, "t").collect()}
    assert got[("2", 9)] == "appended" and len(got) == 5
    # and a later merge still sees the table as partitioned
    assert snap2.properties["partition_by"] == ["bucket"]


def test_append_rejects_schema_drift(spark, tmp_path):
    """A batch whose column types drift must not re-pin how existing
    files are read (the old files would become unreadable)."""
    st = TableStore(str(tmp_path / "kb"))
    base = spark.createDataFrame(pd.DataFrame(
        {"k": [1], "v": [1.5]}))
    st.write(base, "t")
    drift = spark.createDataFrame(pd.DataFrame(
        {"k": [2], "v": [2]}))  # v inferred bigint, table has double
    import pytest
    with pytest.raises(ValueError, match="schema drift"):
        st.append(drift, "t")
    ok = spark.createDataFrame(pd.DataFrame({"k": [2], "v": [2.0]}))
    st.append(ok, "t")
    assert st.read(spark, "t").count() == 2


def test_merge_type_mismatch_falls_back_to_full_rewrite(spark, tmp_path):
    """Incoming types that differ from the table schema force the full
    rewrite (hardlinked old files must never be read under a new pinned
    schema with different physical types)."""
    st = TableStore(str(tmp_path / "kb"))
    base = spark.createDataFrame(pd.DataFrame({
        "bucket": ["a", "b"], "k": [1, 2], "v": [1.5, 2.5]}))
    st.write(base, "t", partition_by=["bucket"])
    upd = spark.createDataFrame(pd.DataFrame({
        "bucket": ["a"], "k": [1], "v": [9]}))  # v bigint vs double
    snap = st.merge(upd, "t", key_cols=["bucket", "k"])
    assert snap.properties["merge_mode"] == "full-rewrite"
    rows = {(r.bucket, r.k): r.v for r in st.read(spark, "t").collect()}
    assert rows[("a", 1)] == 9.0 and rows[("b", 2)] == 2.5


def test_merge_two_column_partition_pruning(spark, tmp_path):
    """Multi-column partition layouts prune too: a merge keyed on both
    partition columns rewrites ONLY the touched (day, region) leaves —
    untouched leaf files carry over by hardlink (inode identity), and
    the fallback reason is absent."""
    import os

    st = TableStore(str(tmp_path / "kb"))
    base = spark.createDataFrame(pd.DataFrame({
        "day": ["d1"] * 4 + ["d2"] * 4,
        "region": ["eu", "eu", "us", "us"] * 2,
        "k": list(range(8)),
        "v": [f"v{i}" for i in range(8)],
    }))
    snap1 = st.write(base, "t", partition_by=["day", "region"])

    def pfiles(path, day, region):
        d = os.path.join(path, f"day={day}", f"region={region}")
        return sorted(os.path.join(d, f) for f in os.listdir(d)
                      if f.endswith(".parquet"))

    before = {(d, r): [(p, os.stat(p).st_ino)
                       for p in pfiles(snap1.path, d, r)]
              for d, r in (("d1", "us"), ("d2", "eu"), ("d2", "us"))}

    upd = spark.createDataFrame(pd.DataFrame({
        "day": ["d1", "d1"], "region": ["eu", "eu"],
        "k": [0, 100], "v": ["patched", "new"],
    }))
    snap2 = st.merge(upd, "t", key_cols=["day", "region", "k"])
    assert snap2.properties["merge_mode"] == "pruned"
    assert snap2.properties["rewritten_partitions"] == ["d1/eu"]
    assert "merge_fallback_reason" not in snap2.properties

    rows = {(r.day, r.region, r.k): r.v for r in st.read(spark, "t").collect()}
    assert rows[("d1", "eu", 0)] == "patched"
    assert rows[("d1", "eu", 100)] == "new"
    assert rows[("d2", "us", 7)] == "v7" and len(rows) == 9

    # every untouched leaf: identical inodes (hardlink, no rewrite/copy)
    for (d, r), files in before.items():
        for p, ino in files:
            assert os.stat(p.replace(snap1.path, snap2.path)).st_ino == ino


def test_merge_fallback_reason_recorded(spark, tmp_path):
    """A partitioned table that falls back to full rewrite must say WHY
    in snapshot properties — at scale a silent full-rewrite merge is the
    thing to monitor for."""
    st = TableStore(str(tmp_path / "kb"))
    base = spark.createDataFrame(pd.DataFrame({
        "day": ["d1", "d2"], "k": [1, 2], "v": ["a", "b"]}))
    st.write(base, "t", partition_by=["day"])
    upd = spark.createDataFrame(pd.DataFrame(
        {"day": ["d1"], "k": [1], "v": ["p"]}))
    snap = st.merge(upd, "t", key_cols=["k"])  # day not in merge key
    assert snap.properties["merge_mode"] == "full-rewrite"
    assert "not all in merge key" in snap.properties["merge_fallback_reason"]


def test_merge_empty_batch_is_noop_commit(spark, tmp_path):
    """An empty incoming batch into a prunable partitioned table must
    commit a valid no-op snapshot (carry every leaf over), not crash on
    an empty prune condition — the incremental run with no new data."""
    import os

    st = TableStore(str(tmp_path / "kb"))
    base = spark.createDataFrame(pd.DataFrame({
        "bucket": ["a", "b"], "k": [1, 2], "v": ["x", "y"]}))
    snap1 = st.write(base, "t", partition_by=["bucket"])
    empty = spark.createDataFrame([], base.schema)
    snap2 = st.merge(empty, "t", key_cols=["bucket", "k"])
    assert snap2.properties["merge_mode"] == "pruned"
    assert snap2.properties["rewritten_partitions"] == []
    rows = {(r.bucket, r.k): r.v for r in st.read(spark, "t").collect()}
    assert rows == {("a", 1): "x", ("b", 2): "y"}
    # pure carry-over: same inodes for every leaf
    for part in ("a", "b"):
        d1 = os.path.join(snap1.path, f"bucket={part}")
        for f in os.listdir(d1):
            if f.endswith(".parquet"):
                assert (os.stat(os.path.join(d1, f)).st_ino
                        == os.stat(os.path.join(
                            snap2.path, f"bucket={part}", f)).st_ino)


def test_merge_empty_string_partition_falls_back(spark, tmp_path):
    """'' and NULL both land in __HIVE_DEFAULT_PARTITION__: a pruned
    commit of '' rows would shadow the NULL leaf and silently drop its
    rows — must take the full rewrite instead."""
    st = TableStore(str(tmp_path / "kb"))
    base = spark.createDataFrame(pd.DataFrame({
        "bucket": [None, "b"], "k": [1, 2], "v": ["nullrow", "y"]}))
    st.write(base, "t", partition_by=["bucket"])
    upd = spark.createDataFrame(pd.DataFrame(
        {"bucket": [""], "k": [9], "v": ["empty"]}))
    snap = st.merge(upd, "t", key_cols=["bucket", "k"])
    assert snap.properties["merge_mode"] == "full-rewrite"
    assert "NULL/empty" in snap.properties["merge_fallback_reason"]
    got = {(r.bucket, r.k): r.v for r in st.read(spark, "t").collect()}
    # the NULL-partition row SURVIVES ('' reads back as NULL from the
    # default partition too — both rows live there, distinct keys)
    assert got[(None, 1)] == "nullrow" and got[(None, 9)] == "empty"
    assert len(got) == 3


def test_compact_shrinks_files_preserves_rows(spark, tmp_path):
    """After several fast-appends the snapshot accumulates a<sid>-*
    files; compact() rewrites to O(partitions) files with identical row
    content and the same partition layout."""
    import os

    st = TableStore(str(tmp_path / "kb"))
    base = spark.createDataFrame(pd.DataFrame({
        "bucket": ["a", "b"] * 4, "k": list(range(8)),
        "v": [f"v{i}" for i in range(8)]}))
    st.write(base, "t", partition_by=["bucket"])
    for i in range(3):
        extra = spark.createDataFrame(pd.DataFrame(
            {"bucket": ["a", "b"], "k": [100 + 2 * i, 101 + 2 * i],
             "v": ["x", "y"]}))
        st.append(extra, "t")

    def n_files(path):
        return sum(1 for root, _d, files in os.walk(path)
                   for f in files if f.endswith(".parquet"))

    before_rows = sorted(map(tuple, st.read(spark, "t").collect()))
    before_files = n_files(st.current_snapshot("t").path)
    snap = st.compact(spark, "t")
    assert snap.properties["operation"] == "compact"
    assert snap.properties["partition_by"] == ["bucket"]
    after_files = n_files(snap.path)
    assert after_files < before_files
    assert after_files <= 2 + 1   # one-ish file per partition value
    assert sorted(map(tuple, st.read(spark, "t").collect())) == before_rows
    # and a later append still works on the compacted layout
    st.append(spark.createDataFrame(pd.DataFrame(
        {"bucket": ["a"], "k": [999], "v": ["z"]})), "t")
    assert st.read(spark, "t").count() == len(before_rows) + 1


def test_pruned_merge_delete_only_emptied_partition_stays_empty(
        spark, tmp_path):
    """ADVICE r03 (high): when a merge leaves an affected partition with
    ZERO rows (delete_keys-only key that was its partition's sole
    occupant), the write emits no leaf for it — the carry-over must NOT
    hardlink the old leaf back and resurrect the evicted rows."""
    st = TableStore(str(tmp_path / "s"))
    base = spark.createDataFrame(pd.DataFrame(
        {"bucket": [0, 1, 1], "conv_id": ["a", "b", "c"], "v": [1, 2, 3]}))
    st.write(base, "t", partition_by=["bucket"])
    empty = spark.createDataFrame([], base.schema)
    dk = spark.createDataFrame(pd.DataFrame(
        {"bucket": [0], "conv_id": ["a"]}))
    snap = st.merge(empty, "t", ["bucket", "conv_id"], delete_keys=dk)
    assert snap.properties["merge_mode"] == "pruned"
    got = sorted((r.bucket, r.conv_id, r.v)
                 for r in st.read(spark, "t").collect())
    assert got == [(1, "b", 2), (1, "c", 3)]
    # a later merge into OTHER partitions must not resurrect it either
    upd = spark.createDataFrame(pd.DataFrame(
        {"bucket": [1], "conv_id": ["b"], "v": [20]}))
    st.merge(upd, "t", ["bucket", "conv_id"])
    got = sorted((r.bucket, r.conv_id, r.v)
                 for r in st.read(spark, "t").collect())
    assert got == [(1, "b", 20), (1, "c", 3)]


def test_pruned_merge_mixed_replace_and_emptying_delete(spark, tmp_path):
    """One batch that both replaces rows in one partition and empties
    another: the replaced partition rewrites, the emptied one vanishes,
    untouched partitions hardlink over."""
    import os

    st = TableStore(str(tmp_path / "s"))
    base = spark.createDataFrame(pd.DataFrame(
        {"bucket": [0, 1, 2], "conv_id": ["a", "b", "c"], "v": [1, 2, 3]}))
    snap1 = st.write(base, "t", partition_by=["bucket"])
    upd = spark.createDataFrame(pd.DataFrame(
        {"bucket": [1], "conv_id": ["b"], "v": [20]}))
    dk = spark.createDataFrame(pd.DataFrame(
        {"bucket": [0], "conv_id": ["a"]}))
    snap2 = st.merge(upd, "t", ["bucket", "conv_id"], delete_keys=dk)
    got = sorted((r.bucket, r.conv_id, r.v)
                 for r in st.read(spark, "t").collect())
    assert got == [(1, "b", 20), (2, "c", 3)]
    # untouched bucket=2 leaf carried by hardlink (same inode)
    d1 = os.path.join(snap1.path, "bucket=2")
    for f in os.listdir(d1):
        if f.endswith(".parquet"):
            assert (os.stat(os.path.join(d1, f)).st_ino
                    == os.stat(os.path.join(
                        snap2.path, "bucket=2", f)).st_ino)


def test_pin_read_at_and_expiry(spark, tmp_path):
    """Snapshot pins (Iceberg tag analog): a pinned snapshot survives
    the retention-3 expiry indefinitely and stays readable through
    read_at with its own schema; unpinning lets the next commit retire
    it, after which read_at raises the explicit expired error."""
    import pytest

    st = TableStore(str(tmp_path / "s"))
    st.write(spark.createDataFrame(pd.DataFrame(
        {"k": ["a", "b"], "v": [1, 2]})), "t")
    sid = st.pin_snapshot("t", "wal")
    assert sid == 1
    for i in range(5):  # push far past the 3-snapshot retention window
        st.write(spark.createDataFrame(pd.DataFrame(
            {"k": ["a", "b"], "v": [10 + i, 20 + i]})), "t")
    old = {r.k: r.v for r in st.read_at(spark, "t", sid).collect()}
    assert old == {"a": 1, "b": 2}  # time travel to pre-overwrite state
    assert {r.k: r.v for r in st.read(spark, "t").collect()} == \
        {"a": 14, "b": 24}
    st.unpin_snapshot("t", "wal")
    st.write(spark.createDataFrame(pd.DataFrame(
        {"k": ["z"], "v": [0]})), "t")  # expiry pass runs on commit
    with pytest.raises(FileNotFoundError, match="expired"):
        st.read_at(spark, "t", sid)
    # unknown snapshot / pin targets fail loudly, unpin of absent = noop
    with pytest.raises(FileNotFoundError):
        st.read_at(spark, "t", 99)
    with pytest.raises(FileNotFoundError):
        st.pin_snapshot("t", "x", snapshot_id=99)
    st.unpin_snapshot("t", "never-existed")


def test_changelog_partition_pruned_and_fallback(spark, tmp_path):
    """Snapshot changelog (Iceberg changelog-scan analog): row-level
    insert/delete diff between two snapshots. After a pruned merge the
    changelog scan must read ONLY the changed partition (shared
    hardlinked leaves are skipped by inode identity — asserted on the
    result's input files); unpartitioned tables fall back to a full
    two-snapshot diff; expired/unknown snapshots fail loudly."""
    import pytest

    st = TableStore(str(tmp_path / "s"))
    base = spark.createDataFrame(pd.DataFrame(
        {"bucket": [0, 0, 1, 1, 2], "k": list("abcde"),
         "v": [1, 2, 3, 4, 5]}))
    s1 = st.write(base, "t", partition_by=["bucket"])
    upd = spark.createDataFrame(pd.DataFrame(
        {"bucket": [1, 1], "k": ["c", "f"], "v": [30, 6]}))
    s2 = st.merge(upd, "t", key_cols=["bucket", "k"])
    assert s2.properties["merge_mode"] == "pruned"

    log = st.changelog(spark, "t", s1.snapshot_id)
    rows = {(r._change_type, r.bucket, r.k, r.v) for r in log.collect()}
    assert rows == {("delete", 1, "c", 3),
                    ("insert", 1, "c", 30),
                    ("insert", 1, "f", 6)}
    # pruned: only bucket=1 files are scanned on BOTH sides
    files = log.inputFiles()
    assert files and all("bucket=1" in f for f in files)

    # self-diff = empty, schema carries _change_type
    self_diff = st.changelog(spark, "t", s2.snapshot_id,
                             s2.snapshot_id)
    assert self_diff.count() == 0
    assert "_change_type" in self_diff.columns

    # unpartitioned fallback (full overwrite between snapshots)
    st.write(spark.createDataFrame(pd.DataFrame(
        {"k": ["a", "b"], "v": [1, 2]})), "u")
    st.write(spark.createDataFrame(pd.DataFrame(
        {"k": ["a", "b"], "v": [1, 20]})), "u")
    rows = {(r._change_type, r.k, r.v)
            for r in st.changelog(spark, "u", 1).collect()}
    assert rows == {("delete", "b", 2), ("insert", "b", 20)}

    with pytest.raises(FileNotFoundError):
        st.changelog(spark, "t", 99)
