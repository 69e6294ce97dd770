"""IcebergTableStore: everything verifiable WITHOUT the Iceberg runtime
jar — the generated SQL text (null-safe keys, quoting, delete clause),
the fail-fast when the session has no catalog configured, and the
SEMANTICS of the group-replacement plan: the generated DELETE executes
against DuckDB on the same data a TableStore.merge processes, and both
stores must converge to the same table."""

import duckdb
import pandas as pd
import pytest

from softcite_kb_spark.storage import TableStore
from softcite_kb_spark.storage_iceberg import (
    IcebergTableStore, delete_by_keys_sql, merge_into_sql,
    snapshot_metadata_sql)


def _duck_quote(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def test_merge_into_sql_null_safe_keys():
    sql = merge_into_sql("`prod`.`kb`.`nodes`", "`src`",
                         ["conv_id", "turn_idx"])
    assert "MERGE INTO `prod`.`kb`.`nodes` t" in sql
    assert "USING `src` s" in sql
    # null-safe equality — the TableStore._anti_by_keys semantics, so a
    # pipeline moved between stores merges identically on NULL keys
    assert "t.`conv_id` <=> s.`conv_id`" in sql
    assert "t.`turn_idx` <=> s.`turn_idx`" in sql
    assert "WHEN MATCHED THEN UPDATE SET *" in sql
    assert "WHEN NOT MATCHED THEN INSERT *" in sql


def test_merge_into_sql_rejects_empty_keys_and_escapes():
    with pytest.raises(ValueError, match="key column"):
        merge_into_sql("t", "s", [])
    sql = merge_into_sql("tbl", "v", ["we`ird"])
    assert "t.`we``ird` <=> s.`we``ird`" in sql


def test_delete_by_keys_sql_shape():
    sql = delete_by_keys_sql("`prod`.`kb`.`triples`", "`keys`",
                             ["bucket", "conv_id"])
    assert sql.startswith("DELETE FROM `prod`.`kb`.`triples` AS t")
    assert "EXISTS (SELECT 1 FROM `keys` s WHERE" in sql
    # null-safe, and spelled so the SAME predicate runs in DuckDB
    assert "t.`bucket` IS NOT DISTINCT FROM s.`bucket`" in sql
    assert "t.`conv_id` IS NOT DISTINCT FROM s.`conv_id`" in sql
    with pytest.raises(ValueError, match="key column"):
        delete_by_keys_sql("t", "k", [])


def test_snapshot_metadata_sql_shape():
    sql = snapshot_metadata_sql("`c`.`ns`.`t`")
    assert "`c`.`ns`.`t`.`history` h" in sql
    assert "`c`.`ns`.`t`.`snapshots` s" in sql
    assert "is_current_ancestor" in sql
    assert "ORDER BY h.made_current_at DESC LIMIT 1" in sql


def test_missing_catalog_fails_fast(spark):
    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        IcebergTableStore(spark, catalog="nope", namespace="kb")


def test_group_replacement_matches_tablestore_semantics(spark, tmp_path):
    """Store-contract check: run the SAME merge — multi-row-per-key
    batch + delete_keys eviction + NULL key components — through
    (a) TableStore.merge and (b) the exact statements
    IcebergTableStore.merge generates (DELETE by keys, then append),
    executed by DuckDB. Both must yield the same multiset of rows."""
    base = pd.DataFrame({
        "bucket": [0, 0, 1, 1, 2, 2, None],
        "conv_id": ["a", "a", "b", "b", "c", "c", "z"],
        "v": [1, 2, 3, 4, 5, 6, 7]})
    base["bucket"] = base["bucket"].astype("object")
    # batch REPLACES conv b (two rows -> one), delete_keys evicts conv a
    batch = pd.DataFrame({"bucket": [1], "conv_id": ["b"], "v": [30]})
    dk = pd.DataFrame({"bucket": [0, None], "conv_id": ["a", "z"]})
    key_cols = ["bucket", "conv_id"]

    # (a) TableStore
    st = TableStore(str(tmp_path / "ts"))
    sdf = spark.createDataFrame(
        base, schema="bucket int, conv_id string, v int")
    st.write(sdf, "t")
    st.merge(spark.createDataFrame(batch,
                                   schema="bucket int, conv_id string, v int"),
             "t", key_cols,
             delete_keys=spark.createDataFrame(
                 dk, schema="bucket int, conv_id string"))
    got_ts = sorted((r.bucket, r.conv_id, r.v)
                    for r in st.read(spark, "t").collect())

    # (b) DuckDB executing the generated statements
    con = duckdb.connect()
    con.register("base_src", base)
    con.execute("CREATE TABLE t AS SELECT "
                "CAST(bucket AS INT) bucket, conv_id, CAST(v AS INT) v "
                "FROM base_src")
    keys = pd.concat([batch[key_cols], dk[key_cols]]).drop_duplicates()
    con.register("merge_keys", keys)
    sql = delete_by_keys_sql("t", "merge_keys", key_cols,
                             quote=_duck_quote)
    con.execute(sql)
    con.register("batch_src", batch)
    con.execute("INSERT INTO t SELECT CAST(bucket AS INT), conv_id, "
                "CAST(v AS INT) FROM batch_src")
    got_duck = sorted(map(tuple, con.execute(
        "SELECT bucket, conv_id, v FROM t").fetchall()))

    assert got_ts == got_duck
    # the eviction actually removed conv a and the NULL-keyed row
    assert ("a" not in {c for _, c, _ in got_ts}
            and "z" not in {c for _, c, _ in got_ts})
    assert got_ts == [(1, "b", 30), (2, "c", 5), (2, "c", 6)]


def test_unique_key_merge_rejects_duplicate_key_batch(
        spark, monkeypatch, tmp_path):
    """unique_key=True guards BEFORE executing: a batch with several
    rows per key must raise, not surface as a mid-merge engine
    cardinality error."""
    spark.conf.set("spark.sql.catalog.faketest",
                   "org.apache.iceberg.spark.SparkCatalog")
    store = IcebergTableStore(spark, catalog="faketest", namespace="kb")
    monkeypatch.setattr(store, "exists", lambda t: True)
    df = spark.createDataFrame(pd.DataFrame(
        {"k": ["a", "a"], "v": [1, 2]}))
    with pytest.raises(ValueError, match="duplicate key"):
        store.merge(df, "t", ["k"], unique_key=True)


def test_merge_materializes_batch_before_delete(
        spark, monkeypatch, tmp_path):
    """ADVICE r04: a group-replacement merge whose batch plan READS the
    target table must evaluate against pre-delete state — the store
    must run its materializer barrier on the batch BEFORE executing the
    DELETE, or the deferred append re-evaluates post-delete and loses
    rows. Pinned by recording the order of (materialize, DELETE,
    append) without an Iceberg runtime."""
    import pandas as pd

    events = []

    class _WriterStub:
        def append(self):
            events.append("append")

    class _DfProxy:
        """Delegates to a real DataFrame; intercepts writeTo."""

        def __init__(self, df):
            self._df = df

        def __getattr__(self, name):
            return getattr(self._df, name)

        def writeTo(self, ident):
            return _WriterStub()

    def recording_materializer(df):
        events.append("materialize")
        return _DfProxy(df)

    spark.conf.set("spark.sql.catalog.faketest3",
                   "org.apache.iceberg.spark.SparkCatalog")
    store = IcebergTableStore(spark, catalog="faketest3", namespace="kb",
                              materializer=recording_materializer)
    monkeypatch.setattr(store, "exists", lambda t: True)

    real_sql = spark.sql

    def recording_sql(stmt, *a, **kw):
        if stmt.lstrip().upper().startswith("DELETE"):
            events.append("delete")
            return None
        return real_sql(stmt, *a, **kw)

    monkeypatch.setattr(store, "spark", spark)
    monkeypatch.setattr(type(spark), "sql", lambda self, s, *a, **kw:
                        recording_sql(s, *a, **kw), raising=True)
    try:
        df = spark.createDataFrame(pd.DataFrame(
            {"k": ["a", "b"], "v": [1, 2]}))
        store.merge(df, "t", ["k"])
    finally:
        monkeypatch.undo()
    assert events == ["materialize", "delete", "append"]


def test_manifest_root_property(spark):
    spark.conf.set("spark.sql.catalog.faketest2",
                   "org.apache.iceberg.spark.SparkCatalog")
    bare = IcebergTableStore(spark, catalog="faketest2")
    with pytest.raises(RuntimeError, match="manifest_root"):
        _ = bare.root
    rooted = IcebergTableStore(spark, catalog="faketest2",
                               manifest_root="/mnt/kb")
    assert rooted.root == "/mnt/kb"


def test_rewrite_data_files_sql_shape():
    from softcite_kb_spark.storage_iceberg import rewrite_data_files_sql

    sql = rewrite_data_files_sql("prod", "kb", "triples")
    assert sql == ("CALL `prod`.system.rewrite_data_files("
                   "table => '`kb`.`triples`')")
    # embedded quotes in a table name are escaped, not injected
    sql2 = rewrite_data_files_sql("c", "n", "we'ird")
    assert "'`n`.`we''ird`'" in sql2


def test_tag_sql_shapes():
    """pin/unpin emit Iceberg named-ref DDL: CREATE OR REPLACE TAG
    (re-pin moves the tag, matching TableStore) AS OF VERSION, and
    idempotent DROP TAG IF EXISTS."""
    from softcite_kb_spark.storage_iceberg import (create_tag_sql,
                                                   drop_tag_sql)

    s = create_tag_sql("cat.kb.t", "ingest23-wal", 42)
    assert s == ("ALTER TABLE cat.kb.t CREATE OR REPLACE TAG "
                 "`ingest23-wal` AS OF VERSION 42")
    assert drop_tag_sql("cat.kb.t", "ingest23-wal") == \
        "ALTER TABLE cat.kb.t DROP TAG IF EXISTS `ingest23-wal`"


def test_pin_unpin_execute_tag_ddl(spark, monkeypatch):
    """pin_snapshot resolves the current snapshot (explicit id
    respected) and executes the tag DDL; unpin executes the drop —
    the verbs the incremental WAL calls, so IncrementalKGPipeline
    runs unchanged over the Iceberg store."""
    from softcite_kb_spark.storage_iceberg import IcebergTableStore
    from softcite_kb_spark.storage import Snapshot

    spark.conf.set("spark.sql.catalog.faketest4",
                   "org.apache.iceberg.spark.SparkCatalog")
    store = IcebergTableStore(spark, catalog="faketest4", namespace="kb")
    stmts = []
    monkeypatch.setattr(
        type(spark), "sql",
        lambda self, s, *a, **kw: stmts.append(s), raising=True)
    try:
        monkeypatch.setattr(
            store, "current_snapshot",
            lambda t: Snapshot(snapshot_id=7, table=t, path="x",
                               row_count=1, schema_ddl="",
                               committed_at=0.0))
        assert store.pin_snapshot("t", "wal") == 7
        assert store.pin_snapshot("t", "wal", snapshot_id=3) == 3
        store.unpin_snapshot("t", "wal")
    finally:
        monkeypatch.undo()
    assert stmts == [
        "ALTER TABLE `faketest4`.`kb`.`t` CREATE OR REPLACE TAG `wal` "
        "AS OF VERSION 7",
        "ALTER TABLE `faketest4`.`kb`.`t` CREATE OR REPLACE TAG `wal` "
        "AS OF VERSION 3",
        "ALTER TABLE `faketest4`.`kb`.`t` DROP TAG IF EXISTS `wal`",
    ]
