"""IcebergTableStore: everything verifiable WITHOUT the Iceberg runtime
jar — the generated MERGE INTO text (null-safe keys, quoting), and the
fail-fast when the session has no catalog configured."""

import pytest

from softcite_kb_spark.storage_iceberg import (
    IcebergTableStore, merge_into_sql)


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


def test_missing_catalog_fails_fast(spark):
    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        IcebergTableStore(spark, catalog="nope", namespace="kb")
