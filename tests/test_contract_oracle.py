"""In-suite guard for the driver contract: run a representative subset of
__spark_entry__ queries against their DuckDB oracles at sf0.001 (the full
set runs via tools/check_contract.py and the driver's own correctness
gate)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SUBSET = [
    "q01_pricing_summary",
    "q06_supplier_majority_vote",
    "q09_latest_event_per_user",
    "q15_doc_quality",
    "q16_doc_langid",
    "q19_doc_minhash",
    "q21_emb_topk",
    "q23_extract_triples_synthetic",
    "q24_fold_mentions_synthetic",
    "q29_facet_cube",
    "q35_event_sessions",
]

# The driver's correctness artifact stops at q50 (VERDICT r03 #6): every
# query above that is the driver's blind spot, so the suite itself must
# prove the full contract — pytest fails if any of them diverges from
# its oracle. Derived dynamically so a new qNN can never be forgotten.
DRIVER_BLIND = sorted(
    n for n in entry.queries()
    if n[0] == "q" and n[1:3].isdigit() and int(n[1:3]) > 50
    and n in entry.oracle_sql())
SUBSET = SUBSET + DRIVER_BLIND

# Genuinely non-SQL-expressible queries may ship without an oracle, but
# ONLY by being named here — the dynamic derivation above silently drops
# a >q50 query missing its oracle_sql entry, so without this guard a
# rows-only query could slip in unvalidated (VERDICT r04 #8).
ROWS_ONLY_ALLOWLIST: set = set()


def test_every_query_is_oracle_checked():
    missing = (set(entry.queries()) - set(entry.oracle_sql())
               - ROWS_ONLY_ALLOWLIST)
    assert not missing, (
        f"queries without an oracle_sql entry (add the oracle or add to "
        f"ROWS_ONLY_ALLOWLIST with justification): {sorted(missing)}")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6f}"
    return str(v)


def _key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    df = entry.queries()[name](spark, SF_DIR)
    pdf = df.toPandas()
    res = duck.sql(entry.oracle_sql()[name])
    duck_rows = res.fetchall()
    assert sorted(pdf.columns) == sorted(res.columns)
    assert len(pdf) == len(duck_rows)
    a = _key([tuple(r) for r in pdf.itertuples(index=False)], list(pdf.columns))
    b = _key(duck_rows, res.columns)
    assert a == b


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"entity", "cnt"}
