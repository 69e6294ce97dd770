"""Batched property tests: invariants checked over a few hundred
generated inputs in ONE DataFrame per property (a Spark job per
hypothesis example would be prohibitively slow, so examples are
deterministic md5-seeded batches evaluated column-wise)."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from softcite_kb_spark.functions.text import (block_key, capitalized_variant,
                                              hyphen_variant, norm_name)
from softcite_kb_spark.operators import dedup, textops


def _word(i: int, salt: str) -> str:
    h = hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
    return "".join(c for c in h[:2 + int(h[10], 16) % 6] if c.isalpha()) or "x"


def _texts(n: int = 300):
    out = []
    for i in range(n):
        h = int(hashlib.md5(f"t:{i}".encode()).hexdigest()[:4], 16)
        n_words = h % 7  # 0..6 tokens — exercises the short-doc edge
        words = [_word(j, f"w{i}") for j in range(n_words)]
        sep = "  " if h % 5 == 0 else " "
        txt = sep.join(words)
        if h % 4 == 0:
            txt += "!?."
        if h % 11 == 0:
            txt = " " + txt + " "
        out.append(txt)
    out += ["", "   ", None]
    return out


@pytest.fixture(scope="module")
def prop_df(spark):
    txts = _texts()
    return spark.createDataFrame(
        pd.DataFrame({"i": range(len(txts)), "text": txts})).persist()


def test_prop_shingle_count(spark, prop_df):
    """|shingles_n(text)| == max(0, n_nonempty_tokens - n + 1), for n=2,3."""
    toks = F.filter(textops.tokens(F.col("text")), lambda t: t != "")
    df = prop_df.select(
        "i", F.size(toks).alias("nt"),
        F.size(dedup.shingles(F.col("text"), 2)).alias("s2"),
        F.size(dedup.shingles(F.col("text"), 3)).alias("s3"),
    ).filter(F.col("text").isNotNull())
    bad = df.filter(
        (F.col("s2") != F.greatest(F.col("nt") - 1, F.lit(0)))
        | (F.col("s3") != F.greatest(F.col("nt") - 2, F.lit(0)))).count()
    assert bad == 0


def test_prop_norm_name_idempotent(spark, prop_df):
    """norm_name and block_key are idempotent; block_key is invariant
    under the capitalized variant."""
    d = prop_df.filter(F.col("text").isNotNull()).select(
        norm_name(F.col("text")).alias("n1"),
        block_key(F.col("text")).alias("b1"),
        F.upper("text").alias("up"),
    ).select(
        "n1", "b1", "up",
        norm_name(F.col("n1")).alias("n2"),
        block_key(F.col("b1")).alias("b2"),
        block_key(capitalized_variant(F.col("up"))).alias("bv"),
    )
    assert d.filter(F.col("n1") != F.col("n2")).count() == 0
    assert d.filter(F.col("b1") != F.col("b2")).count() == 0
    # capitalized_variant may be NULL (not all-caps / unchanged); where it
    # exists its blocking key must equal the original's
    assert d.filter(F.col("bv").isNotNull()
                    & (F.col("bv") != F.col("b1"))).count() == 0


def test_prop_hyphen_variant_involution(spark, prop_df):
    """hyphen_variant applied twice returns the original, wherever defined
    (exactly-one-separator rule makes it an involution)."""
    d = prop_df.filter(F.col("text").isNotNull()).select(
        F.col("text"),
        hyphen_variant(F.col("text")).alias("v1"),
    ).withColumn("v2", hyphen_variant(F.col("v1")))
    bad = d.filter(F.col("v1").isNotNull()
                   & (F.col("v2") != F.col("text"))).count()
    assert bad == 0


def test_prop_fingerprint_punct_invariance(spark, prop_df):
    """fingerprint is invariant under punctuation/whitespace injection and
    case changes."""
    d = prop_df.filter(F.col("text").isNotNull()).select(
        textops.fingerprint(F.col("text")).alias("f0"),
        textops.fingerprint(F.concat(F.lit("  "), F.upper("text"),
                                     F.lit("!!  "))).alias("f1"),
    )
    assert d.filter(F.col("f0") != F.col("f1")).count() == 0


def test_prop_minhash_monotone_under_containment(spark):
    """A doc's minhash slots can only DECREASE (or stay) when shingles are
    added: min over a superset <= min over the subset, slotwise."""
    base = ["alpha beta gamma delta epsilon zeta eta theta",
            "one two three four five six seven eight nine ten"]
    rows = []
    for i, t in enumerate(base):
        rows.append((2 * i, t))
        rows.append((2 * i + 1, t + " extra tokens appended here now"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    mh = {r.doc_id: r.minhash
          for r in dedup.add_minhash(df, num_perm=8).collect()}
    for i in range(2):
        sub, sup = mh[2 * i], mh[2 * i + 1]
        assert all(s2 <= s1 for s1, s2 in zip(sub, sup))


def test_prop_png_roundtrip_random_images(spark):
    """PNG encode -> decode is the identity over ~150 deterministic
    md5-seeded images spanning dims 1..17, all channel counts, all five
    scanline filters, and stored vs compressed deflate — checked in one
    Python pass (the codec is the kernel of the mapInPandas stage)."""
    import numpy as np

    from softcite_kb_spark.operators import multimodal as mm

    for i in range(150):
        h = hashlib.md5(f"png:{i}".encode()).hexdigest()
        rng = np.random.default_rng(int(h[:8], 16))
        w = 1 + int(h[8:10], 16) % 17
        ht = 1 + int(h[10:12], 16) % 17
        c = (1, 3, 4)[i % 3]
        shape = (ht, w) if c == 1 else (ht, w, c)
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        want = px if px.ndim == 3 else px[:, :, None]
        b = mm.encode_png(px, filter_type=i % 5, level=(0, 6)[i % 2])
        got = mm._decode_png_pixels(b)
        assert np.array_equal(got, want), (i, shape, i % 5)
        # every single-byte corruption of the chunk body region must
        # either still decode to the SAME pixels or raise ValueError —
        # never return wrong pixels silently (CRC catches body flips)
        if i % 25 == 0:
            pos = 8 + (int(h[12:16], 16) % (len(b) - 20))
            bad = bytearray(b)
            bad[pos] ^= 0xFF
            try:
                got2 = mm._decode_png_pixels(bytes(bad))
                assert np.array_equal(got2, want), (i, pos)
            except ValueError:
                pass


def test_prop_cap_buckets_equals_window_filter(spark):
    """cap_buckets == window count filter for random bucket layouts and
    caps, including empty input and cap larger than any bucket."""
    from pyspark.sql import Window

    rows = []
    for i in range(400):
        h = hashlib.md5(f"cb:{i}".encode()).hexdigest()
        rows.append((i, int(h[:2], 16) % 7, int(h[2:4], 16) % 3))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "b1", "b2"])).persist()
    for cap in (1, 3, 57, 10_000):
        w = Window.partitionBy("b1", "b2")
        want = sorted(r.id for r in df.withColumn(
            "n", F.count("*").over(w)).filter(F.col("n") <= cap).collect())
        got = sorted(r.id for r in dedup.cap_buckets(
            df, ["b1", "b2"], cap).collect())
        assert got == want, cap
    empty = spark.createDataFrame([], df.schema)
    assert dedup.cap_buckets(empty, ["b1", "b2"], 5).count() == 0
    df.unpersist(blocking=True)
