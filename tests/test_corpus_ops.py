"""Tests for training-data-pipeline operators: text analysis, dedup
(exact/minhash/simhash/jaccard), similarity search, multimodal plumbing."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from softcite_kb_spark.operators import dedup, multimodal, similarity, textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog in the park"),
        (2, "the quick brown fox jumps over the lazy dog in the park"),  # exact dup of 1
        (3, "The quick brown fox jumps over the lazy dog in the park!"),  # norm-dup of 1
        (4, "the quick brown fox jumps over the lazy cat in the park"),   # near-dup
        (5, "der hund ist ein guter freund und die katze auch nicht"),
        (6, "le chat est dans la maison et il ne sort pas du tout"),
        (7, "completely different content about spark query planning engines"),
        (8, "12345 67890 !!! ???"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup(spark, docs):
    groups = dedup.exact_duplicate_groups(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert sorted(g.doc_ids) == [1, 2, 3] and g.keep_id == 1
    kept = dedup.dedup_exact(docs)
    assert kept.count() == 6
    assert {r.doc_id for r in kept.select("doc_id").collect()} == {1, 4, 5, 6, 7, 8}


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = dedup.lsh_candidate_pairs(docs, num_perm=16, bands=8, shingle_n=2)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) in got
    # verify with exact jaccard
    j = dedup.jaccard_pairs(docs, pairs, shingle_n=2)
    jm = {(r.id_a, r.id_b): r.jaccard for r in j.collect()}
    assert jm[(1, 2)] == 1.0
    assert 0.3 < jm.get((1, 4), jm.get((4, 1), 0.5)) < 1.0 or (1, 4) not in jm


def test_simhash_near_pairs(spark, docs):
    pairs = similarity and dedup.simhash_near_pairs(docs, max_hamming=8)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(1, 2)] == 0
    # near-dup doc 4 within a few bits of 1; unrelated docs far away
    if (1, 4) in got:
        assert got[(1, 4)] <= 8
    assert (1, 7) not in got


def test_text_stats_and_quality(spark, docs):
    q = textops.quality_score(docs)
    rows = {r.doc_id: r for r in q.collect()}
    assert rows[1].n_tokens == 12
    assert rows[8].punct_ratio > 0.2
    assert rows[1].quality > rows[8].quality
    assert 0.0 <= rows[8].quality <= 1.0


def test_lang_id(spark, docs):
    lid = textops.lang_id(docs)
    got = {r.doc_id: r.lang_pred for r in lid.collect()}
    assert got[1] == "en" and got[5] == "de" and got[6] == "fr"
    assert got[8] == "und"


def test_fingerprint_normalization(spark, docs):
    fp = textops.add_fingerprint(docs).collect()
    m = {r.doc_id: r.fingerprint for r in fp}
    assert m[1] == m[2] == m[3]
    assert m[1] != m[4]


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np
    rng = np.random.default_rng(5)
    base = rng.normal(size=(20, 8))
    base[1] = base[0] * 2.0 + 0.001          # near-parallel to 0
    pdf = pd.DataFrame({
        "vec_id": range(20),
        "embedding": [row.astype("float32").tolist() for row in base],
    })
    return spark.createDataFrame(pdf)


def test_brute_force_topk(spark, vectors):
    queries = vectors.filter(F.col("vec_id") == 0) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    got = similarity.brute_force_topk(vectors, queries, k=3).collect()
    assert len(got) == 3
    assert got[0].vec_id == 1 and got[0].rank == 1  # the planted neighbor
    assert got[0].cos > 0.99


def test_lsh_topk_subset_of_bucket(spark, vectors):
    queries = vectors.filter(F.col("vec_id") == 0) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    approx = similarity.lsh_topk(vectors, queries, dim=8, k=3, n_planes=2)
    rows = approx.collect()
    assert all(r.query_id == 0 for r in rows)
    # planted near-parallel vector lands in the same half-space bucket
    assert any(r.vec_id == 1 for r in rows)


def test_embedding_near_dup(spark, vectors):
    pairs = similarity.embedding_near_dup_pairs(
        vectors, dim=8, threshold=0.99, n_planes=2).collect()
    assert any((p.id_a, p.id_b) == (0, 1) for p in pairs)


def test_multiprobe_lsh_recall_floor(spark):
    """Multi-probe flips the smallest-|margin| sign bits: on clustered
    vectors (the data ANN is FOR — random vectors have no neighbor
    structure to recall), n_probe=4 must clear a 0.9 recall@5 floor vs
    brute force AND strictly beat the single-probe recall cliff.
    Deterministic: fixed rng seed, md5 plane constants."""
    import numpy as np

    rng = np.random.default_rng(7)
    dim, n_clusters, per = 64, 25, 10
    centers = rng.normal(size=(n_clusters, dim))
    rows = []
    for c in range(n_clusters):
        for j in range(per):
            v = centers[c] + 0.15 * rng.normal(size=dim)
            rows.append((c * per + j, [float(x) for x in v]))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    q = df.filter(F.col("vec_id") % per == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    truth = {(r.query_id, r.vec_id)
             for r in similarity.brute_force_topk(df, q, k=5).collect()}

    def recall(n_probe):
        got = {(r.query_id, r.vec_id) for r in similarity.lsh_topk(
            df, q, dim=dim, k=5, n_planes=6, n_probe=n_probe).collect()}
        return len(got & truth) / len(truth)

    r1, r4 = recall(1), recall(4)
    assert r4 >= 0.9, f"multi-probe recall {r4} below floor"
    assert r4 > r1, f"multi-probe {r4} must beat single-probe {r1}"


def test_probe_buckets_shape_and_bounds(spark):
    """n_probe=1 is exactly the base bucket; probes are distinct; an
    n_probe beyond n_planes+1 (more flips than planes) is rejected."""
    import pytest as _pytest

    d = spark.createDataFrame(pd.DataFrame({
        "v": [[0.5, -0.25, 0.125, 1.0, -1.0, 0.75, 0.3, -0.6]]}))
    one = d.select(similarity.probe_buckets(
        similarity.hyperplane_dots(F.col("v"), 8, 4), 4, 1).alias("p"))
    base = d.select(similarity.hyperplane_signs(
        F.col("v"), 8, 4).alias("b"))
    assert one.collect()[0].p == [base.collect()[0].b]
    four = d.select(similarity.probe_buckets(
        similarity.hyperplane_dots(F.col("v"), 8, 4), 4, 5).alias("p")
    ).collect()[0].p
    assert len(four) == len(set(four)) == 5
    with _pytest.raises(ValueError, match="n_probe"):
        similarity.probe_buckets(F.col("v"), 4, 6)


def test_multimodal_decode_roundtrip(spark):
    media = multimodal.synthesize_media(spark, n=30)
    decoded = multimodal.decode_media(media)
    joined = decoded.join(media.select("media_id",
                                       F.col("kind").alias("kind_true"),
                                       "meta"), "media_id")
    rows = joined.collect()
    assert len(rows) == 30
    for r in rows:
        assert r.kind == r.kind_true
        assert r.width == r.meta.declared_width
        assert r.height == r.meta.declared_height


def _media_df(spark, rows):
    pdf = pd.DataFrame(
        [(i, k, bytearray(p), {"declared_width": 0, "declared_height": 0})
         for i, (k, p) in enumerate(rows)],
        columns=["media_id", "kind", "payload", "meta"])
    return spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)


def test_bmp_real_decode_gradient(spark):
    """The REAL BMP path: a non-uniform gradient image round-trips
    through encode -> distributed decode with the exact pixel checksum,
    on a width whose row stride needs padding (the padding bytes must
    NOT leak into the checksum)."""
    import numpy as np

    w, h = 5, 4                       # stride 16, 1 pad byte per row
    px = (np.arange(h * w * 3, dtype=np.uint32) * 7 % 256).astype(np.uint8)
    px = px.reshape(h, w, 3)
    payload = multimodal.encode_bmp(px)
    assert (3 * w) % 4 != 0           # the stride really is padded
    df = _media_df(spark, [("image", payload)])
    r = multimodal.decode_media(df).collect()[0]
    assert (r.kind, r.width, r.height) == ("image", w, h)
    assert r.checksum == int(px.sum(dtype="int64")) % (2**31)
    assert r.n_bytes == len(payload) == 54 + h * 16


def test_bmp_top_down_rows(spark):
    """Negative header height = top-down row order; the decoded pixel
    matrix must match the original exactly either way."""
    import struct as st

    import numpy as np

    w, h = 3, 2
    px = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    bottom_up = multimodal.encode_bmp(px)
    assert (multimodal._decode_bmp_pixels(bottom_up) == px).all()
    # craft the top-down variant: height := -h, rows in natural order
    stride = (3 * w + 3) // 4 * 4
    body = b"".join(px[y].tobytes() + b"\x00" * (stride - 3 * w)
                    for y in range(h))
    top_down = (bottom_up[:22] + st.pack("<i", -h) + bottom_up[26:54] + body)
    assert (multimodal._decode_bmp_pixels(top_down) == px).all()


def test_wav_real_decode(spark):
    """The REAL WAV path: PCM frames round-trip with frame/channel
    counts and data-chunk checksum; an odd-sized data chunk is
    even-aligned without corrupting the checksum."""
    frames = bytes(range(200)) * 2      # 400 bytes, 2ch 16-bit -> 100 frames
    payload = multimodal.encode_wav(frames, n_channels=2,
                                    sample_rate=16000, bits=16)
    df = _media_df(spark, [("audio", payload)])
    r = multimodal.decode_media(df).collect()[0]
    assert (r.kind, r.width, r.height) == ("audio", 100, 2)
    assert r.checksum == sum(frames) % (2**31)
    # odd data chunk (1 sample byte short of alignment)
    odd = multimodal.encode_wav(b"\x01\x02\x03", n_channels=1,
                                sample_rate=8000, bits=8)
    r2 = multimodal.decode_media(_media_df(spark, [("audio", odd)])) \
        .collect()[0]
    assert (r2.width, r2.height, r2.checksum) == (3, 1, 6)


def test_mixed_format_batch_and_malformed(spark):
    """BMP + WAV + SKBM + poison payloads decode in ONE batch — magic
    dispatch never kills the stage."""
    import numpy as np

    bmp = multimodal.encode_bmp(np.full((2, 2, 3), 9, dtype=np.uint8))
    wav = multimodal.encode_wav(b"\x01\x02", n_channels=1, bits=8)
    skbm = (multimodal.MAGIC + bytes([0, 0, 0, 0])
            + __import__("struct").pack("<II", 4, 5) + b"xy")
    df = _media_df(spark, [
        ("image", bmp), ("audio", wav), ("image", skbm),
        ("image", b"BM" + b"\x00" * 20),            # truncated BMP
        ("audio", b"RIFF\x04\x00\x00\x00WAVE"),     # WAV without chunks
    ])
    got = {r.media_id: r for r in multimodal.decode_media(df).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0].checksum == 2 * 2 * 3 * 9
    assert got[1].width == 2 and got[2].width == 4


def test_resize_media_real_nearest_neighbor(spark):
    """resize_media runs a genuine resample for BMP: the checksum of the
    resized pixels equals the numpy nearest-neighbor reference; stub
    formats keep NULL resized_checksum."""
    import numpy as np

    w, h, tw, th = 7, 5, 4, 4
    px = (np.arange(h * w * 3, dtype=np.uint32) * 13 % 256).astype(np.uint8)
    px = px.reshape(h, w, 3)
    skbm = (multimodal.MAGIC + bytes([0, 0, 0, 0])
            + __import__("struct").pack("<II", 3, 3) + b"zz")
    df = _media_df(spark, [("image", multimodal.encode_bmp(px)),
                           ("image", skbm)])
    got = {r.media_id: r for r in
           multimodal.resize_media(df, target=(tw, th)).collect()}
    yi, xi = (np.arange(th) * h) // th, (np.arange(tw) * w) // tw
    expect = int(px[yi][:, xi].sum(dtype="int64")) % (2**31)
    assert got[0].resized_checksum == expect
    assert got[0].target_width == tw and got[0].target_height == th
    assert got[1].resized_checksum is None       # stub format: no pixels


def test_multimodal_malformed_dropped(spark):
    media = multimodal.synthesize_media(spark, n=6)
    bad = media.withColumn(
        "payload",
        F.when(F.col("media_id") < 2, F.lit(bytearray(b"nonsense")))
        .otherwise(F.col("payload")))
    assert multimodal.decode_media(bad).count() == 4
    kept_null = multimodal.decode_media(bad, drop_malformed=False)
    assert kept_null.count() == 6
    assert kept_null.filter(F.col("kind").isNull()).count() == 2


def test_frame_sample(spark):
    media = multimodal.synthesize_media(spark, n=12)
    frames = dedup and multimodal.frame_sample(media, every_n=2)
    rows = frames.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.frame_idx % 2 == 0 and r.frame_idx < r.n_frames


def test_shingles_short_docs_safe(spark):
    """Docs with < n tokens must yield EMPTY shingles, not a stage-killing
    slice(toks, 0, n) error (sequence(1,0) -> [1,0] descending trap)."""
    short = spark.createDataFrame(
        pd.DataFrame([(1, "one two"), (2, ""), (3, None), (4, "solo"),
                      (5, "alpha beta gamma delta")],
                     columns=["doc_id", "text"]))
    sh = {r.doc_id: r.sh for r in short.select(
        "doc_id", dedup.shingles(F.col("text")).alias("sh")).collect()}
    assert sh[1] == [] and sh[2] == [] and sh[3] == [] and sh[4] == []
    assert sh[5] == ["alpha beta gamma", "beta gamma delta"]
    # full minhash/LSH/jaccard path survives short docs
    mh = {r.doc_id: r.minhash for r in
          dedup.add_minhash(short, num_perm=4).collect()}
    assert mh[1] == [None] * 4 and mh[5][0] is not None
    pairs = dedup.lsh_candidate_pairs(short, num_perm=16, bands=4)
    j = dedup.jaccard_pairs(short, pairs)
    assert j.filter(F.col("jaccard").isNull()).count() == 0


def test_lsh_bands_divisibility_enforced(spark, docs):
    with pytest.raises(ValueError, match="divisible"):
        dedup.lsh_candidate_pairs(docs, num_perm=16, bands=5)


def test_simhash_kernels_agree(spark, docs):
    """All three SimHash kernels (hybrid default, zero-Python native,
    all-Python reference) must agree bit-for-bit, including empty/null/
    whitespace docs."""
    extra = spark.createDataFrame(
        pd.DataFrame([(100, ""), (101, None), (102, "   "), (103, "x")],
                     columns=["doc_id", "text"]))
    allx = docs.unionByName(extra)
    outs = [
        sorted((r.doc_id, r.simhash) for r in
               dedup.add_simhash(allx, impl=i).collect())
        for i in ("hybrid", "native", "pandas")
    ]
    assert outs[0] == outs[1] == outs[2]


def test_multimodal_null_payload_safe(spark):
    """A NULL payload is a poison row: dropped (or surfaced as NULL fields),
    never a stage-killing TypeError."""
    media = multimodal.synthesize_media(spark, n=4)
    null_row = spark.createDataFrame(
        pd.DataFrame([{"media_id": 99, "kind": "image", "payload": None,
                       "meta": {"declared_width": 1, "declared_height": 1}}]),
        schema=multimodal.MEDIA_SCHEMA)
    allm = media.unionByName(null_row)
    assert multimodal.decode_media(allm).count() == 4
    kept = multimodal.decode_media(allm, drop_malformed=False) \
        .filter(F.col("media_id") == 99).collect()
    assert len(kept) == 1 and kept[0].kind is None and kept[0].n_bytes == 0


def test_hyperplane_pandas_matches_expr(spark, vectors):
    """The O(1)-plan-size Arrow matmul path must bucket identically to the
    literal-expression path (signs only differ within fp-epsilon of a
    hyperplane — not reachable with the fixture vectors)."""
    from softcite_kb_spark.operators import similarity as sim

    e = vectors.select(
        "vec_id",
        sim.hyperplane_signs(F.col("embedding"), dim=8, n_planes=6,
                             impl="expr").alias("b_expr"),
        sim.hyperplane_signs(F.col("embedding"), dim=8, n_planes=6,
                             impl="pandas").alias("b_pandas"),
    )
    assert e.filter(F.col("b_expr") != F.col("b_pandas")).count() == 0
    # auto switches to pandas when the coefficient count is large
    big = sim.hyperplane_signs(F.col("embedding"), dim=768, n_planes=8,
                               impl="auto")
    assert "signs" in str(big)  # pandas_udf column, not a literal tree


def test_ivf_topk_recall(spark, vectors):
    """IVF probe search returns valid ranked neighbors; with n_probe high
    enough to cover all cells it equals the exact brute-force top-k."""
    q = vectors.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.rank): r.vec_id
             for r in similarity.brute_force_topk(vectors, q, k=3).collect()}
    full = {(r.query_id, r.rank): r.vec_id
            for r in similarity.ivf_topk(vectors, q, n_cells=4, n_probe=4,
                                         k=3).collect()}
    assert full == exact  # probing every cell == exhaustive search
    approx = similarity.ivf_topk(vectors, q, n_cells=4, n_probe=1, k=3)
    rows = approx.collect()
    assert all(r.rank <= 3 and r.query_id in (0, 1) for r in rows)
    # near-parallel planted pair (vec 1 ~ 2*vec 0) lands in the same cell:
    # 1-probe search must still find it
    top1 = {r.query_id: r.vec_id for r in rows if r.rank == 1}
    assert top1[0] == 1 and top1[1] == 0


def test_lsh_custom_materializer(spark, docs, tmp_path):
    """The self-join barrier is injectable: a durable scratch-table
    materializer (the cluster deployment) must produce the same candidate
    set as the default localCheckpoint."""
    import os

    calls = []

    def scratch(df):
        p = os.path.join(tmp_path, f"scratch{len(calls)}")
        calls.append(p)
        df.write.mode("overwrite").parquet(p)
        return spark.read.parquet(p)

    default = {(r.id_a, r.id_b) for r in dedup.lsh_candidate_pairs(
        docs, num_perm=16, bands=8, shingle_n=2).collect()}
    durable = {(r.id_a, r.id_b) for r in dedup.lsh_candidate_pairs(
        docs, num_perm=16, bands=8, shingle_n=2,
        materializer=scratch).collect()}
    assert durable == default and len(calls) == 1


def test_ivf_lloyd_refinement(spark, vectors):
    """Lloyd rounds move centroids but preserve the exhaustive-search
    invariant (probe-all == brute force) and stay deterministic across
    input partitionings."""
    q = vectors.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.rank): r.vec_id
             for r in similarity.brute_force_topk(vectors, q, k=3).collect()}
    refined = {(r.query_id, r.rank): r.vec_id
               for r in similarity.ivf_topk(
                   vectors, q, n_cells=4, n_probe=4, k=3,
                   lloyd_rounds=2).collect()}
    assert refined == exact
    # determinism: shuffled input -> identical 1-probe results
    a = sorted(map(tuple, similarity.ivf_topk(
        vectors, q, n_cells=4, n_probe=1, k=3, lloyd_rounds=2).collect()))
    b = sorted(map(tuple, similarity.ivf_topk(
        vectors.repartition(7), q, n_cells=4, n_probe=1, k=3,
        lloyd_rounds=2).collect()))
    assert a == b


def test_scrub_pii_and_clean_text(spark):
    rows = [
        (1, "mail bob@x.io and BOB.smith+tag@sub.example.co.uk now"),
        (2, "see https://a.io/p?q=1#frag or http://plain.org ok"),
        (3, "from 10.0.0.1 to 192.168.255.254, not 1.2.3.4.5 though"),
        (4, "clean\x01control\x02chars\tand   runs"),
        (5, None),
        (6, "1.1.1.1,2.2.2.2,3.3.3.3"),
        (7, "v1.2.3.4 8.8.8.8"),
        (8, "connect to 10.0.0.1. Then stop"),
        (9, "ends with 10.0.0.2."),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r.doc_id: r.clean for r in df.select(
        "doc_id",
        textops.clean_text(textops.scrub_pii(F.col("text"))).alias("clean"),
    ).collect()}
    assert out[1] == "mail <EMAIL> and <EMAIL> now"
    assert out[2] == "see <URL> or <URL> ok"
    # 1.2.3.4.5 is part of a LONGER dotted sequence -> not an IP at all
    # (boundary groups reject it; the old \b pattern emitted '<IP>.5')
    assert out[3] == "from <IP> to <IP>, not 1.2.3.4.5 though"
    assert out[4] == "cleancontrolchars and runs"
    assert out[5] is None
    # adjacent IPs share separator chars: the consumed-boundary case the
    # second pass exists for
    assert out[6] == "<IP>,<IP>,<IP>"
    # 'v1.2.3.4' — '1' is preceded by a letter (valid boundary), so the
    # quad IS scrubbed; a bare quad at end-of-text is caught by \z
    assert out[7] == "v<IP> <IP>"
    # sentence-final IP: trailing '.' must not defeat the scrub (dot
    # followed by non-digit / end-of-text is a valid boundary)
    assert out[8] == "connect to <IP>. Then stop"
    assert out[9] == "ends with <IP>."


def test_lang_id_null_and_empty_text(spark):
    """NULL/empty text must classify 'und', never fall through to 'es';
    empty text counts 0 tokens (not the split-[''] quirk)."""
    d = spark.createDataFrame(
        pd.DataFrame([(1, None), (2, ""), (3, "   "), (4, "el perro es un animal y no")],
                     columns=["doc_id", "text"]))
    langs = {r.doc_id: r.lang_pred for r in textops.lang_id(d).collect()}
    assert langs == {1: "und", 2: "und", 3: "und", 4: "es"}
    stats = {r.doc_id: r.n_tokens for r in textops.text_stats(d).collect()}
    assert stats[2] == 0 and stats[3] == 0 and stats[4] == 7


def test_decode_media_oversize_dims_dropped(spark):
    """A payload declaring a uint32 dimension >= 2^31 is poison, not a
    stage-killing Arrow overflow."""
    import struct as st
    bad = multimodal.MAGIC + bytes([0, 0, 0, 0]) + st.pack(
        "<II", 0xFFFFFFFF, 10) + b"body"
    media = multimodal.synthesize_media(spark, n=2).unionByName(
        spark.createDataFrame(
            pd.DataFrame([{"media_id": 99, "kind": "image",
                           "payload": bytearray(bad),
                           "meta": {"declared_width": 1,
                                    "declared_height": 1}}]),
            schema=multimodal.MEDIA_SCHEMA))
    assert multimodal.decode_media(media).count() == 2
    kept = multimodal.decode_media(media, drop_malformed=False) \
        .filter(F.col("media_id") == 99).collect()
    assert kept[0].width is None


def test_near_dup_multitable_recall(spark):
    """Multi-table LSH must recover pairs a single table's split loses,
    never lose one it had, and never duplicate a pair."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 16))
    rows = []
    for i in range(40):
        rows.append((2 * i, [float(x) for x in base[i]]))
        rows.append((2 * i + 1,
                     [float(x) for x in base[i] + 0.05 * rng.normal(size=16)]))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    truth = {(2 * i, 2 * i + 1) for i in range(40)}

    def pairs(n_tables):
        got = similarity.embedding_near_dup_pairs(
            df, dim=16, threshold=0.9, n_planes=5,
            n_tables=n_tables).collect()
        keys = [(r.id_a, r.id_b) for r in got]
        assert len(keys) == len(set(keys))   # deduped before scoring
        return set(keys)

    one, three = pairs(1), pairs(3)
    assert one <= three                       # union never loses a pair
    assert len(three & truth) > len(one & truth)   # recall improved
    assert len(three & truth) / len(truth) >= 0.9


def test_cap_buckets_matches_window_semantics(spark):
    """cap_buckets (groupBy-count + anti-join) must keep exactly the
    rows a window count(*) <= max filter would keep — same semantics,
    no single-reducer funnel."""
    import random

    rng = random.Random(7)
    rows = [(i, rng.choice(["hot"] * 6 + ["b", "c", "d"])) for i in range(200)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "bucket"]))
    from pyspark.sql import Window

    cap = 50
    want = sorted(r.id for r in df.withColumn(
        "n", F.count("*").over(Window.partitionBy("bucket")))
        .filter(F.col("n") <= cap).collect())
    got = sorted(r.id for r in
                 dedup.cap_buckets(df, ["bucket"], cap).collect())
    assert got == want and 0 < len(got) < 200
    # cap=0 disables
    assert dedup.cap_buckets(df, ["bucket"], 0).count() == 200


def _boilerplate_docs(spark, n=1000):
    """n near-identical docs (survive exact dedup: each has a unique
    suffix token) + a handful of distinct ones."""
    rows = [(i, "terms of service boilerplate text repeated verbatim "
             "across the corpus unique" + str(i)) for i in range(n)]
    rows += [(n + j, f"genuinely different document number {j} "
              f"about topic {j}") for j in range(5)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_simhash_pairs_bounded_on_planted_boilerplate(spark):
    """VERDICT r03: 10^3 near-identical docs (one hot chunk bucket)
    must NOT produce ~n^2/2 candidate pairs once max_bucket caps the
    blocking buckets."""
    docs = _boilerplate_docs(spark, 1000)
    n = dedup.simhash_near_pairs(docs, max_hamming=3, max_bucket=100).count()
    # uncapped would be ~499500 pairs from the hot buckets alone
    assert n < 100 * 100 * 4


def test_embedding_near_dup_bounded_on_planted_boilerplate(spark):
    """Same planted-boilerplate guarantee for the embedding LSH path
    (single- and multi-table)."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.normal(size=16)
    rows = [(i, (base + rng.normal(scale=1e-3, size=16)).tolist())
            for i in range(500)]
    rows += [(500 + j, rng.normal(size=16).tolist()) for j in range(5)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    for nt in (1, 2):
        n = similarity.embedding_near_dup_pairs(
            df, dim=16, threshold=0.0, n_planes=4, n_tables=nt,
            max_bucket=50).count()
        assert n < 50 * 50 * (4 ** 2) * nt, nt
    # uncapped blows up quadratically (sanity that the plant is real)
    n_uncapped = similarity.embedding_near_dup_pairs(
        df, dim=16, threshold=0.99, n_planes=4, max_bucket=0).count()
    assert n_uncapped > 100000


def test_near_dup_caps_are_opt_in():
    """ADVICE r04 (low): the bucket caps on the pre-existing public
    near-dup functions must default to 0 (disabled) — a non-zero
    default silently drops true near-duplicate pairs in a chunk-heavy
    corpus with no signal (the repo's no-silent-caps rule). Callers at
    scale opt in explicitly, as the planted-boilerplate tests do."""
    import inspect

    assert inspect.signature(dedup.simhash_near_pairs) \
        .parameters["max_bucket"].default == 0
    assert inspect.signature(similarity.embedding_near_dup_pairs) \
        .parameters["max_bucket"].default == 0


def test_lsh_candidate_pairs_bounded_on_planted_boilerplate(spark):
    docs = _boilerplate_docs(spark, 1000)
    n = dedup.lsh_candidate_pairs(
        docs, num_perm=16, bands=4, shingle_n=3, max_bucket=100).count()
    assert n < 100 * 100 * 4


def test_png_roundtrip_all_filters_and_colortypes(spark):
    """Real PNG decode: every scanline filter (0-4) x gray/RGB/RGBA x
    stored + compressed deflate, random pixels, exact reconstruction."""
    import numpy as np

    rng = np.random.default_rng(11)
    for shape in [(7, 5), (7, 5, 3), (6, 9, 4), (1, 1, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        want = px if px.ndim == 3 else px[:, :, None]
        for ft in range(5):
            for lvl in (0, 6):
                b = multimodal.encode_png(px, filter_type=ft, level=lvl)
                got = multimodal._decode_png_pixels(b)
                assert np.array_equal(got, want), (shape, ft, lvl)
                kind, w, h, cs = multimodal._decode_png(b)
                assert (kind, w, h) == ("image", shape[1], shape[0])
                assert cs == int(want.sum(dtype="int64")) % (2**31)


def test_png_poison_payloads_dropped(spark):
    """Truncation, CRC corruption, interlace, palette, depth-16 — all
    rejected by the decoder and DROPPED by decode_media (poison rows
    never kill the stage)."""
    import struct
    import zlib

    import numpy as np

    good = multimodal.encode_png(np.full((4, 6, 3), 9, np.uint8))

    def rebuild_ihdr(**kw):
        w, h, depth, ct, comp, fm, il = struct.unpack(
            ">IIBBBBB", good[16:29])
        vals = dict(w=w, h=h, depth=depth, ct=ct, comp=comp, fm=fm, il=il)
        vals.update(kw)
        ihdr = struct.pack(">IIBBBBB", vals["w"], vals["h"], vals["depth"],
                           vals["ct"], vals["comp"], vals["fm"], vals["il"])
        chunk = (struct.pack(">I", 13) + b"IHDR" + ihdr
                 + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
        return good[:8] + chunk + good[33:]

    crc_flip = bytearray(good)
    crc_flip[40] ^= 0xFF
    bad = [good[:30], good[:-5], bytes(crc_flip),
           rebuild_ihdr(il=1),         # Adam7
           rebuild_ihdr(ct=3),         # palette
           rebuild_ihdr(depth=16),
           rebuild_ihdr(w=2**20, h=2**14)]  # dimension bomb
    rows = [(i, "image", bytearray(p), {"declared_width": 4,
                                        "declared_height": 4})
            for i, p in enumerate([good] + bad)]
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])
    df = spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.decode_media(df).collect()
    assert [r.media_id for r in out] == [0]
    assert (out[0].width, out[0].height) == (6, 4)
    kept = multimodal.decode_media(df, drop_malformed=False).count()
    assert kept == len(rows)


def test_png_resize_real_nearest_neighbor(spark):
    """resize_media resamples DECODED PNG pixels (same nearest-neighbor
    index maps as BMP) — verified against a numpy reference."""
    import numpy as np

    rng = np.random.default_rng(23)
    px = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    payload = multimodal.encode_png(px, filter_type=2, level=6)
    df = spark.createDataFrame(pd.DataFrame(
        [(1, "image", bytearray(payload),
          {"declared_width": 7, "declared_height": 10})],
        columns=["media_id", "kind", "payload", "meta"]),
        schema=multimodal.MEDIA_SCHEMA)
    got = multimodal.resize_media(df, target=(4, 5)).collect()[0]
    yi = (np.arange(5) * 10) // 5
    xi = (np.arange(4) * 7) // 4
    want = int(px[yi][:, xi].sum(dtype="int64")) % (2**31)
    assert got.resized_checksum == want
    assert (got.width, got.height) == (7, 10)


def test_png_fixture_nbytes_closed_form(spark):
    """media_from_documents_png's stored-deflate payload length matches
    the oracle's closed form 68 + h*(1+3w) for every doc."""
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": list(range(60)), "text": ["x"] * 60}))
    out = multimodal.decode_media(
        multimodal.media_from_documents_png(docs)).collect()
    assert len(out) == 60
    for r in out:
        did = r.media_id
        w, h, v = 1 + did % 13, 1 + (did * 3) % 11, did % 251
        assert (r.width, r.height) == (w, h)
        assert r.n_bytes == 68 + h * (1 + 3 * w)
        assert r.checksum == (3 * w * h * v) % (2**31)


def test_jpeg_roundtrip_layouts_and_tolerance(spark):
    """Real baseline JPEG codec: uniform images reconstruct EXACTLY
    (DC-only blocks, flat quant=1) across grayscale / 4:4:4 / 4:2:0 /
    restart markers; random images round-trip within the DCT rounding
    bound (|err| <= 1 gray, <= 3 color via chroma rounding); padded
    (non-multiple-of-8) dimensions crop back correctly."""
    import numpy as np

    rng = np.random.default_rng(29)
    # exact: uniform values, every scan layout
    for v in (0, 77, 250):
        g = np.full((16, 24), v, np.uint8)
        assert (multimodal._decode_jpeg_pixels(
            multimodal.encode_jpeg(g)) == v).all()
        c3 = np.full((24, 16, 3), v, np.uint8)
        for ss, ri in (("444", 0), ("420", 0), ("420", 2)):
            got = multimodal._decode_jpeg_pixels(
                multimodal.encode_jpeg(c3, subsampling=ss,
                                       restart_interval=ri))
            assert got.shape == (24, 16, 3) and (got == v).all(), (v, ss)
    # bounded error on random pixels + odd dimensions (edge padding)
    g = rng.integers(0, 256, (37, 29), dtype=np.uint8)
    dec = multimodal._decode_jpeg_pixels(multimodal.encode_jpeg(g))
    assert dec.shape == g.shape
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 1
    px = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
    dec = multimodal._decode_jpeg_pixels(
        multimodal.encode_jpeg(px, subsampling="444"))
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 3
    # neutral-chroma 4:2:0 with restarts: chroma is exactly
    # subsample-invariant, luma within rounding
    y = rng.integers(0, 256, (21, 34), dtype=np.uint8)
    n3 = np.stack([y, y, y], axis=-1)
    dec = multimodal._decode_jpeg_pixels(
        multimodal.encode_jpeg(n3, subsampling="420",
                               restart_interval=3))
    assert np.abs(dec.astype(int) - n3.astype(int)).max() <= 1


def test_jpeg_coefficient_idct_matches_reference(spark):
    """The decoder's vectorized IDCT path agrees with an independent
    per-block float IDCT reference on random QUANTIZED coefficients
    shipped through the real entropy coder (catches zigzag, dequant,
    Huffman and einsum wiring errors in one shot)."""
    import numpy as np

    rng = np.random.default_rng(31)
    # random sparse coefficient field expressed as pixels whose encode
    # round-trips: encode random pixels, decode, then re-encode the
    # DECODED pixels — a fixpoint of the codec, so the second decode
    # must reproduce them exactly (quant=1 => requantization is exact)
    px = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    once = multimodal._decode_jpeg_pixels(multimodal.encode_jpeg(px))
    twice = multimodal._decode_jpeg_pixels(
        multimodal.encode_jpeg(once))
    assert np.abs(twice.astype(int) - once.astype(int)).max() <= 1
    # independent IDCT reference on the DC-only path
    C = multimodal._dct_basis()
    blk = np.zeros((8, 8))
    blk[0, 0] = 8 * (200 - 128)
    ref = C.T @ blk @ C + 128
    assert np.allclose(ref, 200)


def test_jpeg_poison_payloads_dropped(spark):
    """Truncation, progressive SOF, marker desync, dimension bombs —
    all rejected and DROPPED by decode_media."""
    import numpy as np
    import struct as st

    good = multimodal.encode_jpeg(np.full((8, 16), 50, np.uint8))
    # flip SOF0 -> SOF2 (progressive)
    sof_at = good.index(b"\xff\xc0")
    prog = good[:sof_at + 1] + b"\xc2" + good[sof_at + 2:]
    # dimension bomb: rewrite SOF dims huge
    bomb = bytearray(good)
    st.pack_into(">HH", bomb, sof_at + 5, 2**15, 2**15)
    bad = [good[:20], good[:-12], prog, bytes(bomb),
           b"\xff\xd8\x00\x00" + good[4:]]
    rows = [(i, "image", bytearray(p), {"declared_width": 8,
                                        "declared_height": 8})
            for i, p in enumerate([good] + bad)]
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload",
                                      "meta"])
    df = spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.decode_media(df).collect()
    assert [r.media_id for r in out] == [0]
    assert (out[0].width, out[0].height) == (16, 8)
    assert multimodal.decode_media(
        df, drop_malformed=False).count() == len(rows)


def test_jpeg_resize_real_nearest_neighbor(spark):
    """resize_media resamples DECODED JPEG pixels like BMP/PNG —
    verified against a numpy reference on an exactly-reconstructible
    uniform image."""
    import numpy as np

    px = np.full((16, 8, 3), 123, np.uint8)
    payload = multimodal.encode_jpeg(px, subsampling="420")
    df = spark.createDataFrame(pd.DataFrame(
        [(1, "image", bytearray(payload),
          {"declared_width": 8, "declared_height": 16})],
        columns=["media_id", "kind", "payload", "meta"]),
        schema=multimodal.MEDIA_SCHEMA)
    got = multimodal.resize_media(df, target=(4, 4)).collect()[0]
    assert got.resized_checksum == (4 * 4 * 3 * 123) % (2**31)
    assert (got.width, got.height) == (8, 16)


def test_cross_split_contamination(spark):
    """Planted leakage: an eval doc sharing a full 3-gram window with a
    train doc reports the exact overlap ratio; clean eval docs report
    0; too-short docs report 0/0 without killing the stage."""
    rows = [
        (1, "train", "the quick brown fox jumps over the lazy dog"),
        (2, "val",   "the quick brown fox sat still"),   # leaks 2 grams
        (3, "val",   "completely novel evaluation content here today"),
        (4, "test",  "the quick brown fox jumps over the lazy dog"),  # full leak
        (5, "test",  "too short"),                        # 0 shingles
    ]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["doc_id", "split", "text"]))
    got = {r.doc_id: (r.n_shingles, r.n_overlapping, r.overlap_ratio)
           for r in dedup.cross_split_contamination(df).collect()}
    assert set(got) == {2, 3, 4, 5}
    # doc 2: grams of 6 tokens = 4; 'the quick brown','quick brown fox' leak
    assert got[2] == (4, 2, 0.5)
    assert got[3][1] == 0 and got[3][2] == 0.0
    # doc 4 is an exact copy: every gram leaks
    assert got[4][0] == 7 and got[4] == (7, 7, 1.0)
    assert got[5] == (0, 0, 0.0)


def test_mp4_roundtrip_demux(spark):
    """encode_mp4 -> real ISO BMFF demux: tkhd dimensions, per-sample
    stsz resolution, checksum over the demuxed sample extents (varying
    per-frame sizes so the fixed-size shortcut cannot fake it)."""
    frames = [bytes([i + 1]) * (10 + 7 * i) for i in range(5)]
    payload = multimodal.encode_mp4(frames, 32, 18)
    assert len(payload) == (multimodal._MP4_HEADER_BYTES
                            + sum(len(f) for f in frames) + 4 * 5)
    df = spark.createDataFrame(pd.DataFrame(
        [(1, "video", bytearray(payload),
          {"declared_width": 32, "declared_height": 18})],
        columns=["media_id", "kind", "payload", "meta"]),
        schema=multimodal.MEDIA_SCHEMA)
    got = multimodal.decode_media(df).collect()[0]
    assert (got.kind, got.width, got.height) == ("video", 32, 18)
    assert got.checksum == sum(sum(f) for f in frames) % (2**31)


def test_mp4_multichunk_and_fixed_stsz(spark):
    """The chunk walk handles multi-chunk stco with an stsc entry whose
    range extends to the last chunk, and the fixed-sample-size stsz
    form — a hand-built container, not encode_mp4's single-chunk
    shape."""
    import struct as st

    fsz, n = 24, 4
    frames = [bytes([40 + i]) * fsz for i in range(n)]
    box, full = multimodal._mp4_box, multimodal._mp4_full
    ftyp = box(b"ftyp", b"isom" + st.pack(">I", 512) + b"isomiso2")
    mdat = box(b"mdat", b"".join(frames))
    off0 = len(ftyp) + 8
    off1 = off0 + 2 * fsz
    tkhd = full(b"tkhd", 0, 3, st.pack(">IIIII", 0, 0, 1, 0, n)
                + b"\x00" * 8 + st.pack(">HHHH", 0, 0, 0, 0)
                + st.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)
                + st.pack(">II", 12 << 16, 8 << 16))
    hdlr = full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                + b"V\x00")
    stsz = full(b"stsz", 0, 0, st.pack(">II", fsz, n))  # fixed size
    stsc = full(b"stsc", 0, 0, st.pack(">IIII", 1, 1, 2, 1))
    stco = full(b"stco", 0, 0, st.pack(">III", 2, off0, off1))
    stbl = box(b"stbl", stsz + stsc + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", trak)
    payload = ftyp + mdat + moov
    kind, w, h, cs = multimodal._decode_bytes(payload)
    assert (kind, w, h) == ("video", 12, 8)
    assert cs == sum(sum(f) for f in frames) % (2**31)
    samples = multimodal._mp4_video_track(payload)[2]
    assert samples == [(off0, fsz), (off0 + fsz, fsz),
                       (off1, fsz), (off1 + fsz, fsz)]


def test_mp4_poison_payloads_dropped(spark):
    """Truncation, out-of-bounds sample offsets, stsz count bombs,
    audio-only tracks — all rejected by the demuxer and DROPPED by
    decode_media (poison rows never kill the stage)."""
    import struct as st

    frames = [bytes([9]) * 30 for _ in range(3)]
    good = multimodal.encode_mp4(frames, 10, 3)

    stco_oob = bytearray(good)
    j = good.index(b"stco")
    stco_oob[j + 12:j + 16] = st.pack(">I", len(good))
    stsz_bomb = bytearray(good)
    k = good.index(b"stsz")
    stsz_bomb[k + 12:k + 16] = st.pack(">I", 2**30)  # sample count
    soun = bytearray(good)
    soun[good.index(b"vide"):good.index(b"vide") + 4] = b"soun"
    bad = [good[:40], good[:-10], bytes(stco_oob), bytes(stsz_bomb),
           bytes(soun)]
    rows = [(i, "video", bytearray(p), {"declared_width": 10,
                                        "declared_height": 3})
            for i, p in enumerate([good] + bad)]
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload",
                                      "meta"])
    df = spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.decode_media(df).collect()
    assert [r.media_id for r in out] == [0]
    assert (out[0].width, out[0].height) == (10, 3)
    assert multimodal.decode_media(df, drop_malformed=False).count() \
        == len(rows)


def test_decoder_error_classes_are_poison_not_stage_killers(spark):
    """Two crafted rows that raise OUTSIDE the (ValueError, TypeError,
    IndexError) family the kernels used to catch: a PNG whose chunks are
    CRC-valid but whose IDAT is not a deflate stream (zlib.error), and a
    JPEG whose SOF segment is shorter than its fixed-layout unpack
    (struct.error). Both must be DROPPED by decode_media AND
    resize_media — not kill the mapInPandas stage."""
    import struct as st
    import zlib

    import numpy as np

    good = multimodal.encode_png(np.full((4, 6, 3), 9, np.uint8))
    # replace IDAT data with same-length garbage and RE-SIGN the CRC so
    # the chunk walk passes and the failure happens inside inflate
    i = good.index(b"IDAT")
    dlen = st.unpack(">I", good[i - 4:i])[0]
    garbage = bytes((7 * k + 13) % 251 for k in range(dlen))
    bad_png = (good[:i - 4]
               + st.pack(">I", dlen) + b"IDAT" + garbage
               + st.pack(">I", zlib.crc32(b"IDAT" + garbage))
               + good[i + 8 + dlen:])
    # SOI + SOF0 with declared length 4 => 2 bytes of segment data,
    # shorter than the ">BHHB" header unpack
    bad_jpeg = b"\xff\xd8\xff\xc0\x00\x04\x01\x02\xff\xd9"
    good_jpeg = multimodal.encode_jpeg(np.full((8, 8), 5, np.uint8))
    rows = [(0, "image", bytearray(good), {}),
            (1, "image", bytearray(good_jpeg), {}),
            (2, "image", bytearray(bad_png), {}),
            (3, "image", bytearray(bad_jpeg), {})]
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload",
                                      "meta"])
    df = spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.decode_media(df).collect()
    assert sorted(r.media_id for r in out) == [0, 1]
    resized = multimodal.resize_media(df, target=(2, 2)).collect()
    assert sorted(r.media_id for r in resized) == [0, 1]
    assert all(r.resized_checksum is not None for r in resized)


def test_mp4_frame_sample_real(spark):
    """frame_sample on MP4 emits one row per sampled REAL sample extent
    (index, byte size, checksum from the container's sample table);
    legacy SKBM videos keep the heuristic count with NULL extents, and
    poison payloads are dropped."""
    frames = [bytes([i]) * (8 + i) for i in range(5)]
    mp4 = multimodal.encode_mp4(frames, 4, 2)
    skbm = (multimodal.MAGIC + bytes([2, 0, 0, 0])
            + bytes(8) + b"\x00" * 48)  # 64 bytes -> 4 heuristic frames
    rows = [(1, "video", bytearray(mp4), {"declared_width": 4,
                                          "declared_height": 2}),
            (2, "video", bytearray(skbm), {"declared_width": 0,
                                           "declared_height": 0}),
            (3, "video", bytearray(b"garbage-payload!"),
             {"declared_width": 0, "declared_height": 0}),
            (4, "image", bytearray(mp4), {"declared_width": 4,
                                          "declared_height": 2})]
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload",
                                      "meta"])
    df = spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)
    got = multimodal.frame_sample(df, every_n=2).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r.media_id, []).append(r)
    m = sorted(by_id[1], key=lambda r: r.frame_idx)
    assert [(r.frame_idx, r.n_frames, r.frame_bytes, r.frame_checksum)
            for r in m] == [
        (i, 5, len(frames[i]), sum(frames[i]) % (2**31))
        for i in (0, 2, 4)]
    s = sorted(by_id[2], key=lambda r: r.frame_idx)
    assert [(r.frame_idx, r.n_frames) for r in s] == [(0, 4), (2, 4)]
    assert all(r.frame_bytes is None and r.frame_checksum is None
               for r in s)
    assert 3 not in by_id and 4 not in by_id  # poison + kind filter


def test_mp4_fixture_closed_form(spark):
    """media_from_documents_mp4's demuxed fields match the q68 oracle's
    closed forms for every doc (incl. the frame-value wraparound past
    byte 250)."""
    ids = list(range(40)) + [246 + i for i in range(10)] + [1255]
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": ids, "text": ["x"] * len(ids)}))
    out = multimodal.decode_media(
        multimodal.media_from_documents_mp4(docs)).collect()
    assert len(out) == len(ids)
    for r in out:
        did = r.media_id
        w, h = 4 * (1 + did % 5), 4 * (1 + (did * 3) % 7)
        n, v = 1 + did % 6, did % 251
        assert (r.kind, r.width, r.height) == ("video", w, h)
        assert r.n_bytes == multimodal._MP4_HEADER_BYTES + n * (w * h + 4)
        want = sum(w * h * ((v + i) % 251) for i in range(n)) % (2**31)
        assert r.checksum == want


def test_mp4_crafted_structure_raises_valueerror_only(spark):
    """Review regression: crafted containers whose malformation lands
    in dict lookups, list indexing or short struct reads must raise
    ValueError (the class decode_media's poison tolerance catches) —
    not KeyError/IndexError/struct.error, which would kill the stage."""
    import struct as st

    import pytest

    frames = [bytes([5]) * 20 for _ in range(3)]
    good = multimodal.encode_mp4(frames, 5, 4)

    no_minf = bytearray(good)
    j = good.index(b"minf")
    no_minf[j:j + 4] = b"xinf"  # vide hdlr + tkhd present, minf gone

    # stsc with a second entry whose first_chunk lies beyond stco's
    # entry count: entry-1's range would index stco[99] (IndexError
    # pre-fix). Rebuild stsc with 2 entries (box grows 12 bytes).
    k = good.index(b"stsc") - 4
    ksz = st.unpack(">I", good[k:k + 4])[0]
    stsc2 = multimodal._mp4_full(
        b"stsc", 0, 0, st.pack(">I", 2)
        + st.pack(">III", 1, 1, 1) + st.pack(">III", 100, 1, 1))
    bad_stsc = good[:k] + stsc2 + good[k + ksz:]
    # (outer box sizes now lie about their length; the box walk must
    # reject that too, and with ValueError)

    # stsz as a too-short final box: truncate right after its verflags
    z = good.index(b"stsz") - 4
    short_stsz = bytearray(good[:z + 12])
    short_stsz[z:z + 4] = st.pack(">I", 12)

    for p in (bytes(no_minf), bad_stsc, bytes(short_stsz)):
        with pytest.raises(ValueError):
            multimodal._decode_bytes(p)

    rows = [(i, "video", bytearray(p), {"declared_width": 5,
                                        "declared_height": 4})
            for i, p in enumerate(
                [good, bytes(no_minf), bad_stsc, bytes(short_stsz)])]
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload",
                                      "meta"])
    df = spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.decode_media(df).collect()
    assert [r.media_id for r in out] == [0]
    assert multimodal.frame_sample(df, every_n=1).filter(
        "media_id != 0").count() == 0


def test_mp4_fixed_stsz_small_samples_accepted(spark):
    """Review regression: the stsz bomb guard must not reject a valid
    fixed-size container whose samples are under 4 bytes (the len/4
    bound prices the VARIABLE form's table entries, not sample data)."""
    import struct as st

    n, fsz = 300, 1  # 300 one-byte samples in a ~1 KB file
    box, full = multimodal._mp4_box, multimodal._mp4_full
    ftyp = box(b"ftyp", b"isom" + st.pack(">I", 512) + b"isomiso2")
    body = bytes(range(44, 44 + 50)) * 6
    mdat = box(b"mdat", body[:n])
    off0 = len(ftyp) + 8
    tkhd = full(b"tkhd", 0, 3, st.pack(">IIIII", 0, 0, 1, 0, n)
                + b"\x00" * 8 + st.pack(">HHHH", 0, 0, 0, 0)
                + st.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000) + st.pack(">II", 3 << 16, 2 << 16))
    hdlr = full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                + b"V\x00")
    stsz = full(b"stsz", 0, 0, st.pack(">II", fsz, n))
    stsc = full(b"stsc", 0, 0, st.pack(">IIII", 1, 1, n, 1))
    stco = full(b"stco", 0, 0, st.pack(">II", 1, off0))
    stbl = box(b"stbl", stsz + stsc + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    payload = ftyp + mdat + box(b"moov", trak)
    kind, w, h, cs = multimodal._decode_bytes(payload)
    assert (kind, w, h) == ("video", 3, 2)
    assert cs == sum(body[:n]) % (2**31)


def test_repetition_stats_hand_computed(spark):
    """Gopher-style repetition metrics vs hand-computed values: coverage
    fractions (incl. the >1 clamp on overlapping duplicate trigrams),
    the gram-DESC tie-break, and the short/NULL-text degenerate rows."""
    d = spark.createDataFrame(
        [(1, "a b a b a b"),     # top2 'a b'x3 covers all chars; dup3 clamps
         (2, "a b c a b c"),     # top2 tie 'a b'/'b c' -> larger gram wins
         (3, "hello"),           # no grams at all
         (4, None),              # NULL text
         (5, "u v w x")],        # all grams unique
        "doc_id long, text string")
    rows = {r.doc_id: r for r in textops.repetition_stats(d).collect()}
    assert (rows[1].top_gram, rows[1].top_gram_count) == ("a b", 3)
    assert rows[1].top_gram_char_frac == 1.0   # 3 occurrences x 2 chars / 6
    assert rows[1].dup_gram_char_frac == 1.0   # raw 12/6 = 2.0, clamped
    assert (rows[2].top_gram, rows[2].top_gram_count) == ("b c", 2)
    assert rows[2].top_gram_char_frac == pytest.approx(4 / 6, abs=1e-6)
    assert rows[2].dup_gram_char_frac == 1.0   # 'a b c' x2 -> 6/6
    for did in (3, 4):
        assert rows[did].top_gram is None
        assert rows[did].top_gram_count == 0
        assert rows[did].top_gram_char_frac == 0.0
        assert rows[did].dup_gram_char_frac == 0.0
    assert (rows[5].top_gram, rows[5].top_gram_count) == ("w x", 1)
    assert rows[5].top_gram_char_frac == 0.5   # 1 x 2 chars / 4
    assert rows[5].dup_gram_char_frac == 0.0
    assert len(rows) == 5


def test_mp4_resize_real_first_frame(spark):
    """resize_media resamples the DECODED first gry8 frame of an MP4
    (same nearest-neighbor index maps as the image formats) — verified
    against a numpy reference on non-uniform pixels; an opaque-fourcc
    container keeps NULL resized_checksum."""
    import numpy as np

    rng = np.random.default_rng(31)
    w, h = 11, 6
    f0 = rng.integers(0, 256, size=h * w, dtype=np.uint8)
    frames = [f0.tobytes(), bytes([1]) * (w * h)]
    payload = multimodal.encode_mp4(frames, w, h)
    opaque = bytearray(payload)
    j = payload.index(b"gry8")
    opaque[j:j + 4] = b"avc1"
    rows = [(1, "video", bytearray(payload), {"declared_width": w,
                                              "declared_height": h}),
            (2, "video", opaque, {"declared_width": w,
                                  "declared_height": h})]
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload",
                                      "meta"])
    df = spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in
           multimodal.resize_media(df, target=(4, 3)).collect()}
    yi = (np.arange(3) * h) // 3
    xi = (np.arange(4) * w) // 4
    want = int(f0.reshape(h, w)[yi][:, xi].sum(dtype="int64")) % (2**31)
    assert got[1].resized_checksum == want
    assert (got[1].width, got[1].height) == (w, h)
    assert got[2].resized_checksum is None  # opaque codec, real metadata
    assert (got[2].width, got[2].height) == (w, h)


def test_mp4_resize_poison_gry8_dropped(spark):
    """Round-5 ADVICE (high): a gry8 container whose first stsz entry
    disagrees with tkhd width*height passes _decode_bytes but fails in
    the pixel decode, and a zero-dimension gry8 container decodes to a
    (0,0) array whose resample would index out of bounds — both rows
    must be DROPPED by resize_media (documented poison tolerance), and
    a good row in the same batch must survive."""
    w, h = 6, 4
    good = multimodal.encode_mp4([bytes([5]) * (w * h)], w, h)
    # first frame one byte short of width*height
    mismatched = multimodal.encode_mp4([bytes([7]) * (w * h - 1)], w, h)
    # zero-dimension container with a consistent (empty) first sample
    zerodim = multimodal.encode_mp4([b""], 0, 0)
    rows = [(1, "video", bytearray(good), {"declared_width": w,
                                           "declared_height": h}),
            (2, "video", bytearray(mismatched), {"declared_width": w,
                                                 "declared_height": h}),
            (3, "video", bytearray(zerodim), {"declared_width": 0,
                                              "declared_height": 0})]
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload",
                                      "meta"])
    df = spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_media(df, target=(3, 3)).collect()
    assert [r.media_id for r in out] == [1]
    assert out[0].resized_checksum == (3 * 3 * 5) % (2**31)
