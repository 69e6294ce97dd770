"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The actual codecs are NOT available
in this container, so the decode kernels are deterministic stubs behind
``_decode_bytes`` (clearly marked), while everything Spark-side — schema,
batching, partitioning, UDF signatures — is real and tested.

Payload wire format for the synthetic fixtures: 16-byte header
``SKBM`` + kind byte + 3 reserved + width uint32 + height uint32, then
payload bytes. The "decoder" parses the header (what a real libjpeg/ffmpeg
binding would do with the full payload).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"SKBM"
KINDS = {0: "image", 1: "audio", 2: "video"}

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("declared_width", T.IntegerType()),
        T.StructField("declared_height", T.IntegerType()),
    ])),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("checksum", T.LongType()),
])


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (the fixture generator)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind_id = i % 3
        w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        body = rng.integers(0, 256, size=int(rng.integers(64, 256)),
                            dtype=np.uint8).tobytes()
        payload = MAGIC + bytes([kind_id, 0, 0, 0]) + struct.pack("<II", w, h) + body
        rows.append((i, KINDS[kind_id], bytearray(payload), (w, h)))
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])
    pdf["meta"] = pdf["meta"].map(
        lambda t: {"declared_width": t[0], "declared_height": t[1]})
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media fixtures derived from a (doc_id, text) table.

    Header fields are modular functions of doc_id and the body is the
    UTF-8 text, so every field the decoder emits (kind, width, height,
    n_bytes, checksum) is reconstructible relationally — this is what lets
    the driver value-check the decode path end-to-end against a SQL oracle
    instead of trusting the stub. Arrow-batched fixture generation, not a
    hot path.
    """

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                kind_id = did % 3
                w = 8 + did % 56
                h = 8 + (did * 7) % 56
                body = (text or "").encode("utf-8")
                rows["media_id"].append(did)
                rows["kind"].append(KINDS[kind_id])
                rows["payload"].append(
                    MAGIC + bytes([kind_id, 0, 0, 0])
                    + struct.pack("<II", w, h) + body)
                rows["meta"].append(
                    {"declared_width": w, "declared_height": h})
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "text").mapInPandas(
        build, schema=MEDIA_SCHEMA)


def _decode_bytes(payload: bytes) -> tuple[str, int, int, int]:
    """STUB DECODER — deterministic header parse standing in for a real
    codec (PIL/ffmpeg are not installed in this container). Returns
    (kind, width, height, checksum). Raises on malformed payloads exactly
    like a real decoder would."""
    if payload is None or len(payload) < 16 or payload[:4] != MAGIC:
        raise ValueError("not a SKBM payload")
    kind = KINDS.get(payload[4])
    if kind is None:
        raise ValueError(f"unknown kind byte {payload[4]}")
    w, h = struct.unpack("<II", payload[8:16])
    # uint32 header vs int32 schema: a declared dimension >= 2^31 would
    # kill the stage at Arrow conversion AFTER this "successful" decode —
    # reject it here so it takes the malformed-payload path instead
    if w >= 2**31 or h >= 2**31:
        raise ValueError(f"dimension out of int32 range: {w}x{h}")
    checksum = sum(payload[16:]) % (2**31)
    return kind, w, h, checksum


def decode_media(df: DataFrame, drop_malformed: bool = True) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (media_id, payload).

    Batch shape: the iterator yields one decoded frame per input batch —
    constant memory per task regardless of partition size. Malformed
    payloads are dropped (or surfaced as NULL rows with
    ``drop_malformed=False``) instead of failing the task: at 100 TB a
    poison payload must never kill a stage.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "width": [], "height": [],
                   "n_bytes": [], "checksum": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    # bytes(None) raises TypeError — a NULL payload is just
                    # another poison row, it must not kill the stage either
                    kind, w, h, cs = _decode_bytes(
                        bytes(payload) if payload is not None else None)
                except (ValueError, TypeError):
                    if drop_malformed:
                        continue
                    kind, w, h, cs = None, None, None, None
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(payload) if payload is not None else 0)
                out["checksum"].append(cs)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        decode, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(DECODED_SCHEMA.fields + [
    T.StructField("target_width", T.IntegerType()),
    T.StructField("target_height", T.IntegerType()),
])


def resize_media(df: DataFrame, target: tuple[int, int] = (32, 32)) -> DataFrame:
    """Resize plumbing: decode + attach target dims. The pixel resample is
    the stubbed part (no PIL here) — a real kernel replaces the body of the
    lambda; partitioning/batching stays identical."""
    tw, th = target
    decoded = decode_media(df)
    return decoded.withColumn("target_width", F.lit(tw)) \
                  .withColumn("target_height", F.lit(th))


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id,
    frame_idx) rows for sampled frames. Frame count is derived
    deterministically from the payload length (stub for real demuxing)."""
    frames = (
        decode_media(df.filter(F.col("kind") == "video"))
        .withColumn("n_frames", (F.col("n_bytes") / 16).cast("int"))
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1,
                                 F.lit(every_n))))
    )
    return frames.select("media_id", "frame_idx", "n_frames")
