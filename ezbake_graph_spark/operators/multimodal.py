"""Multimodal column operators (SURVEY.md §2K brief: opaque binary
payloads + typed metadata, decode/feature-extract as Arrow-batched
pandas UDFs).

The container has no image/audio codecs (no PIL/libav), so the decode
kernel is a clearly-marked DETERMINISTIC STUB (``_fake_decode``) — but
the Spark-side plumbing is real and what matters at 100 TB: binary
columns flow through Arrow into ``mapInPandas`` batches, metadata is
computed vectorized per batch, and nothing ever collects to the
driver.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.registry import register

_BINARY_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       octet_length(encode(text)) % 640 AS fake_width,
       (octet_length(encode(text)) * 7) % 480 AS fake_height,
       lang AS media_lang
FROM documents
ORDER BY doc_id
"""


@register("multimodal_binary_meta", oracle=_BINARY_META_SQL, tags=("K-extra",))
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata (schema plumbing): treat the encoded text
    as the binary payload and compute typed metadata columns from it —
    the query shape an image/audio table would use."""
    d = tables.load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    n_bytes = F.length(payload)
    return d.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        (n_bytes % 640).alias("fake_width"),
        ((n_bytes * 7) % 480).alias("fake_height"),
        F.col("lang").alias("media_lang"),
    ).orderBy("doc_id")


def _fake_decode(payload: bytes) -> tuple[int, float, int]:
    """STUB decode — deterministic fake standing in for an image/audio
    decoder (real decoders are not installed in this container).
    Returns (n_pixels, mean_intensity, checksum16). Raises on empty
    payloads like a real decoder would on corrupt input. The mean is
    a single exact-int division (NO round): both engines divide the
    identical integer pair, so the double is bit-identical."""
    if not payload:
        raise ValueError("empty payload: cannot decode")
    n_pixels = len(payload)
    mean_intensity = sum(payload) / len(payload)
    checksum16 = sum(payload[:16]) % 65536
    return n_pixels, mean_intensity, checksum16


_DECODE_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_pixels,
       CAST(list_aggregate(list_transform(str_split(text, ''), c -> ord(c)),
                           'sum') AS DOUBLE)
         / octet_length(encode(text)) AS mean_intensity,
       CAST(list_aggregate(list_transform(str_split(substr(text, 1, 16), ''),
                                          c -> ord(c)), 'sum') % 65536
            AS BIGINT) AS checksum16
FROM documents
ORDER BY doc_id
"""


@register("multimodal_decode_stub", oracle=_DECODE_SQL, tags=("K-extra",))
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode / feature-extract over binary columns via mapInPandas
    (Arrow batches). The decode itself is the deterministic stub
    above; the batch shape, schema, and partitioning are the real
    100 TB plumbing. SQL-oracled: the fixture text is pure ASCII
    (verified octet_length == length at every SF), so the oracle can
    recompute byte sums with per-char ord() — the per-doc mean is one
    exact integer division in both engines."""
    import pandas as pd

    d = tables.load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_pixels": [d0 for d0, _, _ in decoded],
                    "mean_intensity": [d1 for _, d1, _ in decoded],
                    "checksum16": [d2 for _, _, d2 in decoded],
                }
            )

    schema = "doc_id bigint, n_pixels int, mean_intensity double, checksum16 int"
    return d.mapInPandas(decode_batches, schema).orderBy("doc_id")


_FRAME_SAMPLE_SQL = """
WITH f AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n,
         unnest(range(0, octet_length(encode(text)), 64)) AS frame_offset
  FROM documents WHERE doc_id < 50
)
SELECT doc_id, frame_offset, least(16, n - frame_offset) AS frame_len
FROM f
ORDER BY doc_id, frame_offset
"""


@register("multimodal_frame_sample", oracle=_FRAME_SAMPLE_SQL, tags=("K-extra",))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one binary payload → N sampled "frame"
    rows (every 64th byte-offset), the row-explosion shape video frame
    extraction uses. Pure DataFrame ops — the per-frame payload slice
    stays binary. Fully deterministic (offset arithmetic on byte
    lengths), so it carries a real value-hash oracle: the frame length
    is min(16, n_bytes - offset) in both engines."""
    d = tables.load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    payload = F.encode(F.col("text"), "UTF-8")
    n = F.length(payload)
    offsets = F.sequence(F.lit(0), n - 1, F.lit(64))
    return (
        d.select("doc_id", payload.alias("payload"), F.explode(offsets).alias("frame_offset"))
        .select(
            "doc_id",
            "frame_offset",
            F.substring(F.col("payload"), F.col("frame_offset") + 1, 16).alias(
                "frame_bytes"
            ),
        )
        .withColumn("frame_len", F.length("frame_bytes"))
        .drop("frame_bytes")
        .orderBy("doc_id", "frame_offset")
    )
