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


_PIL_CHECKED: bool | None = None


def _pil_available() -> bool:
    """Lazy once-per-process probe for an installed PIL — evaluated on
    each WORKER process too (cloudpickle ships these helpers by
    reference, so the check runs wherever the batch executes)."""
    global _PIL_CHECKED
    if _PIL_CHECKED is None:
        import importlib.util

        _PIL_CHECKED = importlib.util.find_spec("PIL") is not None
    return _PIL_CHECKED


def _decode_payload(payload: bytes) -> tuple[int, float, int]:
    """Decode dispatch (VERDICT r6 #7): when PIL is installed AND the
    payload is an actual decodable image, return real pixel stats —
    (w*h pixels, grayscale mean, checksum16 of the first 16 RAW
    bytes); otherwise fall back to the deterministic stub. On a
    cluster with codecs the real branch runs; in this container (no
    PIL) and for non-image payloads (the text fixture) the stub runs,
    so the cross-engine oracle stays green in both environments. The
    fallback on a PIL decode error is deliberate: a mixed table of
    images and opaque blobs should not fail the whole batch — gate
    rows upstream if corrupt images must be fatal."""
    if _pil_available():
        import io

        from PIL import Image

        try:
            with Image.open(io.BytesIO(payload)) as im:
                data = list(im.convert("L").getdata())
                return len(data), sum(data) / len(data), sum(payload[:16]) % 65536
        except Exception:
            pass  # not a decodable image: deterministic stub below
    return _fake_decode(payload)


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


def decode_images(d: DataFrame) -> DataFrame:
    """Shared decode stage: (doc_id, payload binary) -> (doc_id,
    n_pixels, mean_intensity, checksum16) via ``mapInPandas`` Arrow
    batches, dispatching through ``_decode_payload`` (real PIL branch
    when installed and decodable, deterministic stub otherwise). Used
    by the registered decode key and the ``curate_images`` composite."""
    import pandas as pd

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = [_decode_payload(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_pixels": [d0 for d0, _, _ in decoded],
                    "mean_intensity": [d1 for _, d1, _ in decoded],
                    "checksum16": [d2 for _, _, d2 in decoded],
                }
            )

    schema = "doc_id bigint, n_pixels int, mean_intensity double, checksum16 int"
    return d.select("doc_id", "payload").mapInPandas(decode_batches, schema)


@register("multimodal_decode_stub", oracle=_DECODE_SQL, tags=("K-extra",))
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode / feature-extract over binary columns via mapInPandas
    (Arrow batches). The decode dispatches through ``_decode_payload``
    — a real PIL branch when the library is installed and the payload
    decodes, else the deterministic stub; the batch shape, schema, and
    partitioning are the real 100 TB plumbing either way. SQL-oracled:
    the fixture text is pure ASCII (verified octet_length == length at
    every SF) and not an image, so both the no-PIL container and a
    codec-equipped cluster take the stub branch here and the oracle
    stays green in both modes (tests pin the dispatch)."""
    d = tables.load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return decode_images(d).orderBy("doc_id")


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


def _fake_resize(payload: bytes, stride: int = 4) -> bytes:
    """STUB resize — deterministic decimation standing in for an image
    resampler (no codec libs in this container): keep every stride-th
    byte. Real implementation swaps this body for PIL/cv2; the Spark
    plumbing (binary in, binary out, Arrow batches) is unchanged."""
    if not payload:
        raise ValueError("empty payload: cannot resize")
    return payload[::stride]


_RESIZE_SQL = """
WITH r AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n,
         list_transform(str_split(text, ''), c -> ord(c)) AS px
  FROM documents
), s AS (
  SELECT doc_id, n,
         [px[i] FOR i IN range(1, n + 1, 4)] AS kept
  FROM r
)
SELECT doc_id,
       CAST(length(kept) AS INTEGER) AS resized_len,
       CAST(list_aggregate(kept, 'sum') AS BIGINT) AS resized_sum
FROM s
ORDER BY doc_id
"""


@register("multimodal_resize_stub", oracle=_RESIZE_SQL, tags=("K-extra", "M107"))
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize / downsample plumbing: binary payload in → smaller binary
    payload out through an Arrow-batched mapInPandas kernel — the
    thumbnail/re-encode stage of an image pipeline. The resample body
    is the stub above (stride-4 byte decimation); everything around it
    is the real 100 TB shape: binary columns in Arrow batches, a
    binary-to-binary kernel, downstream metadata computed from the
    RESIZED payload (length + byte sum, both exact integers — the
    oracle recomputes them from every 4th character's ord). No shuffle:
    kernel + metadata are one map-side pass."""
    import pandas as pd

    d = tables.load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def resize_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            resized = [_fake_resize(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "resized_len": [len(r) for r in resized],
                    "resized_sum": [sum(r) for r in resized],
                }
            )

    schema = "doc_id bigint, resized_len int, resized_sum bigint"
    return d.mapInPandas(resize_batches, schema).orderBy("doc_id")


_AUDIO_SQL = """
WITH f AS (
  SELECT doc_id, text,
         unnest(range(0, octet_length(encode(text)), 256)) AS win_offset
  FROM documents WHERE doc_id < 30
)
SELECT doc_id, win_offset,
       CAST(list_aggregate(list_transform(
              str_split(substr(text, win_offset + 1, 256), ''),
              c -> (ord(c) - 128) * (ord(c) - 128)), 'sum') AS BIGINT)
         AS energy
FROM f
ORDER BY doc_id, win_offset
"""


@register("multimodal_audio_features_stub", oracle=_AUDIO_SQL, tags=("K-extra", "M108"))
def multimodal_audio_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature-extraction plumbing: one binary payload → one row
    per 256-byte analysis window with its signal energy (treating bytes
    as centered 8-bit PCM) — the framing + per-frame-feature shape an
    MFCC/spectrogram extractor uses, with the DSP body reduced to a
    deterministic stand-in (sum of squared centered samples; a real
    pipeline swaps in an FFT over the identical one-to-many batch
    plumbing). The kernel emits MULTIPLE rows per input row from
    mapInPandas — the expansion direction decode_stub (1:1) and
    frame_sample (explode, no Python) don't cover. Energies are exact
    integers; the oracle recomputes them per character."""
    import pandas as pd

    d = tables.load(spark, sf_dir, "documents").filter(F.col("doc_id") < 30).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, offs, energies = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for off in range(0, len(payload), 256):
                    win = payload[off : off + 256]
                    ids.append(doc_id)
                    offs.append(off)
                    energies.append(sum((b - 128) * (b - 128) for b in win))
            yield pd.DataFrame(
                {"doc_id": ids, "win_offset": offs, "energy": energies}
            )

    schema = "doc_id bigint, win_offset bigint, energy bigint"
    return d.mapInPandas(frames, schema).orderBy("doc_id", "win_offset")


_PHASH_SQL = """
WITH ph AS (
  SELECT doc_id,
         substr(md5(text), 1, 2) AS band,
         ('0x' || substr(md5(text),  1, 4))::BIGINT AS h0,
         ('0x' || substr(md5(text),  5, 4))::BIGINT AS h1,
         ('0x' || substr(md5(text),  9, 4))::BIGINT AS h2,
         ('0x' || substr(md5(text), 13, 4))::BIGINT AS h3
  FROM documents
)
SELECT a.doc_id AS doc1, b.doc_id AS doc2,
       CAST(bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
          + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3))
          AS INT) AS hamming
FROM ph a JOIN ph b ON a.band = b.band AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
    + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3)) <= 28
ORDER BY doc1, doc2
"""


@register("multimodal_phash_near_dup", oracle=_PHASH_SQL, tags=("K-extra", "M122"))
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup (K-extra): the pHash dedup shape —
    64-bit fingerprint per payload, band-bucketed candidate join, exact
    Hamming distance on candidates only — with the DCT perceptual hash
    STUBBED as md5 of the payload (no image codecs in-container; a real
    pHash drops in at the fingerprint expression and nothing else
    changes).

    Scale shape: identical to SimHash dedup — the join key is an 8-bit
    band prefix here only so the tiny fixture yields nonempty candidate
    sets; at 100 TB the band is 16-24 bits and each bucket stays small.
    Hamming is 4x bit_count(xor) over 16-bit chunks — pure JVM codegen,
    no Python. Candidates: |bucket|^2/2 per bucket, never all-pairs."""
    d = tables.load(spark, sf_dir, "documents")
    sig = F.md5(F.col("text"))
    chunks = [
        F.conv(F.substring(sig, 1 + 4 * i, 4), 16, 10).cast("long").alias(f"h{i}")
        for i in range(4)
    ]
    ph = d.select(
        "doc_id", F.substring(sig, 1, 2).alias("band"), *chunks
    )
    a, b = ph.alias("a"), ph.alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.h{i}").bitwiseXOR(F.col(f"b.h{i}"))) for i in range(4)
    )
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= 28)
        .orderBy("doc1", "doc2")
    )


_SHARD_SQL = """
WITH sized AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         COALESCE(sum(octet_length(encode(text)))
                  OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS bytes_before
  FROM documents
)
SELECT CAST(bytes_before // 16384 AS BIGINT) AS shard_id,
       count(*) AS n_docs,
       CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM sized
GROUP BY shard_id
ORDER BY shard_id
"""


@register("multimodal_shard_manifest", oracle=_SHARD_SQL, tags=("K-extra", "M123"))
def multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard manifest (K-extra): assign payloads to
    ~16 KiB shards by running byte offset in doc_id order, then emit
    the per-shard manifest (doc count, bytes, id range) a training
    dataloader consumes. The byte-budget twin of text_pack_sequences
    (M104), which packs by token count.

    The global running sum is a DISTRIBUTED PREFIX SUM, not a single
    total-order window (round 3 shipped the one-sort form with the
    production shape only documented; this is that shape):

    1. every doc gets a DETERMINISTIC range-bucket id — a pure column
       expression over in-plan min/max(doc_id) bounds, NOT
       ``repartitionByRange`` (whose SAMPLED boundaries re-draw on
       every execution of the exchange: this subtree executes twice —
       totals + final join — and mismatched draws produced overlapping
       shard ranges at sf0.1; a physical-partition-id prefix sum is
       only sound if the split is a function of the DATA, not of the
       run);
    2. per-bucket Arrow cumsum over the id-sorted group
       (``applyInPandas``) emits each doc's bucket-LOCAL byte offset —
       P parallel sorts, never a global one;
    3. per-bucket byte totals (P tiny rows) get a P-row window for
       cumulative offsets and broadcast-join back — global offset =
       local offset + sum of all earlier buckets' bytes.

    Identical integers to the single-window form (exact BIGINT
    arithmetic, same value hash); the only non-parallel step touches P
    rows. Bucket balance assumes roughly uniform ids (true for ingest
    sequence numbers); with skewed ids, compute the boundaries once
    from a MATERIALIZED sample instead — the prefix-sum algebra is
    unchanged."""
    import pandas as pd
    from pyspark.sql import Window

    d = tables.load(spark, sf_dir, "documents")
    n_bytes = F.length(F.encode(F.col("text"), "UTF-8"))
    n_parts = max(4, spark.sparkContext.defaultParallelism // 4)
    bounds = d.agg(
        F.min("doc_id").alias("lo"), (F.max("doc_id") + 1).alias("hi")
    )
    sized_in = (
        d.select("doc_id", n_bytes.alias("n_bytes"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "doc_id",
            "n_bytes",
            (
                (F.col("doc_id") - F.col("lo"))
                * n_parts
                / (F.col("hi") - F.col("lo"))
            )
            .cast("int")
            .alias("pid"),
        )
    )

    def local_cumsum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        pdf["local_before"] = pdf["n_bytes"].cumsum() - pdf["n_bytes"]
        return pdf[["pid", "doc_id", "n_bytes", "local_before"]]

    local = sized_in.groupBy("pid").applyInPandas(
        local_cumsum, "pid int, doc_id long, n_bytes long, local_before long"
    )
    # `local` feeds both the totals agg and the final join; because the
    # bucket id is a pure function of the data, recomputation yields
    # byte-identical groups (the repartitionByRange form did NOT).
    totals = local.groupBy("pid").agg(
        F.max(F.col("local_before") + F.col("n_bytes")).alias("part_bytes")
    )
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "pid", F.coalesce(F.sum("part_bytes").over(w_off), F.lit(0)).alias("offset")
    )
    sized = local.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        "n_bytes",
        (F.col("local_before") + F.col("offset")).alias("bytes_before"),
    )
    return (
        sized.groupBy(
            (F.col("bytes_before") / F.lit(16384)).cast("long").alias("shard_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").cast("long").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard_id")
    )


# ------------------------------------------------------------- curate_images

_IMG_GATE_MIN = 60
_IMG_GATE_MAX = 500
_IMG_HAMMING_MAX = 28
_IMG_SHARD_BYTES = 16384

_CURATE_IMAGES_SQL = f"""
WITH RECURSIVE dec AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_pixels,
         CAST(list_aggregate(list_transform(str_split(substr(text, 1, 16), ''),
                                            c -> ord(c)), 'sum') % 65536
              AS BIGINT) AS checksum16,
         md5(text) AS sig
  FROM documents
), gated AS (
  SELECT *, (n_pixels BETWEEN {_IMG_GATE_MIN} AND {_IMG_GATE_MAX}) AS keep
  FROM dec
), ph AS (
  SELECT doc_id, substr(sig, 1, 2) AS band,
         ('0x' || substr(sig,  1, 4))::BIGINT AS h0,
         ('0x' || substr(sig,  5, 4))::BIGINT AS h1,
         ('0x' || substr(sig,  9, 4))::BIGINT AS h2,
         ('0x' || substr(sig, 13, 4))::BIGINT AS h3
  FROM gated WHERE keep
), pairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM ph a JOIN ph b ON a.band = b.band AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
      + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3))
      <= {_IMG_HAMMING_MAX}
), sym AS (
  SELECT src, dst FROM pairs UNION SELECT dst AS src, src AS dst FROM pairs
), reach AS (
  SELECT doc_id AS node, doc_id AS label FROM ph
  UNION
  SELECT s.dst AS node, r.label
  FROM reach r JOIN sym s ON s.src = r.node
  WHERE r.label < s.dst
), clus AS (
  SELECT node AS doc_id, min(label) AS canonical FROM reach GROUP BY node
), csz AS (
  SELECT canonical, count(*) AS cluster_size FROM clus GROUP BY canonical
), canon AS (
  SELECT c.doc_id, g.n_pixels,
         COALESCE(sum(g.n_pixels)
                  OVER (ORDER BY c.doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS bytes_before
  FROM clus c JOIN gated g USING (doc_id)
  WHERE c.doc_id = c.canonical
)
SELECT g.doc_id, g.n_pixels, g.checksum16, g.keep,
       c.canonical AS canonical_img_id,
       z.cluster_size,
       CASE WHEN c.doc_id IS NULL THEN NULL
            ELSE c.doc_id = c.canonical END AS is_canonical,
       CAST(n.bytes_before // {_IMG_SHARD_BYTES} AS BIGINT) AS shard_id
FROM gated g
LEFT JOIN clus c USING (doc_id)
LEFT JOIN csz z ON z.canonical = c.canonical
LEFT JOIN canon n ON n.doc_id = g.doc_id
ORDER BY g.doc_id
"""


@register("curate_images", oracle=_CURATE_IMAGES_SQL, tags=("ext", "curate", "bench2"))
def curate_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IMAGE curation composite (VERDICT r7 #5): decode ->
    size gate -> perceptual-hash near-dup clustering -> canonical
    selection -> shard assignment, with full per-image provenance —
    the image twin of ``curate_corpus``. One output row per input
    payload: decode stats (n_pixels, checksum16), the gate verdict,
    the pHash cluster (canonical_img_id, cluster_size, is_canonical;
    NULL for gated-out images), and the training-shard id for
    canonical survivors (NULL otherwise).

    Pipeline (each stage the registered primitive's kernel):
    1. DECODE via ``decode_images`` — Arrow-batched mapInPandas over
       the binary payload column (PIL branch on a codec-equipped
       cluster, deterministic ASCII stub here — which is what makes
       the whole chain SQL-oracle-able end to end);
    2. GATE on decoded size ({_IMG_GATE_MIN}..{_IMG_GATE_MAX} bytes —
       the too-small-icon / too-large-outlier cut; both tails are
       nonempty on the fixtures);
    3. NEAR-DUP pairs on the 64-bit pHash (md5-stub): band-bucketed
       candidate join + exact Hamming <= {_IMG_HAMMING_MAX} on
       candidates only (the ``multimodal_phash_near_dup`` kernel);
    4. CLUSTER via the Pregel min-label WCC over the pair graph only
       (oracle: recursive-CTE label propagation), canonical = min id;
    5. SHARD canonical survivors by running byte offset into
       ~{_IMG_SHARD_BYTES}-byte training shards (the
       ``multimodal_shard_manifest`` budget; per-image assignment
       here, manifest aggregation there).

    Scale: decode/gate are one linear Arrow pass; the pair stage
    shuffles band keys, never all-pairs; WCC runs on the pair graph
    (vastly smaller than the corpus); the shard prefix sum is over
    canonical survivors ordered by id — past
    ``distorder.WINDOW_GATE_ROWS`` it runs on the distributed
    global-order kernel (SCALE.md §24): same byte offsets, no
    single-partition exchange."""
    from pyspark.sql import Window

    from ezbake_graph_spark.graph.pregel import connected_components

    d = tables.load(spark, sf_dir, "documents")
    dec = decode_images(
        d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    )
    gated = dec.select(
        "doc_id",
        "n_pixels",
        "checksum16",
        F.col("n_pixels").between(_IMG_GATE_MIN, _IMG_GATE_MAX).alias("keep"),
    )

    sig = F.md5(F.col("text"))
    ph = (
        d.join(gated.filter("keep").select("doc_id"), "doc_id")
        .select(
            "doc_id",
            F.substring(sig, 1, 2).alias("band"),
            *[
                F.conv(F.substring(sig, 1 + 4 * i, 4), 16, 10)
                .cast("long")
                .alias(f"h{i}")
                for i in range(4)
            ],
        )
    )
    a, b = ph.alias("a"), ph.alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.h{i}").bitwiseXOR(F.col(f"b.h{i}"))) for i in range(4)
    )
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(hamming <= _IMG_HAMMING_MAX)
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    verts = ph.select(F.col("doc_id").alias("id"))
    clus = connected_components(verts, pairs).select(
        F.col("id").alias("doc_id"), F.col("component").alias("canonical_img_id")
    )
    w_sz = Window.partitionBy("canonical_img_id")
    clus = clus.withColumn("cluster_size", F.count(F.lit(1)).over(w_sz)).withColumn(
        "is_canonical", F.col("doc_id") == F.col("canonical_img_id")
    )

    canon = clus.filter("is_canonical").join(
        gated.select("doc_id", "n_pixels"), "doc_id"
    )
    from ezbake_graph_spark.operators import distorder

    if distorder.use_distributed_window(spark, sf_dir, "documents"):
        # exclusive prefix sum = inclusive (kernel running sum) - self
        shards = distorder.attach_global_order(
            canon,
            "doc_id",
            [F.col("doc_id")],
            running={"_incl": "n_pixels"},
        ).select(
            "doc_id",
            ((F.col("_incl") - F.col("n_pixels")) / F.lit(_IMG_SHARD_BYTES))
            .cast("long")
            .alias("shard_id"),
        )
    else:
        w_off = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
        shards = canon.select(
            "doc_id",
            (
                F.coalesce(F.sum("n_pixels").over(w_off), F.lit(0))
                / F.lit(_IMG_SHARD_BYTES)
            )
            .cast("long")
            .alias("shard_id"),
        )
    return (
        gated.join(clus, "doc_id", "left")
        .join(shards, "doc_id", "left")
        .select(
            "doc_id",
            "n_pixels",
            "checksum16",
            "keep",
            "canonical_img_id",
            "cluster_size",
            "is_canonical",
            "shard_id",
        )
        .orderBy("doc_id")
    )
