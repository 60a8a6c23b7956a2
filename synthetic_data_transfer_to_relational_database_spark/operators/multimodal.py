"""Multimodal-column plumbing (BASELINE.json surface): opaque ``binary``
payloads with typed metadata, decode/feature-extract as Arrow-batched
``mapInPandas``.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic STUB (`_fake_decode`) — but everything
Spark-side is real and tested: binary column construction, schema-typed
UDF output, batch iteration, partition-preserving plumbing. Swapping the
stub for PIL/ffmpeg changes one function body, not the plan.

``multimodal_bytes`` is oracle-checked (byte lengths + prefix hex via
UTF-8 encode are engine-portable); the mapInPandas feature extractor is
rows-only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.tables import table
from ._registry import make_registry

QUERIES, ORACLE, q = make_registry()


@q(
    "multimodal_bytes",
    sql="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           hex(encode(substr(text, 1, 8))) AS prefix_hex,
           octet_length(encode(lang)) AS lang_bytes
    FROM documents
    """,
)
def multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Binary-column plumbing: text → bytes, byte-length + prefix
    # inspection entirely JVM-side.
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        F.hex(F.encode(F.substring("text", 1, 8), "UTF-8")).alias("prefix_hex"),
        F.octet_length(F.encode("lang", "UTF-8")).cast("long").alias("lang_bytes"),
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("checksum", LongType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB decoder. A real pipeline would call PIL / ffmpeg here (not
    available in this container). Deterministic fake: derive dimensions
    from the payload so tests can assert exact values.

    Raises NotImplementedError for media types a real decoder would need;
    callers route only 'image' payloads here.
    """
    if not payload:
        raise NotImplementedError("real codec required for empty/real media payloads")
    width = 16 + payload[0] % 64
    height = 16 + payload[-1] % 64
    return width, height


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over a binary media column.

    Builds the media column from document text (stand-in payload), then
    runs mapInPandas: one Python process per partition, pyarrow batches
    in/out — the shape a real image/audio featurizer uses at scale.
    """
    d = table(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        F.encode("text", "UTF-8").cast(BinaryType()).alias("payload"),
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [_fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "width": pd.Series([w for w, _ in dims], dtype="int64"),
                    "height": pd.Series([h for _, h in dims], dtype="int64"),
                    # order-independent checksum: sum of bytes mod 2^31-1
                    "checksum": payloads.map(lambda b: sum(bytes(b)) % 2147483647).astype("int64"),
                }
            )

    return media.mapInPandas(extract, schema=_FEATURE_SCHEMA)


QUERIES["multimodal_features"] = multimodal_features


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: split each payload
    into fixed-size 'frames', keep every 4th — explode + filter, all
    JVM-side; only the (stubbed) per-frame decode would be Python."""
    d = table(spark, sf_dir, "documents")
    frames = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(1, greatest(cast(length(text) / 32 as int), 1)),"
                " i -> encode(substr(text, (i - 1) * 32 + 1, 32), 'utf-8'))"
            )
        ).alias("frame_no", "frame_bytes"),
    ).filter(F.col("frame_no") % 4 == 0)
    return frames.select(
        "doc_id", "frame_no", F.octet_length("frame_bytes").cast("long").alias("frame_len")
    )


QUERIES["multimodal_frame_sample"] = multimodal_frame_sample


@q(
    "multimodal_dyn_batch",
    sql="""
    WITH media AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             octet_length(encode(text)) // 256 AS size_bucket
      FROM documents
    ), seq AS (
      SELECT doc_id, n_bytes, size_bucket,
             ROW_NUMBER() OVER (PARTITION BY size_bucket ORDER BY n_bytes, doc_id) AS rn
      FROM media
    )
    SELECT doc_id, n_bytes, size_bucket,
           (rn - 1) // 8 AS batch_id,
           MAX(n_bytes) OVER (PARTITION BY size_bucket, (rn - 1) // 8)
             AS batch_pad_to
    FROM seq
    """,
)
def multimodal_dyn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic batching for inference over variable-length media: bucket
    payloads by size, order within bucket, cut into fixed batches of 8,
    pad every item to its batch max — the length-grouping trick that
    minimizes wasted padding compute in ASR/vision serving.

    The oracle's ROW_NUMBER() OVER (PARTITION BY size_bucket ...) is the
    spec, but size buckets are FEW (payload_bytes/256) while rows are
    many — at 100 TB each bucket would sort through one WindowExec task.
    Like ``relational.window_rank`` the physical form is COST-BASED on
    Catalyst's size estimate (``spark.sdt.rank.smallInputBytes``): small
    input takes the one-window plan (the derivation's fixed driver jobs
    would dominate), large input takes
    ``skew.group_distribution_ranks`` (range slices + broadcast offsets,
    bit-identical ranks). The per-(bucket, batch) pad max is a window
    whose partitions hold ≤ 8 rows by construction either way."""
    from .skew import group_distribution_ranks, small_rank_input

    d = table(spark, sf_dir, "documents")
    n_bytes = F.octet_length(F.encode("text", "UTF-8")).cast("long")
    # floor division explicitly on BOTH engines: DuckDB's `/` is true
    # division and its CAST rounds-to-nearest, Spark's cast truncates
    media = d.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.floor(n_bytes / 256).cast("long").alias("size_bucket"),
    )
    if small_rank_input(media, cache_key=("multimodal_dyn_batch", sf_dir)):
        w_seq = Window.partitionBy("size_bucket").orderBy("n_bytes", "doc_id")
        seq = media.withColumn("rn", F.row_number().over(w_seq))
    else:
        seq = group_distribution_ranks(media, "size_bucket", ["n_bytes", "doc_id"]).select(
            "doc_id", "n_bytes", "size_bucket", F.col("__rank").alias("rn")
        )
    batch_id = F.floor((F.col("rn") - 1) / 8).cast("long")
    w_batch = Window.partitionBy("size_bucket", "batch_id")
    return (
        seq.withColumn("batch_id", batch_id)
        .withColumn("batch_pad_to", F.max("n_bytes").over(w_batch))
        .select("doc_id", "n_bytes", "size_bucket", "batch_id", "batch_pad_to")
    )
