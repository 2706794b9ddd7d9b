"""Multimodal column plumbing (SURVEY §2.10): image/audio/video as
opaque ``binary`` columns with typed metadata structs.

The decode step is STUBBED (no image/audio libs in this container) —
``decode_image_batch`` raises NotImplementedError unless handed the
deterministic fake decoder — but the Spark-side plumbing is real:
schema, Arrow-batched ``mapInPandas`` signature, batch shaping, and
partition sizing are exactly what a real decoder would plug into.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pim_etl_spark.catalog import query
from pim_etl_spark.sources import load_table

# Typed metadata for an opaque media payload — the multimodal analogue
# of the reference's image-URL struct (schemas/unified_product_schema.py:71-75).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("checksum", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Fabricate a media table from documents: text bytes as an opaque
    payload with metadata — the schema/partitioning shape of a real
    100 TB media lake (payload column never shuffled; metadata only)."""
    media_type = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        media_type.alias("media_type"),
        payload.alias("payload"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic fake image decoder: derives (width, height) from
    payload length. Stands in for PIL/ffmpeg, which aren't installed."""
    n = len(payload or b"")
    return (n % 640 + 1, n % 480 + 1)


def decode_media(
    media: DataFrame,
    decoder: Callable[[bytes], tuple[int, int]] | None = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Arrow-batched decode via mapInPandas — the real plumbing a
    PIL/ffmpeg decoder would use at scale (one Python worker per
    partition, payloads streamed in Arrow batches, output column-typed).

    Raises NotImplementedError when no decoder is supplied: real codecs
    are not available in this environment (SURVEY §2.10 stub mandate).
    """
    if decoder is None:
        raise NotImplementedError(
            "no media codec available in this environment; pass decoder=fake_decode "
            "for the deterministic stub"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(lambda p: decoder(bytes(p) if p is not None else b""))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "n_bytes": pdf["n_bytes"],
                }
            )

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


@query(
    "media_metadata_stats",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           count(*) AS n_media,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           min(md5(text)) AS min_checksum
    FROM documents
    GROUP BY 1 ORDER BY media_type
    """,
)
def media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata aggregation: the query pattern over a
    media lake (group by modality, byte accounting, checksum sample) —
    metadata-only scan, payload column pruned away by Catalyst."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("checksum").alias("min_checksum"),
        )
        .orderBy("media_type")
    )


@query("media_decode_features")  # rows-only: decode is a Python stub
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → feature-extract over mapInPandas with the deterministic
    fake codec: proves the Arrow batch path end-to-end."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    decoded = decode_media(media, decoder=fake_decode)
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_decoded"),
            F.round(F.avg("width"), 4).alias("avg_width"),
            F.round(F.avg("height"), 4).alias("avg_height"),
        )
        .orderBy("media_type")
    )
