"""Multimodal column plumbing (SURVEY.md §2.11 L9).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata — parquet stores them natively, partitioning and predicate
pushdown work on the metadata, and feature extraction runs as
Arrow-batched ``mapInPandas``. The testdata has no media files, so the
payload is the utf-8 document text standing in for bytes; the *decode*
step is a deterministic stub (a real deployment drops in PIL/ffmpeg inside
the same UDF — the container lacks those libs). The Spark-side plumbing —
schema, batch iteration, UDF signature — is real and graded where
SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datums_warehouse_spark.registry import query
from datums_warehouse_spark.sources.tables import load


@query(
    "l9_binary_columns",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS payload_md5,
               lang AS media_kind
        FROM documents
    """,
    tags=("L9",),
)
def l9_binary_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + typed metadata, graded on byte length and
    content hash through the BinaryType representation."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5("text").alias("payload_md5"),
        F.col("lang").alias("media_kind"),
    )


N_FRAMES = 8       # uniform samples per payload
FRAME_BYTES = 16   # bytes per sampled "frame"


@query(
    "l9_frame_sample",
    oracle=f"""
        SELECT doc_id,
               CAST(i AS BIGINT) AS frame_idx,
               CAST(1 + (i * n) // {N_FRAMES} AS BIGINT) AS byte_offset,
               md5(substring(text, CAST(1 + (i * n) // {N_FRAMES} AS INT),
                             {FRAME_BYTES})) AS frame_md5
        FROM (
            SELECT doc_id, text, length(text) AS n,
                   unnest(range({N_FRAMES})) AS i
            FROM documents
        )
        WHERE n > 0
    """,
    tags=("L9",),
)
def l9_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over media payloads: N uniformly-spaced byte-range
    probes per payload, fingerprinted.

    The video-pipeline shape: frame positions are pure arithmetic over the
    payload length (data-independent → embarrassingly parallel, no UDF),
    and each probe touches a bounded byte range — with real video the
    substring becomes an ffmpeg keyframe seek inside a mapInPandas batch
    (see l9_multimodal_features for that plumbing); the sampling plan,
    explode shape, and per-frame output schema are identical.
    """
    d = load(spark, sf_dir, "documents")
    n = F.length("text")
    frames = (
        d.select("doc_id", "text", n.alias("n"))
        .filter(F.col("n") > 0)
        .select(
            "doc_id",
            "text",
            "n",
            F.explode(F.sequence(F.lit(0), F.lit(N_FRAMES - 1))).alias("frame_idx"),
        )
    )
    return (
        frames.withColumn(
            "byte_offset",
            F.expr(f"CAST(1 + (frame_idx * n) div {N_FRAMES} AS BIGINT)"),
        )
        .select(
            "doc_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            "byte_offset",
            F.md5(
                F.expr(f"substring(text, CAST(byte_offset AS INT), {FRAME_BYTES})")
            ).alias("frame_md5"),
        )
    )


FEATURE_DIM = 8
_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, features array<double>, decode_status string"
)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library API: feature extraction over binary payloads via
    ``mapInPandas`` — ``features`` is the natural ``array<double>`` vector.
    Partition-parallel, Arrow transfer, fixed output schema; swap the stub
    for a real decoder without touching the plan."""
    feature_dim = FEATURE_DIM

    # Defined inside the query fn so cloudpickle ships it BY VALUE —
    # executor Python workers don't have this package on their PYTHONPATH.
    def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Arrow-batched feature extractor over binary payloads.

        STUB DECODE: a real pipeline would decode the media here
        (PIL/librosa/ffmpeg — not in this container). The stub derives a
        deterministic byte-histogram feature so the distributed plumbing
        (batch shapes, schema, null handling) is exercised for real.
        """
        import pandas as _pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    rows.append((doc_id, 0, None, "missing"))
                    continue
                buckets = [0] * feature_dim
                for b in payload:
                    buckets[b % feature_dim] += 1
                n = len(payload)
                rows.append(
                    (doc_id, n, [c / n for c in buckets] if n else None, "stub_decoded")
                )
            yield _pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "features", "decode_status"]
            )

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(extract_features, schema=_FEATURE_SCHEMA)


_L9_FEATURE_COLS = ",\n               ".join(
    f"CAST(sum(CASE WHEN bucket = {i} THEN 1 ELSE 0 END) AS DOUBLE) / n AS f{i}"
    for i in range(FEATURE_DIM)
)


@query(
    "l9_multimodal_features",
    oracle=f"""
        WITH pos AS (
            SELECT doc_id, length(text) AS n, text,
                   unnest(range(length(text))) AS i
            FROM documents
        ),
        b AS (
            SELECT doc_id, n,
                   ord(substr(text, CAST(i + 1 AS INT), 1)) % {FEATURE_DIM} AS bucket
            FROM pos
        )
        SELECT doc_id, CAST(n AS BIGINT) AS n_bytes, {_L9_FEATURE_COLS},
               'stub_decoded' AS decode_status
        FROM b GROUP BY doc_id, n
    """,
    tags=("L9",),
)
def l9_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded surface of :func:`multimodal_features`: the feature vector
    unpacked into scalar double columns ``f0..f{FEATURE_DIM-1}``.

    Two reasons for the scalar projection: (1) the driver's canonicalizer
    sorts rows with pandas, which can't factorize list cells — an
    ``array<double>`` graded column is structurally unhashable; (2) with
    scalars the query gets a full DuckDB value-hash oracle instead of the
    weaker rows-only check (the testdata corpus is pure ASCII — verified
    at every SF — so DuckDB's character ops equal the extractor's byte
    ops, and both sides do the identical IEEE count/n division). The
    Python-side ``mapInPandas`` extractor still does the work; the array
    variant stays the library API."""
    feats = multimodal_features(spark, sf_dir)
    return feats.select(
        "doc_id",
        "n_bytes",
        *[F.col("features")[i].alias(f"f{i}") for i in range(FEATURE_DIM)],
        "decode_status",
    )
