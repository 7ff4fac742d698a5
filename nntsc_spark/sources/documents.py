"""Document-corpus sources: JSONL ingestion with corrupt-record
accounting.

Real training corpora arrive as (compressed) JSON-lines, one document
per line, from dozens of producers with drifting schemas and the
occasional truncated/garbled line.  The loader contract a 100 TB
pipeline needs is: project exactly the declared columns (never infer —
schema inference is a whole extra pass over the corpus AND makes the
schema depend on which files were sampled), keep malformed lines
COUNTED instead of silently dropped, and let Spark's codec layer handle
compression transparently (``.gz``/``.zst``/``.bz2`` by extension —
nothing here is format-aware).

(The reference ingests via AMQP/RRD collectors, sources/kafka.py and
sources/rrd.py; this is the charter's training-data sibling for
file-drop corpora.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the engine-wide document schema (matches the testdata `documents`
#: table; n_chars is derived, never trusted from the producer)
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

CORRUPT_COL = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    id_col: str = "doc_id",
) -> DataFrame:
    """JSONL documents under the declared ``schema`` (PERMISSIVE mode:
    a malformed line becomes one row whose ``_corrupt_record`` holds the
    raw text and every projected column is NULL).

    Returns the full frame INCLUDING the corrupt column — compose with
    :func:`split_corrupt` to separate clean rows from rejects.  Column
    pruning still reaches the scan for downstream projections; the
    corrupt column only materializes for consumers that select it
    (Spark requires caching or a re-read to filter on it alone, which
    is why the split helper selects data columns alongside).
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(
    raw: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(clean, rejects) from a :func:`read_documents_jsonl` frame.

    Clean = parsed AND carries the two columns nothing downstream can
    proceed without (the id and the text); a line that parses as JSON
    but lacks them is a reject too (schema drift, not valid data).
    Rejects keep the raw line so a dead-letter sink can land them for
    producer-side debugging — the ingest discipline every lossy-input
    pipeline needs (count and keep, never silently drop).

    ``clean`` re-derives ``n_chars`` engine-side (length of the text it
    actually ingested, not a producer claim).
    """
    ok = (
        F.col(CORRUPT_COL).isNull()
        & F.col(id_col).isNotNull()
        & F.col(text_col).isNotNull()
    )
    data_cols = [c for c in raw.columns if c != CORRUPT_COL]
    clean = raw.where(ok).select(*data_cols).withColumn(
        "n_chars", F.length(F.col(text_col)).cast("long")
    )
    rejects = raw.where(~ok).select(
        F.coalesce(
            F.col(CORRUPT_COL),
            F.to_json(F.struct(*data_cols)),
        ).alias("raw_line"),
        F.when(F.col(CORRUPT_COL).isNotNull(), F.lit("malformed_json"))
        .when(F.col(id_col).isNull(), F.lit("missing_id"))
        .otherwise(F.lit("missing_text"))
        .alias("reject_reason"),
    )
    return clean, rejects
