"""Incremental corpus deduplication over a document stream.

A training-data pipeline ingests documents continuously; dedup must be
INCREMENTAL — each arriving batch is checked against everything already
accepted, never by re-running a global pass.  Spark-first shape:

- ``foreachBatch`` (same batch/streaming-parity pattern as
  ``streaming.ingest.CollectionIngestor``) runs the batch MinHash banding
  from ``pipeline.dedup`` on each micro-batch,
- the accumulated state is a persistent LSH **band index** table
  ``(band, band_hash, doc_id)`` on disk — the accepted corpus's banding,
  exactly what the batch pipeline's ``lsh_bands`` emits,
- a batch doc is a near-dup iff any of its bands equi-joins the index
  (bucket-local, never all-pairs) or collides with an earlier doc inside
  its own batch (min doc_id wins, matching the batch pipeline's
  min-survivor convention),
- accepted docs' bands are APPENDED to the index; the corpus append and
  index append are per-batch and idempotent under retry when the sink
  dedups on doc_id (same T4/T5 atomicity argument as ingest).

At scale the index is (corpus x bands) rows of three narrow columns —
bucketable by (band, band_hash) so the probe join co-locates; state lives
in a table, not executor memory, so it survives restarts and is shared by
any number of writers reading the same path.

Exact dedup on an unbounded stream is the degenerate case (band = content
hash): ``exact_dedup_stream`` wraps Structured Streaming's native
``dropDuplicates`` state instead, with an optional watermark to bound
state for feeds where duplicates only arrive near-in-time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.dedup import lsh_bands, minhash_signatures, shingles

INDEX_COLS = ["band", "band_hash", "doc_id"]


def exact_dedup_stream(
    docs: DataFrame, text_col: str = "text", watermark: tuple[str, str] | None = None
) -> DataFrame:
    """First-occurrence-wins exact dedup on a streaming DataFrame.

    Without a watermark the dedup state holds one entry per distinct
    content hash forever (exact global dedup — state grows with corpus
    size, the honest cost of exactness).  With ``watermark=(ts_col,
    delay)`` state is bounded to the watermark horizon: right for feeds
    where duplicates arrive close together in event time.
    """
    hashed = docs.withColumn("content_hash", F.md5(F.col(text_col)))
    if watermark is not None:
        ts_col, delay = watermark
        return hashed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])


def batch_bands(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """LSH banding of one batch — the same shingle->sign->band pipeline the
    batch dedup uses (one code path, batch/streaming parity)."""
    return lsh_bands(minhash_signatures(shingles(docs, text_col)))


class IncrementalDeduper:
    """Persistent-band-index incremental near-dup filter (see module doc)."""

    def __init__(
        self, spark: SparkSession, index_path: str, out_path: str
    ) -> None:
        self.spark = spark
        self.index_path = index_path
        self.out_path = out_path

    def _load_index(self) -> DataFrame | None:
        if not os.path.exists(self.index_path):
            return None
        return self.spark.read.parquet(self.index_path)

    def process_batch(
        self, docs: DataFrame, batch_id: int = 0, text_col: str = "text"
    ) -> DataFrame:
        """Accept-or-drop one micro-batch; returns the accepted docs.

        Duplicate logic, all equi-joins on (band, band_hash):
        1. any band collides with the persisted index  -> drop,
        2. else any band collides with a LOWER doc_id in this batch -> drop
           (min-survivor, deterministic under retry).
        """
        docs = docs.localCheckpoint()  # batch is consumed by several jobs
        bands = batch_bands(docs, text_col).localCheckpoint()

        index = self._load_index()
        if index is not None:
            vs_index = bands.join(
                index.select("band", "band_hash"), ["band", "band_hash"], "left_semi"
            ).select("doc_id")
        else:
            vs_index = None

        b2 = bands.select(
            "band", "band_hash", F.col("doc_id").alias("other_id")
        )
        vs_batch = (
            bands.join(b2, ["band", "band_hash"])
            .where(F.col("other_id") < F.col("doc_id"))
            .select("doc_id")
        )
        dups = vs_batch if vs_index is None else vs_index.unionAll(vs_batch)
        accepted = docs.join(dups.distinct(), "doc_id", "left_anti").localCheckpoint()

        accepted_bands = bands.join(
            accepted.select("doc_id"), "doc_id", "left_semi"
        )
        accepted_bands.select(*INDEX_COLS).write.mode("append").parquet(
            self.index_path
        )
        accepted.write.mode("append").parquet(self.out_path)
        return accepted

    def start_stream(self, doc_stream: DataFrame, checkpoint: str):
        """Wire a streaming document source into the incremental filter."""
        return (
            doc_stream.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(lambda df, bid: self.process_batch(df, bid) and None)
            .trigger(availableNow=True)
            .start()
        )
