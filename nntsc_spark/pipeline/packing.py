"""Sequence packing: assign documents to fixed-token-budget training
sequences.

LLM training consumes fixed-length sequences; feeding one short document
per sequence wastes the budget on padding, so pipelines PACK documents
until the budget is full.  Exact global first-fit is inherently
sequential, which is why production packers parallelize the way this one
does: hash documents into G independent groups, pack each group exactly
and deterministically, and let the groups run in parallel.  Packing
quality is unaffected at corpus scale (each group sees a representative
sample of lengths), and determinism is total: membership depends only on
(doc_id % G), order within a group only on doc_id.

Spark-first shape: token counts are a JVM-side projection; the sequential
fold runs per group inside ``applyInPandas`` (Arrow-batched, one group per
task — the sanctioned custom-stateful batch operator tier from the
charter, same as the streaming sessionizer).  State never leaves a task;
scaling out = more groups.

Semantics (mirrored exactly by the DuckDB recursive-CTE oracle):

- docs are packed in ``doc_id`` order within their group;
- a doc's effective length is ``min(n_tokens, capacity)``; docs longer
  than the capacity occupy a fresh sequence alone and are flagged
  ``truncated``;
- a doc opens a new sequence when the current fill plus its effective
  length would exceed the capacity;
- ``seq_id`` is globally unique: ``group * SEQ_STRIDE + local index``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

from .text import token_count_expr

#: per-group sequence-id stride (max sequences per group)
SEQ_STRIDE = 1_000_000

PACKED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("grp", LongType(), False),
        StructField("seq_id", LongType(), False),
        StructField("seq_offset", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("truncated", BooleanType(), False),
    ]
)


def _make_pack_fn(capacity: int):
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        grp = int(pdf["grp"].iloc[0])
        seq, fill = 0, 0
        out = []
        for doc_id, t in zip(pdf["doc_id"], pdf["n_tokens"]):
            t = int(t)
            e = min(t, capacity)
            # fill == 0 implies e <= capacity fits, so no flag needed for
            # the first doc of a sequence
            if fill + e > capacity:
                seq += 1
                fill = 0
            out.append(
                (
                    int(doc_id),
                    grp,
                    grp * SEQ_STRIDE + seq,
                    fill,
                    t,
                    t > capacity,
                )
            )
            fill += e
        return pd.DataFrame(
            out,
            columns=[
                "doc_id",
                "grp",
                "seq_id",
                "seq_offset",
                "n_tokens",
                "truncated",
            ],
        )

    return pack


def pack_sequences(
    docs: DataFrame,
    capacity: int = 256,
    n_groups: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Pack documents into token-budget sequences (see module doc).

    Output: (doc_id, grp, seq_id, seq_offset, n_tokens, truncated).
    """
    sized = docs.select(
        "doc_id",
        (F.col("doc_id") % n_groups).alias("grp"),
        token_count_expr(text_col).alias("n_tokens"),
    )
    return sized.groupBy("grp").applyInPandas(
        _make_pack_fn(capacity), schema=PACKED_SCHEMA
    )


def corpus_shuffle(
    docs: DataFrame,
    shards: int = 64,
    seed: str = "shuffle-0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle: the step between a
    curated corpus and a data loader.  Every row gets a pseudo-random
    order key (salted md5 of its id), a shard (key mod ``shards``), and
    its position within the shard — so readers stream shard files in
    position order and see a reproducible global permutation, and a
    re-run (same corpus, same seed) emits the identical order: epoch
    boundaries, checkpoint resume, and A/B runs all line up.  A new
    ``seed`` is a fresh permutation (per-epoch reshuffle).

    Scale shape: this is the ONLY scalable global shuffle — one hash
    projection over the scan, one shuffle keyed by shard, and a
    per-shard sort bounded at corpus/shards rows.  A naive global
    ``ORDER BY rand()`` is a whole-corpus range sort whose sampling +
    skew handling dominate at 100 TB, and it is not reproducible across
    retries; ``shards`` is the parallelism/memory knob (pick it near the
    output file count).  The hash is the repo's portable md5-long, so
    the DuckDB oracle re-derives the identical permutation.

    Output: all input columns + (shard INT, shuffle_pos BIGINT),
    position 0-based within shard.
    """
    from pyspark.sql import Window

    from .dedup import md5_long

    key = md5_long(
        F.concat(F.col(id_col).cast("string"), F.lit("|" + seed))
    )
    keyed = docs.withColumn("_okey", key).withColumn(
        "shard", F.pmod(F.col("_okey"), F.lit(int(shards))).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_okey", id_col)
    return (
        keyed.withColumn(
            "shuffle_pos", (F.row_number().over(w) - 1).cast("long")
        )
        .drop("_okey")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    context-length preprocessing dual of :func:`pack_sequences` (packing
    merges short docs; chunking splits long ones).

    Chunk starts advance by ``chunk_tokens - overlap``; the final window is
    allowed to be short rather than re-anchored, so every token appears in
    at least one chunk and chunk membership is a pure function of the doc
    (stable across runs and cluster layouts).  All array expressions —
    split once, explode over the start sequence, slice per chunk — stay
    JVM-side; the explode multiplies rows, never a shuffle.

    Output: (doc_id, chunk_idx, chunk_text, n_chunk_tokens).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # number of chunks: ceil(max(n - overlap, 1) / step) for n>0
    n_chunks = F.ceil(
        F.greatest(n - F.lit(overlap), F.lit(1)) / F.lit(step)
    ).cast("int")
    return (
        docs.select(
            "doc_id",
            toks.alias("_toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.slice(
                F.col("_toks"), F.col("chunk_idx") * step + 1, chunk_tokens
            ).alias("_chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join(F.col("_chunk"), " ").alias("chunk_text"),
            F.size(F.col("_chunk")).cast("long").alias("n_chunk_tokens"),
        )
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int = 16,
    key_col: str = "doc_id",
    salt: str = "",
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Deterministic global-shuffle shard writer — the LAST prep step:
    training wants the corpus in a randomized but REPRODUCIBLE order,
    split into shards that data loaders stream independently.

    Both the shard assignment and the within-shard order derive from the
    md5 priority used across the sampling operators (layout-independent:
    the same (salt, corpus) produces byte-identical shards on any cluster,
    and a re-run after adding docs moves nothing that didn't hash there).
    md5 uniformity balances shard sizes to sampling error.

    One shuffle total: ``repartition(n_shards, shard)`` hashes each shard
    value to exactly one task, ``sortWithinPartitions`` orders rows by
    priority inside it, and ``partitionBy(shard)`` therefore emits ONE
    ordered file per shard directory — the layout loaders want (seekable,
    no cross-file merge).  At 100 TB raise ``n_shards``; everything else
    is unchanged.

    ``fmt="json"`` emits JSON-lines shards (the interchange format most
    training loaders stream natively) through the identical
    shuffle/order path; parquet stays the default (typed, compressed,
    prunable) for shards this engine re-reads.
    """
    from .text import hash_priority_expr

    pri = hash_priority_expr(key_col, salt)
    (
        docs.withColumn("_pri", pri)
        .withColumn("shard", F.pmod(F.col("_pri"), F.lit(n_shards)).cast("int"))
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "_pri", key_col)
        .drop("_pri")
        .write.partitionBy("shard")
        .mode(mode)
        .format(fmt)
        .save(path)
    )
