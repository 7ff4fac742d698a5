"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``: exact cosine top-k of every query vector against the
  corpus.  The query set is broadcast; the corpus is scanned once; ranking
  is a per-query window over the (small) score set.  This is the correctness
  baseline and is oracle-checked against DuckDB's list_cosine_similarity.
- ``lsh_topk``: the scale path — multi-table random-hyperplane LSH.  Each
  vector gets L independent B-bit signatures from deterministic md5-derived
  hyperplanes; candidates come only from the query's buckets, then exact
  cosine re-ranks.  At 100 TB this turns a full scan per query into L
  bucket-local lookups; recall is tunable via bits/tables (unit-tested
  against the brute-force baseline).

Per-pair dot products use ``F.zip_with`` + ``F.aggregate`` (JVM-side array
folds); bulk all-pairs work uses Arrow-batched numpy GEMM (see
``brute_force_near_duplicates``) because interpreted lambda folds lose to
BLAS by ~100x on dense linear algebra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query id (excluding self).

    Output: (query_id, neighbor_id, rank, cosine) — cosine rounded to 4,
    ties broken by neighbor_id for determinism.
    """
    from pyspark.sql import Window

    queries = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_expr(F.col("qvec"), F.col(vec_col)), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hyperplane_expr(vec: Column, plane: int, dims: int) -> Column:
    """Sign bit of <vec, h_plane> with h derived from md5(plane:dim) — a
    deterministic pseudo-random hyperplane in [-1, 1]^dims, identical on any
    engine that can md5."""
    weights = F.array(
        *[
            (
                (md5_long(F.lit(f"{plane}:{d}")) % 2001 - 1000) / F.lit(1000.0)
            ).alias(f"w{d}")
            for d in range(dims)
        ]
    )
    return (dot_expr(vec, weights) > 0).cast("int")


def lsh_signature(vec: Column, bits: int, dims: int) -> Column:
    """B-bit bucket id from B hyperplane sign bits."""
    sig = F.lit(0).cast("long")
    for p in range(bits):
        sig = sig + F.shiftleft(
            hyperplane_expr(vec, p, dims).cast("long"), p
        )
    return sig


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    bits: int = 4,
    tables: int = 16,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    Standard LSH geometry: one B-bit table has per-bit collision probability
    ``1 - theta/pi``, so a single table's recall collapses for moderate
    similarities; L independent tables of fewer bits union their buckets
    (recall ~= 1 - (1 - p^B)^L).  Defaults (B=4, L=16) give ~0.9 recall at
    cosine ~0.5 on 64-dim data while touching only L buckets per query —
    the scan cost per query is bucket-sized, not corpus-sized, which is the
    point at 100 TB.  Exact cosine re-ranks candidates.
    """
    from pyspark.sql import Window

    def sig(table: int) -> Column:
        s = F.lit(0).cast("long")
        for p in range(bits):
            s = s + F.shiftleft(
                hyperplane_expr(F.col(vec_col), table * bits + p, dims).cast("long"),
                p,
            )
        return s

    tagged = emb.select(
        id_col,
        vec_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), sig(t).alias("s"))
                    for t in range(tables)
                ]
            )
        ).alias("_b"),
    ).select(id_col, vec_col, F.col("_b.t").alias("_t"), F.col("_b.s").alias("_s"))
    queries = tagged.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        "_t",
        "_s",
    )
    scored = (
        tagged.join(F.broadcast(queries), ["_t", "_s"])
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("nvec"),
            F.col("qvec"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qvec"), F.col("nvec")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs: LSH-bucketed candidates, exact cosine
    verify >= threshold.  Output (v1, v2, cosine rounded 4)."""
    with_sig = emb.withColumn("_sig", lsh_signature(F.col(vec_col), bits, dims))
    a, b = with_sig.alias("a"), with_sig.alias("b")
    cands = a.join(
        b,
        (F.col("a._sig") == F.col("b._sig"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("v1"),
        F.col(f"b.{id_col}").alias("v2"),
        F.round(
            cosine_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 4
        ).alias("cosine"),
    )
    return cands.where(F.col("cosine") >= threshold)


def brute_force_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine >= threshold, exact.

    Dense pairwise cosine is the one workload where Arrow-batched numpy
    (BLAS matmul inside mapInPandas) beats JVM expression evaluation by an
    order of magnitude: per-pair array folds evaluate the lambda per
    element, ~100x slower than a blocked GEMM.  The corpus matrix is
    broadcast (a 1M x 1k-dim float corpus is ~4 GB — broadcastable; beyond
    that use :func:`embedding_near_duplicates`, the LSH-bucketed scale
    path); each task computes its row block against the broadcast matrix.
    """
    import numpy as np
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    normed = mat / norms[:, None]
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((ids, normed))

    out_schema = StructType(
        [
            StructField("v1", LongType(), False),
            StructField("v2", LongType(), False),
            StructField("cosine", DoubleType(), False),
        ]
    )

    def block(it):
        import pandas as pd

        all_ids, all_normed = bc.value
        for pdf in it:
            bids = pdf[id_col].to_numpy(dtype=np.int64)
            bmat = np.array(list(pdf[vec_col]), dtype=np.float64)
            bnorm = bmat / np.linalg.norm(bmat, axis=1)[:, None]
            sims = np.round(bnorm @ all_normed.T, 4)
            bi, aj = np.nonzero((sims >= threshold) & (bids[:, None] < all_ids[None, :]))
            yield pd.DataFrame(
                {"v1": bids[bi], "v2": all_ids[aj], "cosine": sims[bi, aj]}
            )

    return emb.select(id_col, vec_col).mapInPandas(block, out_schema)
