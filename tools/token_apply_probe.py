"""Cold A/B of the apply_token_map rewrite (r15 verdict task 3).

Two variants of the token-substitution apply step, timed COLD (one run
per fresh JVM — the r15 seam memo and scratch pool make warm in-session
reps measure caches, not the operator):

- ``inarray``  — the shipped r15 form (``nntsc_spark.pipeline.text
  .apply_token_map``): per-doc distinct-token hits -> per-doc mini-map ->
  transform over the intact document row.
- ``exploded`` — the pre-r15 form, reproduced verbatim below from commit
  96e1eb9~1: posexplode every document into a corpus-sized
  (doc_id, pos, tok) stream, left-join the map, reassemble through an
  ordered collect_list.

Both variants read the SAME materialized inputs: the documents table
(sf0.1, or the fuzzy-linear x<factor> replica — disjoint per-replica
alphabets, so vocabulary, pairs and map hits all scale exactly linearly)
and a canonical map built once with the registered chain
(edit_distance_pairs max_dist=2 q=2 -> fuzzy_canonical_map) and cached
as parquet next to the replica, OUTSIDE the timed region.  The timer
covers exactly the apply: construct -> noop sink.  Output checksums
(row count, sum of n_changed, sums of crc32 over both text columns) are
printed so the two variants can be checked bit-identical.

Usage: python tools/token_apply_probe.py {inarray|exploded} [factor]
       (factor absent or 1 = raw sf0.1 documents)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def apply_token_map_exploded(
    docs: DataFrame,
    token_map: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The pre-r15 posexplode -> join -> ordered-collect_list form,
    verbatim from 96e1eb9~1 (docstring elided)."""
    from nntsc_spark.pipeline.text import tokens_expr

    toks = docs.select(
        id_col,
        F.posexplode(
            tokens_expr(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("pos", "tok"),
    )
    mapped = toks.join(token_map, "tok", "left").select(
        id_col,
        "pos",
        F.coalesce(F.col("canonical"), F.col("tok")).alias("out"),
        (F.col("canonical").isNotNull()
         & (F.col("canonical") != F.col("tok"))).alias("_chg"),
    )
    return mapped.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "out"))),
                lambda s: s["out"],
            ),
            " ",
        ).alias("text_norm"),
        F.sum(F.col("_chg").cast("int")).cast("long").alias("n_changed"),
    )


def main() -> None:
    variant = sys.argv[1]
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    assert variant in ("inarray", "exploded"), variant

    from nntsc_spark.pipeline.dedup import edit_distance_pairs
    from nntsc_spark.pipeline.dedup import fuzzy_canonical_map
    from nntsc_spark.pipeline.text import apply_token_map, tokens_expr
    from nntsc_spark.session import get_spark
    from tools.scaling_probe import SF_DIR, build_fuzzy_linear_replica

    spark = get_spark(
        "token-apply-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    if factor <= 1:
        d = SF_DIR
    else:
        d = build_fuzzy_linear_replica(spark, factor)
    docs = spark.read.parquet(f"{d}/documents.parquet")

    # canonical map: computed ONCE with the registered chain, cached on
    # disk so every timed invocation (both variants) reads the identical
    # parquet — the map build is never inside the timer
    from tools.scaling_probe import SCRATCH

    cmap_path = (
        f"{d.rstrip('/')}/cmap_probe.parquet" if factor > 1
        else f"{SCRATCH}/cmap_probe_sf.parquet"
    )
    if not os.path.exists(cmap_path):
        vocab = (
            docs.select(F.explode(tokens_expr("text")).alias("tok"))
            .where(F.col("tok") != "")
            .groupBy("tok")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        pairs = edit_distance_pairs(vocab, key_col="tok", max_dist=2, q=2)
        cmap = (
            fuzzy_canonical_map(vocab, pairs)
            .where(F.col("canonical") != F.col("tok"))
            .select("tok", "canonical")
        )
        cmap.write.mode("overwrite").parquet(cmap_path)
    token_map = spark.read.parquet(cmap_path)
    n_map = token_map.count()  # warm the map's footers outside the timer

    fn = apply_token_map if variant == "inarray" else apply_token_map_exploded
    spark.sparkContext.setJobDescription(
        f"token-apply {variant} x{factor}"
    )
    t0 = time.time()
    out = fn(docs, token_map)
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    chk = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_changed").alias("changed"),
        F.sum(F.crc32(F.col("text_norm"))).alias("crc_text"),
        F.sum(F.crc32(F.concat_ws(":", "doc_id", "text_norm"))).alias(
            "crc_keyed"
        ),
    ).collect()[0]
    print(
        f"token-apply variant={variant} x{factor} map_rows={n_map}: "
        f"wall={wall:.2f}s rows={chk['rows']} changed={chk['changed']} "
        f"crc_text={chk['crc_text']} crc_keyed={chk['crc_keyed']}"
    )


if __name__ == "__main__":
    main()
