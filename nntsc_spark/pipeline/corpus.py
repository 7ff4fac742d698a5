"""End-to-end training-corpus preparation — the composition the individual
pipeline operators exist for.

A reference user's "give me a clean training corpus" flow is: hold out the
eval split, keep quality in-language documents, collapse near-duplicate
clusters to their survivors, drop documents that verbatim-leak eval
content, scrub PII.  ``training_corpus`` chains the already-verified
operators (each with its own oracle + tests) into one DataFrame; every
stage stays the scale shape it was built with — the filters are
projections, the dedup/decontamination sides are pairs-derived or
distinct-build-side joins, and the final scrub is one JVM-side regex
projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_clusters, ngram_decontaminate
from .text import (
    PII_PATTERNS,
    deterministic_sample,
    language_id,
    quality_features,
)


def training_corpus(
    docs: DataFrame,
    text_col: str = "text",
    quality_min: float = 0.3,
    lang: str = "en",
    eval_rate: float = 0.1,
    eval_salt: str = "contam",
    ngram_n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """One-call corpus prep: eval holdout -> quality + language filter ->
    near-dup survivor election -> n-gram decontamination -> PII scrub.

    Stage order matters and mirrors production practice:

    - the eval split is held out FIRST (documents sampled out can never
      re-enter via any later stage);
    - near-dup clustering runs over the train side only — eval docs must
      not elect survivors;
    - decontamination flags train docs sharing any word ``ngram_n``-gram
      with the eval split (:func:`ngram_decontaminate` — the verbatim
      channel; LSH-near leaks are the cluster stage's job only within the
      train side, so the verbatim check is the cross-split guard);
    - filters apply as anti-joins against pairs-derived tables (both ≪
      corpus), so the kept set is computed without ever shuffling the
      full corpus by anything but its own keys.

    Output: (doc_id, text [scrubbed], n_tokens, quality_score).
    """
    qf = quality_features(docs, text_col).select(
        "doc_id", "n_tokens", "quality_score"
    )
    lid = language_id(docs, text_col).select("doc_id", "pred_lang")
    evalset = deterministic_sample(docs, eval_rate, salt=eval_salt)
    train = docs.join(evalset.select("doc_id"), "doc_id", "left_anti")

    non_survivors = (
        dedup_clusters(train, text_col, threshold)
        .where(~F.col("is_survivor"))
        .select("doc_id")
    )
    # NOTE the deliberate role reversal, spelled out as keywords: the
    # operator flags ITS `test` side, and here the docs being screened are
    # the TRAIN corpus (flag train docs carrying eval n-grams).  Swapping
    # these "back" would anti-join train against eval-split ids — a no-op
    # that silently disables decontamination (guarded by
    # test_training_corpus_end_to_end_stages).
    leaked = ngram_decontaminate(
        train=evalset, test=train, text_col=text_col, n=ngram_n
    ).select(F.col("test_doc_id").alias("doc_id"))

    kept = (
        train.join(qf, "doc_id")
        .join(lid, "doc_id")
        .where(
            (F.col("quality_score") >= quality_min)
            & (F.col("pred_lang") == lang)
        )
        .join(non_survivors, "doc_id", "left_anti")
        .join(leaked, "doc_id", "left_anti")
    )
    scrubbed = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return kept.select(
        "doc_id", scrubbed.alias("text"), "n_tokens", "quality_score"
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot-to-snapshot change accounting: classify every document
    id as ``added`` / ``removed`` / ``changed`` / ``unchanged`` between
    two corpus snapshots — the bookkeeping step every incremental
    training-data refresh needs before deciding what to re-process
    (re-tokenize/re-embed only ``added``+``changed``; retire
    ``removed`` from the index).

    Content identity is ``md5(text)`` — EXACT equality, deliberately not
    the shingle :func:`~nntsc_spark.pipeline.text.fingerprint` (near-dup
    identity would classify a real edit as unchanged).  Shape: one
    projection per side (scan + md5, no shuffle), one full-outer
    equi-join on the unique document key (both sides co-partition on the
    join key; unique keys -> no skew), one CASE.  Output size is
    |old ∪ new| — the contract, not a blowup.

    Output: (key, status, fp_old, fp_new).
    """
    o = old.select(
        F.col(key_col), F.md5(F.col(text_col)).alias("fp_old")
    )
    n = new.select(
        F.col(key_col), F.md5(F.col(text_col)).alias("fp_new")
    )
    joined = o.join(n, key_col, "full_outer")
    return joined.select(
        key_col,
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") == F.col("fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        "fp_old",
        "fp_new",
    )
