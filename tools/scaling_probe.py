"""Scaling probe: do the core query plans scale linearly in rows?

Replicates the sf0.1 ``events`` table Nx (event ids re-keyed, timestamps
jittered within the hour so rows stay distinct; user ids — i.e. streams —
unchanged, so per-key volume grows Nx, the hard direction) into a scratch
dir, then times the headline event-table queries at each factor with
min-of-2.  Near-linear growth + a visible constant term is the expected
signature for scan-bound plans; super-linear growth flags an operator whose
cost curve would not survive the 100 TB target.

Usage: python tools/scaling_probe.py [factors...]   (default: 1 10 100)
Writes SCALING.md at the repo root.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nntsc_spark.plans import queries as q
from nntsc_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
SCRATCH = "/tmp/sparktsc-scaling"
QUERIES = ["select_raw", "agg_bin", "matrix", "smoke", "rollup_build",
           "frequency", "sessionize", "stream_stats", "funnel",
           "cohort_retention",
           # r8 time-series family: all one-window-shuffle plans whose
           # per-key volume grows Nx here (the hard direction for
           # per-key ordered windows)
           "event_asof", "gapfill_locf", "counter_rate",
           "anomaly_zscore",
           # r9: EWMA's bounded collect_list window, the mapInPandas
           # Holt-Winters seam (per-key volume grows Nx — the stitched
           # series get LONGER, the hard direction for a sequential
           # recursion), and the mergeable histogram percentile read
           "ewma_smooth", "holt_winters", "rollup_percentile",
           # r9: CUSUM's two-stacked-window plan (per-key volume grows
           # Nx), HLL registers (state bounded at 2^p per group however
           # many rows stream through), and point-in-interval
           # attribution (see PER_QUERY_MAX_FACTOR note)
           "cusum_change", "hll_distinct", "interval_attr",
           # r9: classical decomposition (one ordered window + two
           # bounded aggs) and the daily-register HLL merge path
           "seasonal_decompose", "hll_merge_days",
           # r9: RRD-style time-weighted consolidation (bounded explode,
           # streams x bins output) and LTTB pixel-budget downsampling
           # (streams x n_out output — both stay driver-returnable at
           # x1000 because output size is the contract, not the input)
           "twa_bin", "lttb_downsample",
           # r9: correlation analytics over the consolidated hourly grid
           # (outputs bounded by streams x lags / top-n)
           "acf_stream", "stream_corr",
           # r9: Hampel median/MAD repair — per-event output like
           # seasonal_decompose (PER_QUERY_MAX_FACTOR note)
           "hampel_outliers",
           # r9: batch gap report (frequency window + lag window; the
           # densified replica axis shrinks gaps, so output stays small)
           "gap_report", "availability",
           # r10: the oracle-pinned bounded production variants (last-day
           # pushed scan bound + 200-diff sampling) — these are the rows
           # that must stay near-flat where the unbounded family climbs
           "gap_report_bounded", "availability_bounded",
           # r11: the per-stream gap rollup over the same bounds, now a
           # REGISTERED query (was the probe-only gap_report_summary
           # capped variant — the last family member without one)
           "gap_report_summary_bounded",
           # r10: bin-composed LTTB (the per-key sort sees hourly bins,
           # not raw samples — the densified replica axis adds samples
           # per bin, not bins, so the curve should go flat)
           "lttb_binned"]
# Pipeline heavies probe on replicated documents/embeddings (see
# build_pipeline_replica): the 100 TB claims for dedup/ANN/contamination
# rest on these measured curves, not plan reading alone.
PIPELINE_QUERIES = ["dedup_minhash", "dedup_clusters", "contamination",
                    "similarity_ivf_topk", "text_repetition",
                    "dedup_spans",
                    # (training_corpus moved to the capped set in r11 —
                    # it now runs to x1000)
                    # r6/r7 additions: selection + mixing operators whose
                    # bounded-cost claims (bucket-capped DSIR model, #source-
                    # bounded rate tables) deserve measured curves too
                    "dsir_weights", "dsir_resample", "doc_despan_keepfirst",
                    "mixture_sample", "mixture_token_sample",
                    # r7: perplexity proxy (the explode+distinct heavy),
                    # quantile banding (bounded-histogram collect), and
                    # per-source vocabulary profiling
                    "text_unigram_logprob", "doc_quality_bands",
                    "source_vocab_stats", "curated_mixture",
                    # r8: corpus drift, BPE pair stats, NB classifier
                    "source_divergence", "bpe_pair_counts",
                    "quality_classifier",
                    # r9: BM25 retrieval, count-min heavy hitters,
                    # stupid-backoff bigram LM, distinct-n diversity
                    "bm25_search", "cms_topk", "bigram_logprob",
                    "ngram_diversity",
                    # r9: C4 line cleaning (frequent-line set stays
                    # heavy-hitter bounded: replica lines are distinct
                    # across replicas) and PQ ADC top-k (encode is a
                    # map-only projection; the rank window carries
                    # corpus x queries rows)
                    "doc_clean_lines", "pq_topk",
                    # r9: vocabulary-sized PageRank iterations
                    "textrank_keywords",
                    # r9: IVFADC (projection encode + broadcast LUT join)
                    # and the one-hash split assignment rollup
                    "ivfpq_topk", "doc_split",
                    # r9: per-key caps (WindowGroupLimit — output bounded
                    # at keys x cap however many rows stream in) and
                    # epoch mixtures (explode+filter, output = mass)
                    "source_cap", "epoch_mixture",
                    # r9: raw-bytes media dedup (hash rides the shuffle,
                    # not the blob) and one-pass suite decontamination
                    # (same machinery as contamination, split per set)
                    "media_dedup", "contamination_suite",
                    # r9: snapshot diff (two projections + one full-outer
                    # equi-join) and cluster-balanced selection (bounded
                    # at nlist x per_cell via WindowGroupLimit)
                    "corpus_diff", "cluster_sample",
                    # r9: RRF hybrid retrieval (both lists top-50
                    # bounded; the corpus-side cost is BM25's filtered
                    # explode + the brute-force scan)
                    "hybrid_search",
                    # r9: per-source percent-rank calibration (one
                    # stratum window; output = input rows)
                    "quality_calibrated",
                    # r9: exact-substring canary audits (zero-shuffle
                    # scan; batch form broadcasts the phrase table)
                    "phrase_hits", "phrase_hits_many",
                    # r11: deterministic training-order shuffle (hash
                    # projection + one shard-keyed shuffle + per-shard
                    # sort bounded at corpus/shards rows)
                    "corpus_shuffle",
                    # r11: fuzzy edit-distance matching.  NB the replica
                    # curve measures a GROWING-OUTPUT workload: one base
                    # word's per-replica tags (word#z17 vs word#z18) are
                    # mutual near-matches, so pair counts grow
                    # ~quadratically with the factor by construction
                    # (7 -> 4.8M pairs at x1000) — see SCALING.md's
                    # caveat before reading the cells as a scan curve
                    "vocab_fuzzy",
                    # r11: the apply step (posexplode + map join +
                    # ordered reassembly) is corpus-sized — the row that
                    # shows the rewrite scales with tokens, not with the
                    # vocabulary the map came from
                    "doc_normalize_tokens"]
# semantic_dedup shares embedding_clusters' exclusion (below): vector
# replicas are either mutual near-dups (quadratic by construction) or
# carry a synthetic cosine tail — both measure the instrument, not the
# operator.  Its two stages have probed proxies: map-only cell
# assignment (similarity_ivf_topk) and a cell-local pair join
# (embedding_neardup, benched).
# embedding_clusters is deliberately NOT replica-probed: in fixed
# dimension, any replica construction either duplicates vectors (the old
# value-jitter: an original's N copies are near-dups of each other,
# C(N,2) pairs, quadratic by construction) or injects random-sign copies
# whose cross-replica cosine tail is HEAVIER than the real corpus's
# (sign-flip replicas: ~N(0, 1/dims) puts ~0.07% of cross pairs above
# the 0.4 threshold where the true corpus has almost none -> a synthetic
# hairball that stalls connected components).  Both regimes measure the
# instrument.  Its two halves have measured curves of their own: the
# LSH-bucketed pair join (same shape as the benched embedding_neardup)
# and connected components (dedup_clusters row).
#: pipeline heavies stop here (x1000 documents = 5M docs whose shingle
#: tables run to billions of rows — hours per cell on this box); the
#: event-table queries keep going and their cells render "—" beyond this
#: for the pipeline rows
MAX_PIPELINE_FACTOR = 100


def _capped_queries():
    """The CAPPED production variants — the paths built for the x1000
    regime the uncapped registered queries can't reach on this box:

    - frequency_bounded: estimate_frequency with the in-code scan bound
      (last day) + the reference's own 200-diff sampling — the registered
      row's unbounded full-history sort is the one super-linear probe.
    - minhash_pruned: verify_prune=True restricts the exact-Jaccard
      verify to candidate shingles (broadcast semi-join) instead of 3x
      corpus shingles.
    - ngram_jaccard_capped: max_df=128 drops shingles shared by more
      than 128 docs from the inverted index — the quadratic-term guard.

    These run to MAX_CAPPED_FACTOR so the crossover claims in
    jaccard_verify's and frequency's docstrings carry measured numbers.
    (gap_report_summary graduated in r11: it is now the REGISTERED
    gap_report_summary_bounded query in the main QUERIES list.)
    """
    from nntsc_spark.operators.frequency import estimate_frequency
    from nntsc_spark.pipeline.dedup import (
        minhash_near_duplicates,
        ngram_jaccard_pairs,
    )
    from nntsc_spark.sources.tables import events_fact, load_table

    def frequency_bounded(spark, d):
        fact = events_fact(spark, d)
        # cutoff: last day of the table's own range (cheap column-scan
        # agg, itself linear — part of the measured cost)
        hi = fact.agg(F.max("timestamp")).collect()[0][0]
        return estimate_frequency(fact, since=hi - 86_400, max_diffs=200)

    from nntsc_spark.operators.timeseries import counter_rate
    from nntsc_spark.plans.queries import START, STOP
    from nntsc_spark.operators.select import time_filter

    def counter_rate_summary(spark, d):
        # the registered counter_rate emits one row per event, so its
        # x1000 probe cell dies on DRIVER RESULT SIZE (46.8M rows > 1 GiB
        # maxResultSize) — an instrument limit, not the operator's.  The
        # production shape aggregates derived rates (alert thresholds,
        # per-stream health rollups); this variant runs the IDENTICAL
        # window derivation with a bounded per-stream summary on top, so
        # the x1000 cell measures the computation the registered query
        # can't deliver through one driver.
        from pyspark.sql import Window

        fact = time_filter(events_fact(spark, d, START, STOP), START, STOP)
        w = (
            Window.partitionBy("stream_id")
            .orderBy("timestamp", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ctr = fact.select(
            "stream_id", "timestamp", "event_id",
            F.sum(F.round(F.col("value") * 100).cast("long")).over(w).alias("counter"),
        )
        out = counter_rate(ctr, value_col="counter", order_cols=["event_id"])
        return out.groupBy("stream_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("rate"), 4).alias("avg_rate"),
            F.sum(F.col("reset").cast("int")).alias("n_resets"),
        )

    def holt_winters_summary(spark, d):
        # same driver-result-size instrument limit as counter_rate: the
        # registered query returns one row per event, so x1000 can't come
        # back through one driver; identical derivation, bounded rollup
        from nntsc_spark.operators.timeseries import holt_winters

        fact = time_filter(events_fact(spark, d, START, STOP), START, STOP)
        hw = holt_winters(fact, season_length=8, order_cols=["event_id"])
        return hw.groupBy("stream_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_anomaly").cast("int")).alias("n_anomalies"),
            F.round(F.avg(F.abs("residual")), 4).alias("mean_abs_resid"),
        )

    def ewma_summary(spark, d):
        from nntsc_spark.operators.timeseries import ewma

        fact = time_filter(events_fact(spark, d, START, STOP), START, STOP)
        sm = ewma(fact, order_cols=["event_id"])
        return sm.groupBy("stream_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("ewma"), 4).alias("mean_ewma"),
        )

    def seasonal_summary(spark, d):
        # same driver-result-size instrument limit: the registered query
        # returns one row per event x 7 cols, so the x1000 cell exceeds
        # maxResultSize (1052 MiB observed); identical decomposition,
        # bounded per-stream rollup on top
        from nntsc_spark.operators.timeseries import seasonal_decompose

        fact = time_filter(events_fact(spark, d, START, STOP), START, STOP)
        dec = seasonal_decompose(fact, order_cols=["event_id"], period=24)
        return dec.groupBy("stream_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.abs("seasonal")), 4).alias("mean_abs_seasonal"),
            F.round(F.avg(F.abs("remainder")), 4).alias("mean_abs_remainder"),
        )

    def _pipe_factor(d: str) -> int:
        """Replica factor from the pipeline dir name (px{N}; SF_DIR=x1)."""
        base = os.path.basename(d.rstrip("/"))
        return int(base[2:]) if base.startswith("px") else 1

    def _scaled_centroids(spark, emb, f):
        """Quantizer for the nlist=8f sizing rule, None = the default
        lowest-id sampler.  Beyond nlist=2000 the default SATURATES on
        this replica corpus (replica 0 holds the only ids < 1M, and it
        has 2000 rows — centroid_rows(emb, 8000) silently yields 2000
        cells, 4x-overfull cells, and a measured 54x/decade cell that
        benchmarked the saturation, not the operator).  Sample the 8
        lowest ids PER replica instead: same determinism, correct nlist,
        and per-replica coverage (each replica's sign-flip subspace gets
        its own centroids, the structure the corpus actually has)."""
        if 8 * f <= 2000:
            return None
        rows = (
            emb.where(F.col("vec_id") % 1_000_000 < 8)
            .orderBy("vec_id")
            .collect()
        )
        return [(int(r["vec_id"]), list(r["embedding"])) for r in rows]

    def ivfpq_index_topk(spark, d):
        # the encode-once production shape (r9 verdict task #1): build
        # the persistent cell-partitioned IVFADC index ONCE per replica
        # (rep 1 pays it, rep 2 measures query-only — the steady state a
        # billion-vector serving layer runs), then answer the registered
        # query's ids against the codes table with static cell pruning.
        from nntsc_spark.pipeline.similarity import (
            ivfpq_build_index,
            ivfpq_query_index,
        )
        from nntsc_spark.plans.pipeline_queries import (
            _IVFPQ_NLIST,
            _IVFPQ_NPROBE,
            _PQ_K,
            _QUERY_IDS,
        )

        emb = load_table(spark, d, "embeddings")
        idx = f"{SCRATCH}/ivfpq_idx_x{_pipe_factor(d)}"
        if not os.path.exists(f"{idx}/codes"):
            ivfpq_build_index(emb, idx, nlist=_IVFPQ_NLIST)
        return ivfpq_query_index(
            emb, idx, _QUERY_IDS, k=_PQ_K, nprobe=_IVFPQ_NPROBE
        )

    def semantic_dedup_scaled(spark, d):
        # r9 verdict task #3: SemDeDup probed with nlist SCALING WITH N
        # (the paper's own sizing — nlist = N / target_cell_size, LAION
        # runs used ~1e5 clusters), so per-cell pair work stays bounded
        # as the corpus grows.  Sign-flip replicas are safe HERE (unlike
        # embedding_clusters): at tau=0.95 the synthetic cross-replica
        # cosine tail (~N(0, 1/64), sd 0.125) is 8 sigma below the
        # threshold, so candidate structure stays the original's.
        # Assignment: the flat BLAS path (honest O(nlist * dims) per
        # row) up to x100; the x1000 cell (nlist=8000, 50M vectors)
        # switches to the TWO-LEVEL coarse quantizer front
        # (assign_two_level=True — r10 verdict task #3), exactly the
        # handoff production makes past ~1e3-1e4 cells (faiss fronts an
        # HNSW/IMI quantizer the same way); the routing is approximate
        # (pytest pins >=95% agreement with flat on clustered data).
        from nntsc_spark.pipeline.similarity import semantic_dedup

        f = _pipe_factor(d)
        emb = load_table(spark, d, "embeddings")
        # assign_two_level is left at the auto default (r12): the
        # nlist=8*f sizing crosses TWO_LEVEL_ASSIGN_MIN_NLIST=1000
        # exactly at the x1000 cell, so auto reproduces the validated
        # handoff — the probe now exercises the production default
        out = semantic_dedup(
            emb, nlist=8 * f, threshold=0.95,
            centroids=_scaled_centroids(spark, emb, f),
        )
        # per-vector output x100 = 500k rows: roll up so the cell
        # measures the operator, not Arrow delivery
        return out.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("kept").cast("int")).alias("n_kept"),
        )

    def embedding_curation_scaled(spark, d):
        # same sizing rule; output stays bounded at nlist x per_cell
        from nntsc_spark.pipeline.similarity import curate_embeddings

        f = _pipe_factor(d)
        emb = load_table(spark, d, "embeddings")
        # auto two-level handoff, as in semantic_dedup_scaled
        return curate_embeddings(
            emb, nlist=8 * f, threshold=0.95, per_cell=15,
            centroids=_scaled_centroids(spark, emb, f),
        )

    def training_corpus_curated_scaled(spark, d):
        # the heaviest registered query (r10 verdict task #5: no measured
        # curve) probed with the embedding stage under the SCALED sizing
        # rule (emb_nlist = 8 x factor — the registered query's fixed
        # nlist=8 would make per-cell pair work quadratic in the factor,
        # measuring the sizing mistake, not the operator).  The text
        # side runs the registered composition verbatim.
        from nntsc_spark.pipeline.corpus import training_corpus

        f = _pipe_factor(d)
        # the doc replica re-keys ids by +i*10M, the embedding replica
        # by +i*1M — re-align the vector ids to the doc keying so each
        # replica's survivors find their vectors (identity at x1)
        emb = load_table(spark, d, "embeddings").select(
            (
                F.col("vec_id") % 1_000_000
                + F.floor(F.col("vec_id") / 1_000_000).cast("long")
                * F.lit(10_000_000)
            ).alias("vec_id"),
            "embedding",
        )
        return training_corpus(
            load_table(spark, d, "documents"),
            # replica-appropriate gates (r12): the token-tag transform
            # zeroes the quality heuristic and classifies every doc
            # 'und', so the REGISTERED gates keep zero docs — the r11
            # composed cells ran the heavy dedup/decontamination stages
            # but an EMPTY kept side and an empty embedding stage.
            # Relaxing to the replica's own uniform values restores a
            # realistic survivor volume (~81% of docs) through the
            # kept-side join, PII scrub, and the whole embedding stage.
            quality_min=0.0,
            lang="und",
            embeddings=emb,
            emb_nlist=8 * f,
            emb_threshold=0.95,
            emb_per_cell=15,
            # same x1000 remedy as semantic_dedup_scaled: a quantizer
            # whose id domain spans the replicas (the lowest-id default
            # saturates past nlist=2000); the two-level front now
            # engages via the auto default at the x1000 sizing
            emb_centroids=_scaled_centroids(spark, emb, f),
        )

    return (
        {"frequency_bounded": frequency_bounded,
         "counter_rate_summary": counter_rate_summary,
         "holt_winters_summary": holt_winters_summary,
         "ewma_summary": ewma_summary,
         "seasonal_summary": seasonal_summary},
        {
            "minhash_pruned": lambda spark, d: minhash_near_duplicates(
                load_table(spark, d, "documents"), verify_prune=True
            ),
            "ngram_jaccard_capped": lambda spark, d: ngram_jaccard_pairs(
                load_table(spark, d, "documents"), max_df=128
            ),
            "ivfpq_index_topk": ivfpq_index_topk,
            "semantic_dedup_scaled": semantic_dedup_scaled,
            "embedding_curation_scaled": embedding_curation_scaled,
            "training_corpus_curated_scaled": training_corpus_curated_scaled,
            # r11: the text capstone itself now takes an x1000 cell (the
            # r6-era "hours per cell" estimate is stale after the
            # md5-long shuffle keys + despan/minhash optimizations:
            # measured 327 s warm) — registered here so the capped loop
            # extends the PIPELINE_QUERIES row past its x100 cap; cells
            # <= x100 come from the cache either way
            "training_corpus": lambda spark, d: training_corpus_text(
                spark, d
            ),
        },
    )


def training_corpus_text(spark, d):
    """The text capstone on the tag replica with replica-appropriate
    gates (see training_corpus_curated_scaled's note — the registered
    quality/lang gates keep zero tagged docs, emptying every stage after
    the filters)."""
    from nntsc_spark.pipeline.corpus import training_corpus

    from nntsc_spark.sources.tables import load_table as _lt

    return training_corpus(
        _lt(spark, d, "documents"), quality_min=0.0, lang="und"
    )


#: capped variants keep going past the uncapped heavies' cutoff — that is
#: their reason to exist
MAX_CAPPED_FACTOR = 1000

#: per-query factor ceilings for cells this single box physically cannot
#: hold (the sign-flip embedding replica — see build_pipeline_replica —
#: removed the instrument-made quadratic pair growth that spilled
#: embedding_clusters' x100 cell to disk death under the old value-jitter
#: replica; re-add entries if a cell hits 'No space left on device').
#: The three per-event-OUTPUT queries stop at x100: their x1000 result
#: (46.8M rows) exceeds spark.driver.maxResultSize — an instrument limit,
#: not the operators'; the *_summary capped variants run the identical
#: derivations to x1000 with bounded rollups on top.
PER_QUERY_MAX_FACTOR: dict[str, int] = {
    "counter_rate": 100,
    "ewma_smooth": 100,
    "holt_winters": 100,
    # the events replica densifies a FIXED time axis (jitter within the
    # hour), so clicks-per-purchase-window grows Nx on top of Nx
    # purchases — the match count is quadratic in N by replica
    # construction, not by plan (real growth extends the time axis,
    # holding matches-per-interval constant).  x10 is enough to show the
    # join itself is linear in its output.
    "interval_attr": 10,
    # one row per event x 7 cols: the x1000 result exceeds driver
    # maxResultSize (1052 MiB observed) — instrument limit; the
    # seasonal_summary variant carries the x1000 cell
    "seasonal_decompose": 100,
    # same instrument limit: row-level repair output (x1000 = 46M rows
    # on its 1-in-10 stream subset x 8 cols)
    "hampel_outliers": 100,
}
# (semantic_dedup_scaled / embedding_curation_scaled lost their x100
# caps in r11: their x1000 cells run the two-level coarse-quantizer
# front — assign_two_level=True — which removes the flat O(nlist*dims)
# assignment bound the caps existed for.)


def build_replica(spark, factor: int) -> str:
    out = f"{SCRATCH}/x{factor}"
    if os.path.exists(f"{out}/events.parquet"):
        return out
    os.makedirs(out, exist_ok=True)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = ev.count()
    rep = (
        ev.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
        .select(
            (F.col("event_id") * factor + F.col("i")).alias("event_id"),
            # jitter inside the hour keeps bin membership realistic while
            # making replicas distinct rows
            (F.col("ts") + F.make_interval(secs=F.col("i") % 3600)).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    )
    rep.repartition(32).write.mode("overwrite").parquet(f"{out}/events.parquet")
    print(f"built x{factor}: {n * factor} rows", file=sys.stderr)
    return out


def build_pipeline_replica(spark, factor: int) -> str:
    """Nx documents + embeddings replicas with LINEAR duplicate structure.

    Documents: every replica tags EACH TOKEN with its replica id
    (``word`` -> ``word#z<i>``) — a bijection on the token alphabet, so
    within a replica the shingle/Jaccard/candidate structure is EXACTLY
    the original corpus's, while cross-replica shingle sets (and md5s)
    are disjoint.  Net: corpus Nx, near-dup pairs Nx (the fair scaling
    direction — replicating text verbatim would grow pairs N^2 by
    construction, measuring the corpus generator, not the engine; and a
    salt token INSERTED between words would create degenerate
    ``salt word salt`` shingles shared by any two docs sharing a single
    word, measured 15x slower at x1 from the candidate blow-up).

    Every factor INCLUDING x1 goes through this transform so the salt's
    constant token inflation (~2x tokens/doc) cancels out of the ratios.

    Embeddings: ids re-keyed (replica 0 keeps the original ids AND
    values, so the registered query's fixed _QUERY_IDS still resolve);
    replicas i > 0 apply a per-replica deterministic SIGN FLIP per
    dimension — an orthogonal transform, so within-replica pairwise
    cosines are exactly the original corpus's while cross-replica
    cosines decorrelate to ~N(0, 1/dims).
    """
    out = f"{SCRATCH}/px{factor}"
    if os.path.exists(f"{out}/embeddings.parquet"):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = (
        docs.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
        .select(
            # cast BEFORE the multiply: i and the literal are 32-bit ints,
            # and i * 10M overflows at i >= 215 under ANSI mode (x1000)
            (F.col("doc_id") + F.col("i").cast("long") * F.lit(10_000_000)
             ).alias("doc_id"),
            F.expr(
                "array_join(transform(split(text, ' '), "
                "t -> concat(t, '#z', i)), ' ')"
            ).alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text"))
    )
    rep.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # per-replica deterministic SIGN FLIPS, the vector analogue of token
    # tagging: a sign pattern is an orthogonal transform, so every
    # WITHIN-replica pairwise cosine is exactly the original corpus's
    # (near-dup pairs grow Nx — the fair direction), while CROSS-replica
    # cosines decorrelate to ~N(0, 1/dims).  The previous tiny value
    # jitter made an original's N replicas true near-dups of each other,
    # so pair count grew as C(N,2) per original — quadratic in the
    # factor by construction, and the x100 embedding_clusters cell
    # spilled the box's disk measuring the generator, not the operator.
    # Replica 0 keeps identity values so fixed _QUERY_IDS still resolve
    # against the true vectors.
    erep = (
        emb.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
        .select(
            (F.col("vec_id") + F.col("i").cast("long") * F.lit(1_000_000)
             ).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, j) -> CASE WHEN i = 0 THEN x "
                "ELSE float(x * (pmod(hash(i, j), 2) * 2 - 1)) END)"
            ).alias("embedding"),
            "label",
        )
    )
    erep.repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print(f"built pipeline x{factor}", file=sys.stderr)
    return out


#: planted-cluster replica geometry (see build_planted_clusters)
PLANTED_CLUSTERS_PER_REP = 400
PLANTED_MEMBERS = 5
PLANTED_DIMS = 256


def build_planted_clusters(spark, factor: int) -> str:
    """Synthetic embeddings with PLANTED, factor-linear cluster structure
    — the instrument that can probe ``embedding_clusters`` where the
    sign-flip replica cannot (its cross-replica cosines inject a random
    tail; verbatim duplication grows pairs quadratically — both measure
    the generator).

    Geometry, all deterministic in (cluster, member, dim) hashes:

    - **centroids**: one +/-1 sign vector per cluster in 256 dims.  Two
      independent sign vectors' cosine is a scaled binomial ~N(0, 1/256)
      (sigma = 0.0625), so the 0.4 verify threshold sits at 6.4 sigma —
      cross-cluster edges are ~1e-10 probable per pair (~zero through
      x100, single digits at x1000), i.e. the planted partition IS the
      answer structure.
    - **members**: 5 per cluster; member 0 is the centroid, members m>0
      flip ONE hash-chosen coordinate, so within-cluster pairwise cosine
      is >= 1 - 4/256 = 0.984 — far above threshold, and high/stable
      SimHash recall (~0.98 at bits=8, tables=4), identical per replica
      because the geometry is identical per replica.

    Net: vectors, true pairs (10 per cluster), and components all grow
    LINEARLY with the factor; what the probe measures is LSH banding +
    verify + Pregel CC on a fixed-answer-density workload.  Planted
    truth: cluster(vec_id) = vec_id div 5.  Probe calls pass dims=256.
    """
    out = f"{SCRATCH}/planted_x{factor}"
    if os.path.exists(f"{out}/embeddings.parquet"):
        return out
    os.makedirs(out, exist_ok=True)
    n_clusters = PLANTED_CLUSTERS_PER_REP * factor
    m, d = PLANTED_MEMBERS, PLANTED_DIMS
    emb = (
        spark.range(n_clusters)
        .select(F.col("id").alias("c"))
        .withColumn("m", F.explode(F.sequence(F.lit(0), F.lit(m - 1))))
        .select(
            (F.col("c") * m + F.col("m")).alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {d - 1}), j -> float("
                f"(pmod(hash(c, j), 2) * 2 - 1) * (CASE WHEN m > 0 AND "
                f"j = pmod(hash(c, m, 42), {d}) THEN -1 ELSE 1 END)))"
            ).alias("embedding"),
            F.lit("planted").alias("label"),
        )
    )
    emb.repartition(32).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )
    print(f"built planted x{factor}: {n_clusters * m} vectors", file=sys.stderr)
    return out


#: fuzzy linear replica: tokens shorter than this are dropped.  Two
#: zero-common-character strings sit at Levenshtein distance
#: max(len1, len2) exactly, so cross-replica matches under the disjoint
#: alphabets need BOTH sides <= k; dropping len <= k (k=2 registered)
#: tokens closes that channel — pure length arithmetic no length-
#: preserving encoding could avoid.
FUZZY_MIN_TOK_LEN = 3


def build_fuzzy_linear_replica(spark, factor: int) -> str:
    """Documents replica with FIXED-ANSWER-DENSITY fuzzy structure — the
    linear instrument for ``vocab_fuzzy`` (the token-tag replica's tags
    are mutual near-matches across replicas, so its match count grows
    ~quadratically by construction; SCALING.md's r11 caveat).

    Each replica rewrites every token through its OWN character
    alphabet: replica i maps ``ch -> chr(0x4E00 + 26*i + (ch - 'a'))``
    — a per-replica bijection on characters, so WITHIN a replica every
    pairwise edit distance (and hence the match set, the gram structure,
    and the deletion neighborhoods) is EXACTLY the base vocabulary's,
    while CROSS-replica tokens share zero characters, putting any two at
    distance max(len1, len2) >= FUZZY_MIN_TOK_LEN > k.  Tokens of
    len <= k are dropped from every replica including x1 (see
    FUZZY_MIN_TOK_LEN's note) so that length bound holds.  Net: vocabulary Nx,
    matched pairs EXACTLY Nx — the curve measures candidate generation
    and verification at fixed answer density, not synthetic pair
    delivery.  Codepoint range: 0x4E00 + 26*factor stays below the
    surrogate block (0xD800) through x1000.

    The translation itself runs as a token-level equi-join (per-replica
    token map built from the char map — vocabulary x factor rows), never
    a per-character pass over the corpus.
    """
    out = f"{SCRATCH}/fuzzlin_x{factor}"
    if os.path.exists(f"{out}/documents.parquet"):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # per-(replica, char) map — tiny, Python-built (chr() for the unicode
    # codepoints Spark SQL's chr() cannot produce: it wraps mod 256)
    char_rows = [
        (i, chr(97 + j), chr(0x4E00 + 26 * i + j))
        for i in range(factor)
        for j in range(26)
    ]
    char_map = F.broadcast(
        spark.createDataFrame(char_rows, "i int, ch string, ch_t string")
    )
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.length("tok") >= FUZZY_MIN_TOK_LEN)
        .distinct()
    )
    tok_map = (
        vocab.crossJoin(
            spark.range(factor).select(F.col("id").cast("int").alias("i"))
        )
        .select(
            "i",
            "tok",
            F.posexplode(F.split("tok", "")).alias("p", "ch"),
        )
        .join(char_map, ["i", "ch"])
        .groupBy("i", "tok")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "ch_t"))),
                    lambda s: s["ch_t"],
                ),
                "",
            ).alias("tok_t")
        )
    )
    rep = (
        docs.withColumn(
            "i", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
        )
        .withColumn("i", F.col("i").cast("int"))
        .repartition(32, "doc_id", "i")  # spread the x1000 explode
        .select(
            (F.col("doc_id") + F.col("i").cast("long") * F.lit(10_000_000)
             ).alias("doc_id"),
            "i",
            "lang",
            "source",
            F.posexplode(F.split("text", " ")).alias("pos", "tok"),
        )
        # vocabulary x factor rows: pin the broadcast to the MAP side so
        # AQE can never elect the exploded corpus side
        .join(F.broadcast(tok_map), ["i", "tok"])
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok_t"))),
                    lambda s: s["tok_t"],
                ),
                " ",
            ).alias("text")
        )
        .withColumn("n_chars", F.length("text"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    rep.repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    print(f"built fuzzy-linear x{factor}", file=sys.stderr)
    return out


#: driver heap the probe needs by replica factor, measured (SCALING.md):
#: x1000 cells OOM at the default 8g (4M-doc persisted text + the GEMM
#: verify share one JVM); x100 is comfortable at 16g.  Running a cell
#: with too small a heap doesn't fail cleanly — Spark retries around the
#: OOM and the probe silently measures a crash-retry as if it were the
#: query, so the requirement is enforced UP FRONT.
def required_driver_mem_gb(max_factor: int) -> int:
    if max_factor >= 1000:
        return 48
    if max_factor >= 100:
        return 16
    return 8


def _parse_mem_gb(raw: str) -> float:
    """'48g' / '8192m' / '16384' -> GiB; unparseable -> 0 (too small).

    Follows Spark's sizeAsMb convention for spark.driver.memory: a BARE
    number means MiB (r13 advice — parsing it as bytes made
    SPARK_DRIVER_MEM=16384, which Spark reads as 16 GiB, fail the
    up-front requirement at ~1.5e-5 GiB).  k/t suffixes accepted too."""
    s = raw.strip().lower()
    try:
        if s.endswith("t"):
            return float(s[:-1]) * 1024.0
        if s.endswith("g"):
            return float(s[:-1])
        if s.endswith("m"):
            return float(s[:-1]) / 1024.0
        if s.endswith("k"):
            return float(s[:-1]) / (1024.0 * 1024.0)
        return float(s) / 1024.0
    except ValueError:
        return 0.0


def _ensure_driver_mem(factors: list[int]) -> None:
    """Auto-size SPARK_DRIVER_MEM from the largest requested factor (the
    env var must be set BEFORE the JVM exists), or fail fast naming the
    required value when the caller pinned a smaller one."""
    need = required_driver_mem_gb(max(factors))
    cur = os.environ.get("SPARK_DRIVER_MEM")
    if cur is None:
        os.environ["SPARK_DRIVER_MEM"] = f"{need}g"
        print(
            f"probe: sized driver heap to {need}g for x{max(factors)}",
            file=sys.stderr,
        )
        return
    if _parse_mem_gb(cur) < need:
        raise SystemExit(
            f"probe: SPARK_DRIVER_MEM={cur} is below the {need}g the "
            f"x{max(factors)} cells need (SCALING.md) — raise it or "
            "unset it to let the probe size itself"
        )


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    _ensure_driver_mem(factors)
    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    reg = q.queries()
    reg["agg_bin"](spark, SF_DIR).collect()  # warm session

    # per-cell result cache: a multi-factor run can take tens of minutes,
    # so an interrupted run resumes instead of remeasuring finished cells
    import json

    state_path = f"{SCRATCH}/results.json"
    try:
        with open(state_path) as fh:
            cache = {tuple(k.split(":", 1)): v for k, v in json.load(fh).items()}
    except (OSError, ValueError):
        cache = {}

    capped_event, capped_pipe = _capped_queries()
    runners = dict(reg)
    runners.update(capped_event)
    runners.update(capped_pipe)

    results: dict[int, dict[str, float]] = {}
    for f in factors:
        sf_dir = SF_DIR if f == 1 else build_replica(spark, f)
        todo = [(n, sf_dir) for n in QUERIES]
        todo += [(n, sf_dir) for n in capped_event]
        if f <= MAX_PIPELINE_FACTOR or (
            f <= MAX_CAPPED_FACTOR and capped_pipe
        ):
            pipe_dir = build_pipeline_replica(spark, f)
            if f <= MAX_PIPELINE_FACTOR:
                todo += [(n, pipe_dir) for n in PIPELINE_QUERIES]
            if f <= MAX_CAPPED_FACTOR:
                todo += [(n, pipe_dir) for n in capped_pipe]
        row: dict[str, float] = {}
        for name, qdir in todo:
            if f > PER_QUERY_MAX_FACTOR.get(name, MAX_CAPPED_FACTOR):
                continue
            if (str(f), name) in cache:
                row[name] = cache[(str(f), name)]
                continue
            # min-of-2 at EVERY factor, no exceptions: the caching
            # pipelines (dedup/contamination) serve rep 2 from the scratch
            # persist pool, so min-of-2 measures warm steady state — one
            # factor on a different rep policy would compare warm against
            # cold and fabricate a super-linear ratio (that exact mistake
            # produced a phantom 13.7x for dedup_minhash: cold single-rep
            # x100 over warm min-of-2 x10; warm-over-warm is 2.5x).
            best = None
            try:
                for _ in range(2):
                    t0 = time.time()
                    runners[name](spark, qdir).toPandas()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
            except Exception as exc:
                # a cell the box can't hold (executor OOM, disk-full
                # shuffle) must cost a gap in the table, not the whole
                # run — every other cell still gets measured and written
                print(f"  x{f} {name}: FAILED ({exc})"[:300], file=sys.stderr)
                continue
            row[name] = round(best, 2)
            cache[(str(f), name)] = row[name]
            with open(state_path, "w") as fh:
                json.dump({f"{a}:{b}": v for (a, b), v in cache.items()}, fh)
            print(f"  x{f} {name}: {row[name]}", file=sys.stderr)
        results[f] = row
        print(f"x{f}: {row}", file=sys.stderr)

    lines = [
        "# SCALING — runtime vs data volume (generated by tools/scaling_probe.py)",
        "",
        f"sf0.1 `events` replicated Nx (same streams, Nx rows per stream — the",
        "skew-hard direction), local[32], min-of-2 per cell, Arrow",
        "materialization.  A plan that scales is near-linear between 10x and",
        "100x once the constant per-query overhead (~0.3-0.7 s of plan",
        "compile + job scheduling) is amortized.",
        "",
        "| query | " + " | ".join(f"x{f} (s)" for f in factors) +
        " | last-step ratio |",
        "|---|" + "---|" * (len(factors) + 1),
    ]
    for name in (
        QUERIES + list(capped_event) + PIPELINE_QUERIES + list(capped_pipe)
    ):
        cells = [
            f"{results[f][name]:.2f}" if name in results[f] else "—"
            for f in factors
        ]
        have = [f for f in factors if name in results[f]]
        if len(have) > 1:
            a, b = results[have[-2]][name], results[have[-1]][name]
            ratio = f"{b / a:.1f}x" if a else "—"
        else:
            ratio = "—"
        lines.append(f"| {name} | " + " | ".join(cells) + f" | {ratio} |")
    lines += [
        "",
        "Reading: the x100 table holds 10M events (~100x rows per stream).",
        "A ratio well under the 10x data growth between the last two columns",
        "means the constant term still dominates; near 10x is scan-bound",
        "linear scaling; above ~12x would flag a super-linear operator.",
        "frequency is the one SORT-bound row (per-stream lag window over",
        "the full history): its step runs n*log(n) plus external-sort",
        "spill, so ~12-13x per decade is its expected near-linear shape.",
        "Its production bound is the frequency_bounded row (events_fact",
        "start= scan bound + max_diffs=200, oracle-pinned as a registered",
        "query): the pushed-down cutoff keeps the sort input at the recent",
        "slice, which is why its curve stays near-flat where the unbounded",
        "row climbs.",
        "",
        "The gap/availability family (gap_report, availability,",
        "availability) and lttb_downsample sit in frequency's SORT-bound",
        "class, not the delivery-bound one — their outputs are small but",
        "each runs 1-2 per-key full-history ordered windows, so their",
        "x1000 cells are n*log(n) + external-sort spill stacked once per",
        "window; the production remedy is the same scan bound",
        "(events_fact start= / max_diffs) that flattens",
        "frequency_bounded, or time-slicing via operators/chunking.",
        "",
        "Row-per-event outputs (select_raw, counter_rate, event_asof,",
        "ewma_smooth, holt_winters) are RESULT-DELIVERY-bound at x1000:",
        "the probe materializes through one driver, so their large cells",
        "measure Arrow transfer of a corpus-sized result, not the",
        "derivation (event_asof's window compute alone is ~6 s of its",
        "29 s cell); the three whose full x1000 result exceeds",
        "spark.driver.maxResultSize stop at x100 (the '—',",
        "PER_QUERY_MAX_FACTOR).  The *_summary rows run the IDENTICAL",
        "window/recursion derivations with a bounded per-stream rollup on",
        "top: their near-linear curves are the operators' (holt_winters's",
        "x1000 summary cell is 46.8M points through the stitched",
        "mapInPandas seam — ~8x per decade, the Python-loop cost scaling",
        "with points, parallel across series); on a cluster the full",
        "results would land in a distributed sink, never one driver.",
        "",
        f"The last {len(PIPELINE_QUERIES)} rows are the pipeline heavies over Nx-replicated",
        "documents/embeddings with LINEAR duplicate structure (per-replica",
        "token tagging keeps within-replica shingle structure exact while",
        "making cross-replica shingle sets disjoint — see",
        "build_pipeline_replica).  x1 runs the same tagging transform, so",
        "its constant cost cancels out of every ratio.",
        "All cells are min-of-2, which for the caching pipelines means WARM",
        "steady state (rep 2 reuses the scratch-persist pool — the",
        "production shape, where the corpus caches serve many queries).",
        "Embedding replicas use per-replica SIGN FLIPS (an orthogonal",
        "transform): within-replica cosines are exactly the original",
        "corpus's, cross-replica cosines decorrelate to ~N(0, 1/dims).",
        "embedding_clusters is not replica-probed at all — in fixed",
        "dimension every replica design either duplicates vectors",
        "(quadratic pairs) or injects a random cross-replica cosine tail",
        "heavier than the real corpus's thin one; both measure the",
        "instrument, not the operator (see the note in",
        "tools/scaling_probe.py; its halves are covered by the",
        "embedding_neardup bench row and the dedup_clusters CC row).",
        "",
        "frequency_bounded / minhash_pruned / ngram_jaccard_capped are the",
        "CAPPED production variants (since+max_diffs scan bound; prune-to-",
        "candidates verify; max_df=128 hot-shingle cap) probed past the",
        "uncapped heavies' cutoff — the numbers behind the 'use the capped",
        "path at scale' claims in the operator docstrings.",
        "ngram_jaccard_capped is the one spill-bound row: its",
        "inverted-index shuffle VOLUME grows linearly (the max_df cap's",
        "job — no quadratic pair term), but on one machine that volume",
        "crosses executor memory around x100 and runs disk-speed from",
        "there (~13-15x per decade = linear bytes at spill bandwidth, not",
        "algorithmic growth).  Keying the intersection joins on 60-bit",
        "md5 longs instead of shingle strings (~4x fewer shuffle bytes)",
        "is what brought the x1000 cell inside this box's disk at all —",
        "the string version died on 'No space left on device'.  On a",
        "cluster the same bytes spread across nodes; when per-node volume",
        "still bites, minhash_pruned (~10x/decade to x1000) is the",
        "built-in lighter-shuffle near-dup path.",
        "",
        "r10 rows: gap_report_bounded / availability_bounded are the",
        "ORACLE-PINNED bounded variants (registered queries) and",
        "lttb_binned composes A1 hourly pre-binning under the same",
        "24-point LTTB — all three stay near-flat because the replica",
        "densifies a fixed time axis; r11 adds gap_report_summary_bounded",
        "(the per-stream rollup, also registered — the probe-only",
        "gap_report_summary capped variant graduated into it).",
        "ivfpq_index_topk measures the ENCODE-ONCE serving",
        "shape: rep 1 builds the persistent cell-partitioned codes table",
        "(cost amortized over the index lifetime), rep 2 — the min —",
        "measures pure query cost against statically-pruned cell",
        "directories.  semantic_dedup_scaled / embedding_curation_scaled",
        "probe the two heaviest bench queries with nlist SCALING WITH N",
        "(8 x factor, the SemDeDup paper's own N/target_cell_size rule;",
        "LAION runs used ~1e5 clusters): per-cell pair work stays",
        "bounded, and the rows honestly include quantizer-assignment",
        "cost — flat BLAS O(nlist * dims) per row up to x100, and from",
        "x1000 (nlist=8000) the TWO-LEVEL coarse-quantizer front",
        "(assign_two_level=True), the same handoff production makes past",
        "~1e3-1e4 cells (faiss fronts an HNSW/IMI quantizer identically).",
        "At this sizing the pair VERIFY dominates end to end, and r11",
        "moved it to cell-local GEMMs (_semantic_pairs_arrow, one GEMM",
        "per (cell, block-pair) group) behind the same nlist gate: the",
        "x1000 semantic_dedup cell measured 722 s with one interpreted",
        "64-term fold per candidate pair and 76 s with the GEMM stage —",
        "identical pair sets and verdicts, pytest-pinned.",
        "Two-level vs flat at the SAME nlist=80 on the px10 replica:",
        "kept/dropped dedup verdicts agree 100%, raw cell labels 58% —",
        "the latter is the instrument, not the router (sign-flip",
        "replicas are near-isotropic, so cosine margins between",
        "candidate cells are ~0 and ANY tie-flip changes the label;",
        "pytest pins >=95% cell agreement on clustered data, the regime",
        "a coarse quantizer exists for).",
        "Sign-flip replicas are safe for these two (tau=0.95 sits 8",
        "sigma above the synthetic cross-replica cosine tail), unlike",
        "embedding_clusters' tau=0.4 regime.",
        "",
        "r11 rows: training_corpus_curated_scaled is the composed",
        "text+embedding capstone (the heaviest registered query, 47",
        "shuffles) with the embedding stage under the scaled sizing rule",
        "(emb_nlist = 8 x factor; the registered query's fixed nlist=8",
        "would quadratically overfill cells as the corpus grows,",
        "measuring the sizing mistake).  Its dominant stage is the TEXT",
        "side's near-dup survivor election (the minhash band join +",
        "connected components over 50k docs/replica — the same costs the",
        "dedup_minhash and dedup_clusters rows carry); the embedding",
        "stage adds the semantic_dedup_scaled shape over survivors only.",
        "Its x1000 cell stops at the pipeline-heavy cap with the whole",
        "PIPELINE_QUERIES family (x1000 documents = 5M docs, shingle",
        "tables in the billions; the embedding stage's x1000 story is",
        "semantic_dedup_scaled's row).  The TEXT capstone",
        "(training_corpus) itself now takes the x1000 cell (327 s warm,",
        "~19x/decade): like ngram_jaccard_capped it is single-box",
        "SPILL-bound there — shuffle volume is linear, but past executor",
        "memory it runs at disk bandwidth; on a cluster the same bytes",
        "spread across nodes.",
        "",
        "ivfpq_build_index(assign_two_level=True) — the same coarse",
        "front applied to the ENCODE side, whose flat path is ALWAYS the",
        "interpreted inlined-fold argmin (no BLAS fallback: the round-4",
        "L2 conventions are oracle-pinned) — measured head-to-head on",
        "this box: px10/nlist=80 flat 26.2 s vs two-level 19.5 s (1.3x);",
        "px100/nlist=800 flat 92.6 s vs two-level 36.8 s (2.5x).  The",
        "ratio grows with nlist (assignment's share of the build), which",
        "is the r10-verdict case for fronting the 1e5-cell 100 TB build;",
        "full-probe parity with the flat build is pytest-pinned",
        "bit-for-bit on codes and served results.",
        "",
        "seasonal_decompose's windowed frame feeds two consumers (the",
        "phase-mean aggregation and the final join's left side); r10",
        "persists it, so the per-key ordered window — the expensive",
        "stage — runs once (x1000 summary cell: 73 -> 10 s), on top of",
        "the 2xm-trend endpoint identity (one sliding sum + O(1)",
        "lag/lead frames; head-to-head 3.5x faster than the",
        "three-sliding-frame form at x1000).  Isolated re-measures of",
        "x1000 cells are cold-I/O noisy (47-165 s spread observed before",
        "warming the replica files) — warm the page cache first.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
