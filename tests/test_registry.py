"""REGISTRY smoke test — every registered query must import and build.

Round-2 shipped a top-level ImportError in a registered query with 65/65
green tests because nothing in tests/ imported the query REGISTRY; the
broken entry then failed the driver's correctness gate AND crashed the
whole bench.  This module closes that class of regression: for every
``queries()`` entry we build the plan on sf0.001 (Spark analysis resolves
imports, column references, and types — no execution cost), and we assert
the oracle map stays in sync with the registry.
"""

from __future__ import annotations

import pytest

from nntsc_spark.plans import queries as _q

#: queries intentionally without a DuckDB oracle — currently none; kept so
#: a future non-SQL-expressible op has a documented escape hatch.
NO_ORACLE: set[str] = set()

REGISTRY = _q.queries()
ORACLES = _q.oracle_sql()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_builds(name, spark, sf_dir):
    """Plan analysis (schema resolution) must succeed for every entry."""
    df = REGISTRY[name](spark, sf_dir)
    assert df.columns, f"{name} produced a zero-column plan"


def test_driver_entry_executes(spark):
    """The driver's smoke check actually EXECUTES entry() — so do we.

    Plan analysis alone (test_query_builds) would have caught round 3's
    type drift, but only execution catches runtime-only breaks (codegen,
    Arrow, partition reading) on the real testdata parquet.
    """
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert df.columns and isinstance(rows, list)


def test_every_query_has_oracle_or_is_whitelisted():
    missing = set(REGISTRY) - set(ORACLES) - NO_ORACLE
    assert not missing, f"queries without oracle SQL: {sorted(missing)}"


def test_no_orphan_oracles():
    orphans = set(ORACLES) - set(REGISTRY)
    assert not orphans, f"oracle SQL without a query: {sorted(orphans)}"


#: The driver verifies exactly the FIRST 50 registered queries (insertion
#: order) — the curated head.  This pin makes window membership a tested
#: invariant instead of hand-maintained prose: a refactor that reorders
#: the registry (or inserts a new entry mid-head) can no longer silently
#: demote a flagship out of the correctness gate.  Changing the window IS
#: allowed — do it deliberately, by editing this list together with the
#: registry and the tail note in plans/queries.py.
#: r15 ROTATION (final): after the r13 (original head) and r14 (rotated
#: head) windows, 38 entries had never received a driver-written green —
#: the 34 the r14 rotation left at positions 51-84 plus the four r14/r15
#: registrations.  This window front-loads all 38 and fills the remaining
#: 12 slots with the front of the r14-verified set; after this round every
#: registry query has a driver-written green on record.  Everything else
#: stays oracle-green via CORRECTNESS_FULL.json (the test below).
DRIVER_WINDOW = [
    "cms_topk", "bigram_logprob", "ngram_diversity", "doc_clean_lines",
    "hll_distinct", "pq_topk", "textrank_keywords", "hll_merge_days",
    "ivfpq_topk", "ivfpq_index_topk", "doc_split", "corpus_shuffle",
    "corpus_diff", "source_cap", "epoch_mixture", "media_dedup",
    "contamination_suite", "cluster_sample", "hybrid_search",
    "quality_calibrated", "embedding_curation", "training_corpus_curated",
    "phrase_hits", "phrase_hits_many", "vocab_fuzzy", "vocab_canonical",
    "doc_normalize_tokens", "fuzzy_linkage", "vocab_fuzzy_unicode",
    "fuzzy_linkage_unicode", "arraysize", "dedup_exact",
    "similarity_topk", "multimodal_meta",
    "leakage_safe_split", "split_leakage_report",
    "matrix_hour_edge", "curated_split_audit",
    "smoke_array", "funnel", "cohort_retention", "event_asof",
    "gapfill_locf", "counter_rate", "anomaly_zscore", "rollup_percentile",
    "ewma_smooth", "holt_winters", "cusum_change", "interval_attr",
]


def test_driver_window_membership_pinned():
    assert len(DRIVER_WINDOW) == 50
    assert list(REGISTRY)[:50] == DRIVER_WINDOW


def test_committed_full_artifact_covers_every_registered_query():
    """r6 shipped `mixture_sample` registered-but-unverified because the
    committed CORRECTNESS_FULL.json predated the registration — the exact
    gap the driver-window pin above can't see (it guards the HEAD).  This
    extends the guarantee to the tail: every REGISTRY key must have a
    green row in the committed artifact.  Regenerate with
    `python tools/verify_local.py /root/testdata/sf0.01` as the last act
    of any round that registers a query."""
    import json
    from pathlib import Path

    artifact = Path(__file__).resolve().parents[1] / "CORRECTNESS_FULL.json"
    data = json.loads(artifact.read_text())
    rows = data.get("queries", data)  # verify_local wraps rows under "queries"
    missing = set(REGISTRY) - set(rows)
    assert not missing, (
        f"registered queries without a committed oracle row: {sorted(missing)}"
    )
    red = sorted(
        k for k, v in rows.items()
        if k in REGISTRY and not (
            v.get("rows_match") and v.get("schema_match")
            and (v.get("hash_match") or k in NO_ORACLE)
        )
    )
    assert not red, f"non-green rows in committed artifact: {red}"


def test_oracle_sql_mentions_no_hostile_types():
    """HUGEINT/DECIMAL survive DuckDB but break the driver's pandas
    normalization (see round-2 fixes) — oracles must cast them away."""
    for name, sql in ORACLES.items():
        assert "HUGEINT" not in sql.upper(), name


def test_bench_artifact_guard_and_headline_list():
    """r12 verdict tasks #1/#7: the bench must (a) refuse to let an
    sf!=0.1 run silently replace the committed sf0.1 artifacts unless
    forced, and (b) keep every headline-tier query resolvable in the
    registry — a rename would otherwise shrink the fixed comparison list
    and break round-over-round attribution."""
    import bench

    assert bench._may_write_full("0.1", force=False)
    assert not bench._may_write_full("0.01", force=False)
    assert not bench._may_write_full("0.001", force=False)
    assert bench._may_write_full("0.01", force=True)

    missing = [n for n in bench.HEADLINE_QUERIES if n not in REGISTRY]
    assert not missing, missing
    assert len(bench.HEADLINE_QUERIES) == len(set(bench.HEADLINE_QUERIES))
    assert len(bench.HEADLINE_QUERIES) >= 20

    prov = bench._provenance("0.1", "headline",
                             len(bench.HEADLINE_QUERIES), len(REGISTRY),
                             reps=3, budget=540.0)
    for key in ("tier", "sf", "n_queries", "registry_size", "reps",
                "deadline_sec", "deadline_tiering", "rep_policy",
                "driver_mem", "cpus"):
        assert key in prov, key
    assert prov["deadline_tiering"] is False  # headline never tiers
    assert prov["rep_policy"] == "fixed-min-of-N"
    # r14 verdict task 2: the full tier's rep count must depend on the
    # query's own cost, never its registry position — policy is pinned in
    # provenance so two artifacts can be judged comparable
    full_prov = bench._provenance("0.1", "full", 137, 137,
                                  reps=3, budget=1200.0)
    # v2 since r16: caches reset between queries, minimum one warm rep,
    # cold_sec/warm_sec recorded (r15 verdict task 1)
    assert full_prov["rep_policy"] == "per-query-budget-v2"
    assert full_prov["deadline_tiering"] is False
    assert "stability_band" not in full_prov  # stamped at run time, not here
