"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (100 TB corpus):

- *exact*: one hash-groupBy — the shuffle key is the content hash, so data
  skew is impossible by construction.
- *MinHash+LSH*: shingle explode -> K min-hash aggregates (one groupBy) ->
  band buckets -> candidate pairs ONLY within equal buckets (equi-join on
  (band, band_hash), never a cross join) -> exact Jaccard verification over
  the candidates.  Each stage shuffles on a uniform hash key.
- *SimHash*: 60-bit signatures from md5 token hashes; near-dup = equal
  signature band or small Hamming distance; majority vote via a bit explode
  (60x row blowup on the token-hash table, map-side combinable).
- All hashes are md5-derived so the DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_expr

#: md5 prefix length in hex chars -> 60-bit non-negative bigint
HASH_HEX_LEN = 15
SIMHASH_BITS = 60


# ---------------------------------------------------------------------------
# Scratch-cache pool
# ---------------------------------------------------------------------------

#: semanticHash -> persisted DataFrame handle (insertion order = LRU order)
_CACHE_POOL: OrderedDict[int, DataFrame] = OrderedDict()
#: 16, not 8: the deepest registered composition (training_corpus with
#: embeddings + corpus_split_audit on top) registers ~11 distinct
#: intermediates in one call — at cap 8 its own early stages (the text
#: capstone's shingle/band tables and `out`) were evicted before the
#: final action consumed them, forcing recompute inside a single query
#: run (guide §5: cache only helps if it survives until the reuse).
#: Still a hard bound on cache footprint; entries are spill-to-disk.
_CACHE_POOL_CAP = 16


def scratch_persist(df: DataFrame, level=None) -> DataFrame:
    """Persist a pipeline intermediate with a BOUNDED lifetime.

    Spark's CacheManager serves cached data to any semantically-equal plan,
    so re-running the same pipeline (a bench rep, a user retry) hits the
    warm cache without any plumbing.  What Spark does NOT do is release
    entries: a bare ``.persist()`` with no ``.unpersist()`` leaks blocks for
    the session lifetime (the r4 advice finding).  This pool keeps the last
    ``_CACHE_POOL_CAP`` distinct intermediates alive and unpersists the
    least-recently-used beyond that — warm re-runs, hard cap on cache
    footprint, no reliance on GC timing.  (A per-result ``weakref.finalize``
    was tried first and dropped: refcount-triggered unpersist fires the
    moment a composite operator's intermediate goes out of scope, forcing
    every re-run cold.)
    """
    from pyspark import StorageLevel

    df = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    try:
        h = df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        # plan not hashable (e.g. Spark Connect: no _jdf) — register under
        # a unique key so the LRU cap still bounds the cache footprint;
        # only semantic-equality REUSE is lost, not the eviction guarantee
        # (the early-return form leaked every intermediate on that path)
        import uuid as _uuid

        h = ("nohash", _uuid.uuid4().hex)
    _CACHE_POOL[h] = df
    _CACHE_POOL.move_to_end(h)
    while len(_CACHE_POOL) > _CACHE_POOL_CAP:
        _, old = _CACHE_POOL.popitem(last=False)
        try:
            old.unpersist()
        except Exception:
            pass
    return df


#: (tag, semanticHash, extras) -> [(analyzed plan, result DataFrame)] —
#: eager-seam memo (insertion order = LRU order).  scratch_persist above
#: covers LAZY intermediates: Spark's CacheManager serves the persisted
#: blocks to any semantically-equal plan, so a re-constructed pipeline
#: hits the warm cache with no plumbing.  EAGER seams get no such help:
#: a ``localCheckpoint`` materializes into a fresh RDD on every call, and
#: an iterative fixpoint (connected_components) runs its per-round jobs
#: at CONSTRUCTION time — so re-building the same composition re-paid the
#: checkpoint pass and every Pregel round, and (worse) every plan built
#: DOWNSTREAM of the fresh checkpoint was rooted at a new RDD id, which
#: made it semantically UNEQUAL to the previous construction's plans and
#: defeated the CacheManager for the whole rest of the pipeline
#: (measured: warm `curated_split_audit` re-ran its banding + both CC
#: loops every rep, 17.5 s warm vs 18.9 s cold at sf0.1).  This memo is
#: the CacheManager contract extended to eager seams: bucket by
#: ``semanticHash``, confirm with an exact ``sameResult`` plan
#: comparison (no hash-collision exposure), serve the ALREADY
#: materialized result.  Session-scoped and LRU-bounded like the scratch
#: pool; every first computation still runs from the parquet inputs.
_SEAM_MEMO: OrderedDict[tuple, list] = OrderedDict()
_SEAM_MEMO_CAP = 16
_SEAM_MEMO_CTX = None  # owning SparkContext (same guard as expr_cached)


def _seam_memo_lookup(tag: str, df: DataFrame, extras: tuple = ()):
    """Return (key, analyzed_plan, memoized_result_or_None).

    ``key``/``analyzed_plan`` are opaque tokens for :func:`_seam_memo_put`;
    both are None when the plan is not introspectable (Spark Connect).
    """
    global _SEAM_MEMO_CTX
    try:
        # a restarted session must never be served a DataFrame bound to
        # a stopped context: the memo lives exactly as long as the
        # SparkContext that materialized its entries
        sc = df.sparkSession.sparkContext
        if sc is not _SEAM_MEMO_CTX:
            _SEAM_MEMO.clear()
            _SEAM_MEMO_CTX = sc
        plan = df._jdf.queryExecution().analyzed()
        key = (tag, plan.semanticHash(), *extras)
    except Exception:
        return None, None, None
    bucket = _SEAM_MEMO.get(key)
    if bucket:
        for old_plan, out in bucket:
            if old_plan.sameResult(plan):
                _SEAM_MEMO.move_to_end(key)
                return key, plan, out
    return key, plan, None


def _seam_memo_put(key, plan, out: DataFrame) -> None:
    if key is None:
        return
    _SEAM_MEMO.setdefault(key, []).append((plan, out))
    _SEAM_MEMO.move_to_end(key)
    while len(_SEAM_MEMO) > _SEAM_MEMO_CAP:
        _SEAM_MEMO.popitem(last=False)


def scratch_checkpoint(df: DataFrame) -> DataFrame:
    """Eager ``localCheckpoint`` with the scratch pool's reuse contract:
    one materialization per distinct (semantically-equal) input plan per
    session.  Re-constructions get the SAME checkpointed DataFrame back,
    so their downstream plans stay semantically equal to the previous
    construction's and keep hitting the scratch-persist caches."""
    key, plan, hit = _seam_memo_lookup("ckpt", df)
    if hit is not None:
        return hit
    out = df.localCheckpoint()
    _seam_memo_put(key, plan, out)
    return out


def reset_scratch() -> None:
    """Release every session-scoped cache this module owns.

    The scratch pool and the seam memo exist so that ONE query's
    re-constructions (warm bench reps, composed capstones sharing a
    sub-pipeline) reuse work inside a session.  Shared across QUERIES they
    make a measurement unattributable: a later query's first rep either
    rides an earlier query's cache (reads too fast) or pays its eviction
    churn (reads too slow) — the r15 verdict's item 1.  Measurement
    harnesses call this between queries so every rep-1 wall is the query's
    own cold cost; streaming maintainers that mutate a parquet path a
    memoized seam was built over can call it to drop the stale
    materializations (the memo itself cannot see the append — it compares
    PLANS, and a re-read of the same path is plan-equal).

    Persisted blocks are unpersisted; checkpoint blocks are released by the
    ContextCleaner once the memo drops the last reference (Dataset.unpersist
    does not free localCheckpoint RDDs — see connected_components).
    """
    global _SEAM_MEMO_CTX
    while _CACHE_POOL:
        _, df = _CACHE_POOL.popitem(last=False)
        try:
            df.unpersist()
        except Exception:
            pass
    _SEAM_MEMO.clear()
    _SEAM_MEMO_CTX = None


def md5_long(col: Column) -> Column:
    """First 15 hex digits of md5 as a non-negative bigint (portable:
    DuckDB ``('0x' || substring(md5(x),1,15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, HASH_HEX_LEN), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Group by content hash; keep the smallest doc_id as survivor.

    Output: (content_hash, survivor_doc_id, n_copies).
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# Shingling + MinHash + LSH
# ---------------------------------------------------------------------------


def shingles(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    *,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle).

    ``carry`` names extra per-document columns (functionally dependent on
    doc_id, e.g. a corpus-side tag) to thread through the output — cheaper
    than joining them back later.

    Built entirely in the array domain — ``transform(sequence(...))`` over
    the token array, per-doc dedup via ``array_distinct``, then one explode
    — so the whole build is a ZERO-SHUFFLE map over the corpus scan.  The
    earlier posexplode + lead-window + dropDuplicates form cost two
    shuffles of the pre-distinct shingle stream (window sort by doc +
    distinct) and measured ~25% slower warm, ~2x cold, at sf0.1.  (An r1
    micro-benchmark had HOF lambdas ~5x slower; that held for
    per-element ``element_at`` chains, not for this single
    slice+concat_ws lambda, and the shuffle savings dominate regardless.)

    A document shorter than ``n`` tokens yields no shingles (guarded CASE:
    ``sequence(0, size-n)`` would count DOWNWARD for size < n and emit
    bogus indices).

    Zero shuffles cuts parallelism too: a small corpus file arrives as ONE
    scan partition, and without the old shuffle every downstream consumer
    of the exploded table would run single-threaded (measured 8x on the
    ngram self-join).  When the scan yields fewer partitions than the
    default parallelism, the COMPACT doc rows are repartitioned before the
    explode — shuffling |docs| rows, not |shingles|.  On a cluster-scale
    input the scan already has >= parallelism splits and this is a no-op.
    """
    sg = (
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"transform(sequence(0, size(_toks) - {n}),"
        f" i -> concat_ws(' ', slice(_toks, i + 1, {n}))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    docs = _ensure_parallel(docs)
    return docs.withColumn("_toks", tokens_expr(text_col)).select(
        "doc_id",
        *carry,
        F.explode(F.array_distinct(F.expr(sg))).alias("shingle"),
    )


def _ensure_parallel(docs: DataFrame) -> DataFrame:
    """Small-scan parallelism guard that never EXECUTES the input plan.

    The earlier form asked ``docs.rdd.getNumPartitions()`` — with AQE on,
    converting a derived DataFrame (e.g. training_corpus's anti-joined
    train side) to an RDD materializes its shuffle stages right there, a
    full extra pass over the corpus per builder call (r5 review finding).
    ``inputFiles()`` is metadata-only: fewer source files than the default
    parallelism means the scan (or anything derived from it) can arrive
    under-partitioned, so the compact doc rows are repartitioned; at
    cluster scale file counts exceed parallelism and this is a no-op.
    Non-file-backed frames (in-memory test data) report zero files and are
    left alone — parallelism of tiny local relations is immaterial.
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(docs.inputFiles())
    except Exception:
        return docs
    if 0 < n_files < par:
        return docs.repartition(par)
    return docs


def minhash_signatures(
    sh: DataFrame, k: int = 8, *, carry: tuple[str, ...] = ()
) -> DataFrame:
    """K min-hash values per doc, permutation i = md5('<i>:' || shingle).

    One groupBy with K min aggregates — no explode over permutations, so the
    shuffle volume is exactly the shingle table size.
    Output: (doc_id, mh0..mh{k-1}) as 60-bit bigints.  Integer min matters:
    min over a STRING buffer forces SortAggregate (a full sort of the
    shingle table per aggregation), while fixed-width bigint buffers keep
    the plan in HashAggregate with map-side partials.
    """
    aggs = [
        F.min(md5_long(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(
            f"mh{i}"
        )
        for i in range(k)
    ]
    # carry columns are functionally dependent on doc_id; adding them to the
    # grouping key changes nothing about the partitioning (hash still led by
    # the same doc_id values) and avoids a join-back.
    return sh.groupBy("doc_id", *carry).agg(*aggs)


def lsh_bands(
    sigs: DataFrame,
    bands: int = 4,
    rows: int = 2,
    *,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Band the signature: band b hash = md5(mh[b*rows] || ',' || ...).

    One explode over an inline (band, band_hash) array rather than a
    bands-way UNION of projections: the union form re-evaluates the
    signature aggregate per branch (bands x the minhash groupBy), while the
    explode reads it once and widens rows map-side.

    Output: (doc_id, band, band_hash).
    """
    entries = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        entries.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *cols)).alias("band_hash"),
            )
        )
    return sigs.select(
        "doc_id", *carry, F.explode(F.array(*entries)).alias("_e")
    ).select("doc_id", *carry, "_e.band", "_e.band_hash")


def candidate_pairs(banded: DataFrame) -> DataFrame:
    """Distinct doc pairs sharing >= 1 LSH bucket (equi-join, bucket-local)."""
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .dropDuplicates(["d1", "d2"])
    )


def _jaccard_from_sizes(
    inter: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """Shared tail of both exact-Jaccard operators: join per-doc set sizes
    onto (d1, d2, n_inter), compute |A∩B| / (|A|+|B|-|A∩B|) rounded to 4,
    and threshold ON THE ROUNDED value (the convention every paired DuckDB
    oracle mirrors; jaccard_verify and ngram_jaccard_pairs previously
    carried two hand-maintained copies of this block)."""
    jac = (
        inter.join(
            sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1")), "d1"
        )
        .join(
            sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2")), "d2"
        )
        .select(
            "d1",
            "d2",
            F.round(
                F.col("n_inter")
                / (F.col("n1") + F.col("n2") - F.col("n_inter")).cast("double"),
                4,
            ).alias("jaccard"),
        )
    )
    return jac.where(F.col("jaccard") >= threshold)


def jaccard_verify(
    pairs: DataFrame,
    sh: DataFrame,
    threshold: float = 0.5,
    *,
    prune: bool = False,
) -> DataFrame:
    """Exact Jaccard over candidate pairs via shingle-set joins.

    ``prune=True`` first restricts the shingle table to documents that
    appear in a candidate pair, via a BROADCAST semi-join on the distinct
    pair-doc list, so the verify joins and the set-size aggregation touch
    O(candidate shingles) instead of O(corpus shingles) x 3.  Set sizes
    from the pruned table are identical for candidate docs (a semi-join
    keeps every shingle of a kept doc).  Flip it on when the corpus dwarfs
    the candidate set — the 100 TB regime, where shuffling the full table
    three times is the dominant cost; it requires ``pairs`` to be cheap to
    re-evaluate (persist it: it is consumed twice) and the candidate doc
    list to fit broadcast capacity (tens of millions of ids).  It stays
    off by default because at small scale the extra broadcast stage and
    per-consumer semi-join cost MORE than the full-table joins they avoid
    (measured 1.8 s vs 0.8 s warm at sf0.1) — the crossover is measured in
    tools/scaling_probe.py, not assumed.

    Output: (d1, d2, jaccard) for pairs >= threshold, jaccard rounded to 4.
    """
    src = sh
    if prune:
        pair_docs = (
            pairs.select(F.col("d1").alias("doc_id"))
            .unionByName(pairs.select(F.col("d2").alias("doc_id")))
            .distinct()
        )
        src = sh.join(F.broadcast(pair_docs), "doc_id", "left_semi")
    # intersection joins key on the 60-bit md5 of the shingle: the two
    # verify exchanges move 8-byte longs instead of n-gram text (~4x
    # fewer shuffle bytes — this tail runs inside every minhash/
    # contamination call).  Exact modulo 2^-60 collisions, and the DuckDB
    # oracles hash identically (_JACCARD_TAIL), so even a collision
    # matches.  Set sizes stay string-distinct.
    src_h = src.select("doc_id", md5_long(F.col("shingle")).alias("sh_h"))
    s1 = src_h.select(F.col("doc_id").alias("d1"), "sh_h")
    s2 = src_h.select(F.col("doc_id").alias("d2"), "sh_h")
    inter = (
        pairs.join(s1, "d1")
        .join(s2, ["d2", "sh_h"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = src.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    return _jaccard_from_sizes(inter, sizes, threshold)


def minhash_near_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 8,
    bands: int = 4,
    rows: int = 2,
    threshold: float = 0.5,
    verify_prune: bool = False,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle -> sign -> band ->
    candidates -> exact-Jaccard verify.

    ``verify_prune`` forwards to :func:`jaccard_verify`'s candidate-doc
    prune — the corpus-scale path; see its docstring for the crossover.

    The shingle table feeds both the signature build and the verify join;
    persisting it halves the explode+md5 work (one materialization, two
    consumers).  MEMORY_AND_DISK (not MEMORY_ONLY cache): the exploded
    shingle table is several times the corpus size, and a silent cache
    eviction at 100 TB would re-run the explode+md5 lineage per consumer —
    disk spill keeps the reuse guarantee.

    The banded table is persisted too: the candidate self-join consumes it
    on BOTH sides, and without a persist each side re-runs the whole
    signature aggregation (k md5s over every shingle — the most expensive
    map work in the pipeline, twice).  It is tiny (#docs x bands rows), so
    the storage cost is nil at any scale.
    """
    sh = scratch_persist(shingles(docs, text_col, shingle_n))
    sigs = minhash_signatures(sh, k)
    banded = scratch_persist(lsh_bands(sigs, bands, rows))
    # one eager job fills both caches (banded's lineage runs through sh);
    # the candidate self-join and verify branches then read cache instead of
    # racing to recompute the shingle lineage per branch
    banded.count()
    cands = candidate_pairs(banded)
    if verify_prune:
        # pairs are consumed twice on the prune path (doc list + verify
        # join); persist AND materialize — left lazy, AQE runs the two
        # consumer stages concurrently, both find the cache cold, and the
        # band self-join executes twice (same race the sh/banded eager
        # count()s prevent elsewhere in this module)
        cands = scratch_persist(cands)
        cands.count()
    return jaccard_verify(cands, sh, threshold, prune=verify_prune)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit SimHash per document over token md5 hashes.

    Majority vote per bit: explode (token_hash, bit) -> sum(+-1) -> assemble.
    Output: (doc_id, simhash bigint).

    One aggregation over |tokens| rows instead of a 60x bit explode — and
    SWAR-packed: 4 bit-counters per long in 16-bit lanes, so 15 packed
    sums + a row count replace 60 separate +-1 vote sums (fewer aggregate
    buffer updates map-side).  A lane saturates at 65535 tokens per doc,
    far above any document here (guard the input if that ever changes).
    Vote sign: sum(+-1) > 0  <=>  2*ones > n.

    The ~75 expressions are built as SQL TEXT, one ``expr``/``selectExpr``
    parse each, not as nested Column operators: every Column method is a
    py4j roundtrip, and profiling showed plan CONSTRUCTION at 1.5 s per
    call (~500 driver RPCs) against 0.08 s for the parsed-text form —
     3x total query time for identical plans.  Same lesson as
    ``similarity.ivf_cell_scores_sql``.
    """
    lanes = 4
    toks = docs.select(
        "doc_id", F.explode(tokens_expr(text_col)).alias("token")
    )
    hashed = toks.selectExpr(
        "doc_id",
        f"cast(conv(substring(md5(token), 1, {HASH_HEX_LEN}), 16, 10) as bigint)"
        " AS h",
    )
    packs = []
    for j in range(SIMHASH_BITS // lanes):
        lane_sql = " + ".join(
            f"shiftleft(shiftright(h, {j * lanes + k}) & 1, {16 * k})"
            for k in range(lanes)
        )
        packs.append(F.expr(f"sum({lane_sql}) AS p{j}"))
    per_doc = hashed.groupBy("doc_id").agg(*packs, F.expr("count(1) AS n"))
    terms = [
        f"shiftleft(cast(((shiftright(p{b // lanes}, {16 * (b % lanes)})"
        f" & 65535) * 2 > n) as bigint), {b})"
        for b in range(SIMHASH_BITS)
    ]
    return per_doc.selectExpr("doc_id", "(" + " + ".join(terms) + ") AS simhash")


def hamming_distance(a: Column, b: Column) -> Column:
    """Popcount of XOR via bit_count (Spark >= 3.0)."""
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# Near-dup clustering: pairs -> connected components -> survivor per cluster
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    src_col: str = "d1",
    dst_col: str = "d2",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Min-label propagation over the near-dup pair graph.

    Pure DataFrame Pregel: each round every node takes the minimum label
    among itself and its neighbors; fixpoint when no label changes.  Rounds
    needed = graph diameter, and dedup graphs are unions of small
    near-clique clusters (diameter a handful), so this converges in a few
    rounds — per round: one shuffle join (labels x edges) + one min-groupBy
    + a convergence probe that is a plain filter over the round's own
    checkpointed output (each node's previous label rides through the
    groupBy, so no second join per round — guide §2.4).  Round 1 is fused
    into the init: min(self, neighbors) comes straight off the edge list
    with the same groupBy the identity init spent on its distinct, saving
    one full round of join+groupBy+checkpoint on every call.  The edge
    list is |near-dup pairs|, orders of magnitude smaller than the corpus,
    so even at 100 TB corpus scale this iterates over a comparatively
    small table.

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without
    convergence (a pathological chain-shaped graph) rather than returning
    silently-unfinished labels.

    Iteration state is checkpointed every round: without lineage
    truncation each round's plan contains ALL previous rounds plus the
    whole upstream pair pipeline, so Catalyst re-analyzes and re-codegens
    an ever-growing tree (measured 3-5x the per-round cost on a 500-edge
    graph — and unbounded growth with depth).  This is the same trade
    GraphX's Pregel makes.  Default is ``localCheckpoint`` (executor
    block store — fast, but state dies with an executor); pass
    ``checkpoint_dir=`` to switch to reliable ``checkpoint()`` into that
    directory (HDFS/S3/local path) so executor loss mid-algorithm is
    survivable on a production cluster — the algorithm is unchanged.

    Output: (node, label) — ``label`` is the smallest node id in the
    component, which doubles as the canonical cluster id.
    """
    if checkpoint_dir is not None:
        # setCheckpointDir is context-global; setting it per-call is safe
        # (last writer wins) and .checkpoint() requires it
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint()  # eager, reliable storage

    else:

        def ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    edges = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    # Fixpoint memo (see _SEAM_MEMO): the whole loop below runs eagerly at
    # construction time, outside the CacheManager's reach — re-building
    # the same composition (a warm bench rep, two capstones sharing one
    # clustering) re-paid every round.  Key on the normalized edge
    # projection; the labels are a pure function of that graph.  The
    # checkpoint flavor and the round budget are part of the key: a
    # memoized localCheckpoint result must not satisfy a caller that
    # asked for reliable storage, and a converged result must not mask
    # the nonconvergence raise a smaller max_iter contracts for.
    key, plan, hit = _seam_memo_lookup(
        "cc", edges, (checkpoint_dir or "", int(max_iter))
    )
    if hit is not None:
        return hit
    sym = ckpt(
        edges.unionAll(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
    )
    # Round 1 fused into init: every node's first-round label is
    # min(self, neighbors), computable straight off the edge list with
    # the same groupBy the old identity init needed for its distinct —
    # identical labels to (identity init + one propagate round), one
    # whole round (shuffle join + groupBy + checkpoint + probe) cheaper.
    # No convergence probe here: any edge (a,b) strictly lowers the
    # larger endpoint's label, so round 1 always improves when edges
    # exist, and with no edges the loop below sees empty tables and
    # exits on its first (trivially cheap) probe.
    labels = ckpt(
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("_mn"))
        .select(
            "node", F.least(F.col("node"), F.col("_mn")).alias("label")
        )
    )
    for _ in range(max_iter):
        nbr = sym.join(labels, sym["src"] == labels["node"]).select(
            F.col("dst").alias("node"), "label", F.lit(False).alias("_own")
        )
        # carry each node's previous label through the same groupBy
        # (exactly one _own row per node, so min-over-when recovers it):
        # the convergence probe is then a filter over THIS checkpointed
        # table instead of a second shuffle join per round
        new_labels = ckpt(
            labels.select("node", "label", F.lit(True).alias("_own"))
            .unionAll(nbr)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("_own"), F.col("label"))).alias("_old"),
            )
        )
        improved = (
            new_labels.where(F.col("label") < F.col("_old"))
            .limit(1)
            .count()
        )
        new_labels = new_labels.select("node", "label")
        # Superseded generations are NOT explicitly freed: Dataset.unpersist
        # does not release localCheckpoint blocks (verified on Spark 4.1.2 —
        # they belong to the checkpointed RDD, not the cache manager), so the
        # honest statement is that each round retains one label-table
        # generation until the JVM-side RDD is garbage-collected by the
        # ContextCleaner once this loop drops its reference.  Peak storage
        # is therefore O(max_iter x |nodes|) worst-case, bounded in practice
        # by convergence in a handful of rounds over a pairs-sized table.
        labels = new_labels
        if improved == 0:
            _seam_memo_put(key, plan, labels)
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the pair graph has a longer-than-expected chain — raise max_iter"
    )


def dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Resolve MinHash near-dup PAIRS into actionable dedup clusters.

    Pair lists answer "who matches whom"; an actual dedup pass needs "which
    rows do I drop".  This chains :func:`minhash_near_duplicates` ->
    :func:`connected_components` and elects the minimum doc_id of each
    component as survivor (the component label IS that minimum, so election
    is free).  Keeping `survivors + unclustered docs` == global dedup.

    Output: (doc_id, cluster_id, n_members, is_survivor) for every doc that
    belongs to a near-dup cluster (singletons are absent — they survive by
    definition and listing them would be corpus-sized output).
    """
    pairs = minhash_near_duplicates(docs, text_col, threshold=threshold)
    cc = connected_components(pairs)
    # member counts via count-groupBy + equi-join, both AQE-sized.  Three
    # shapes were tried here: F.broadcast(sizes) forces an O(#clusters)
    # table into every executor (unbounded at corpus scale — r4 advice);
    # a count window over `label` hashes each cluster's members into ONE
    # window partition, and `label` is exactly the skew axis when the
    # corpus holds a giant mirror-set cluster (r5 verdict).  The groupBy
    # is map-side combinable (a giant cluster partial-aggregates before
    # the shuffle), the join's build side has one row per key, so AQE's
    # skew-join split handles a hot label; cc is checkpointed by the
    # Pregel loop, so its double consumption re-reads stored blocks, not
    # lineage.
    sizes = cc.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    return cc.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "n_members",
        (F.col("node") == F.col("label")).alias("is_survivor"),
    )


def leakage_safe_split(
    docs: DataFrame,
    fractions: tuple[float, float, float] = (0.9, 0.05, 0.05),
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    salt: str = "split",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Train/validation/test split that is ATOMIC over near-duplicate
    clusters — the leakage-safe counterpart of
    :func:`~.text.train_val_test_split`.

    A per-document hash split leaks: two near-identical documents can
    land one in train, one in test, and the held-out copy then scores
    as memorized (the train/test overlap the GPT-3 and C4 papers had to
    measure and patch post hoc).  Here the SAME md5 bucket draw is keyed
    on the near-dup CLUSTER REPRESENTATIVE — the component min id from
    :func:`connected_components` over :func:`minhash_near_duplicates`
    pairs; singletons key on themselves — so both members of any
    near-dup pair share the key, the key picks the split, and a
    cross-split near-dup pair is impossible BY CONSTRUCTION, not by
    post-hoc decontamination.

    Scale shape: the cluster table is pairs-derived (orders below the
    corpus); it re-attaches through one left equi-join keyed on the doc
    id, and the bucket assignment is a pure projection — one join
    beyond what the split alone costs.  Output: every ``docs`` column
    plus ``rep_id`` (the split key) and ``split``; the three splits
    exactly partition the corpus for any (data, salt).

    ``pairs`` injects a precomputed near-dup pair table ((d1, d2)
    columns, e.g. one shared with :func:`split_leakage_report` so a
    split-then-audit composition bands the corpus once, not twice);
    when omitted the banded pass runs here.
    """
    from .text import SAMPLE_MOD, hash_priority_expr

    f_train, f_val, f_test = (float(f) for f in fractions)
    tot = f_train + f_val + f_test
    if abs(tot - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {tot}")
    t1 = int(round(f_train * SAMPLE_MOD))
    t2 = int(round((f_train + f_val) * SAMPLE_MOD))
    if pairs is None:
        pairs = minhash_near_duplicates(docs, text_col, threshold=threshold)
    cc = connected_components(pairs)
    keyed = (
        docs.join(
            cc.select(
                F.col("node").alias(id_col), F.col("label").alias("_rep")
            ),
            id_col,
            "left",
        )
        .withColumn("rep_id", F.coalesce(F.col("_rep"), F.col(id_col)))
        .drop("_rep")
    )
    bucket = hash_priority_expr("rep_id", salt) % SAMPLE_MOD
    return keyed.withColumn(
        "split",
        F.when(bucket < t1, F.lit("train"))
        .when(bucket < t2, F.lit("validation"))
        .otherwise(F.lit("test")),
    )


def split_leakage_report(
    docs: DataFrame,
    split_col: str = "split",
    text_col: str = "text",
    threshold: float = 0.5,
    id_col: str = "doc_id",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Audit ANY split assignment for near-dup leakage — the detection
    counterpart of :func:`leakage_safe_split`'s prevention: given a
    corpus already carrying ``split_col`` (an external pipeline's
    assignment, a legacy per-doc hash split, shard labels), count
    near-dup pairs by the (ordered) pair of split values their members
    landed in.  Rows with ``split_a != split_b`` are exactly the leaks
    a held-out evaluation would score as memorization.

    Scale shape: the pair list is banded (never all-pairs); the two
    label attachments are equi-joins of a 2-column projection against
    the pairs-derived table, and the report is one bounded groupBy
    (#distinct split values squared).  Output: (split_a, split_b,
    n_pairs) with split_a <= split_b lexicographically, so the pair of
    labels is order-canonical whichever member carried which.

    ``pairs`` injects a precomputed pair table (see
    :func:`leakage_safe_split`); with it supplied, ``docs`` only needs
    (``id_col``, ``split_col``) — no text column is touched.
    """
    if pairs is None:
        pairs = minhash_near_duplicates(docs, text_col, threshold=threshold)
    lab = docs.select(F.col(id_col), F.col(split_col))
    a = lab.select(
        F.col(id_col).alias("d1"), F.col(split_col).alias("_s1")
    )
    b = lab.select(
        F.col(id_col).alias("d2"), F.col(split_col).alias("_s2")
    )
    return (
        pairs.join(a, "d1")
        .join(b, "d2")
        .select(
            F.least("_s1", "_s2").alias("split_a"),
            F.greatest("_s1", "_s2").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def select_representatives(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Quality-aware survivor election: keep the HIGHEST-quality document
    of each near-dup cluster instead of :func:`dedup_clusters`'s min-id
    convention (production pipelines keep the best page of a mirror set,
    not the lowest-numbered one; ties break on doc_id for determinism).

    The quality score joins in via an inner equi-join on doc_id — the
    cluster-member table is *pairs-derived* (≪ corpus), so the join prunes
    the quality projection to clustered docs and AQE picks the physical
    strategy (no forced broadcast: #clustered-docs is unbounded at corpus
    scale).  Election is one window over cluster_id; per-cluster row counts
    are near-dup group sizes, so partitions stay small unless the corpus is
    pathologically one giant mirror set.

    Output: one row per cluster — (cluster_id, doc_id, n_members,
    quality_score) of the elected representative.  Singletons are absent,
    as in :func:`dedup_clusters`: they keep themselves by definition.
    """
    from pyspark.sql import Window

    from .text import quality_features

    members = dedup_clusters(docs, text_col, threshold)
    scored = members.join(
        quality_features(docs, text_col).select("doc_id", "quality_score"),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") == 1)
        .select("cluster_id", "doc_id", "n_members", "quality_score")
    )


def ngram_decontaminate(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """N-gram-overlap decontamination (the GPT-3 appendix-C method: flag an
    eval document when any of its word n-grams also occurs anywhere in the
    training corpus; Brown et al. 2020 used 13-grams on much longer
    documents — the default 5 suits the short synthetic corpus).

    Complements :func:`contamination`: LSH+Jaccard finds *mostly-similar
    documents*, while a single verbatim n-gram hit catches a benchmark
    answer pasted into one paragraph of an otherwise-unrelated page.

    Distributed shape: the train side collapses to DISTINCT n-grams BEFORE
    the join — map-side-combinable aggregation, and afterwards each join
    key exists exactly once on the build side, so a stop-phrase shared by
    a billion training docs contributes ONE row, never a fan-out (the skew
    guard).  The probe side is the (much smaller) eval corpus's n-grams;
    the equi-join shuffles on the n-gram string and AQE handles residual
    key skew.  Per-doc shingles are already distinct, so the count is the
    number of distinct leaked n-grams.

    Output: (test_doc_id, n_hit_ngrams) for contaminated eval docs only.
    """
    train_grams = shingles(train, text_col, n).select("shingle").distinct()
    return (
        shingles(test, text_col, n)
        .join(train_grams, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_ngrams"))
        .select(F.col("doc_id").alias("test_doc_id"), "n_hit_ngrams")
    )


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    w: int = 10,
) -> DataFrame:
    """Verbatim repeated-SPAN detection — the substring-level dedup of Lee
    et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better"), which removes exact repeated passages (boilerplate, licence
    headers, quoted chunks) that document-level dedup can't touch because
    the surrounding documents differ.

    Spark-first shape instead of the paper's suffix array: every w-token
    window is fingerprinted, a window is *duplicated* when its exact text
    occurs >= 2 times corpus-wide (any documents, or twice in one), and a
    doc's overlapping/adjacent duplicated windows merge into maximal spans
    via gaps-and-islands.  Cost stays LINEAR in corpus tokens: the
    occurrence count is one map-side-combinable aggregation keyed on the
    window text (a million-fold-repeated boilerplate window is ONE group —
    hot windows make the count cheap, never a pair blow-up), the join-back
    has a distinct build side, and the merge windows shuffle once on
    doc_id.  No pairwise comparison anywhere.

    Output: (doc_id, span_start, span_end, n_windows) — 1-based inclusive
    token positions of each maximal repeated span, with the number of
    duplicated windows it merged.
    """
    # token_windows (the tokenize+explode of the WHOLE corpus) feeds both
    # the occurrence count and the join-back for hits; persist + eager
    # count so the two consumers read cache instead of re-running the
    # explode lineage per branch (same convention as
    # minhash_near_duplicates' sh/banded persists above)
    wins = scratch_persist(token_windows(docs, text_col, w))
    wins.count()
    dup = wins.groupBy("win").count().where(F.col("count") >= 2).select("win")
    hits = wins.join(dup, "win").select(
        "doc_id", "s", (F.col("s") + F.lit(w - 1)).alias("e")
    )
    return merge_spans(hits)


def despan_keep_first(
    docs: DataFrame,
    text_col: str = "text",
    w: int = 10,
) -> DataFrame:
    """Keep-one-copy substring dedup — the canonical Lee et al. 2021
    selection policy composed onto :func:`duplicate_spans` /
    :func:`remove_spans`: for every duplicated w-token window, the FIRST
    corpus occurrence (smallest (doc_id, start)) survives; every other
    occurrence is cut.  Contrast plain ``remove_spans(duplicate_spans())``,
    which cuts ALL occurrences and leaves no copy of the repeated passage
    in the corpus.

    Distributed shape mirrors duplicate_spans: the first-occurrence
    election is a map-side-combinable ``min(struct(doc_id, s))`` keyed on
    the window text — NOT a row_number window over `win`, whose
    partition key would be the exact skew axis (a million-fold-repeated
    boilerplate window is ONE group under the aggregate, one hot
    partition under a window).  Join-back has a distinct build side;
    non-first occurrences merge into maximal spans and are cut by the
    JVM filter-transform.

    Output: (doc_id, text [cut], n_removed_tokens) for every document.
    """
    wins = scratch_persist(token_windows(docs, text_col, w))
    wins.count()
    firsts = (
        wins.groupBy("win")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(F.struct("doc_id", "s")).alias("_first"),
        )
        .where(F.col("_n") >= 2)
        .select("win", "_first")
    )
    hits = (
        wins.join(firsts, "win")
        .where(
            ~(
                (F.col("doc_id") == F.col("_first.doc_id"))
                & (F.col("s") == F.col("_first.s"))
            )
        )
        .select("doc_id", "s", (F.col("s") + F.lit(w - 1)).alias("e"))
    )
    return remove_spans(docs, merge_spans(hits), text_col)


def token_windows(
    docs: DataFrame, text_col: str = "text", w: int = 10
) -> DataFrame:
    """Every w-token window per document with its 1-based start position:
    (doc_id, s, win).  Same zero-shuffle array-domain build (and the same
    small-scan repartition guard) as :func:`shingles`, but positional —
    no per-doc distinct, because span detection needs every occurrence."""
    win_struct = (
        f"CASE WHEN size(_toks) >= {w} THEN "
        f"transform(sequence(0, size(_toks) - {w}),"
        f" i -> struct(i + 1 AS s, concat_ws(' ', slice(_toks, i + 1, {w})) AS win)) "
        f"ELSE CAST(array() AS ARRAY<STRUCT<s: INT, win: STRING>>) END"
    )
    docs = _ensure_parallel(docs)
    return (
        docs.withColumn("_toks", tokens_expr(text_col))
        .select("doc_id", F.explode(F.expr(win_struct)).alias("_w"))
        .select("doc_id", F.col("_w.s").alias("s"), F.col("_w.win").alias("win"))
    )


def remove_spans(
    docs: DataFrame, spans: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Cut span positions out of document text — the transform half of
    substring dedup (:func:`duplicate_spans` detects, this removes).

    Removes EVERY listed span: the keep-one-copy policy of Lee et al. is
    a *selection over spans*, not a different cut — compose it by
    filtering the spans table first (e.g. anti-join span doc_ids against
    your canonical keep-list) and passing the survivors here.  Keeping
    policy out of the cut keeps both operators deterministic and simple.

    Distributed shape: spans aggregate to one per-doc array (pairs-scale
    table, AQE-broadcastable), the cut is a single JVM-side
    filter-transform over the token array (no UDF, no extra shuffle), and
    docs without spans pass through untouched via the left join.

    Output: (doc_id, text [cut], n_removed_tokens).
    """
    agg = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_sp")
    )
    # Spark lambda index i is 0-based; span positions are 1-based inclusive
    kept_expr = (
        "CASE WHEN _sp IS NULL THEN _toks ELSE "
        "filter(transform(_toks, (t, i) -> "
        "IF(exists(_sp, p -> i + 1 >= p.span_start AND i + 1 <= p.span_end), "
        "CAST(NULL AS STRING), t)), x -> x IS NOT NULL) END"
    )
    return (
        docs.join(agg, "doc_id", "left")
        .withColumn("_toks", tokens_expr(text_col))
        .withColumn("_kept", F.expr(kept_expr))
        .select(
            "doc_id",
            F.array_join("_kept", " ").alias("text"),
            (F.size("_toks") - F.size("_kept")).cast("long").alias(
                "n_removed_tokens"
            ),
        )
    )


def merge_spans(hits: DataFrame) -> DataFrame:
    """Gaps-and-islands merge of (doc_id, s, e) hit windows into maximal
    spans: overlapping or abutting windows coalesce; output (doc_id,
    span_start, span_end, n_windows).  One shuffle on doc_id."""
    from pyspark.sql import Window

    by_pos = Window.partitionBy("doc_id").orderBy("s")
    prev_max = F.max("e").over(by_pos.rowsBetween(Window.unboundedPreceding, -1))
    islands = hits.withColumn(
        "_new", F.when(prev_max.isNull() | (F.col("s") > prev_max + 1), 1).otherwise(0)
    ).withColumn(
        "_island",
        F.sum("_new").over(by_pos.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy("doc_id", "_island").agg(
        F.min("s").cast("long").alias("span_start"),
        F.max("e").cast("long").alias("span_end"),
        F.count(F.lit(1)).alias("n_windows"),
    ).drop("_island")


# ---------------------------------------------------------------------------
# Cross-corpus contamination (train/eval overlap detection)
# ---------------------------------------------------------------------------


def contamination(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Find eval/test documents that leak from the training corpus — the
    benchmark-contamination check every training pipeline needs.

    Two channels, strictly cross-corpus (within-side duplicates are the
    dedup operators' job, not this one's):

    - *exact*: content-hash equi-join (shuffle keyed on md5 — skew-proof);
    - *near*: each side is banded independently (a doc's LSH bands depend
      only on its own text), candidates are the CROSS band-bucket
      collisions only, then exact-Jaccard verification over the union
      shingle table.  Never an all-pairs comparison, and never a
      train-vs-train pair.

    ``doc_id`` must be unique across the two inputs (they usually come
    from one catalog, as in the registered query).  Exact matches are
    reported once with match='exact' and excluded from the near channel.

    Shingle/signature/band tables are built ONCE over the tagged union —
    the corpus-side tag rides the shingle rows (``carry``), so splitting
    the banded table back into train/test sides is a filter, not a
    semi-join: no per-side re-derivation (which doubled the signature
    aggregation, r4's 30-shuffle plan) and no id-list exchanges.

    The shingle/band persists go through :func:`scratch_persist`, which
    bounds their lifetime (LRU pool) instead of leaking them for the
    session.  (An eager ``localCheckpoint`` of the verified pairs was
    measured 3-10x slower as a cleanup vehicle: the RDD materialization
    path skips AQE and its blocks pile up in executor memory.)

    Output: (test_doc_id, train_doc_id, jaccard, match_type).
    """
    ex = (
        test.select(F.md5(F.col(text_col)).alias("h"), F.col("doc_id").alias("test_doc_id"))
        .join(
            train.select(
                F.md5(F.col(text_col)).alias("h"), F.col("doc_id").alias("train_doc_id")
            ),
            "h",
        )
        .select(
            "test_doc_id",
            "train_doc_id",
            F.lit(1.0).alias("jaccard"),
            F.lit("exact").alias("match_type"),
        )
    )

    tagged = train.withColumn("side", F.lit("train")).unionByName(
        test.withColumn("side", F.lit("test"))
    )
    sh = scratch_persist(shingles(tagged, text_col, carry=("side",)))
    bands = scratch_persist(
        lsh_bands(minhash_signatures(sh, carry=("side",)), carry=("side",))
    )
    # Materialize both caches NOW: downstream, the candidate build and the
    # verify's semi-join prune are sibling branches of one action — left
    # lazy, they race to compute the uncached shingle lineage in parallel
    # and each branch re-runs the explode+window+md5 work (measured 3-6x
    # slower than this two-job materialization).
    bands.count()
    bt = bands.where(F.col("side") == "train").select(
        "band", "band_hash", F.col("doc_id").alias("d2")
    )
    be = bands.where(F.col("side") == "test").select(
        "band", "band_hash", F.col("doc_id").alias("d1")
    )
    cands = (
        be.join(bt, ["band", "band_hash"]).select("d1", "d2").dropDuplicates()
    )
    near = (
        jaccard_verify(cands, sh, threshold)
        .select(
            F.col("d1").alias("test_doc_id"),
            F.col("d2").alias("train_doc_id"),
            "jaccard",
            F.lit("near").alias("match_type"),
        )
        .join(ex.select("test_doc_id", "train_doc_id"), ["test_doc_id", "train_doc_id"], "left_anti")
    )
    return ex.unionByName(near)


# ---------------------------------------------------------------------------
# n-gram Jaccard (direct, candidate-free — for bounded corpora / validation)
# ---------------------------------------------------------------------------


def eval_suite_contamination(
    train: DataFrame,
    test: DataFrame,
    set_col: str = "eval_set",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Screen the training corpus against a whole SUITE of benchmarks in
    ONE pass — real pipelines decontaminate against dozens of eval sets,
    and looping :func:`contamination` per set rescans the corpus (and
    rebuilds the shingle/signature tables) once per benchmark.

    ``test`` is the UNION of all eval sets with a ``set_col`` label;
    the expensive machinery runs once over train + the union (the
    per-set split costs nothing: cross-side candidate generation never
    depended on which test set a doc belongs to — test-test collisions
    are excluded either way), then the per-set report is a broadcast
    join of the bounded (#contaminated docs) flag table back onto the
    labels.

    Output, one row per eval set: (set_col, n_test_docs,
    n_contaminated, n_exact, n_near_only, contamination_rate) — where
    ``n_contaminated`` counts test docs with ANY training-side leak,
    split into docs with an exact copy vs near-duplicate-only.
    """
    pairs = contamination(
        train, test.drop(set_col), text_col=text_col, threshold=threshold
    )
    per_doc = pairs.groupBy("test_doc_id").agg(
        F.max(
            F.when(F.col("match_type") == "exact", 1).otherwise(0)
        ).alias("_has_exact")
    )
    labeled = test.select(
        F.col("doc_id").alias("test_doc_id"), F.col(set_col)
    ).join(per_doc, "test_doc_id", "left")
    return labeled.groupBy(set_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_test_docs"),
        F.count("_has_exact").cast("long").alias("n_contaminated"),
        F.sum(F.coalesce(F.col("_has_exact"), F.lit(0)))
        .cast("long")
        .alias("n_exact"),
        (
            F.count("_has_exact")
            - F.sum(F.coalesce(F.col("_has_exact"), F.lit(0)))
        )
        .cast("long")
        .alias("n_near_only"),
        F.round(
            F.count("_has_exact")
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("contamination_rate"),
    )


def ngram_jaccard_shuffle_estimate(
    n_docs: int,
    avg_tokens: float,
    max_df: int,
    n_nodes: int = 1,
    n: int = 3,
    bytes_per_row: int = 16,
) -> dict:
    """Capacity-planning estimate for :func:`ngram_jaccard_pairs` with a
    ``max_df`` cap — the sizing formula behind SCALING.md's spill-bound
    x1000 cell, as code instead of prose (r6 verdict task).

    Two shuffle terms dominate:

    - INDEX exchanges: both self-join sides ship every shingle occurrence
      as an (8 B doc_id, 8 B md5 long) row —
      ``2 * n_docs * (avg_tokens - n + 1) * bytes_per_row``;
    - PAIR aggregation: the join emits at most ``(max_df - 1) / 2``
      ordered pairs per occurrence (each occurrence of a shingle with
      df <= max_df meets at most ``max_df - 1`` partners, halved by the
      d1 < d2 filter) — the cap's whole job is making this term LINEAR
      in corpus size instead of quadratic.

    A single node spills once its share crosses executor memory (the
    measured onset on the 128 GiB test box is ~x100 of the sf0.1 corpus
    — SCALING.md); on a cluster the same bytes divide by ``n_nodes``.
    When ``per_node_bytes`` still exceeds memory, use
    :func:`minhash_near_duplicates` — banding replaces the pair term
    entirely.

    Returns row counts, per-term bytes, and ``per_node_bytes``.
    """
    shingle_rows = int(n_docs * max(avg_tokens - n + 1, 1))
    index_bytes = 2 * shingle_rows * bytes_per_row
    pair_rows = int(shingle_rows * max(max_df - 1, 0) / 2)
    pair_bytes = pair_rows * bytes_per_row
    total = index_bytes + pair_bytes
    return {
        "shingle_rows": shingle_rows,
        "index_shuffle_bytes": index_bytes,
        "pair_rows_upper_bound": pair_rows,
        "pair_shuffle_bytes_upper_bound": pair_bytes,
        "total_shuffle_bytes_upper_bound": total,
        "per_node_bytes": total / max(1, n_nodes),
    }


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """n-gram Jaccard >= threshold via the inverted index ONLY.

    Intersection sizes come straight from the shingle self-join aggregated
    on the pair key — candidates are never materialized and re-joined back
    to the shingle table (that re-join fans out to |pairs| x |avg shingles|
    rows, ~50x the index join).

    ``max_df`` guards the quadratic term: join fan-out is sum over shingles
    of C(df, 2), so a single stop-word-like shingle with df=10^6 alone
    produces ~5*10^11 join rows.  Shingles whose document frequency exceeds
    ``max_df`` are dropped from BOTH join sides of the index (bounding any
    one shingle's fan-out at C(max_df, 2)) but kept in the per-doc set
    sizes, so computed Jaccard never over-estimates: the cap can only lose
    pairs whose overlap is carried by corpus-ubiquitous shingles (recall
    loss only, no precision loss).  The default is ``None`` — EXACT — so
    callers are never silently recall-lossy (the r4 default of 128 made
    the public API approximate without asking); scale runs over corpora
    with hot shingles must opt in with an explicit cap, e.g.
    ``max_df=128``.  For corpora where capped recall is unacceptable, use
    MinHash banding (:func:`minhash_near_duplicates`), which replaces the
    quadratic term entirely.  Size a capped run BEFORE launching it with
    :func:`ngram_jaccard_shuffle_estimate` (docs x tokens x max_df x
    bytes / nodes — the formula behind SCALING.md's spill analysis).

    Perf note (r5): the zero-shuffle array-domain shingle build is a net
    win for the signature pipelines (minhash/contamination ~25% faster
    warm) but costs THIS operator ~0.7 s at sf0.1 vs the old shuffled
    build (1.3 s vs 0.6 s; still 0.8x the r1 anchor).  The self-join's
    quadratic fan-out dominates and is partition-count-insensitive
    (measured flat across 32/64/512 pre-join partitions), so the shared
    build is kept — the capped (max_df) variant remains the scale path.
    """
    # consumed three times (both join sides + sizes): persist or the
    # shingle build runs three times; materialize eagerly so sibling
    # branches read cache instead of racing to compute it
    sh = scratch_persist(shingles(docs, text_col, n))
    sh.count()
    idx = sh
    if max_df is not None:
        # Hot-shingle list is tiny by construction (only shingles with
        # df > max_df — stop-word-grade n-grams), so a broadcast anti-join
        # removes them MAP-SIDE, before any shuffle: the skewed keys never
        # reach the self-join's exchange.  A window-count alternative would
        # shuffle the whole index partitioned by exactly these hot keys.
        # The df aggregation itself is map-side combinable (partial counts).
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > int(max_df))
            .select("shingle")
        )
        idx = sh.join(F.broadcast(hot), "shingle", "left_anti")
    # the self-join keys on the 60-bit md5 of the shingle, not the string:
    # the two index exchanges carry 8-byte longs instead of n-gram text
    # (~4x fewer shuffle bytes — the difference between spilling and not
    # at the x100 probe).  Intersection counts are therefore exact modulo
    # 60-bit collisions (~2^-60 per shingle pair, and the DuckDB oracle
    # hashes identically, so even a collision matches).  Set sizes stay
    # string-distinct.
    idx_h = idx.select("doc_id", md5_long(F.col("shingle")).alias("sh"))
    s1 = idx_h.select(F.col("doc_id").alias("d1"), "sh")
    s2 = idx_h.select(F.col("doc_id").alias("d2"), "sh")
    inter = (
        s1.join(s2, "sh")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    return _jaccard_from_sizes(inter, sizes, threshold)


# ---------------------------------------------------------------------------
# Fuzzy (edit-distance) matching — q-gram blocked Levenshtein join
# ---------------------------------------------------------------------------


def _qgram_index(keys: DataFrame, q: int) -> DataFrame:
    """(s, gh) — DISTINCT q-grams per key, hashed to 60-bit longs so the
    candidate self-join exchanges 8-byte keys, never gram text (the same
    shuffle-byte discipline as :func:`ngram_jaccard_pairs`).  The
    ``array_distinct`` runs map-side in the gram build: set semantics cost
    no shuffle.  Callers must pre-filter ``length(s) >= q`` — Spark's
    ``sequence(1, n)`` DESCENDS for n < 1, which would fabricate grams."""
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(1, length(s) - {q - 1}),"
            f" i -> substring(s, i, {q}))"
        )
    )
    return keys.select(
        "s", F.explode(grams).alias("_g")
    ).select("s", md5_long(F.col("_g")).alias("gh"))


def _deletion_variants(col, k: int):
    """Array of every DISTINCT non-empty string reachable from ``col``
    by deleting up to ``k`` codepoints — the FastSS / symmetric-delete
    neighborhood (Bocek et al. 2007; the SymSpell index), built by k
    rounds of map-side array HOFs (no shuffle, no Python).  Size is
    bounded by sum_{j<=k} C(len, j); callers apply it only to the
    short-key stratum (len < (k+1)*q), so <= ~37 variants per key at
    len 8, k 2.  The EMPTY variant is dropped: a pair whose only common
    deletion subsequence is '' has its shorter side len <= k, which is
    exactly the tiny-cross stratum's slice."""

    def one_dels(t):
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t), F.lit(1))),
            lambda i: F.concat(
                t.substr(F.lit(1), i - F.lit(1)),
                t.substr(i + F.lit(1), F.length(t)),
            ),
        )

    arr = F.array(col)
    for _ in range(int(k)):
        arr = F.array_distinct(
            F.array_union(arr, F.flatten(F.transform(arr, one_dels)))
        )
    return F.filter(arr, lambda v: F.length(v) > 0)


def _deletion_index(keys: DataFrame, k: int) -> DataFrame:
    """(s, gh) — 60-bit hashes of s's <=k-deletion neighborhood.  The
    short-stratum counterpart of :func:`_qgram_index`: blocking keys are
    whole subsequences (near-unique), not single characters, so the
    candidate self-join's fan-out is sum over variants of C(df, 2) with
    variant df orders of magnitude below any character df — this is what
    removes the sum-over-chars df^2 blow-up a 1-gram index has on a
    natural short vocabulary."""
    return keys.select(
        "s", F.explode(_deletion_variants(F.col("s"), k)).alias("_v")
    ).select("s", md5_long(F.col("_v")).alias("gh"))


def _qgram_candidates(
    keys: DataFrame, q: int, k: int, max_df: int | None
) -> DataFrame:
    """(s1, s2) candidate pairs sharing >= 1 distinct q-gram, pruned by
    the EXACT count lower bound before any verification.

    Bound: one edit rewrites at most ``q`` gram occurrences, so ``k``
    edits eliminate at most ``k*q`` distinct gram TYPES from either side;
    surviving types of s appear verbatim in t.  Hence any true pair
    satisfies ``shared >= max(|grams(s1)|, |grams(s2)|) - k*q`` — a
    precision-only prune (never drops a true pair), applied to the pair
    aggregate so Levenshtein verification sees a fraction of the join's
    fan-out.  (PassJoin/Gravano-style count filtering; the classic form
    uses positional gram bags — the distinct-type form above is the
    set-semantics-safe restatement.)"""
    idx = _qgram_index(keys, q)
    if max_df is not None:
        # identical hot-key discipline to ngram_jaccard_pairs: the skewed
        # grams never reach the self-join exchange (recall-lossy, opt-in)
        hot = (
            idx.groupBy("gh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > int(max_df))
            .select("gh")
        )
        idx = idx.join(F.broadcast(hot), "gh", "left_anti")
    dcnt = idx.groupBy("s").agg(F.count(F.lit(1)).alias("_dg"))
    p1 = idx.select(F.col("s").alias("s1"), "gh")
    p2 = idx.select(F.col("s").alias("s2"), "gh")
    shared = (
        p1.join(p2, "gh")
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    d1 = dcnt.select(F.col("s").alias("s1"), F.col("_dg").alias("_dg1"))
    d2 = dcnt.select(F.col("s").alias("s2"), F.col("_dg").alias("_dg2"))
    return (
        shared.join(d1, "s1")
        .join(d2, "s2")
        .where(
            F.col("_shared")
            >= F.greatest(F.col("_dg1"), F.col("_dg2")) - F.lit(k * q)
        )
        .select("s1", "s2")
    )


def edit_distance_pairs(
    strings: DataFrame,
    key_col: str = "s",
    max_dist: int = 2,
    q: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """All pairs of DISTINCT keys within Levenshtein distance
    ``max_dist`` — fuzzy matching / record linkage (typo-variant
    detection over a vocabulary, near-identical titles or URLs) as a
    blocked join, never an all-pairs comparison.

    The reference has no fuzzy matching (its stream identity is exact
    column equality, database.py:731-787); this extends the dedup family
    the same way MinHash extends exact dedup.

    Candidate generation is COMPLETE (recall 1.0 vs a brute-force
    Levenshtein join, property-tested) via three strata, unioned then
    verified; with ``k = max_dist``:

    - **q-grams** (len >= q): pairs whose longer side has
      ``len >= (k+1)*q`` are guaranteed >= 1 surviving shared gram
      (each edit destroys <= q gram occurrences).  Inverted-index
      self-join on 60-bit gram hashes + the exact distinct-type count
      prune (see :func:`_qgram_candidates`).
    - **deletion neighborhoods** (0 < len < (k+1)*q): the short-key
      regime, where gram blocking keys degenerate.  Each key emits the
      60-bit hashes of every distinct string reachable by deleting
      <= k codepoints (FastSS / symmetric delete); candidates are the
      equi-join on those hashes.  Complete: an optimal <=k-edit
      alignment of (s, t) with i insertions, d deletions, c
      substitutions has its MATCHED characters form a common
      subsequence u reachable from s by d+c <= k deletions and from t
      by i+c <= k deletions, so u is in both neighborhoods — unless u
      is empty, which forces the shorter side to len <= k, exactly the
      tiny-cross slice below.  Blocking keys are whole subsequences, so
      per-bucket fan-out is sum over variants of C(df, 2) with variant
      df near 1 on natural vocabularies — a 1-gram index here would
      instead shuffle sum over characters of df^2 pairs (near-all-pairs
      over the short slice, since most natural-language tokens are
      shorter than (k+1)*q), which is why this stratum does NOT block
      on single characters.
    - **tiny cross** (len <= k vs len <= 2*k): a key of length <= k is
      within ``k`` edits of anything of length <= 2*k (and of NOTHING
      longer, by the length bound) and may share no character with it;
      the broadcast cross of these two alphabet-bounded slivers closes
      completeness exactly where gram blocking cannot.

    Verification filters ``abs(len diff) <= k`` then runs the JVM
    ``levenshtein(s1, s2, threshold=k)`` (early-exit banded DP, O(k*len)
    per survivor) — built-in codegen, no Python.  Output: one row per
    matched unordered pair, ``(s1, s2, dist)`` with ``s1 < s2``.

    ``max_df`` (opt-in, default None = exact) drops grams whose document
    frequency exceeds it from the q-gram index — the hot-shingle cap of
    :func:`ngram_jaccard_pairs` with the same recall-only loss contract,
    for corpora whose gram distribution is adversarial.  The cap applies
    to the q-gram stratum ONLY: deletion-variant keys are already
    selective and the tiny cross is alphabet-bounded, so capping them
    would trade recall for nothing.

    Unicode contract: distances count CODEPOINT edits (Spark's
    ``levenshtein`` semantics — 'é' vs 'e' is one edit).  NB DuckDB's
    ``levenshtein`` counts BYTE edits, so a direct oracle is equivalent
    on ASCII keys only; the registered ``vocab_fuzzy_unicode`` query
    pins the non-ASCII case with a byte-faithful oracle (codepoint ->
    single-byte placeholder bijection before the oracle's levenshtein).

    100 TB shape: every stage is an equi-join or map-side-combinable
    aggregate on uniform hash keys; the only non-equi join is the tiny
    cross whose BOTH sides are <= |alphabet|^(2k) distinct keys.  The
    verify stage is output-proportional.  Cost model mirrors
    :func:`ngram_jaccard_shuffle_estimate` with pair fan-out bounded by
    sum over grams of C(df, 2) — cap with ``max_df`` when the gram df
    tail is heavy.  Measured at fixed answer density (SCALING.md, the
    disjoint-alphabet linear replica): flat to a 100x vocabulary and
    4.4x on the next decade, with matched pairs exactly linear — the
    candidate-generation curve itself, separated from output
    delivery."""
    k = int(max_dist)
    if k < 0:
        raise ValueError("max_dist must be >= 0")
    if q < 2:
        raise ValueError("q must be >= 2 (the short stratum uses deletion neighborhoods)")
    keys = (
        strings.select(F.col(key_col).cast("string").alias("s"))
        .where(F.col("s").isNotNull() & (F.length("s") > 0))
        .distinct()
    )
    keys = scratch_persist(keys)
    kq = (k + 1) * q
    cand_a = _qgram_candidates(keys.where(F.length("s") >= q), q, k, max_df)
    short_idx = _deletion_index(keys.where(F.length("s") < kq), k)
    # NB no per-stratum distinct here: the union-level distinct below
    # already dedups map-side (partial aggregation), so an inner distinct
    # would buy its early reduction at the price of a whole extra shuffle
    # of the short-stratum slice on every call
    cand_b = (
        short_idx.select(F.col("s").alias("s1"), "gh")
        .join(short_idx.select(F.col("s").alias("s2"), "gh"), "gh")
        .where(F.col("s1") < F.col("s2"))
        .select("s1", "s2")
    )
    tiny = keys.where(F.length("s") <= k)
    near = keys.where(F.length("s") <= 2 * k)
    cand_c = (
        F.broadcast(tiny.select(F.col("s").alias("_ta")))
        .crossJoin(near.select(F.col("s").alias("_tb")))
        .where(F.col("_ta") != F.col("_tb"))
        .select(
            F.least("_ta", "_tb").alias("s1"),
            F.greatest("_ta", "_tb").alias("s2"),
        )
    )
    cand = cand_a.unionByName(cand_b).unionByName(cand_c).distinct()
    return (
        cand.where(
            F.abs(F.length("s1") - F.length("s2")) <= k
        )
        .withColumn("dist", F.levenshtein("s1", "s2", k))
        .where(F.col("dist") >= 0)
        .select("s1", "s2", F.col("dist").cast("int").alias("dist"))
    )


def fuzzy_canonical_map(
    vocab: DataFrame,
    pairs: DataFrame,
    tok_col: str = "tok",
    n_col: str = "n",
) -> DataFrame:
    """One-step typo canonicalization over :func:`edit_distance_pairs`
    output: each token maps to the MOST FREQUENT member of
    {itself} ∪ its fuzzy neighbours (ties broken to the
    lexicographically smallest candidate), the deterministic election a
    cleaning pass applies before counting/joining on token identity.

    Deliberately one-step, not a transitive closure: chaining
    ``cat -> hat -> had`` would merge tokens arbitrarily far apart (the
    classic over-merge failure of closure-based spell canonicalization);
    one election per token keeps every mapping within ``max_dist`` of
    its source and makes the result order- and partitioning-independent.

    Input contracts: ``vocab`` is (tok, n) with distinct tokens;
    ``pairs`` is the (s1, s2, ...) unordered-pair frame from
    :func:`edit_distance_pairs` over the same keys.  Output:
    ``(tok, canonical, canonical_n)`` for EVERY vocab token (callers
    filter ``canonical != tok`` for the variant report).

    Scale: all frames are vocabulary-bounded; the election is one
    rank-1 window whose predicate runs as WindowGroupLimit (map-side
    top-1 per token before the shuffle)."""
    from pyspark.sql import Window

    nb = pairs.select(
        F.col("s1").alias("_t"), F.col("s2").alias("_cand")
    ).unionByName(
        pairs.select(F.col("s2").alias("_t"), F.col("s1").alias("_cand"))
    )
    self_c = vocab.select(
        F.col(tok_col).alias("_t"), F.col(tok_col).alias("_cand")
    )
    scored = (
        nb.unionByName(self_c)
        .join(
            vocab.select(
                F.col(tok_col).alias("_cand"), F.col(n_col).alias("_cn")
            ),
            "_cand",
        )
    )
    w = Window.partitionBy("_t").orderBy(F.desc("_cn"), F.asc("_cand"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("_t").alias(tok_col),
            F.col("_cand").alias("canonical"),
            F.col("_cn").alias("canonical_n"),
        )
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str = "s",
    right_col: str = "s",
    max_dist: int = 2,
    q: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Two-table record linkage within Levenshtein distance ``max_dist``:
    every (left key, right key) pair — including exact matches at
    distance 0 — via the same complete blocked candidate generation as
    :func:`edit_distance_pairs` (the self-join form), never a cross
    join of the tables.

    Strata mirror the self form, crossed between sides: q-gram inverted
    indexes joined left-vs-right on 60-bit gram hashes with the exact
    distinct-type count prune; <=k-deletion-neighborhood indexes for the
    short-key regime (see :func:`_deletion_index` — complete by the
    FastSS common-subsequence argument, selective where 1-gram keys are
    near-all-pairs); and a broadcast tiny-cross of the two ``len <= 2k``
    slivers keeping pairs whose SHORTER member is ``len <= k``.  Keys deduplicate per
    side first, so linkage is between key universes — callers join the
    result back to rows.  Output: (left_col, right_col, dist); when both
    sides pass the same column name the right one gains a ``_r`` suffix.

    100 TB shape: identical to the self form — equi-joins on uniform
    hash keys, output-proportional verify, opt-in ``max_df`` hot-gram
    cap (recall-only loss) — with the candidate fan-out bounded by
    sum over grams of df_left * df_right.  The cap's document frequency
    is computed over the UNION of both sides' indexes (the two-table
    analogue of the self form's single key universe), so a gram hot on
    one side and cold on the other is pruned from both — the recall
    contract of a given ``max_df`` is the same whichever side a key
    lands on."""
    k = int(max_dist)
    if k < 0:
        raise ValueError("max_dist must be >= 0")
    if q < 2:
        raise ValueError("q must be >= 2 (the short stratum uses deletion neighborhoods)")
    out_l = left_col
    out_r = right_col if right_col != left_col else f"{right_col}_r"

    def keyed(df: DataFrame, col: str) -> DataFrame:
        return (
            df.select(F.col(col).cast("string").alias("s"))
            .where(F.col("s").isNotNull() & (F.length("s") > 0))
            .distinct()
        )

    kl = scratch_persist(keyed(left, left_col))
    kr = scratch_persist(keyed(right, right_col))
    kq = (k + 1) * q

    def cross_candidates() -> DataFrame:
        il = _qgram_index(kl.where(F.length("s") >= q), q)
        ir = _qgram_index(kr.where(F.length("s") >= q), q)
        if max_df is not None:
            # df over the UNION of both indexes, so the cap's meaning
            # matches the self form (one key universe): a gram hot on
            # either side is pruned from BOTH, never from just one —
            # asymmetric pruning would give the two sides different
            # recall-loss contracts for the same cap value.
            hot = (
                il.select("gh")
                .unionAll(ir.select("gh"))
                .groupBy("gh")
                .agg(F.count(F.lit(1)).alias("_df"))
                .where(F.col("_df") > int(max_df))
                .select("gh")
            )
            il = il.join(F.broadcast(hot), "gh", "left_anti")
            ir = ir.join(F.broadcast(hot), "gh", "left_anti")
        dl = il.groupBy("s").agg(F.count(F.lit(1)).alias("_dgl"))
        dr = ir.groupBy("s").agg(F.count(F.lit(1)).alias("_dgr"))
        shared = (
            il.select(F.col("s").alias("_l"), "gh")
            .join(ir.select(F.col("s").alias("_r"), "gh"), "gh")
            .groupBy("_l", "_r")
            .agg(F.count(F.lit(1)).alias("_shared"))
        )
        return (
            shared.join(dl.select(F.col("s").alias("_l"), "_dgl"), "_l")
            .join(dr.select(F.col("s").alias("_r"), "_dgr"), "_r")
            .where(
                F.col("_shared")
                >= F.greatest(F.col("_dgl"), F.col("_dgr")) - F.lit(k * q)
            )
            .select("_l", "_r")
        )

    cand_c = (
        F.broadcast(
            kl.where(F.length("s") <= 2 * k).select(F.col("s").alias("_l"))
        )
        .crossJoin(
            kr.where(F.length("s") <= 2 * k).select(F.col("s").alias("_r"))
        )
        .where(F.least(F.length("_l"), F.length("_r")) <= k)
    )
    cand_b = (
        _deletion_index(kl.where(F.length("s") < kq), k)
        .select(F.col("s").alias("_l"), "gh")
        .join(
            _deletion_index(kr.where(F.length("s") < kq), k)
            .select(F.col("s").alias("_r"), "gh"),
            "gh",
        )
        .select("_l", "_r")
        .distinct()
    )
    cand = (
        cross_candidates()
        .unionByName(cand_b)
        .unionByName(cand_c)
        .distinct()
    )
    return (
        cand.where(F.abs(F.length("_l") - F.length("_r")) <= k)
        .withColumn("dist", F.levenshtein("_l", "_r", k))
        .where(F.col("dist") >= 0)
        .select(
            F.col("_l").alias(out_l),
            F.col("_r").alias(out_r),
            F.col("dist").cast("int").alias("dist"),
        )
    )
