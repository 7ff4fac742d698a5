"""Property-based tests (hypothesis) for the exact-semantics expressions.

SURVEY.md §7.3 "Hard #1" calls out the operators whose defaults silently
diverge (integer-truncating median, RLE, greedy packing, bin arithmetic).
Fixed fixtures pin known cases; these properties pin the SEMANTICS against
independent pure-Python references over generated inputs.  Each example
costs a Spark job, so examples are capped and deadlines disabled — the
point is breadth of inputs, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # CI determinism: same examples every run
)


@given(vals=st.lists(st.integers(min_value=0, max_value=10**9), max_size=25))
@settings(**SETTINGS)
def test_int_median_matches_reference_semantics(spark, vals):
    from nntsc_spark.ingest.base import int_median_expr

    df = spark.createDataFrame([(vals,)], "a array<long>")
    got = df.select(
        int_median_expr(F.array_sort(F.col("a"))).alias("m")
    ).collect()[0]["m"]

    s = sorted(vals)
    if not s:
        expected = None
    elif len(s) % 2 == 1:
        expected = s[len(s) // 2]
    else:
        expected = int((s[len(s) // 2] + s[len(s) // 2 - 1]) / 2)
    assert got == expected


@given(path=st.lists(st.integers(min_value=0, max_value=5), max_size=20))
@settings(**SETTINGS)
def test_rle_roundtrip_and_run_invariants(spark, path):
    from nntsc_spark.functions.scalars import rle_runs

    df = spark.createDataFrame([(path,)], "a array<long>")
    runs = df.select(rle_runs(F.col("a")).alias("r")).collect()[0]["r"]

    # decode(encode(x)) == x
    decoded = [r["asn"] for r in runs for _ in range(r["cnt"])]
    assert decoded == path
    # runs are maximal: no two adjacent runs share a value
    assert all(a["asn"] != b["asn"] for a, b in zip(runs, runs[1:]))


@given(
    lengths=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=30),
    capacity=st.integers(min_value=8, max_value=64),
)
@settings(**SETTINGS)
def test_pack_sequences_invariants(spark, lengths, capacity):
    from nntsc_spark.pipeline.packing import pack_sequences

    rows = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(lengths)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        pack_sequences(docs, capacity=capacity, n_groups=1).collect(),
        key=lambda r: r.doc_id,
    )

    # reference greedy fold
    seq, fill = 0, 0
    for r, t in zip(out, lengths):
        e = min(t, capacity)
        if fill + e > capacity:
            seq, fill = seq + 1, 0
        assert (r.seq_id, r.seq_offset, r.n_tokens, r.truncated) == (
            seq,
            fill,
            t,
            t > capacity,
        )
        fill += e
    # budget: untruncated docs in one sequence never exceed capacity
    by_seq: dict[int, int] = {}
    for r in out:
        if not r.truncated:
            by_seq[r.seq_id] = by_seq.get(r.seq_id, 0) + r.n_tokens
    assert all(v <= capacity for v in by_seq.values())


@given(
    ts=st.lists(st.integers(min_value=0, max_value=2**31), max_size=20),
    binsize=st.integers(min_value=1, max_value=10**6),
)
@settings(**SETTINGS)
def test_binstart_matches_python_floor_division(spark, ts, binsize):
    from nntsc_spark.operators.aggregate import with_binstart

    df = spark.createDataFrame([(t,) for t in ts], "timestamp long")
    got = [
        r.binstart
        for r in with_binstart(df, binsize).orderBy("timestamp").collect()
    ]
    assert got == [t - (t % binsize) for t in sorted(ts)]


@given(
    corpus=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_duplicate_spans_matches_bruteforce(spark, corpus):
    """duplicate_spans == an independent O(n^2) reimplementation on random
    tiny-alphabet corpora (the 4-letter alphabet forces window collisions,
    exercising merging, islands, and within-doc repeats)."""
    from collections import Counter

    from nntsc_spark.pipeline.dedup import duplicate_spans

    w = 3
    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end): r.n_windows
        for r in duplicate_spans(df, w=w).collect()
    }

    # brute force: count every window occurrence, merge per-doc islands
    toks = {i: t.split(" ") for i, t in docs}  # split('') -> [''] like Spark
    counts = Counter(
        tuple(l[i : i + w])
        for l in toks.values()
        for i in range(len(l) - w + 1)
    )
    expect = {}
    for doc_id, l in toks.items():
        starts = [
            i + 1
            for i in range(len(l) - w + 1)
            if counts[tuple(l[i : i + w])] >= 2
        ]
        cur = None  # (start, end, n)
        for s in starts:
            e = s + w - 1
            if cur and s <= cur[1] + 1:
                cur = (cur[0], max(cur[1], e), cur[2] + 1)
            else:
                if cur:
                    expect[(doc_id, cur[0], cur[1])] = cur[2]
                cur = (s, e, 1)
        if cur:
            expect[(doc_id, cur[0], cur[1])] = cur[2]
    assert got == expect


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=12),
    budget=st.integers(min_value=1, max_value=120),
)
@settings(**SETTINGS)
def test_token_budget_sample_matches_greedy(spark, sizes, budget):
    """token_budget_sample == greedy prefix in md5-priority order for
    arbitrary doc-length distributions and budgets (single stratum)."""
    import hashlib

    from nntsc_spark.pipeline.text import token_budget_sample

    docs = [(i, " ".join(["w"] * n), "s0") for i, n in enumerate(sizes)]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {r.doc_id: r.cum_tokens
           for r in token_budget_sample(df, budget_tokens=budget).collect()}

    pri = sorted(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16), i, n)
        for i, n in enumerate(sizes)
    )
    expect, total = {}, 0
    for _, i, n in pri:
        total += n
        if total > budget:
            break
        expect[i] = total
    assert got == expect


@given(
    assignment=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2),
                  st.integers(min_value=0, max_value=3)),
        min_size=1,
        max_size=24,
    ),
    tiny_target=st.booleans(),
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture],
          derandomize=True)
def test_compact_fact_read_identity_property(spark, tmp_path, assignment, tiny_target):
    """For ANY assignment of rows to (day, ingest batch) and either a
    tiny or huge file-size target, compaction preserves the exact row
    multiset and a second run is a no-op."""
    import uuid as _uuid

    from nntsc_spark.storage import compact_fact, read_fact, write_fact

    path = str(tmp_path / f"fact-{_uuid.uuid4().hex[:8]}")
    t0 = 1_700_000_000 - (1_700_000_000 % 86_400)
    by_batch = {}
    for i, (day, batch) in enumerate(assignment):
        by_batch.setdefault(batch, []).append(
            (i % 4, t0 + day * 86_400 + i, float(i))
        )
    for batch, rows in sorted(by_batch.items()):
        write_fact(
            spark.createDataFrame(
                rows, "stream_id long, timestamp long, value double"
            ),
            path,
            batch_id=batch + 1,
        )
    before = sorted(tuple(r) for r in read_fact(spark, path).collect())
    target = 1024 if tiny_target else 1 << 30
    compact_fact(spark, path, target_bytes=target)
    assert sorted(tuple(r) for r in read_fact(spark, path).collect()) == before
    # idempotent: once at target, nothing further rewrites
    assert compact_fact(spark, path, target_bytes=target) == []


@given(
    sizes=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]),
                  st.integers(min_value=1, max_value=30)),
        min_size=1,
        max_size=12,
    ),
    budget=st.integers(min_value=1, max_value=200),
)
@settings(**SETTINGS)
def test_temperature_token_sample_matches_reference(spark, sizes, budget):
    """temperature_token_sample == per-source greedy prefix under
    floor(budget * T_s^0.7 / z) token allocations, for arbitrary
    source/length distributions — the budget math pinned against an
    independent pure-Python reference."""
    import hashlib

    from nntsc_spark.pipeline.text import temperature_token_sample

    docs = [(i, src, " ".join(["w"] * n)) for i, (src, n) in enumerate(sizes)]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {r.doc_id: r.cum_tokens
           for r in temperature_token_sample(
               df, budget_tokens=budget, alpha=0.7).collect()}

    totals: dict[str, int] = {}
    for _i, (src, n) in enumerate(sizes):
        totals[src] = totals.get(src, 0) + n
    z = sum(w for _, w in sorted(
        {s: float(t) ** 0.7 for s, t in totals.items()}.items()))
    budgets = {s: int(float(budget) * (float(t) ** 0.7) / z)
               for s, t in totals.items()}
    expect: dict[int, int] = {}
    for src in totals:
        pri = sorted(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16), i, n)
            for i, (s, n) in enumerate(sizes) if s == src
        )
        total = 0
        for _, i, n in pri:
            total += n
            if total > budgets[src]:
                break
            expect[i] = total
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),   # doc_id
            st.sampled_from(["a", "b", "c"]),          # key
            st.integers(min_value=0, max_value=50),    # priority
        ),
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    cap=st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_cap_per_key_matches_python_reference(spark, rows, cap):
    """cap_per_key == a pure-Python top-cap per key under the identical
    (priority DESC, md5-priority ASC) order."""
    import hashlib

    from nntsc_spark.pipeline.text import cap_per_key

    if not rows:
        return
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    got = sorted(
        r.doc_id
        for r in cap_per_key(
            df, cap=cap, priority_col="n_chars", salt="p"
        ).collect()
    )

    def pri(doc_id):
        return int(hashlib.md5(f"p{doc_id}".encode()).hexdigest()[:15], 16)

    expected = []
    for key in {r[1] for r in rows}:
        members = sorted(
            (r for r in rows if r[1] == key),
            key=lambda r: (-r[2], pri(r[0])),
        )
        expected += [r[0] for r in members[:cap]]
    assert got == sorted(expected)


@given(
    lists=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=30),
            max_size=8,
            unique=True,
        ),
        min_size=2,
        max_size=2,
    ),
    k=st.integers(min_value=1, max_value=90),
)
@settings(**SETTINGS)
def test_rrf_fuse_matches_python_reference(spark, lists, k):
    from nntsc_spark.pipeline.search import rrf_fuse

    frames = [
        spark.createDataFrame(
            [(d, i + 1) for i, d in enumerate(lst)] or [(None, None)],
            "doc_id long, rank int",
        ).where(F.col("doc_id").isNotNull())
        for lst in lists
    ]
    got = {
        r.doc_id: (r.n_lists, r.rrf_score)
        for r in rrf_fuse(frames, k=k).collect()
    }
    expected: dict[int, list[int]] = {}
    for lst in lists:
        for i, d in enumerate(lst):
            expected.setdefault(d, []).append(i + 1)
    assert set(got) == set(expected)
    for d, ranks in expected.items():
        n, score = got[d]
        assert n == len(ranks)
        ref = 0.0
        for r in sorted(ranks, reverse=True):  # any order: 2-term max
            ref += 1.0 / (k + r)
        assert score == ref


@given(
    epochs=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.floats(min_value=0.0, max_value=3.0,
                  allow_nan=False, allow_infinity=False),
        max_size=3,
    ),
    default=st.floats(min_value=0.0, max_value=2.0,
                      allow_nan=False, allow_infinity=False),
)
@settings(**SETTINGS)
def test_epoch_upsample_matches_python_reference(spark, epochs, default):
    import hashlib
    import math

    from nntsc_spark.pipeline.text import epoch_upsample

    rows = [(i, ["a", "b", "c", "d"][i % 4]) for i in range(24)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r.doc_id, r.epoch)
        for r in epoch_upsample(df, epochs, salt="q",
                                default_epochs=default).collect()
    )

    def bucket(doc_id):
        return (
            int(hashlib.md5(f"q{doc_id}".encode()).hexdigest()[:15], 16)
            % 10000
        )

    expected = []
    for doc_id, src in rows:
        e = float(epochs.get(src, default))
        full = int(math.floor(e))
        thr = int(round((e - full) * 10000))
        expected += [(doc_id, k) for k in range(full)]
        if thr > 0 and bucket(doc_id) < thr:
            expected.append((doc_id, full))
    assert got == sorted(expected)


@given(
    ts=st.lists(st.integers(min_value=0, max_value=500),
                min_size=2, max_size=30, unique=True),
    freq=st.integers(min_value=1, max_value=40),
    k=st.floats(min_value=1.0, max_value=5.0,
                allow_nan=False, allow_infinity=False),
)
@settings(**SETTINGS)
def test_gap_report_matches_bruteforce(spark, ts, freq, k):
    from nntsc_spark.operators.frequency import gap_report

    df = spark.createDataFrame([(1, t) for t in ts],
                               "stream_id long, timestamp long")
    fr = spark.createDataFrame([(1, freq)],
                               "stream_id long, frequency long")
    got = sorted(
        (r.gap_start, r.gap_end, r.gap_seconds, r.missed)
        for r in gap_report(df, k=k, frequency=fr).collect()
    )
    s = sorted(ts)
    expected = []
    for a, b in zip(s, s[1:]):
        d = b - a
        if d > k * freq:
            expected.append((a, b, d, max(int(d / freq) - 1, 1)))
    assert got == sorted(expected)


@given(
    points=st.lists(st.integers(min_value=0, max_value=200),
                    max_size=15),
    intervals=st.lists(
        st.tuples(st.integers(min_value=0, max_value=200),
                  st.integers(min_value=0, max_value=60)),
        max_size=10,
    ),
    bucket=st.integers(min_value=1, max_value=50),
)
@settings(**SETTINGS)
def test_interval_join_matches_bruteforce(spark, points, intervals, bucket):
    """Bucketed equi-join strategy == the naive theta join, for any
    bucket size — every overlap found, every match exactly once."""
    from nntsc_spark.operators.intervals import interval_join

    if not points or not intervals:
        return
    p = spark.createDataFrame(
        [(i, t) for i, t in enumerate(points)], "pid long, timestamp long"
    )
    iv = spark.createDataFrame(
        [(j, s, s + w) for j, (s, w) in enumerate(intervals)],
        "iid long, start long, end long",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(p, iv, bucket=bucket).collect()
    )
    expected = sorted(
        (i, j)
        for i, t in enumerate(points)
        for j, (s, w) in enumerate(intervals)
        if s <= t <= s + w
    )
    assert got == expected


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),     # query_id
            st.integers(min_value=0, max_value=40),    # neighbor_id
            st.integers(min_value=0, max_value=50),    # score (as int/10)
        ),
        max_size=60,
    ),
    k=st.integers(min_value=1, max_value=5),
    ascending=st.booleans(),
)
@settings(**SETTINGS)
def test_per_query_topk_matches_single_window_reference(
    spark, rows, k, ascending
):
    """The two-stage (query, partition)-local top-k — round 10's ANN
    rank-stage rewrite — must be EXACT: identical rows and ranks to the
    naive single per-query window under the shared (score, neighbor_id)
    total order, for any candidate multiset, k, and sort direction.
    Duplicate (query, neighbor) candidate rows are allowed on input
    (LSH multi-table generators produce them pre-dedup)."""
    from nntsc_spark.pipeline.similarity import _per_query_topk

    # dedup (query, neighbor) pairs: row_number over a non-unique total
    # order would be nondeterministic on exact ties of BOTH keys
    seen = {}
    for q, n, s in rows:
        seen[(q, n)] = s / 10.0
    data = [(q, n, s) for (q, n), s in seen.items()]
    if not data:
        return
    df = spark.createDataFrame(
        data, "query_id long, neighbor_id long, score double"
    ).repartition(7)  # several input partitions so the local stage acts
    got = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.score)
        for r in _per_query_topk(df, k, "score", ascending=ascending)
        .collect()
    )
    expected = []
    by_q: dict = {}
    for q, n, s in data:
        by_q.setdefault(q, []).append((s, n))
    for q, cands in by_q.items():
        cands.sort(key=lambda sn: (sn[0] if ascending else -sn[0], sn[1]))
        for rank, (s, n) in enumerate(cands[:k], start=1):
            expected.append((q, n, rank, s))
    assert got == sorted(expected)


@given(
    picks=st.lists(
        st.integers(min_value=0, max_value=5), min_size=1, max_size=12
    )
)
@settings(**SETTINGS)
def test_leakage_safe_split_partition_and_atomicity(spark, picks):
    """leakage_safe_split's two contracts hold STRUCTURALLY for any
    duplicate topology, not just the fixed fixture: (a) the three
    splits exactly partition the corpus; (b) every emitted near-dup
    pair shares its component representative and therefore its split.
    (b) is deterministic whatever the LSH recall — the invariant is
    checked against the pairs the SAME generator emits, and both
    endpoints of any edge sit in one component by construction."""
    from nntsc_spark.pipeline.dedup import (
        leakage_safe_split,
        minhash_near_duplicates,
    )

    pool = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "pack my box with five dozen liquor jugs today",
        "sphinx of black quartz judge my vow tonight",
        "how vexingly quick daft zebras jump around here",
        "completely different words entirely unrelated text now",
    ]
    rows = [(i, pool[p]) for i, p in enumerate(picks)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r.doc_id: r for r in leakage_safe_split(docs).collect()}
    assert set(out) == set(range(len(picks)))
    assert all(
        r.split in ("train", "validation", "test") for r in out.values()
    )
    for p in minhash_near_duplicates(docs).collect():
        assert out[p.d1].rep_id == out[p.d2].rep_id
        assert out[p.d1].split == out[p.d2].split


@given(
    picks=st.lists(
        st.integers(min_value=0, max_value=5), min_size=1, max_size=12
    ),
    salt=st.sampled_from(["split", "s2", "epoch7", ""]),
)
@settings(**SETTINGS)
def test_corpus_split_audit_off_diagonal_empty(spark, picks, salt):
    """r14 verdict task 5: the composed split-plus-audit's off-diagonal
    is EMPTY for any duplicate topology and any salt — the audit runs
    over leakage_safe_split's own assignment, where a cross-split
    near-dup pair is impossible by construction.  The per-split doc
    counts must also exactly partition the corpus."""
    from nntsc_spark.pipeline.corpus import corpus_split_audit
    from nntsc_spark.pipeline.dedup import (
        leakage_safe_split,
        split_leakage_report,
    )

    pool = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "pack my box with five dozen liquor jugs today",
        "sphinx of black quartz judge my vow tonight",
        "how vexingly quick daft zebras jump around here",
        "completely different words entirely unrelated text now",
    ]
    rows = [(i, pool[p]) for i, p in enumerate(picks)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = corpus_split_audit(docs, salt=salt).collect()
    assert sum(r.n_docs for r in out) == len(picks)
    assert all(r.n_cross_split_pairs == 0 for r in out)
    # the corpus-level pair totals are constant across the split rows
    assert len({(r.n_same_split_pairs, r.n_cross_split_pairs)
                for r in out}) == 1
    # the raw report agrees: no off-diagonal rows at all
    labeled = leakage_safe_split(docs, salt=salt)
    rep = split_leakage_report(labeled).collect()
    assert all(r.split_a == r.split_b for r in rep)
    assert sum(r.n_pairs for r in rep) == out[0].n_same_split_pairs
