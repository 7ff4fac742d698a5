"""Unit tests for pipeline/vocab.py: source-vs-corpus divergence, BPE
pair statistics, training, and encoding."""

from __future__ import annotations

import math

import pytest

from nntsc_spark.pipeline.vocab import (
    EOW,
    bpe_encode,
    bpe_pair_counts,
    bpe_train,
    source_divergence,
)


def _kl_js_reference(src_counts: dict, corpus_counts: dict):
    """Plain-python KL(s||c) and JS(s||c) over the union vocabulary."""
    stot = sum(src_counts.values())
    ctot = sum(corpus_counts.values())
    kl = sum(
        (c / stot) * math.log((c / stot) / (corpus_counts[w] / ctot))
        for w, c in src_counts.items()
    )
    js = 0.0
    for w in set(src_counts) | set(corpus_counts):
        p = src_counts.get(w, 0) / stot
        q = corpus_counts.get(w, 0) / ctot
        m = (p + q) / 2
        if p:
            js += p / 2 * math.log(p / m)
        if q:
            js += q / 2 * math.log(q / m)
    return kl, js


def test_source_divergence_matches_reference_math(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a b", "A"),
            (2, "b c", "B"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in source_divergence(docs).collect()}
    corpus = {"a": 2, "b": 2, "c": 1}
    kl_a, js_a = _kl_js_reference({"a": 2, "b": 1}, corpus)
    kl_b, js_b = _kl_js_reference({"b": 1, "c": 1}, corpus)
    assert out["A"].n_tokens == 3 and out["A"].vocab_size == 2
    assert out["B"].n_tokens == 2 and out["B"].vocab_size == 2
    assert out["A"].kl_vs_corpus == pytest.approx(round(kl_a, 4))
    assert out["A"].js_vs_corpus == pytest.approx(round(js_a, 4))
    assert out["B"].kl_vs_corpus == pytest.approx(round(kl_b, 4))
    assert out["B"].js_vs_corpus == pytest.approx(round(js_b, 4))
    # a source that IS the corpus has zero divergence on both measures
    uni = spark.createDataFrame(
        [(1, "x y", "only")], "doc_id long, text string, source string"
    )
    r = source_divergence(uni).collect()[0]
    assert r.kl_vs_corpus == 0.0 and r.js_vs_corpus == pytest.approx(0.0)


def test_bpe_pair_counts_known_words(spark):
    docs = spark.createDataFrame(
        [(1, "low low"), (2, "lower")], "doc_id long, text string"
    )
    out = {(r.left, r.right): r.pair_count
           for r in bpe_pair_counts(docs).collect()}
    assert out == {
        ("l", "o"): 3,
        ("o", "w" + EOW): 2,
        ("o", "w"): 1,
        ("w", "e"): 1,
        ("e", "r" + EOW): 1,
    }


def test_bpe_train_learns_sennrich_merges(spark):
    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(1, corpus)], "doc_id long, text string")
    merges = bpe_train(docs, num_merges=3, min_freq=1)
    # ('s','t</w>') and ('e','s') tie at count 9 (est</w> occurs 9x);
    # the deterministic lexicographic-max tie-break picks ('s','t</w>'),
    # then ('e','st</w>') at 9, then ('l','o') at 7 — same learned unit
    # est</w> as the textbook trace, fixed order
    assert merges == [("s", "t" + EOW), ("e", "st" + EOW), ("l", "o")]
    # determinism: same corpus, same merges
    assert bpe_train(docs, num_merges=3, min_freq=1) == merges


def test_bpe_train_max_words_guard(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_words"):
        bpe_train(docs, num_merges=1, min_freq=1, max_words=3)


def test_bpe_encode_applies_merges_rank_greedy(spark):
    merges = [("e", "s"), ("es", "t" + EOW), ("l", "o"), ("w", "est" + EOW)]
    docs = spark.createDataFrame(
        [(1, "lowest low unseen")], "doc_id long, text string"
    )
    row = bpe_encode(docs, merges).collect()[0]
    assert row.bpe_tokens == [
        "lo", "west" + EOW,              # lowest: all four merges chain
        "lo", "w" + EOW,                 # low: (l,o) applies, (o,w</w>) unlearned
        "u", "n", "s", "e", "e", "n" + EOW,  # unseen: no merges apply
    ]
    assert row.n_bpe_tokens == len(row.bpe_tokens)
    # lossless: stripping EOW and joining reconstructs the original words
    rebuilt = "".join(row.bpe_tokens).replace(EOW, " ").strip()
    assert rebuilt == "lowest low unseen"


def test_bpe_encode_roundtrip_with_trained_merges(spark, sf_dir):
    from nntsc_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = bpe_train(docs, num_merges=30, min_freq=1, max_words=10_000)
    assert len(merges) > 0
    enc = bpe_encode(docs, merges).select("doc_id", "text", "bpe_tokens")
    for r in enc.collect():
        rebuilt = "".join(r.bpe_tokens).replace(EOW, " ").strip()
        assert rebuilt == " ".join(r.text.split())


def test_textrank_hub_token_outranks_periphery(spark):
    from nntsc_spark.pipeline.vocab import (
        textrank_keywords,
        token_cooccurrence_edges,
    )

    # "hub" is adjacent to every other word; peripheral words only ever
    # touch the hub or one chain neighbor
    docs = spark.createDataFrame(
        [
            (0, "hub alpha hub beta hub gamma hub delta"),
            (1, "alpha hub gamma hub epsilon hub beta"),
            (2, "delta hub epsilon"),
        ],
        "doc_id long, text string",
    )
    edges = {
        (r["src"], r["dst"]): r["w"]
        for r in token_cooccurrence_edges(docs).collect()
    }
    # undirected: both directions present with equal weight (doc 0 has
    # "hub alpha" AND "alpha hub", doc 1 adds one more adjacency)
    assert edges[("hub", "alpha")] == edges[("alpha", "hub")] == 3
    ranked = textrank_keywords(docs, iters=5, topk=10).collect()
    assert ranked[0]["token"] == "hub"
    assert ranked[0]["rank"] > 1.5 * ranked[1]["rank"]
    # ranks are the round-6 pinned values: re-running is byte-identical
    again = textrank_keywords(docs, iters=5, topk=10).collect()
    assert [tuple(r) for r in ranked] == [tuple(r) for r in again]
