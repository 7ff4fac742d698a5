"""RRD poller source tests (S2) + smoke fan trim (A11 tail)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from nntsc_spark.functions.aggregations import trim_smoke_fan
from nntsc_spark.ingest.rrd_smokeping import process_smokeping
from nntsc_spark.sources.rrd import RRDPoller, RRDStream


def _write_export(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_rrd_poller_incremental(spark, tmp_path):
    f1 = tmp_path / "a.rrd.json"
    _write_export(
        f1,
        [
            {"timestamp": 100, "loss": 0, "median": 0.02, "pings": [0.02, 0.03]},
            {"timestamp": 400, "loss": 1, "median": 0.03, "pings": [0.03, None]},
        ],
    )
    poller = RRDPoller(
        spark, [RRDStream(str(f1), "src", "host1")]
    )
    df = poller.poll()
    assert df.count() == 2
    # second poll: nothing new
    assert poller.poll() is None
    # new row appended -> only it is fetched
    _write_export(
        f1,
        [
            {"timestamp": 100, "loss": 0, "median": 0.02, "pings": [0.02, 0.03]},
            {"timestamp": 400, "loss": 1, "median": 0.03, "pings": [0.03, None]},
            {"timestamp": 700, "loss": 0, "median": 0.025, "pings": [0.025, 0.026]},
        ],
    )
    df3 = poller.poll()
    assert df3.count() == 1 and df3.collect()[0]["timestamp"] == 700


def test_rrd_poller_feeds_smokeping_ingest(spark, tmp_path):
    f1 = tmp_path / "b.rrd.json"
    _write_export(
        f1, [{"timestamp": 100, "loss": 1, "median": 0.0215, "pings": [0.02, None, 0.025]}]
    )
    poller = RRDPoller(spark, [RRDStream(str(f1), "src", "h")])
    out = process_smokeping(poller.poll()).collect()[0]
    assert out["median"] == 21.5 and out["pingsent"] == 3
    assert out["lossrate"] == 1 / 3


def test_rrd_poller_missing_file(spark, tmp_path):
    poller = RRDPoller(spark, [RRDStream(str(tmp_path / "nope"), "s", "h")])
    assert poller.poll() is None


def test_trim_smoke_fan(spark):
    df = spark.createDataFrame(
        [([1.0] * 20, 5), ([2.0] * 20, 25)], "fan array<double>, n long"
    )
    out = df.select(F.size(trim_smoke_fan(F.col("fan"), F.col("n"))).alias("sz")).collect()
    assert sorted(r.sz for r in out) == [5, 20]


def test_events_fact_adapts_to_both_ts_layouts(spark, tmp_path):
    """The driver's testdata changed events.ts physical type between rounds
    (TIMESTAMP(NANOS)-as-long -> timestamp[us]); a hardcoded assumption cost
    round 3 thirty queries.  events_fact must produce IDENTICAL epoch-second
    facts from either layout, with the range predicate applied in the
    column's own type."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nntsc_spark.sources.tables import events_fact

    base = 1704153600  # 2024-01-02 00:00:00 UTC
    rows = [(i, base + i * 3600, i % 3, f"t{i % 2}", float(i)) for i in range(48)]
    ids, secs, uids, etypes, vals = zip(*rows)

    for sub, ts_arr in [
        ("micros", pa.array([s * 1_000_000 for s in secs], pa.timestamp("us"))),
        ("nanos", pa.array([s * 1_000_000_000 for s in secs], pa.timestamp("ns"))),
        # raw-integer layouts at three units: the bigint branch must probe
        # the magnitude, not assume nanos
        ("long_s", pa.array(list(secs), pa.int64())),
        ("long_us", pa.array([s * 1_000_000 for s in secs], pa.int64())),
        ("long_ns", pa.array([s * 1_000_000_000 for s in secs], pa.int64())),
    ]:
        d = tmp_path / sub
        d.mkdir()
        table = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": ts_arr,
                "user_id": pa.array(uids, pa.int64()),
                "event_type": pa.array(etypes, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        )
        pq.write_table(table, str(d / "events.parquet"))

    def facts(sub):
        df = events_fact(spark, str(tmp_path / sub), base + 3600, base + 10 * 3600)
        return sorted(
            (r.stream_id, r.timestamp, r.event_type, r.value, r.event_id)
            for r in df.collect()
        )

    micros = facts("micros")
    assert len(micros) == 10  # inclusive bounds: hours 1..10
    assert min(r[1] for r in micros) == base + 3600
    assert max(r[1] for r in micros) == base + 10 * 3600
    for sub in ("nanos", "long_s", "long_us", "long_ns"):
        assert facts(sub) == micros, sub


def test_rrd_poller_revert_replays_failed_batch(spark, tmp_path):
    """Reference revert-to-lastcommit (rrd.py:233-238): a failed downstream
    write must not lose measurements — revert() rewinds the tentative read
    cursor and the next poll returns the same rows; commit() makes them
    durable so a later revert doesn't resurrect them."""
    f1 = tmp_path / "a.rrd"
    _write_export(
        f1,
        [
            {"timestamp": 100, "loss": 0.0, "median": 10.0, "pings": [10.0]},
            {"timestamp": 200, "loss": 0.0, "median": 11.0, "pings": [11.0]},
        ],
    )
    poller = RRDPoller(spark, [RRDStream(str(f1), "src", "h")])

    first = {r.timestamp for r in poller.poll().collect()}
    assert first == {100, 200}
    poller.revert()  # downstream write failed
    again = {r.timestamp for r in poller.poll().collect()}
    assert again == first  # same batch replayed, nothing lost

    poller.commit()  # this time the write succeeded
    assert poller.poll() is None  # nothing new
    poller.revert()  # a later failure must NOT rewind past the commit
    assert poller.poll() is None


def test_jsonl_documents_split_clean_from_rejects(spark, tmp_path):
    """JSONL ingest contract: declared schema (no inference pass), every
    malformed or schema-drifted line COUNTED with its raw text and a
    reason — never silently dropped — and n_chars re-derived."""
    import json as _json

    from nntsc_spark.sources.documents import (
        read_documents_jsonl,
        split_corrupt,
    )

    p = tmp_path / "corpus.jsonl"
    lines = [
        _json.dumps({"doc_id": 1, "text": "good one", "lang": "en",
                     "source": "web"}),
        '{"doc_id": 2, "text": "truncated...',         # malformed
        _json.dumps({"doc_id": None, "text": "orphan"}),  # missing id
        _json.dumps({"doc_id": 3, "lang": "en"}),         # missing text
        _json.dumps({"doc_id": 4, "text": "", "source": "web"}),
    ]
    p.write_text("\n".join(lines) + "\n")
    clean, rejects = split_corrupt(read_documents_jsonl(spark, str(p)))
    got = {r.doc_id: r for r in clean.collect()}
    assert set(got) == {1, 4}
    assert got[1].n_chars == 8 and got[4].n_chars == 0
    reasons = sorted(r.reject_reason for r in rejects.collect())
    assert reasons == ["malformed_json", "missing_id", "missing_text"]
    raws = [r.raw_line for r in rejects.collect()]
    assert any("truncated" in r for r in raws)


def test_shard_writer_jsonl_format(spark, tmp_path):
    from nntsc_spark.pipeline.packing import write_training_shards

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4, salt="s", fmt="json")
    back = spark.read.json(out)
    assert back.count() == 40
    assert back.select("shard").distinct().count() == 4
    # identical shuffle/order path: parquet and jsonl shard assignments agree
    outp = str(tmp_path / "shardsp")
    write_training_shards(docs, outp, n_shards=4, salt="s")
    a = {(r.doc_id, r.shard) for r in back.select("doc_id", "shard").collect()}
    b = {(r.doc_id, r.shard)
         for r in spark.read.parquet(outp).select("doc_id", "shard").collect()}
    assert a == b
