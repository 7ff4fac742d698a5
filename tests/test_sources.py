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
