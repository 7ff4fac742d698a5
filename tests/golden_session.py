"""Golden protocol session: record/replay the full export wire flow.

Per-message-type pytests pin each frame shape in isolation; this module
pins the whole conversation END TO END the way the oracle pins queries —
a scripted client session (VERSION_CHECK handshake -> REQUEST
COLLECTIONS -> SCHEMAS -> STREAMS -> SUBSCRIBE -> HISTORY ->
HISTORY_DONE -> LIVE -> PUSH -> MATRIX -> AGGREGATE -> UNSUBSCRIBE ->
PERCENTILE rejection -> new-stream announcement, the reference's
exporter flow, exporter.py:973-1200) is replayed over a real
socket against a server on a fixed fact table, and every decoded
response must equal the committed fixture byte-for-byte at the message
level (type + body).  A framing change now fails the replay until the
fixture is regenerated deliberately:

    python -m tests.golden_session   # rewrites tests/golden/protocol_session.json

The comparison is on DECODED messages, not raw bytes, so the fixture is
stable across zlib build differences while still exercising header
struct, compression bounds, and safe-unpickle on every frame.
"""

from __future__ import annotations

import json
from pathlib import Path

from nntsc_spark.export.protocol import Msg, Req, pack, read_message

FIXTURE = Path(__file__).parent / "golden" / "protocol_session.json"

#: The scripted session.  Each step is (kind, payload, read_strategy):
#:   kind "send"     -> payload is (Msg, body) sent on the socket
#:   kind "publish"  -> payload is (stream_id, rows) via server.publish_live
#:   kind "push"     -> payload is a timestamp via server.push_marker
#:   kind "announce" -> payload is new-stream rows via server.announce_streams
#: read_strategy: ("n", k) read exactly k messages; ("more", k) read until
#: a frame carries more=False (at most k frames, a hang guard).
SCRIPT = [
    ("send", (Msg.REQUEST, {"request": int(Req.COLLECTIONS)}), ("n", 1)),
    (
        "send",
        (Msg.REQUEST,
         {"request": int(Req.SCHEMAS), "collection": "amp-icmp"}),
        ("n", 1),
    ),
    (
        "send",
        (Msg.REQUEST,
         {"request": int(Req.STREAMS), "collection": "amp-icmp", "minid": 0}),
        ("more", 10),
    ),
    (
        "send",
        (Msg.SUBSCRIBE,
         {"collection": "amp-icmp", "labels": {"L1": [1]},
          "columns": ["value"], "start": 1, "stop": 10_000}),
        ("n", 2),  # HISTORY (single block) + HISTORY_DONE
    ),
    (
        "publish",
        (1, [{"timestamp": 20_000, "value": 42.5, "stream_id": 1,
              "nntsclabel": "L1"}]),
        ("n", 1),  # LIVE
    ),
    ("push", 20_001, ("n", 1)),  # PUSH heartbeat
    (
        "send",
        (Msg.MATRIX,
         {"collection": "amp-icmp", "labels": {"L1": [1], "L2": [2]},
          "value_cols": ["value"], "start": 0, "stop": 7200}),
        ("more", 10),
    ),
    # single label on purpose: _ship_history's final per-label flush
    # iterates a set, whose order is per-process under str hash
    # randomization — one label keeps the recorded sequence exact
    (
        "send",
        (Msg.AGGREGATE,
         {"collection": "amp-icmp", "labels": {"L1": [1]},
          "aggcols": [("value", "avg"), ("value", "count")],
          "start": 1, "stop": 10_000, "binsize": 100}),
        ("n", 2),  # HISTORY (single block) + HISTORY_DONE
    ),
    # second live subscription so UNSUBSCRIBE can drop one stream while
    # the other keeps flowing (exporter.py:894-905)
    (
        "send",
        (Msg.SUBSCRIBE,
         {"collection": "amp-icmp", "labels": {"L2": [2]},
          "columns": ["value"], "start": 1, "stop": 10_000}),
        ("n", 2),  # HISTORY (single block) + HISTORY_DONE
    ),
    ("send", (Msg.UNSUBSCRIBE,
              {"collection": "amp-icmp", "streams": [1]}), ("n", 0)),
    # sync barrier: UNSUBSCRIBE is handled inline by the reader thread
    # before the next message is read, so once this reply arrives the
    # drop has taken effect
    ("send", (Msg.REQUEST, {"request": int(Req.COLLECTIONS)}), ("n", 1)),
    # stream 1 was dropped: this publish must produce NO frame — a stray
    # LIVE here would desync every later read against the fixture
    (
        "publish",
        (1, [{"timestamp": 21_000, "value": 1.0, "stream_id": 1,
              "nntsclabel": "L1"}]),
        ("n", 0),
    ),
    (
        "publish",
        (2, [{"timestamp": 21_000, "value": 2.0, "stream_id": 2,
              "nntsclabel": "L2"}]),
        ("n", 1),  # LIVE for the still-subscribed stream
    ),
    # legacy percentile request: distinct polite rejection
    ("send", (Msg.PERCENTILE, {"collection": "amp-icmp"}), ("n", 1)),
    # live new-stream announcement: the STREAMS request above registered
    # this socket's collection interest (exporter.py:1118-1119), so an
    # announced stream arrives as a STREAMS frame without re-requesting
    (
        "announce",
        [{"stream_id": 3, "source": "src", "destination": "dst3"}],
        ("n", 1),
    ),
    # ...and its FIRST live batch is forwarded even though no
    # subscription names stream 3 (exporter.py:1466-1484)
    (
        "publish",
        (3, [{"timestamp": 22_000, "value": 3.0, "stream_id": 3,
              "nntsclabel": "3"}]),
        ("n", 1),  # LIVE via the newstreams path
    ),
]


def build_server(spark):
    """The fixed collection the session runs against (same data shape as
    the test_export fixture; fully deterministic)."""
    from nntsc_spark.export.server import ExportServer

    fact = spark.createDataFrame(
        [(1, 100 + 10 * i, float(i)) for i in range(30)]
        + [(2, 100 + 30 * i, 100.0 + i) for i in range(10)],
        "stream_id long, timestamp long, value double",
    )
    streams = spark.createDataFrame(
        [(1, "src", "dst1"), (2, "src", "dst2")],
        "stream_id long, source string, destination string",
    )
    return ExportServer(spark, {"amp-icmp": {"fact": fact, "streams": streams}})


def _read_per_strategy(sock, strategy):
    kind, k = strategy
    out = []
    for _ in range(k):
        m = read_message(sock)
        assert m is not None, "connection closed mid-session"
        out.append({"msgtype": int(m[0]), "body": m[1]})
        if kind == "more" and m[1].get("more") is False:
            return out
    if kind == "more":
        raise AssertionError(f"no more=False terminator within {k} frames")
    return out


def run_session(server) -> list[dict]:
    """Execute SCRIPT against a STARTED server; return the ordered decoded
    response stream (JSON-compatible)."""
    import socket

    sock = socket.create_connection(("127.0.0.1", server.port), timeout=60)
    got: list[dict] = []
    try:
        # frame 0 of every connection: the version handshake, sent by the
        # server before any request is read (exporter.py:1150-1156)
        got.extend(_read_per_strategy(sock, ("n", 1)))
        for kind, payload, strategy in SCRIPT:
            if kind == "send":
                mt, body = payload
                sock.sendall(pack(mt, body))
            elif kind == "publish":
                sid, rows = payload
                server.publish_live("amp-icmp", sid, rows)
            elif kind == "announce":
                server.announce_streams("amp-icmp", payload)
            elif kind == "push":
                # push_marker skips subs whose seam drain hasn't settled;
                # wait for waiting=False so the PUSH frame is deterministic
                import time as _time

                for _ in range(500):
                    with server._lock:
                        if server._subs and not any(
                            s.waiting for s in server._subs
                        ):
                            break
                    _time.sleep(0.01)
                server.push_marker("amp-icmp", payload)
            got.extend(_read_per_strategy(sock, strategy))
    finally:
        sock.close()
    # matrix row order within a frame is NOT wire contract (clients key
    # rows by label; it varies with session partitioning) — canonicalize
    # so the golden compare pins content, not partition order
    for m in got:
        if isinstance(m["body"], dict) and "matrix" in m["body"]:
            m["body"]["matrix"] = sorted(
                m["body"]["matrix"],
                key=lambda r: (r.get("nntsclabel") or "", r.get("binstart") or 0),
            )
    # roundtrip through JSON so recorded and replayed values compare in
    # the same domain (tuples->lists, int enum keys -> str, etc.)
    return json.loads(json.dumps(got))


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("golden-session-record")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    server = build_server(spark)
    server.start()
    try:
        messages = run_session(server)
    finally:
        server.stop()
    FIXTURE.parent.mkdir(parents=True, exist_ok=True)
    FIXTURE.write_text(json.dumps(messages, indent=1, sort_keys=True) + "\n")
    print(f"wrote {FIXTURE} ({len(messages)} messages)")


if __name__ == "__main__":
    main()
