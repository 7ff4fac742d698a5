"""Wire protocol: framed, compressed, pickled messages.

The reference frames every message with a fixed struct header and a
zlib-compressed pickled body (libnntsc/exporter.py:525-546 _enqueue_history,
transmit_client; header format nntsc_hdr_fmt).  Same scheme here: a
``!HI`` header (message type, body length) followed by zlib(pickle(body)).

Message inventory mirrors README:311-360 and exporter.py's dispatch:
client->server REQUEST (COLLECTIONS/SCHEMAS/STREAMS), AGGREGATE, SUBSCRIBE,
MATRIX; server->client COLLECTIONS, SCHEMAS, STREAMS, HISTORY,
HISTORY_DONE, LIVE, PUSH, ERROR.
"""

from __future__ import annotations

import pickle
import socket
import struct
import zlib
from enum import IntEnum

HDR_FMT = "!HI"
HDR_LEN = struct.calcsize(HDR_FMT)


class Msg(IntEnum):
    # client -> server
    REQUEST = 1
    AGGREGATE = 2
    SUBSCRIBE = 3
    MATRIX = 4
    # server -> client
    COLLECTIONS = 10
    SCHEMAS = 11
    STREAMS = 12
    HISTORY = 13
    HISTORY_DONE = 14
    LIVE = 15
    PUSH = 16
    ERROR = 17
    # reference NNTSC_QUERY_CANCELLED (exporter.py:514-521): tells the
    # client the missing range is a query timeout, not an absence of data
    QUERY_CANCELLED = 18


class Req(IntEnum):
    COLLECTIONS = 0
    SCHEMAS = 1
    STREAMS = 2


def pack(msgtype: Msg, body: object) -> bytes:
    payload = zlib.compress(pickle.dumps(body, protocol=4))
    return struct.pack(HDR_FMT, int(msgtype), len(payload)) + payload


def read_message(sock: socket.socket) -> tuple[Msg, object] | None:
    """Blocking read of one framed message; None on clean EOF."""
    hdr = _read_exact(sock, HDR_LEN)
    if hdr is None:
        return None
    msgtype, length = struct.unpack(HDR_FMT, hdr)
    payload = _read_exact(sock, length)
    if payload is None:
        return None
    return Msg(msgtype), pickle.loads(zlib.decompress(payload))


def _read_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf
