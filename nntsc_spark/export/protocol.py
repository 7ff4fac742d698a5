"""Wire protocol: framed, compressed, pickled messages.

The reference frames every message with a fixed struct header and a
zlib-compressed pickled body (libnntsc/exporter.py:525-546 _enqueue_history,
transmit_client; header format nntsc_hdr_fmt).  Same scheme here: a
``!HI`` header (message type, body length) followed by zlib(pickle(body)).

Message inventory mirrors README:311-360 and exporter.py's dispatch:
client->server REQUEST (COLLECTIONS/SCHEMAS/STREAMS), AGGREGATE, SUBSCRIBE,
UNSUBSCRIBE, MATRIX, PERCENTILE (rejected); server->client VERSION_CHECK
(first frame on every connection, exporter.py:1152-1156), COLLECTIONS,
SCHEMAS, STREAMS, HISTORY, HISTORY_DONE, LIVE, PUSH, ERROR.
"""

from __future__ import annotations

import io
import pickle
import socket
import struct
import zlib
from enum import IntEnum

HDR_FMT = "!HI"
HDR_LEN = struct.calcsize(HDR_FMT)

#: Hard ceilings on what we will accept from a socket.  The header's
#: length field allows 4 GiB and zlib expands ~1000:1, so an unbounded
#: ``zlib.decompress`` hands any client that can reach the port a
#: decompression-bomb OOM.  64 MiB compressed / 256 MiB decompressed is
#: far beyond any legitimate NNTSC message (the reference flushes history
#: every 10k rows, exporter.py:434-445) while keeping the worst case a
#: bounded allocation.
MAX_FRAME_BYTES = 64 * 1024 * 1024
MAX_BODY_BYTES = 256 * 1024 * 1024


class FrameTooLarge(ValueError):
    """A frame exceeded MAX_FRAME_BYTES / MAX_BODY_BYTES."""


#: Client-API version sent as the body of the connect-time VERSION_CHECK
#: frame.  The reference transmits its client library's version constant
#: as the FIRST frame of every connection and clients refuse to proceed on
#: a mismatch (exporter.py:1150-1156: "Tell the client what version of the
#: client API they need").  The constant itself lives in the out-of-tree
#: libnntscclient package, so this engine defines its own version string;
#: the contract (first frame, exact-match gate) is what matters.
CLIENTAPI_VERSION = "nntsc-spark/1.0"


class Msg(IntEnum):
    # client -> server
    REQUEST = 1
    AGGREGATE = 2
    SUBSCRIBE = 3
    MATRIX = 4
    # NNTSC_UNSUBSCRIBE (exporter.py:894-905, dispatched inline at :982):
    # drop streams from a live subscription without disconnecting
    UNSUBSCRIBE = 5
    # NNTSC_PERCENTILE: a legacy request the reference politely rejects
    # with DBWORKER_BADJOB + a log line (exporter.py:144-148)
    PERCENTILE = 6
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
    # NNTSC_VERSION_CHECK (exporter.py:1152-1156): first frame on every
    # connection, body = CLIENTAPI_VERSION
    VERSION_CHECK = 19


class Req(IntEnum):
    COLLECTIONS = 0
    SCHEMAS = 1
    STREAMS = 2


def pack(msgtype: Msg, body: object) -> bytes:
    payload = zlib.compress(pickle.dumps(body, protocol=4))
    return struct.pack(HDR_FMT, int(msgtype), len(payload)) + payload


#: the ONLY globals a protocol body may reference: its own two enums.
#: Everything else is plain data (dicts/lists/tuples/str/int/float/bytes).
_ALLOWED_GLOBALS = {(__name__, "Msg"), (__name__, "Req")}


class _SafeUnpickler(pickle.Unpickler):
    """Unpickler with the class-lookup door welded shut.

    Raw ``pickle.loads`` on socket data hands any client that can reach
    the port arbitrary code execution (a crafted ``__reduce__`` calling
    ``os.system``).  The reference shares the scheme wholesale
    (exporter.py:525-546); here the trust boundary is enforced:
    ``find_class`` admits only this module's two message enums, so a
    malicious GLOBAL opcode raises ``UnpicklingError`` instead of
    importing attacker-chosen callables.
    """

    def find_class(self, module, name):  # noqa: D102 - see class doc
        if (module, name) in _ALLOWED_GLOBALS:
            return {"Msg": Msg, "Req": Req}[name]
        raise pickle.UnpicklingError(
            f"protocol forbids global {module}.{name}"
        )


def safe_loads(data: bytes) -> object:
    return _SafeUnpickler(io.BytesIO(data)).load()


def bounded_decompress(payload: bytes, limit: int = MAX_BODY_BYTES) -> bytes:
    """zlib-decompress with an explicit decompressed-size ceiling.

    Uses ``decompressobj().decompress(data, max_length)`` so a
    decompression bomb stops allocating at ``limit`` instead of
    expanding ~1000:1; any unconsumed tail (input that would expand
    past the ceiling, or trailing garbage) is an error.
    """
    d = zlib.decompressobj()
    body = d.decompress(payload, limit)
    if d.unconsumed_tail or d.decompress(b"", 1):
        raise FrameTooLarge(
            f"decompressed body exceeds {limit} byte ceiling"
        )
    if d.unused_data:
        # bytes AFTER a complete zlib stream land in unused_data, not
        # unconsumed_tail — without this check trailing garbage was
        # silently accepted (r6 advice finding)
        raise FrameTooLarge("trailing garbage after compressed body")
    return body


def read_message(sock: socket.socket) -> tuple[Msg, object] | None:
    """Blocking read of one framed message; None on clean EOF.

    Raises FrameTooLarge (without reading the payload) when the header
    announces a frame over MAX_FRAME_BYTES, and when the payload would
    decompress past MAX_BODY_BYTES — both are hostile-client shapes the
    reference's unbounded scheme (exporter.py:525-546) would OOM on.
    """
    hdr = _read_exact(sock, HDR_LEN)
    if hdr is None:
        return None
    msgtype, length = struct.unpack(HDR_FMT, hdr)
    if length > MAX_FRAME_BYTES:
        raise FrameTooLarge(
            f"frame of {length} bytes exceeds {MAX_FRAME_BYTES} byte cap"
        )
    payload = _read_exact(sock, length)
    if payload is None:
        return None
    return Msg(msgtype), safe_loads(bounded_decompress(payload))


def _read_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf
