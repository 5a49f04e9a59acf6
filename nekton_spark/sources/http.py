"""HTTP server source (reference ``type: http_server``, ``src/sources.rs:32-78``).

Reference semantics: a blocking HTTP server; each POST body at the
configured path becomes a one-message batch; 405 for non-POST, 404 for
wrong path, 201 on accept.

Spark has no built-in HTTP source, so this is a custom **Python
DataSource** (Spark 4 ``pyspark.sql.datasource``). Architecture note:
the ``SimpleDataSourceStreamReader`` runs in a separate Python worker
process (and may be constructed more than once), so the listener and
the reader cannot share memory. The listener therefore runs driver-side
(started by :func:`http_server_source`) and *spools each POST body to a
file* (atomic tmp+rename, zero-padded sequence numbers); the reader is
a pure spool consumer whose offset is the sequence number. The
streaming checkpoint's offset log then gives exactly the reference's
ack contract (``src/sources.rs:70-73``): a body is only consumed-once
after its epoch commits.

Scale note: an HTTP push endpoint is inherently single-ingress; the
100 TB path is a fleet of stateless HTTP→Kafka bridges + the Kafka
source. This source exists for reference parity and local pipelines.
"""

from __future__ import annotations

import contextlib
import http.server
import os
import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession

try:  # Spark 4.x
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    _HAS_DATASOURCE = True
except ImportError:  # pragma: no cover - older Spark
    DataSource = object
    SimpleDataSourceStreamReader = object
    _HAS_DATASOURCE = False

from ..registry import register_source

_SERVERS: dict[str, tuple[http.server.ThreadingHTTPServer, str]] = {}
_LOCK = threading.Lock()


class _Spool:
    """Append-only directory of numbered payload files."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._seq_lock = threading.Lock()
        existing = [int(f) for f in os.listdir(root) if f.isdigit()]
        self._seq = max(existing) + 1 if existing else 0

    def append(self, body: bytes) -> int:
        # The lock is held across write+rename, and _seq only advances
        # after a successful rename: concurrent POSTs can never expose
        # a gap (seq N+1 visible before N), which would make
        # read_range crash the micro-batch (advisor finding). A failed
        # write (e.g. disk full) leaves _seq unchanged, so the number
        # is reused instead of becoming a permanent hole.
        with self._seq_lock:
            seq = self._seq
            fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".tmp")
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(body)
                os.rename(tmp, os.path.join(self.root, f"{seq:020d}"))
            except BaseException:
                with contextlib.suppress(OSError):
                    os.unlink(tmp)
                raise
            self._seq += 1
        return seq

    @staticmethod
    def read_range(root: str, start: int, end: int) -> list[tuple[int, str]]:
        out = []
        for seq in range(start, end):
            path = os.path.join(root, f"{seq:020d}")
            with open(path, "rb") as f:
                out.append((seq, f.read().decode("utf-8")))
        return out

    @staticmethod
    def current_end(root: str) -> int:
        nums = [int(f) for f in os.listdir(root) if f.isdigit()]
        return max(nums) + 1 if nums else 0


def _handler_for(spool: _Spool, path: str):
    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_POST(self):
            if self.path != path:
                self.send_response(404)  # wrong path (src/sources.rs:56-60)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            spool.append(self.rfile.read(n))
            self.send_response(201)  # accepted (src/sources.rs:70-73)
            self.end_headers()

        # 405 for EVERY non-POST method (src/sources.rs:50-54 rejects
        # anything that isn't POST) — without these, PUT/DELETE/HEAD/
        # PATCH fell through to BaseHTTPRequestHandler's default 501
        def _reject(self):
            self.send_response(405)
            self.end_headers()

        do_GET = _reject
        do_PUT = _reject
        do_DELETE = _reject
        do_HEAD = _reject
        do_PATCH = _reject
        do_OPTIONS = _reject

    return Handler


def start_http_listener(address: str, path: str, spool_dir: str | None = None):
    """Start (or reuse) the listener for address+path; returns (server, spool_dir)."""
    key = f"{address}{path}"
    spool_dir = spool_dir or os.path.join(
        tempfile.gettempdir(), "nekton_http_spool", key.replace(":", "_").replace("/", "_")
    )
    with _LOCK:
        if key not in _SERVERS:
            host, port = address.rsplit(":", 1)
            spool = _Spool(spool_dir)
            server = http.server.ThreadingHTTPServer((host, int(port)), _handler_for(spool, path))
            threading.Thread(target=server.serve_forever, daemon=True).start()
            _SERVERS[key] = (server, spool_dir)
        server, active_dir = _SERVERS[key]
        if active_dir != spool_dir:
            # the cached server keeps spooling to ITS directory; handing
            # the caller their different spool_dir would wire the reader
            # to a directory the server never writes — refuse loudly
            raise ValueError(
                f"http listener for {key} already spools to {active_dir}; "
                f"cannot re-spool to {spool_dir} (stop the session or "
                "use the same spool_dir)"
            )
        return server, active_dir


if _HAS_DATASOURCE:

    class HttpStreamReader(SimpleDataSourceStreamReader):
        """Pure spool consumer — safe to construct in any process."""

        def __init__(self, options):
            self.spool_dir = options.get("spool_dir")
            if not self.spool_dir:
                raise ValueError("http_server source requires spool_dir option")

        def initialOffset(self):
            return {"idx": 0}

        def read(self, start):
            end = _Spool.current_end(self.spool_dir)
            rows = [
                (seq, 0, body, None)
                for seq, body in _Spool.read_range(self.spool_dir, start["idx"], end)
            ]
            return iter(rows), {"idx": end}

        def readBetweenOffsets(self, start, end):
            return iter(
                (seq, 0, body, None)
                for seq, body in _Spool.read_range(self.spool_dir, start["idx"], end["idx"])
            )

        def commit(self, end):
            pass  # spool files retained; offset log is the ledger

    class HttpServerDataSource(DataSource):
        @classmethod
        def name(cls):
            return "http_server"

        def schema(self):
            return "batch_id long, msg_idx long, value string, metadata map<string,string>"

        def simpleStreamReader(self, schema):
            return HttpStreamReader(self.options)


@register_source("http_server")
def http_server_source(
    spark: SparkSession,
    address: str = "127.0.0.1:4195",
    path: str = "/post",
    spool_dir: str | None = None,
) -> DataFrame:
    if not _HAS_DATASOURCE:
        raise NotImplementedError("http_server source requires Spark 4 Python DataSource API")
    _, spool_dir = start_http_listener(address, path, spool_dir)
    try:
        spark.dataSource.register(HttpServerDataSource)
    except Exception:
        pass  # already registered
    return (
        spark.readStream.format("http_server")
        .option("address", address)
        .option("path", path)
        .option("spool_dir", spool_dir)
        .load()
    )
