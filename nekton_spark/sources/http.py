"""HTTP server source (reference ``type: http_server``, ``src/sources.rs:32-78``).

Reference semantics: a blocking HTTP server; each POST body at the
configured path becomes a one-message batch; 405 for non-POST, 404 for
wrong path, 201 once downstream acks.

Spark has no built-in HTTP source, so this is a custom **Python
DataSource** (Spark 4 ``pyspark.sql.datasource``) with a
``SimpleDataSourceStreamReader``: an embedded HTTP listener accepts
POSTs into an in-memory spool; ``read(start)`` drains the spool and
advances the offset; Structured Streaming's commit log provides the
ack — a body is only "201-complete" in the reference's sense when its
epoch commits, which is the same post-sink ack point as the reference
(``src/sources.rs:70-73``).

Scale note: an HTTP *push* endpoint is inherently a single-ingress
bottleneck; the 100 TB path is to terminate HTTP at a fleet of
stateless bridges publishing to Kafka and use the Kafka source. This
source exists for reference parity and local pipelines.
"""

from __future__ import annotations

import http.server
import json
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

_SPOOLS: dict[str, "_Spool"] = {}
_SPOOLS_LOCK = threading.Lock()


class _Spool:
    """Thread-safe append-only body log with offset reads."""

    def __init__(self):
        self.items: list[str] = []
        self.lock = threading.Lock()

    def append(self, body: str) -> None:
        with self.lock:
            self.items.append(body)

    def read_from(self, start: int) -> tuple[list[str], int]:
        with self.lock:
            return self.items[start:], len(self.items)

    def read_between(self, start: int, end: int) -> list[str]:
        with self.lock:
            return self.items[start:end]


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
            spool.append(self.rfile.read(n).decode("utf-8"))
            self.send_response(201)  # ack (src/sources.rs:70-73)
            self.end_headers()

        def do_GET(self):
            self.send_response(405)  # non-POST (src/sources.rs:50-54)
            self.end_headers()

    return Handler


def start_http_listener(address: str, path: str) -> tuple[http.server.ThreadingHTTPServer, _Spool]:
    host, port = address.rsplit(":", 1)
    spool = _Spool()
    with _SPOOLS_LOCK:
        _SPOOLS[f"{address}{path}"] = spool
    server = http.server.ThreadingHTTPServer((host, int(port)), _handler_for(spool, path))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, spool


if _HAS_DATASOURCE:

    class HttpStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            address = options.get("address", "127.0.0.1:4195")
            path = options.get("path", "/post")
            key = f"{address}{path}"
            with _SPOOLS_LOCK:
                spool = _SPOOLS.get(key)
            if spool is None:
                _, spool = start_http_listener(address, path)
            self.spool = spool

        def initialOffset(self):
            return {"idx": 0}

        def read(self, start):
            items, end = self.spool.read_from(start["idx"])
            rows = [(start["idx"] + i, 0, v, None) for i, v in enumerate(items)]
            return iter(rows), {"idx": end}

        def readBetweenOffsets(self, start, end):
            items = self.spool.read_between(start["idx"], end["idx"])
            return iter([(start["idx"] + i, 0, v, None) for i, v in enumerate(items)])

        def commit(self, end):
            pass  # spool is in-memory; checkpoint offset log is the ledger

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
    spark: SparkSession, address: str = "127.0.0.1:4195", path: str = "/post"
) -> DataFrame:
    if not _HAS_DATASOURCE:
        raise NotImplementedError("http_server source requires Spark 4 Python DataSource API")
    try:
        spark.dataSource.register(HttpServerDataSource)
    except Exception:
        pass  # already registered
    return (
        spark.readStream.format("http_server")
        .option("address", address)
        .option("path", path)
        .load()
    )
