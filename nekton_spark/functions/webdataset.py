r"""WebDataset-style tar shard extraction.

Multimodal training corpora ship as tar shards (the WebDataset
convention, public: github.com/webdataset — POSIX ustar members named
``<sample-key>.<ext>``; all members sharing a basename form ONE
sample: ``000123.jpg`` + ``000123.txt`` + ``000123.json``). This is
the image/caption twin of the WARC front end:

    media_files(*.tar) → webdataset_samples → decode_media /
    html-free caption pipeline — map-only end to end.

The tar walk uses the stdlib ``tarfile`` reader (like zlib for PNG and
the old stdlib ``wave`` — the public battle-tested parser for a public
format; gzip shards are detected by magic and inflated bounded first).
Contract:

- :func:`tar_records` — one row per regular-file member
  ``(member_name, member_bytes)``; non-file members (dirs, links) are
  skipped; a corrupt archive refuses with ValueError;
- :func:`webdataset_samples` — one row per SAMPLE: key = the member
  path up to the first dot in its basename (the WebDataset rule, so
  ``a/b/000123.seg.png`` groups under ``a/b/000123``), plus an
  ``exts`` map ext → bytes. Grouping happens WITHIN the shard in the
  same Arrow pass — tar members of one sample are contiguous by
  convention, but this does not rely on it — so there is still no
  shuffle; shards parallelize by file like every other source.
"""

from __future__ import annotations

import io
import tarfile
import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_MAX_INFLATE = 1 << 30


def _maybe_gunzip(b: bytes) -> bytes:
    if b[:2] != b"\x1f\x8b":
        return b
    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    try:
        out = d.decompress(b, _MAX_INFLATE + 1)
    except zlib.error as e:
        raise ValueError(f"corrupt gzip tar shard: {e}") from None
    if len(out) > _MAX_INFLATE:
        raise ValueError("tar shard exceeds inflate bound")
    return out


def tar_members(payload: bytes) -> list[tuple[str, bytes]]:
    """(name, bytes) for every regular-file member, archive order."""
    b = _maybe_gunzip(bytes(payload))
    out: list[tuple[str, bytes]] = []
    try:
        with tarfile.open(fileobj=io.BytesIO(b), mode="r:") as tf:
            for m in tf:
                if not m.isfile():
                    continue
                f = tf.extractfile(m)
                out.append((m.name, f.read() if f else b""))
    except tarfile.TarError as e:
        raise ValueError(f"corrupt tar shard: {e}") from None
    return out


def _sample_key(name: str) -> tuple[str, str]:
    """WebDataset split: key = path up to the FIRST dot of the
    basename, ext = everything after it (so 'a/x.seg.png' →
    ('a/x', 'seg.png'))."""
    d, _, base = name.rpartition("/")
    stem, _, ext = base.partition(".")
    key = f"{d}/{stem}" if d else stem
    return key, ext


def tar_records(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Explode tar shard bytes into one row per member."""
    from .similarity import ensure_parallelism

    df = ensure_parallelism(df)  # heavy Arrow pass: fan out when under-partitioned

    keep = [f.name for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(
        [df.schema[c] for c in keep]
        + [
            T.StructField("member_name", T.StringType(), True),
            T.StructField("member_bytes", T.BinaryType(), True),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                for name, data in tar_members(row[payload_col]):
                    r = {c: row[c] for c in keep}
                    r["member_name"] = name
                    r["member_bytes"] = data
                    rows.append(r)
            yield pd.DataFrame(
                rows, columns=[*keep, "member_name", "member_bytes"]
            )

    return df.mapInPandas(run, out_schema)


def webdataset_samples(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Explode tar shard bytes into one row per SAMPLE with an
    ext → bytes map. In-shard grouping, no shuffle."""
    from .similarity import ensure_parallelism

    df = ensure_parallelism(df)  # heavy Arrow pass: fan out when under-partitioned

    keep = [f.name for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(
        [df.schema[c] for c in keep]
        + [
            T.StructField("sample_key", T.StringType(), True),
            T.StructField("n_members", T.IntegerType(), True),
            T.StructField(
                "exts", T.MapType(T.StringType(), T.BinaryType()), True
            ),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                samples: dict[str, dict[str, bytes]] = {}
                order: list[str] = []
                for name, data in tar_members(row[payload_col]):
                    key, ext = _sample_key(name)
                    if key not in samples:
                        samples[key] = {}
                        order.append(key)
                    samples[key][ext] = data
                for key in order:
                    r = {c: row[c] for c in keep}
                    r["sample_key"] = key
                    r["n_members"] = len(samples[key])
                    r["exts"] = samples[key]
                    rows.append(r)
            yield pd.DataFrame(
                rows, columns=[*keep, "sample_key", "n_members", "exts"]
            )

    return df.mapInPandas(run, out_schema)


def tar_encode(members: list[tuple[str, bytes]], gz: bool = False) -> bytes:
    """Genuine ustar bytes for fixtures (stdlib writer, deterministic
    zeroed metadata so outputs are byte-stable)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    if gz:
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        return co.compress(raw) + co.flush()
    return raw


def synth_wds_media(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """One tar shard per row carrying 2 + key % 2 samples; sample s of
    doc key has members ``s<key>_<s>.txt`` (the closed-form caption
    'cap <key> <s>' plus the document text on s = 0) and
    ``s<key>_<s>.cls`` (the byte of (key + s) % 251). Gzip shard on
    odd keys. Member layout exercises the first-dot key rule."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("shard", T.BinaryType(), True)]
    )

    def run(batches):
        def one(row) -> bytes:
            key = int(row[key_col])
            text = row[text_col] if row[text_col] is not None else ""
            members = []
            for s in range(2 + key % 2):
                cap = f"cap {key} {s}" + (f" {text}" if s == 0 else "")
                members.append((f"s{key}_{s}.txt", cap.encode("utf-8")))
                members.append((f"s{key}_{s}.cls", bytes([(key + s) % 251])))
            return tar_encode(members, gz=bool(key % 2))

        for pdf in batches:
            yield pdf.assign(shard=pdf.apply(one, axis=1))

    from .similarity import ensure_parallelism

    # fan out BELOW the per-row Python pass (r15 opt): a 1-split
    # local input would serialize it on one task; no-op at scale
    return ensure_parallelism(df).mapInPandas(run, out_schema)


def _open_fs(path: str):
    """(filesystem, in-fs path) via pyarrow.fs: plain paths → the
    local filesystem, URIs (``file://``, ``hdfs://``, ``s3://``, …) →
    whatever pyarrow resolves. Constructed INSIDE each task (cheap,
    avoids shipping credentials/handles through pickles)."""
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


class _TarSink:
    """Minimal write/tell file adapter: streams tarfile output into a
    pyarrow output stream, optionally through one gzip member (single
    final flush, so bytes match :func:`tar_encode`'s whole-buffer
    compress exactly)."""

    def __init__(self, raw, gz: bool):
        self._raw = raw
        self._off = 0
        self._co = (
            zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            if gz
            else None
        )

    def write(self, b) -> int:
        b = bytes(b)
        d = self._co.compress(b) if self._co is not None else b
        if d:
            self._raw.write(d)
        self._off += len(b)
        return len(b)

    def tell(self) -> int:
        return self._off

    def finish(self) -> None:
        if self._co is not None:
            tail = self._co.flush()
            if tail:
                self._raw.write(tail)


def _tar_stream(members, out, gz: bool) -> None:
    """Stream deterministic ustar members (zeroed metadata, same
    writer and member order as :func:`tar_encode`, so shard bytes are
    identical) to an open output stream without materializing the
    archive."""
    sink = _TarSink(out, gz)
    with tarfile.open(fileobj=sink, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))
    sink.finish()


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str = "sample_key",
    exts_col: str = "exts",
    n_shards: int = 32,
    gz: bool = False,
    max_shard_bytes: int = 1 << 30,
) -> int:
    """The WRITE side: rows (sample_key, ext → bytes map) → tar shards
    under ``path`` — the format training loaders stream directly.

    Deterministic shard layout (same contract as the parquet shard
    sink): sample s lands in shard pmod(xxhash64(key), n_shards) and
    samples within a shard are tar'd in key order, so shard bytes are
    a pure function of the data — reproducible across re-runs, input
    partitioning and cluster size. One shuffle (repartition on the
    shard id); each shard is built and written by ITS OWN task, so no
    shard ever materializes on the driver. Returns the number of
    samples written.

    Cluster-grade write path (r12 verdict #4): tasks write through
    ``pyarrow.fs`` resolved from the path — plain paths and
    ``file://`` hit the local filesystem, ``hdfs://``/``s3://``/…
    whatever pyarrow resolves — with a per-task-attempt temp name +
    rename commit (atomic on POSIX/HDFS; on object stores the rename
    is copy+delete, but the temp upload itself only becomes visible
    on close, and deterministic bytes make duplicate attempts
    idempotent). No executor-local ``open()`` remains.

    Memory envelope: a task holds ITS shards' sample bytes (the tar
    assembly itself streams — nothing is double-buffered). Sizing
    rule: ``n_shards ≈ corpus_bytes / target_shard_bytes`` (WebDataset
    convention ~100 MB–1 GB per shard). The ``max_shard_bytes`` guard
    (default 1 GiB) refuses early — while collecting, before any
    write — when a shard's payload exceeds it, naming the n_shards
    fix, instead of OOMing the executor."""
    from pyspark.sql import functions as F

    fs, base = _open_fs(path)
    fs.create_dir(base, recursive=True)
    sharded = df.select(
        F.col(key_col).alias("k"), F.col(exts_col).alias("e"),
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).alias("_shard"),
    ).repartition(n_shards, "_shard")

    def write_part(it):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        tfs, tbase = _open_fs(path)
        by_shard: dict[int, list] = {}
        sizes: dict[int, int] = {}
        for row in it:
            sh = int(row["_shard"])
            # Arrow map columns may arrive as list-of-(k, v) pairs
            # rather than dicts depending on the conversion path
            e = row["e"] if isinstance(row["e"], dict) else dict(row["e"])
            sizes[sh] = sizes.get(sh, 0) + sum(len(v) for v in e.values())
            if sizes[sh] > max_shard_bytes:
                raise ValueError(
                    f"webdataset shard {sh} exceeds max_shard_bytes="
                    f"{max_shard_bytes}: raise n_shards to about "
                    f"corpus_bytes / {max_shard_bytes // 2} (or raise "
                    "max_shard_bytes if the executors have the memory)"
                )
            by_shard.setdefault(sh, []).append((row["k"], e))
        n = 0
        for sh, rows in sorted(by_shard.items()):
            rows.sort(key=lambda r: r[0])
            members = [
                (f"{k}.{ext}", bytes(e[ext]))
                for k, e in rows
                for ext in sorted(e)
            ]
            final = f"{tbase.rstrip('/')}/shard-{sh:05d}.tar" + (
                ".gz" if gz else ""
            )
            tmp = f"{final}.inprogress-{attempt}"
            with tfs.open_output_stream(tmp) as out:
                _tar_stream(members, out, gz)
            tfs.move(tmp, final)
            n += len(rows)
        yield pd.DataFrame({"n": [n]})

    out = sharded.mapInPandas(
        lambda it: write_part(_concat_rows(it)), "n long"
    )
    return int(out.agg({"n": "sum"}).collect()[0][0] or 0)


def _concat_rows(batches):
    """mapInPandas gives an iterator of pdf batches; the tar assembly
    wants row dicts across the whole partition."""
    for pdf in batches:
        for _, row in pdf.iterrows():
            yield row
