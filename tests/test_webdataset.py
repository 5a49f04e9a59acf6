"""WebDataset tar-shard extraction (functions/webdataset.py): member
round trips, the first-dot sample-key rule, gzip shards, refusals, and
the CLI-shaped pipeline: media_files(*.tar) → samples → decode."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nekton_spark.functions.webdataset import (
    _sample_key,
    synth_wds_media,
    tar_encode,
    tar_members,
    tar_records,
    webdataset_samples,
)


class TestTar:
    def test_round_trip_plain_and_gz(self):
        m = [("a/1.jpg", b"JJ"), ("a/1.txt", b"cap"), ("b/2.seg.png", b"P")]
        for gz in (False, True):
            assert tar_members(tar_encode(m, gz=gz)) == m

    def test_first_dot_key_rule(self):
        assert _sample_key("a/x.seg.png") == ("a/x", "seg.png")
        assert _sample_key("x.txt") == ("x", "txt")
        assert _sample_key("d/e/y.json") == ("d/e/y", "json")

    def test_corrupt_refuses(self):
        with pytest.raises(ValueError, match="tar"):
            tar_members(b"garbage" * 200)
        good = tar_encode([("x.txt", b"abc")])
        with pytest.raises(ValueError, match="tar|gzip"):
            tar_members(b"\x1f\x8b" + good[2:])

    def test_encode_is_byte_stable(self):
        m = [("x.txt", b"abc")]
        assert tar_encode(m) == tar_encode(m)


class TestSpark:
    def test_samples_group_within_shard(self, spark):
        shard = tar_encode(
            [
                ("000/7.jpg", b"IMG"),
                ("000/7.txt", b"a cat"),
                ("000/7.json", b"{}"),
                ("000/8.jpg", b"IMG2"),
                ("000/8.txt", b"a dog"),
            ]
        )
        df = spark.createDataFrame(
            [(1, bytearray(shard))], "shard_id long, payload binary"
        )
        got = {r.sample_key: r for r in webdataset_samples(df).collect()}
        assert set(got) == {"000/7", "000/8"}
        assert got["000/7"].n_members == 3
        assert bytes(got["000/7"].exts["txt"]) == b"a cat"
        assert bytes(got["000/8"].exts["jpg"]) == b"IMG2"
        recs = tar_records(df)
        assert recs.count() == 5

    def test_synth_matches_closed_form(self, spark, tables):
        d = tables["documents"].select("doc_id", "text").limit(10)
        out = webdataset_samples(synth_wds_media(d).drop("text"), "shard")
        rows = {(r.doc_id, r.sample_key): r for r in out.collect()}
        for r in d.collect():
            n = 2 + r.doc_id % 2
            for s in range(n):
                row = rows[(r.doc_id, f"s{r.doc_id}_{s}")]
                assert row.n_members == 2
                cap = bytes(row.exts["txt"]).decode()
                exp = f"cap {r.doc_id} {s}" + (
                    f" {r.text or ''}" if s == 0 else ""
                )
                assert cap == exp
                assert row.exts["cls"][0] == (r.doc_id + s) % 251

    def test_real_image_members_decode(self, spark):
        """The actual WebDataset shape: image bytes + caption per
        sample, decoded through the real codec family."""
        from nekton_spark.functions.bmp import bmp_encode
        from nekton_spark.functions.multimodal import decode_image, pack_media

        rng = np.random.default_rng(31)
        img = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
        shard = tar_encode(
            [("s0.bmp", bmp_encode(img, 24)), ("s0.txt", b"caption")]
        )
        df = spark.createDataFrame([(1, bytearray(shard))], "sid long, payload binary")
        samples = webdataset_samples(df)
        media = samples.select(
            "sample_key",
            pack_media(
                F.element_at("exts", "bmp"), F.lit("image/bmp")
            ).alias("media"),
        )
        dec = decode_image(media).first()
        assert (dec.dec_height, dec.dec_width) == (10, 12)
        assert dec.pixels == img.ravel().astype("int64").tolist()

    def test_processor_registry(self, spark):
        from nekton_spark.registry import PROCESSORS

        shard = tar_encode([("k.txt", b"v")])
        df = spark.createDataFrame([(1, bytearray(shard))], "sid long, payload binary")
        assert PROCESSORS["tar_records"](df).first().member_name == "k.txt"
        assert PROCESSORS["webdataset_samples"](df).first().sample_key == "k"


class TestWriteSide:
    def test_round_trip_write_read(self, spark, tmp_path):
        """write_webdataset → media-file read-back → webdataset_samples
        reproduces every sample; re-running writes byte-identical
        shards (deterministic layout)."""
        import os

        from nekton_spark.functions.webdataset import write_webdataset

        rows = [
            (f"k{i:03d}", {"txt": bytearray(f"cap {i}".encode()),
                           "cls": bytearray([i % 7])})
            for i in range(40)
        ]
        df = spark.createDataFrame(
            rows, "sample_key string, exts map<string, binary>"
        )
        out = str(tmp_path / "wds")
        n = write_webdataset(df, out, n_shards=4)
        assert n == 40
        files = sorted(os.listdir(out))
        assert all(f.startswith("shard-") and f.endswith(".tar") for f in files)
        # read back through the source-side path
        from nekton_spark.functions.webdataset import tar_members, _sample_key

        got = {}
        for f in files:
            for name, data in tar_members(open(os.path.join(out, f), "rb").read()):
                key, ext = _sample_key(name)
                got.setdefault(key, {})[ext] = data
        assert len(got) == 40
        for i in range(40):
            k = f"k{i:03d}"
            assert got[k]["txt"] == f"cap {i}".encode()
            assert got[k]["cls"] == bytes([i % 7])
        # determinism: second write is byte-identical
        out2 = str(tmp_path / "wds2")
        write_webdataset(df, out2, n_shards=4)
        for f in files:
            a = open(os.path.join(out, f), "rb").read()
            b = open(os.path.join(out2, f), "rb").read()
            assert a == b, f

    def test_write_through_fs_uri(self, spark, tmp_path):
        """r12 verdict #4: the write path goes through pyarrow.fs, so
        a non-local-style file: URI lands byte-identically to the
        plain-path write, with no .inprogress temp left behind."""
        import os

        from nekton_spark.functions.webdataset import write_webdataset

        rows = [
            (f"k{i:03d}", {"txt": bytearray(f"cap {i}".encode())})
            for i in range(20)
        ]
        df = spark.createDataFrame(
            rows, "sample_key string, exts map<string, binary>"
        )
        plain = str(tmp_path / "plain")
        uri_dir = tmp_path / "via_uri"
        n1 = write_webdataset(df, plain, n_shards=3)
        n2 = write_webdataset(df, f"file://{uri_dir}", n_shards=3)
        assert n1 == n2 == 20
        files = sorted(os.listdir(plain))
        assert files == sorted(os.listdir(uri_dir))
        assert not any(".inprogress" in f for f in os.listdir(uri_dir))
        for f in files:
            assert (
                open(os.path.join(plain, f), "rb").read()
                == open(os.path.join(uri_dir, f), "rb").read()
            )

    def test_max_shard_bytes_guard(self, spark, tmp_path):
        """The per-shard memory guard refuses BEFORE writing, naming
        the n_shards sizing rule."""
        from nekton_spark.functions.webdataset import write_webdataset

        rows = [
            (f"k{i}", {"bin": bytearray(b"x" * 4096)}) for i in range(8)
        ]
        df = spark.createDataFrame(
            rows, "sample_key string, exts map<string, binary>"
        )
        with pytest.raises(Exception, match="raise n_shards"):
            write_webdataset(
                df, str(tmp_path / "guard"), n_shards=1,
                max_shard_bytes=8192,
            )
        # and a compliant sizing succeeds
        assert write_webdataset(
            df, str(tmp_path / "ok"), n_shards=8, max_shard_bytes=1 << 20
        ) == 8

    def test_sink_registry(self, spark, tmp_path):
        from nekton_spark.registry import SINKS

        df = spark.createDataFrame(
            [("k", {"txt": bytearray(b"v")})],
            "sample_key string, exts map<string, binary>",
        )
        out = str(tmp_path / "snk")
        SINKS["webdataset"](df, path=out, n_shards=1)
        import os

        assert os.listdir(out) == ["shard-00000.tar"]
