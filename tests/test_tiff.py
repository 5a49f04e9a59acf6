"""TIFF (baseline TIFF 6.0) codec tests — from-spec round trips over
the compression × photometric × bit-depth envelope, both byte orders,
refusal paths, and Spark wiring."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nekton_spark.functions.tiff import (
    _lzw_decode_tiff,
    _lzw_encode_tiff,
    _packbits_decode,
    _packbits_encode,
    tiff_decode,
    tiff_decode_pages,
    tiff_encode,
    tiff_page_count,
)


class TestPrimitives:
    def test_lzw_early_change_and_clears(self):
        """Deep table growth forces the 9→10→11→12 width bumps (with
        the spec's early change) and the clear-at-4094 restart; the
        encoder/decoder pair must stay bit-synchronized throughout."""
        rng = np.random.default_rng(1)
        for n in (10, 300, 5_000, 60_000):
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            assert _lzw_decode_tiff(_lzw_encode_tiff(data), n) == data
        runs = (b"a" * 4000 + b"b" * 4000) * 4
        assert _lzw_decode_tiff(_lzw_encode_tiff(runs), len(runs)) == runs

    def test_lzw_refusals(self):
        with pytest.raises(ValueError, match="truncated"):
            _lzw_decode_tiff(b"\x80", 100)  # clear then nothing
        # first code after clear must be a literal
        with pytest.raises(ValueError, match="literal"):
            # width 9: CLEAR=256 -> 100000000, then 258 -> 100000010
            _lzw_decode_tiff(bytes([0b10000000, 0b01000000, 0b10000000]), 9)

    def test_packbits(self):
        rng = np.random.default_rng(2)
        for n in (1, 5, 200, 1000):
            data = rng.integers(0, 4, n, dtype=np.uint8).tobytes()
            assert _packbits_decode(_packbits_encode(data), n) == data
        with pytest.raises(ValueError, match="truncated"):
            _packbits_decode(b"\x03ab", 4)  # literal run cut short
        with pytest.raises(ValueError, match="truncated|short"):
            _packbits_decode(b"\xfe", 3)


class TestRoundTrip:
    def test_compression_matrix_gray(self):
        rng = np.random.default_rng(11)
        g = rng.integers(0, 256, (13, 17), dtype=np.uint8)
        for comp in (1, 5, 8, 32773):
            for rps in (None, 4):
                p = tiff_encode([g], compression=comp, rows_per_strip=rps)
                assert (tiff_decode(p) == g).all(), (comp, rps)

    def test_predictor_paths(self):
        rng = np.random.default_rng(12)
        g = rng.integers(0, 256, (10, 21), dtype=np.uint8)
        rgb = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
        for comp in (5, 8):
            p = tiff_encode([g], compression=comp, predictor=2, rows_per_strip=5)
            assert (tiff_decode(p) == g).all()
            p = tiff_encode([rgb], compression=comp, predictor=2)
            assert (tiff_decode(p) == rgb).all()

    def test_palette_and_bilevel(self):
        rng = np.random.default_rng(13)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, (11, 13), dtype=np.uint8)
        p = tiff_encode([idx], photometric=3, palette=pal, bits=4,
                        compression=32773)
        assert (tiff_decode(p) == pal[idx]).all()
        bw = rng.integers(0, 2, (8, 19), dtype=np.uint8)
        p = tiff_encode([bw], photometric=0, bits=1)
        assert (tiff_decode(p) == (1 - bw) * 255).all()
        g4 = rng.integers(0, 16, (6, 9), dtype=np.uint8)
        p = tiff_encode([g4], bits=4)
        exp = (g4.astype(np.uint16) * 255 // 15).astype(np.uint8)
        assert (tiff_decode(p) == exp).all()

    def test_multi_page_chain(self):
        rng = np.random.default_rng(14)
        pages = [
            rng.integers(0, 256, (5, 6), dtype=np.uint8),
            rng.integers(0, 256, (7, 4, 3), dtype=np.uint8),
            rng.integers(0, 256, (3, 9), dtype=np.uint8),
        ]
        p = tiff_encode(pages, compression=5)
        assert tiff_page_count(p) == 3
        out = tiff_decode_pages(p)
        for a, b in zip(out, pages):
            assert (a == b).all()
        # tiff_decode reads page 1 only
        assert (tiff_decode(p) == pages[0]).all()

    def test_big_endian_fixture(self):
        img = bytes([10, 20, 30, 40])
        ifd_off = 8 + len(img)
        out = b"MM\x00*" + struct.pack(">I", ifd_off) + img

        def ent(tag, typ, val4):
            return struct.pack(">HHI", tag, typ, 1) + val4

        entries = [
            ent(256, 3, struct.pack(">HH", 2, 0)),
            ent(257, 3, struct.pack(">HH", 2, 0)),
            ent(258, 3, struct.pack(">HH", 8, 0)),
            ent(259, 3, struct.pack(">HH", 1, 0)),
            ent(262, 3, struct.pack(">HH", 1, 0)),
            ent(273, 4, struct.pack(">I", 8)),
            ent(277, 3, struct.pack(">HH", 1, 0)),
            ent(278, 3, struct.pack(">HH", 2, 0)),
            ent(279, 4, struct.pack(">I", 4)),
        ]
        out += (
            struct.pack(">H", len(entries))
            + b"".join(entries)
            + struct.pack(">I", 0)
        )
        assert (tiff_decode(out) == np.array([[10, 20], [30, 40]])).all()


class TestRefusals:
    def test_not_tiff(self):
        with pytest.raises(ValueError, match="not a TIFF"):
            tiff_decode(b"PNG whatever")

    def test_ccitt_and_jpeg_reason_coded(self):
        g = np.zeros((4, 4), dtype=np.uint8)
        base = tiff_encode([g])
        # compression tag value sits in the IFD; patch 1 -> 3 (G3)
        for comp, words in ((3, "CCITT"), (7, "JPEG compression")):
            p = bytearray(base)
            at = p.index(struct.pack("<HHI", 259, 3, 1))
            p[at + 8] = comp
            with pytest.raises(NotImplementedError, match=words):
                tiff_decode(bytes(p))

    def test_tiled_refuses(self):
        g = np.zeros((4, 4), dtype=np.uint8)
        p = bytearray(tiff_encode([g]))
        # rewrite the RowsPerStrip tag id (278) to TileWidth (322)
        at = p.index(struct.pack("<HHI", 278, 3, 1))
        p[at : at + 2] = struct.pack("<H", 322)
        with pytest.raises(ValueError, match="tiled TIFF"):
            tiff_decode(bytes(p))

    def test_truncation_refuses(self):
        g = np.arange(64, dtype=np.uint8).reshape(8, 8)
        p = tiff_encode([g], compression=5)
        with pytest.raises(ValueError):
            tiff_decode(p[: len(p) // 2])

    def test_refusal_codes_mapped(self):
        from nekton_spark.functions.multimodal import _refusal_code

        assert _refusal_code(ValueError("not a TIFF payload (bad magic)")) == "bad_tiff"
        assert (
            _refusal_code(
                NotImplementedError("TIFF CCITT T.6 (Group 4) ...")
            )
            == "ccitt_tiff"
        )
        assert (
            _refusal_code(NotImplementedError("TIFF JPEG compression is ..."))
            == "tiff_jpeg"
        )
        assert _refusal_code(ValueError("tiled TIFF is outside ...")) == "tiff_tiled"
        assert _refusal_code(ValueError("TIFF LZW code overflows table")) == "bad_lzw"


class TestSparkWiring:
    def test_synth_decode_matches_closed_form(self, spark):
        from pyspark.sql import functions as F
        from nekton_spark.functions.multimodal import (
            decode_image,
            synth_tiff_media,
        )

        keys = list(range(15))
        df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
        rows = {
            r["doc_id"]: r
            for r in decode_image(synth_tiff_media(df)).collect()
        }
        for k in keys:
            w, h = 8 + k % 9, 8 + k % 7
            leg = k % 5
            yy, xx = np.mgrid[0:h, 0:w]
            if leg in (0, 3):
                exp = (k * 31 + yy * 17 + xx * 7) % 256
            elif leg == 1:
                exp = np.stack(
                    [(k * 31 + yy * 17 + xx * 7 + c * 11) % 256
                     for c in range(3)],
                    axis=2,
                )
            elif leg == 2:
                i = np.arange(16)
                pal = np.stack(
                    [(k * 7 + i * 13 + c * 29) % 256 for c in range(3)],
                    axis=1,
                )
                exp = pal[(k + 3 * yy + xx) % 16]
            else:
                exp = (1 - (k + 3 * yy + xx) % 2) * 255
            r = rows[k]
            assert (r["dec_height"], r["dec_width"]) == (h, w), k
            assert r["pixels"] == exp.ravel().tolist(), k

    def test_decode_coverage_and_ext(self, spark, tmp_path):
        from nekton_spark.functions.multimodal import decode_coverage
        from nekton_spark.sources.files import media_files_source

        g = np.arange(24, dtype=np.uint8).reshape(4, 6)
        d = tmp_path / "tiffs"
        d.mkdir()
        (d / "a.tif").write_bytes(tiff_encode([g], compression=5))
        media = media_files_source(spark, str(d))
        row = media.first()
        assert row.media.mime == "image/tiff"
        cov = decode_coverage(media).first()
        assert (cov.decode_status, cov.decode_reason) == ("ok", "tiff")

    def test_frame_sample_multipage_sparse(self, spark):
        """Multi-page TIFF through frame_sample: every-2nd page, and
        ONLY sampled pages pay for decode (the sparse contract —
        corrupting page 1's strip data must not affect sampling pages
        0 and 2)."""
        import pandas as pd
        from nekton_spark.functions.multimodal import frame_sample

        rng = np.random.default_rng(17)
        pages = [
            rng.integers(0, 256, (4 + i, 5), dtype=np.uint8)
            for i in range(4)
        ]
        payload = tiff_encode(pages, compression=5)
        # locate page 1's strip bytes and trash them: page 1 = second
        # encoded strip blob; find via its LZW header position by
        # re-encoding page 1 alone
        strip1 = tiff_encode([pages[1]], compression=5)
        # (cheap trick: the raw LZW bytes of page 1 appear verbatim)
        from nekton_spark.functions.tiff import _lzw_encode_tiff

        raw1 = _lzw_encode_tiff(pages[1].tobytes())
        at = payload.index(raw1)
        corrupted = (
            payload[:at] + bytes(len(raw1)) + payload[at + len(raw1):]
        )
        pdf = pd.DataFrame(
            {"media": [
                {"payload": corrupted, "mime": "image/tiff", "meta": {}}
            ]}
        )
        df = spark.createDataFrame(
            pdf,
            schema="media struct<payload:binary,mime:string,meta:map<string,string>>",
        )
        rows = frame_sample(df, every=2).collect()
        assert sorted(r.frame_idx for r in rows) == [0, 2]
        by = {r.frame_idx: r for r in rows}
        for i in (0, 2):
            assert by[i].pixels == pages[i].ravel().tolist()
            assert (by[i].dec_height, by[i].dec_width) == pages[i].shape
