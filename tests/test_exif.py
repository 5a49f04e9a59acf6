"""EXIF extraction + privacy scrub (functions/exif.py): both byte
orders, GPS DMS rationals, strip exactness (pixels byte-identical,
the inserted segment removed to the byte), refusals, and the Spark
surfaces. Driver row exif_scrub carries the closed-form oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nekton_spark.functions.exif import (
    exif_encode_app1,
    exif_extract,
    insert_app1,
    jpeg_strip_metadata,
)
from nekton_spark.functions.jpeg import (
    jpeg_decode,
    jpeg_encode_blocks,
    synth_block_values,
)


def _base(key=9):
    dcs, bx, w, h = synth_block_values(key)
    return jpeg_encode_blocks(dcs, bx, w, h)


class TestKernel:
    @pytest.mark.parametrize("le", [True, False])
    def test_round_trip_both_byte_orders(self, le):
        base = _base()
        app1 = exif_encode_app1(
            orientation=6, datetime="2021:05:04 03:02:01",
            gps=(48.208754, -16.372504), le=le,
        )
        j = insert_app1(base, app1)
        e = exif_extract(j)
        assert e["orientation"] == 6
        assert e["datetime"] == "2021:05:04 03:02:01"
        assert e["has_gps"] == 1
        assert abs(e["lat"] - 48.208754) < 2e-7
        assert abs(e["lon"] + 16.372504) < 2e-7
        # strip removes exactly what insert added; pixels identical
        clean = jpeg_strip_metadata(j)
        assert clean == base
        assert np.array_equal(jpeg_decode(clean), jpeg_decode(base))
        assert exif_extract(clean)["has_gps"] == 0

    def test_no_exif_all_null(self):
        e = exif_extract(_base())
        assert e == {
            "orientation": None, "datetime": None,
            "has_gps": 0, "lat": None, "lon": None,
        }

    def test_partial_tags(self):
        j = insert_app1(_base(), exif_encode_app1(orientation=1))
        e = exif_extract(j)
        assert e["orientation"] == 1 and e["has_gps"] == 0
        assert e["datetime"] is None

    def test_strip_also_drops_comments(self):
        base = _base()
        com = b"\xff\xfe" + (5).to_bytes(2, "big") + b"hi!"
        j = base[:2] + com + base[2:]
        assert jpeg_strip_metadata(j) == base

    def test_app1_slice_ends_at_segment_boundary(self):
        """r12 ADVICE off-by-two: the TIFF buffer must end exactly at
        the APP1 segment boundary. A GPS rational whose final 8 bytes
        would only fit by reading 2 bytes of the NEXT JPEG marker must
        refuse as truncated, not silently admit those bytes."""
        import struct

        f = "<"
        # IFD0 @8: one entry -> GPS IFD @26; GPS IFD: lat rationals @44
        tiff = bytearray()
        tiff += b"II" + struct.pack(f + "H", 42) + struct.pack(f + "I", 8)
        tiff += struct.pack(f + "H", 1)
        tiff += struct.pack(f + "HHI", 0x8825, 4, 1) + struct.pack(f + "I", 26)
        tiff += struct.pack(f + "I", 0)
        tiff += struct.pack(f + "H", 1)
        tiff += struct.pack(f + "HHI", 0x2, 5, 3) + struct.pack(f + "I", 44)
        tiff += struct.pack(f + "I", 0)
        assert len(tiff) == 44
        # 3 rationals need 24 bytes; provide only 22 -> last read is
        # 2 bytes short of the segment end
        tiff += struct.pack(f + "IIII", 10, 1, 20, 1) + b"\x00" * 6
        seg = b"\xff\xe1" + struct.pack(">H", 8 + len(tiff)) + b"Exif\x00\x00" + bytes(tiff)
        base = _base()
        j = base[:2] + seg + base[2:]
        with pytest.raises(ValueError, match="rational beyond payload"):
            exif_extract(j)

    def test_refusals(self):
        with pytest.raises(ValueError, match="SOI"):
            exif_extract(b"nope")
        bad = insert_app1(
            _base(), b"\xff\xe1\x00\x10Exif\x00\x00XX" + b"\x00" * 6
        )
        with pytest.raises(ValueError, match="byte order"):
            exif_extract(bad)


class TestSpark:
    def test_row_pipeline(self, spark):
        from nekton_spark.functions.exif import (
            media_exif,
            scrub_media_metadata,
            synth_jpeg_exif_media,
        )
        from nekton_spark.functions.multimodal import decode_image

        d = spark.createDataFrame([(3,), (4,)], "doc_id long")
        out = decode_image(
            scrub_media_metadata(media_exif(synth_jpeg_exif_media(d)))
        ).collect()
        got = {r.doc_id: r for r in out}
        assert got[3].has_gps == 1 and got[3].gps_lat == 3.25
        assert got[3].gps_lon == -3.5 and got[3].scrubbed_bytes == 182
        assert got[4].has_gps == 0 and got[4].scrubbed_bytes == 68
        assert got[4].orientation == 5
        # pixels still match the baseline closed form
        for key in (3, 4):
            dcs, bx, w, h = synth_block_values(key)
            exp = sum(64 * ((key * 31 + b * 17) % 256) for b in range(len(dcs)))
            assert sum(got[key].pixels) == exp

    def test_processor_registry(self, spark):
        from nekton_spark.registry import PROCESSORS
        from nekton_spark.functions.exif import synth_jpeg_exif_media

        d = synth_jpeg_exif_media(
            spark.createDataFrame([(6,)], "doc_id long")
        )
        assert PROCESSORS["media_exif"](d).first().has_gps == 1
        assert PROCESSORS["scrub_media_metadata"](d).first().scrubbed_bytes > 0
