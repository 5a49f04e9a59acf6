"""dHash + image near-dup (functions/imagehash.py): kernel
properties (downsample identity, luma path, re-encode stability),
the banded pair mining recall guarantee, and integration with the
real codec family. Driver rows image_dhash / image_near_dup carry the
closed-form oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nekton_spark.functions.imagehash import (
    dhash64,
    image_dhash,
    image_near_dup_pairs,
    synth_gray_frames,
)


def _pattern(q: int) -> np.ndarray:
    y, x = np.mgrid[0:8, 0:9]
    return (q * 131 + y * 17 + x * 23 + (q * (y + 1) * (x + 1)) % 97) % 251


class TestKernel:
    def test_block_mean_downsample_identity(self):
        base = _pattern(3)
        h0 = dhash64(base)
        # 2× and 3× nearest-neighbor upscales block-average back exactly
        for s in (2, 3):
            big = np.kron(base, np.ones((s, s), dtype=np.int64)).astype(np.uint8)
            assert dhash64(big) == h0

    def test_luma_and_alpha_paths(self):
        base = _pattern(7).astype(np.uint8)
        h0 = dhash64(base)
        assert dhash64(np.stack([base] * 3, axis=2)) == h0
        rgba = np.dstack([np.stack([base] * 3, axis=2),
                          np.full_like(base, 9)])
        assert dhash64(rgba) == h0  # alpha ignored

    def test_jpeg_reencode_is_near(self):
        """The property the hash exists for: a lossy re-encode of the
        same image lands within small Hamming distance."""
        from nekton_spark.functions.jpeg import (
            jpeg_decode,
            jpeg_encode_blocks,
            synth_block_values,
        )

        dcs, bx, w, h = synth_block_values(11)  # 24x16, 6 blocks
        payload = jpeg_encode_blocks(dcs, bx, w, h)
        pix = jpeg_decode(payload)
        h_exact = dhash64(pix)
        # quantize harder: re-encode the DECODED pixels' DC means
        blocks = [
            int(pix[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].mean()) - 128
            for by in range(2)
            for bx in range(3)
        ]
        pix2 = jpeg_decode(jpeg_encode_blocks(blocks, 3, 24, 16))
        d = bin((h_exact ^ dhash64(pix2)) & ((1 << 64) - 1)).count("1")
        assert d <= 8, d

    def test_too_small_refuses(self):
        with pytest.raises(ValueError, match="grid"):
            dhash64(np.zeros((5, 5), dtype=np.uint8))


class TestSpark:
    def test_planted_pairs_exact(self, spark):
        d = spark.range(0, 40).select(F.col("id").alias("doc_id"))
        pairs = image_near_dup_pairs(synth_gray_frames(d)).collect()
        planted = {(2 * q, 2 * q + 1) for q in range(20)}
        got = {(r.id_a, r.id_b) for r in pairs}
        assert planted <= got
        assert all(r.hamming <= 3 for r in pairs)
        ham = {(r.id_a, r.id_b): r.hamming for r in pairs}
        assert all(ham[p] == 1 for p in planted)

    def test_max_bucket_refuses_hot_clique(self, spark):
        """A constant-image clique shares every band key; with
        max_bucket set the pair mining refuses instead of silently
        materializing the quadratic output."""
        d = spark.range(0, 30).select(
            F.col("id").alias("doc_id"),
            F.array(*[F.lit((i * 7) % 251) for i in range(72)]).alias("pixels"),
            F.lit(8).alias("dec_height"),
            F.lit(9).alias("dec_width"),
        )
        with pytest.raises(Exception, match="max_bucket"):
            image_near_dup_pairs(d, max_bucket=10).collect()
        # without the cap the quadratic-but-true output materializes
        assert image_near_dup_pairs(d).count() == 30 * 29 // 2

    def test_salt_tile_pair_set_identical(self, spark):
        """r12 verdict #6: the tile salt spreads a hot bucket's
        quadratic join work without changing the output — pair sets
        (and hammings) are identical to the unsalted plan across
        forced tile sizes, on a corpus mixing a clique with planted
        near-dup pairs."""
        clique = spark.range(0, 25).select(
            F.col("id").alias("doc_id"),
            F.array(*[F.lit((i * 7) % 251) for i in range(72)]).alias("pixels"),
            F.lit(8).alias("dec_height"),
            F.lit(9).alias("dec_width"),
        )
        normal = synth_gray_frames(
            spark.range(100, 140).select(F.col("id").alias("doc_id"))
        )
        d = clique.unionByName(normal)
        want = {
            (r.id_a, r.id_b): r.hamming
            for r in image_near_dup_pairs(d).collect()
        }
        assert len(want) >= 25 * 24 // 2 + 20
        for tile in (2, 7, 64):
            got = {
                (r.id_a, r.id_b): r.hamming
                for r in image_near_dup_pairs(d, salt_tile=tile).collect()
            }
            assert got == want, f"salt_tile={tile}"

    def test_salt_tile_validates(self, spark):
        d = synth_gray_frames(
            spark.range(0, 4).select(F.col("id").alias("doc_id"))
        )
        with pytest.raises(ValueError, match="salt_tile"):
            image_near_dup_pairs(d, salt_tile=1)

    def test_band_params_validate(self, spark):
        d = synth_gray_frames(spark.range(0, 4).select(F.col("id").alias("doc_id")))
        with pytest.raises(ValueError, match="divide"):
            image_near_dup_pairs(d, bands=5)
        with pytest.raises(ValueError, match="pigeonhole"):
            image_near_dup_pairs(d, bands=4, max_hamming=4)

    def test_real_codec_integration(self, spark):
        """decode_image(BMP) → image_dhash: identical images hash
        identically across container formats (BMP vs GIF vs lossless
        WebP of the same pixels)."""
        from nekton_spark.functions.gif import gif_encode
        from nekton_spark.functions.bmp import bmp_encode
        from nekton_spark.functions.webp import webp_encode_palette
        from nekton_spark.functions.multimodal import decode_image, pack_media

        rng = np.random.default_rng(23)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, (12, 18), dtype=np.uint8)
        pal_rgba = np.concatenate(
            [pal, np.full((16, 1), 255, dtype=np.uint8)], axis=1
        )
        rows = [
            (1, bytearray(bmp_encode(pal[idx], 24)), "image/bmp"),
            (2, bytearray(gif_encode(idx, pal)), "image/gif"),
            (3, bytearray(webp_encode_palette(idx, pal_rgba)), "image/webp"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary, mime string")
        media = df.select("doc_id", pack_media(F.col("payload"), F.col("mime")).alias("media"))
        hashed = image_dhash(decode_image(media)).select("doc_id", "dhash").collect()
        vals = {r.doc_id: r.dhash for r in hashed}
        assert vals[1] == vals[2] == vals[3]
        assert vals[1] == dhash64(pal[idx])

    def test_orient_pixels_all_eight(self):
        """Every EXIF orientation's display transform lands back on
        the upright image when applied to the correspondingly stored
        pixels (inverse round trip), and invalid values refuse."""
        from nekton_spark.functions.imagehash import orient_pixels

        rng = np.random.default_rng(7)
        up = rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
        inverses = {
            1: lambda a: a,
            2: lambda a: a[:, ::-1],
            3: lambda a: a[::-1, ::-1],
            4: lambda a: a[::-1, :],
            5: lambda a: np.swapaxes(a, 0, 1),
            6: lambda a: np.rot90(a, k=1, axes=(0, 1)),
            7: lambda a: np.rot90(a[::-1, :], k=1, axes=(0, 1)),
            8: lambda a: np.rot90(a, k=-1, axes=(0, 1)),
        }
        for o, inv in inverses.items():
            stored = inv(up)
            assert (orient_pixels(stored, o) == up).all(), o
        assert (orient_pixels(up, None) == up).all()
        # The eight display transforms are pairwise DISTINCT on a
        # generic image — pins the r13 ADVICE bug class (orientation 7
        # silently collapsing onto orientation 5's transpose).
        outs = {o: orient_pixels(up, o) for o in range(1, 9)}
        for a in range(1, 9):
            for b in range(a + 1, 9):
                oa, ob = outs[a], outs[b]
                assert oa.shape != ob.shape or (oa != ob).any(), (a, b)
        with pytest.raises(ValueError, match="orientation"):
            orient_pixels(up, 9)

    def test_auto_orient_rotated_pairs_hamming_zero(self, spark):
        """r12 verdict #8 end-to-end: a real JPEG and its 90°-rotated
        re-shoot tagged EXIF orientation 6 — media_exif → decode →
        auto_orient → near-dup pairs lands the pair at Hamming 0;
        without auto_orient the hashes differ."""
        from nekton_spark.functions.exif import (
            exif_encode_app1,
            insert_app1,
            media_exif,
        )
        from nekton_spark.functions.imagehash import (
            auto_orient,
            image_near_dup_pairs,
        )
        from nekton_spark.functions.jpeg import jpeg_encode_blocks
        from nekton_spark.functions.multimodal import decode_image, pack_media

        # upright: 2x3 blocks of distinct DCs. Orientation 6 means the
        # stored image needs a 90° CW rotation to display — i.e. it
        # was STORED rotated 90° CCW: np.rot90(grid, k=1)
        # (block-constant, so the DC-only codec reproduces the
        # rotation exactly)
        grid = np.array([[10, -20, 30], [-40, 50, -60]])
        up = jpeg_encode_blocks([int(v) for v in grid.ravel()], 3, 24, 16)
        rot = np.rot90(grid, k=1)
        rj = jpeg_encode_blocks([int(v) for v in rot.ravel()], 2, 16, 24)
        rj = insert_app1(rj, exif_encode_app1(orientation=6))
        rows = [
            (1, bytearray(up), "image/jpeg"),
            (2, bytearray(rj), "image/jpeg"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, payload binary, mime string"
        ).select(
            "doc_id",
            pack_media(F.col("payload"), F.col("mime")).alias("media"),
        )
        dec = decode_image(media_exif(df))
        pairs = image_near_dup_pairs(auto_orient(dec)).collect()
        assert [(r.id_a, r.id_b, r.hamming) for r in pairs] == [(1, 2, 0)]
        # control: without normalization the rotated hash differs
        assert image_near_dup_pairs(dec).count() == 0

    def test_synth_oriented_frames_oracle_shape(self, spark):
        """auto_orient over the driver-row synth lands every
        orientation leg on the upright base pattern."""
        from nekton_spark.functions.imagehash import (
            auto_orient,
            image_dhash,
            synth_oriented_frames,
        )

        d = spark.range(0, 16).select(F.col("id").alias("doc_id"))
        out = image_dhash(auto_orient(synth_oriented_frames(d))).collect()
        for r in out:
            assert (r.dec_height, r.dec_width) == (8, 9)
            q = r.doc_id
            yy, xx = np.mgrid[0:8, 0:9]
            base = (
                q * 131 + yy * 17 + xx * 23 + (q * (yy + 1) * (xx + 1)) % 97
            ) % 251
            assert r.dhash == dhash64(base)

    def test_processor_registry(self, spark):
        from nekton_spark.registry import PROCESSORS

        d = synth_gray_frames(
            spark.range(0, 6).select(F.col("id").alias("doc_id"))
        )
        assert "dhash" in PROCESSORS["image_dhash"](d).columns
        assert PROCESSORS["image_near_dup"](d).count() == 3
