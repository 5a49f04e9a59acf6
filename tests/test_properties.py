"""Property-based tests (hypothesis) for the pure-Python kernels —
the codec paths must hold for arbitrary inputs, not just the synth
fixtures the oracles replay."""

from __future__ import annotations

import io
import wave

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


class TestPngProperties:
    @given(
        h=st.integers(min_value=1, max_value=24),
        w=st.integers(min_value=1, max_value=24),
        seed=st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_round_trip_any_grayscale_array(self, h, w, seed):
        from nekton_spark.functions.multimodal import _png_decode, _png_encode

        rng = np.random.default_rng(seed)
        pix = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        back = _png_decode(_png_encode(pix))
        assert back.shape == (h, w)
        assert (back == pix).all()

    @given(
        h=st.integers(min_value=2, max_value=10),
        w=st.integers(min_value=2, max_value=10),
        flip=st.integers(min_value=0, max_value=2**30),
    )
    @settings(max_examples=30, deadline=None)
    def test_idat_corruption_never_passes_silently(self, h, w, flip):
        """Flipping any byte inside a chunk body or CRC must raise —
        never return wrong pixels silently."""
        from nekton_spark.functions.multimodal import _png_decode, _png_encode

        pix = np.arange(h * w, dtype=np.uint8).reshape(h, w)
        b = bytearray(_png_encode(pix))
        # byte 8 onward: first chunk; avoid the length fields (could
        # make parsing run off the end and legitimately IndexError)
        idx = 16 + flip % (len(b) - 20)
        b[idx] ^= 0xFF
        try:
            out = _png_decode(bytes(b))
        except Exception:
            return  # detected (CRC/signature/parse error) — good
        # a flip that still parses must not have altered pixel content
        assert (out == pix).all()


class TestWavProperties:
    @given(key=st.integers(min_value=0, max_value=10**9))
    @settings(max_examples=40, deadline=None)
    def test_synth_bytes_are_valid_wav_with_exact_samples(self, key):
        from nekton_spark.functions.multimodal import _synth_samples

        n = 256 + key % 256
        samples = _synth_samples(key, n)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(2)
            wv.setframerate(8000)
            wv.writeframes(samples.tobytes())
        with wave.open(io.BytesIO(buf.getvalue()), "rb") as rd:
            assert rd.getnframes() == n
            back = np.frombuffer(rd.readframes(n), dtype="<i2")
        assert (back == samples).all()


class TestPackingMath:
    @given(
        tokens=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30),
        budget=st.integers(min_value=1, max_value=64),
    )
    @settings(max_examples=60, deadline=None)
    def test_offsets_and_straddle_counts(self, tokens, budget):
        """Pure-python replay of the packing formulas: offsets are the
        exclusive prefix sum; a doc's window span matches interval
        arithmetic on [start, start + n) over windows of `budget`."""
        start = 0
        for n in tokens:
            pack_id = start // budget
            if n == 0:
                n_packs = 0
            else:
                n_packs = (start + n - 1) // budget - start // budget + 1
                # span must cover exactly the windows its tokens touch
                first, last = start // budget, (start + n - 1) // budget
                assert n_packs == last - first + 1
                assert first * budget <= start < (first + 1) * budget
            assert pack_id >= 0
            start += n


class TestJpegProperties:
    @given(
        bx=st.integers(min_value=1, max_value=4),
        by=st.integers(min_value=1, max_value=4),
        seed=st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_dc_blocks_round_trip_any_values(self, bx, by, seed):
        """Arbitrary DC values in the full category range must survive
        the Huffman/bitstream/IDCT round trip exactly (the DC-only
        closed form: pixel = dc + 128)."""
        from nekton_spark.functions.jpeg import jpeg_decode, jpeg_encode_blocks

        rng = np.random.default_rng(seed)
        dcs = rng.integers(-128, 128, size=bx * by).tolist()
        pix = jpeg_decode(jpeg_encode_blocks(dcs, bx, bx * 8, by * 8))
        assert pix.shape == (by * 8, bx * 8)
        for b, dc in enumerate(dcs):
            yb, xb = divmod(b, bx)
            assert (pix[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8] == dc + 128).all()

    @given(
        crop_w=st.integers(min_value=1, max_value=16),
        crop_h=st.integers(min_value=1, max_value=16),
    )
    @settings(max_examples=30, deadline=None)
    def test_non_multiple_of_8_dimensions_crop(self, crop_w, crop_h):
        """SOF0 dimensions that aren't block multiples: the decoder must
        pad the MCU grid internally and crop the output exactly."""
        from nekton_spark.functions.jpeg import jpeg_decode, jpeg_encode_blocks

        bx, by = (crop_w + 7) // 8, (crop_h + 7) // 8
        dcs = [(7 * b) % 200 - 100 for b in range(bx * by)]
        pix = jpeg_decode(jpeg_encode_blocks(dcs, bx, crop_w, crop_h))
        assert pix.shape == (crop_h, crop_w)
        assert (pix[0, 0] == dcs[0] + 128).all()


class TestJpegColorProperties:
    @given(
        bx=st.integers(min_value=1, max_value=3),
        by=st.integers(min_value=1, max_value=3),
        seed=st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_color_dc_blocks_round_trip_any_values(self, bx, by, seed):
        """Arbitrary per-component DC values through encode → decode →
        YCbCr→RGB: each block's RGB must equal the closed form
        floor(f(dc+128) + 0.5) clamped to [0, 255] — the same half-up
        rounding the SQL oracle replays."""
        from nekton_spark.functions.jpeg import jpeg_decode, jpeg_encode_blocks_color

        rng = np.random.default_rng(seed)
        dcs = [rng.integers(-128, 128, size=bx * by).tolist() for _ in range(3)]
        pix = jpeg_decode(jpeg_encode_blocks_color(*dcs, bx, bx * 8, by * 8))
        assert pix.shape == (by * 8, bx * 8, 3)
        for b in range(bx * by):
            y, cb, cr = (float(dcs[c][b] + 128) for c in range(3))
            exp = np.clip(
                np.floor(
                    np.array(
                        [
                            y + 1.402 * (cr - 128.0),
                            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                            y + 1.772 * (cb - 128.0),
                        ]
                    )
                    + 0.5
                ),
                0,
                255,
            ).astype(np.uint8)
            yb, xb = divmod(b, bx)
            block = pix[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8, :]
            assert (block == exp).all()

    @given(
        crop_w=st.integers(min_value=1, max_value=16),
        crop_h=st.integers(min_value=1, max_value=16),
        seed=st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_color_non_multiple_of_8_dimensions_crop(self, crop_w, crop_h, seed):
        """Non-block-multiple SOF0 dimensions: the interleaved-MCU grid
        pads internally and the decoder crops to exactly (h, w, 3),
        with the top-left block still matching the closed form."""
        from nekton_spark.functions.jpeg import jpeg_decode, jpeg_encode_blocks_color

        bx, by = (crop_w + 7) // 8, (crop_h + 7) // 8
        rng = np.random.default_rng(seed)
        dcs = [rng.integers(-128, 128, size=bx * by).tolist() for _ in range(3)]
        pix = jpeg_decode(jpeg_encode_blocks_color(*dcs, bx, crop_w, crop_h))
        assert pix.shape == (crop_h, crop_w, 3)
        y, cb, cr = (float(dcs[c][0] + 128) for c in range(3))
        exp = np.clip(
            np.floor(
                np.array(
                    [
                        y + 1.402 * (cr - 128.0),
                        y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                        y + 1.772 * (cb - 128.0),
                    ]
                )
                + 0.5
            ),
            0,
            255,
        ).astype(np.uint8)
        assert (pix[0, 0, :] == exp).all()


class TestAviProperties:
    @given(
        n_frames=st.integers(min_value=1, max_value=12),
        seed=st.integers(min_value=0, max_value=2**32 - 1),
        fps=st.integers(min_value=1, max_value=60),
    )
    @settings(max_examples=60, deadline=None)
    def test_container_round_trips_arbitrary_frame_bytes(self, n_frames, seed, fps):
        """The RIFF/AVI container must return frame payloads verbatim
        for any frame count, size mix (odd lengths exercise the even-
        padding rule), and fps."""
        from nekton_spark.functions.video import avi_decode_frames, avi_encode_mjpeg

        rng = np.random.default_rng(seed)
        frames = [
            rng.integers(0, 256, size=int(rng.integers(1, 400)), dtype=np.uint8).tobytes()
            for _ in range(n_frames)
        ]
        avi = avi_encode_mjpeg(frames, width=16, height=8, fps=fps)
        assert avi_decode_frames(avi) == frames

    @given(cut=st.integers(min_value=13, max_value=60))
    @settings(max_examples=20, deadline=None)
    def test_truncated_container_refuses(self, cut):
        """Any truncation inside the chunk tree must raise, never
        silently return partial frames."""
        import pytest as _pytest

        from nekton_spark.functions.video import avi_decode_frames, avi_encode_mjpeg

        avi = avi_encode_mjpeg([b"x" * 100], width=8, height=8)
        with _pytest.raises(ValueError):
            avi_decode_frames(avi[:cut])


class TestFoldKernelEquality:
    """The allocation-stall kernel rewrites must preserve the exact
    left-fold addition order — each fold form is compared against the
    cumsum reference it replaced, element-for-element (== on float64,
    no tolerance)."""

    def test_assignment_distance_fold_equals_cumsum(self):
        import numpy as np

        rng = np.random.RandomState(7)
        P = rng.randn(37, 64)
        C = rng.randn(9, 64)
        diff = P[:, None, :] - C[None, :, :]
        ref = np.cumsum(diff * diff, axis=-1)[:, :, -1]
        acc = np.zeros((len(P), len(C)))
        for j in range(P.shape[1]):
            dcol = P[:, j, None] - C[None, :, j]
            acc += dcol * dcol
        assert np.array_equal(acc, ref)

    def test_sketch_dot_fold_equals_cumsum(self):
        import numpy as np

        from nekton_spark.functions.similarity import hyperplane_values

        rng = np.random.RandomState(11)
        M = rng.randn(23, 64)
        H = np.array([hyperplane_values(7000 + i, 64) for i in range(56)])
        ref = np.cumsum(M[:, None, :] * H[None, :, :], axis=2)[:, :, -1]
        dots = np.zeros((len(M), H.shape[0]))
        for j in range(H.shape[1]):
            dots += M[:, j, None] * H[None, :, j]
        assert np.array_equal(dots, ref)


class TestSaltedPairMiningInvariant:
    """r6 verdict #8: the 'every unordered pair meets in exactly one
    subgroup' salting argument, asserted DIRECTLY — for random corpora
    with planted cliques and forced tiny tile sizes {1, 2, 7} (heavy
    salting: every bucket/cluster above the tile splits), the salted
    and unsalted runs must emit IDENTICAL pair/evidence sets, scores
    bit-equal (per-pair folds are tile-shape-independent)."""

    # clique position: ids 20-29, chosen DECORRELATED from the k-means
    # seed ranks. Seeds are the k smallest hash60(id, SEED_ORDER_SALT)
    # — for n=36, k=3 that is ids {3, 6, 7} — so no seed lands inside
    # the clique and SemDeDup's per-cluster contract keeps the clique
    # in one cluster (9 dup marks). The previous fixture planted the
    # clique at ids 0-9, which under the old smallest-id seeding put
    # ALL seeds inside it (the r8 red test); the id-adjacent-clique
    # case is now pinned directly by
    # test_functions.TestClustering::test_seeding_decorrelated_from_id_adjacency.
    CLIQUE = range(20, 30)

    def _corpus(self, spark, seed, n=36, dim=8):
        rng = np.random.default_rng(seed)
        V = rng.normal(size=(n, dim))
        # plant a tight clique of 10 near-copies (hot bucket/cluster)
        base = rng.normal(size=dim)
        for i in self.CLIQUE:
            V[i] = base + rng.normal(size=dim) * 1e-3
        rows = [(int(i), [float(x) for x in V[i]]) for i in range(n)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    @given(
        seed=st.integers(min_value=0, max_value=10**6),
        tile=st.sampled_from([1, 2, 7]),
    )
    @settings(max_examples=6, deadline=None)
    def test_embedding_near_dup_pairs_identical_under_salt(self, spark, seed, tile):
        from nekton_spark.functions.similarity import embedding_near_dup

        df = self._corpus(spark, seed)
        kw = dict(threshold=0.5, dim=8, n_bits=8, bands=4)
        unsalted = sorted(
            (r.id_a, r.id_b, r.score)
            for r in embedding_near_dup(df, salt_tile=2048, **kw).collect()
        )
        salted = sorted(
            (r.id_a, r.id_b, r.score)
            for r in embedding_near_dup(df, salt_tile=tile, **kw).collect()
        )
        assert len(unsalted) >= 9  # the planted clique must be found
        assert salted == unsalted  # scores bit-equal, sets identical

    @given(
        seed=st.integers(min_value=0, max_value=10**6),
        tile=st.sampled_from([1, 2, 7]),
    )
    @settings(max_examples=6, deadline=None)
    def test_semdedup_evidence_identical_under_salt(self, spark, seed, tile):
        from nekton_spark.functions.clustering import semdedup

        df = self._corpus(spark, seed)
        kw = dict(k=3, iters=2, tau=0.9)
        unsalted = sorted(
            (r.vec_id, r.cluster, r.is_dup)
            for r in semdedup(df, salt_tile=2048, **kw).collect()
        )
        salted = sorted(
            (r.vec_id, r.cluster, r.is_dup)
            for r in semdedup(df, salt_tile=tile, **kw).collect()
        )
        assert sum(d for *_, d in unsalted) >= 9  # clique marked
        assert salted == unsalted


class TestDocumentFormatProperties:
    @given(
        paras=st.lists(
            st.text(
                # any unicode except the XML-forbidden C0 controls the
                # writer would emit raw (tab/newline are round-tripped
                # via <w:tab/>/<w:br/> and stay)
                st.characters(
                    blacklist_categories=("Cs",),
                    blacklist_characters="".join(
                        chr(c) for c in range(0x20) if c not in (9, 10)
                    ),
                ),
                max_size=60,
            ),
            min_size=1,
            max_size=5,
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_docx_round_trips_any_unicode(self, paras):
        from nekton_spark.functions.docx import docx_encode, docx_text

        text, title, n = docx_text(docx_encode(paras))
        assert text == "\n".join(paras)
        assert n == len(paras) and title is None

    @given(
        lines=st.lists(
            st.text(
                st.characters(blacklist_categories=("Cs",)), max_size=50
            ),
            min_size=1,
            max_size=4,
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_pdf_identity_h_round_trips_any_unicode(self, lines):
        from nekton_spark.functions.pdf import pdf_encode, pdf_page_texts

        got = pdf_page_texts(
            pdf_encode([lines], flate=False, unicode_font=True)
        )
        # the line model is exact: shown lines join with \n (the
        # first show seeds the output, empty strings included)
        assert got == ["\n".join(lines)]

    @given(
        paras=st.lists(
            st.text(
                alphabet=st.sampled_from(
                    "abc ABC 123 àé€ 日本 🙂 &<>\"'\t\n"
                ),
                max_size=40,
            ),
            min_size=1,
            max_size=3,
        )
    )
    @settings(max_examples=30, deadline=None)
    def test_pdf_flate_winansi_safe_subset(self, paras):
        """WinAnsi legs: cp1252-encodable lines round-trip through the
        Flate path; non-encodable ones are the documented refusal of
        the WRITER (encode raises), not silent mojibake."""
        from nekton_spark.functions.pdf import pdf_encode, pdf_page_texts

        try:
            p = pdf_encode([paras])
        except UnicodeEncodeError:
            return  # writer-side: line not representable in WinAnsi
        assert pdf_page_texts(p) == ["\n".join(paras)]
