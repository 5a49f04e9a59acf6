"""WebP (VP8L lossless) codec tests — from-spec round trips, refusal
paths, Spark wiring, and (where the environment provides libwebp)
bidirectional bit-exact parity against the reference implementation.

The parity battery is the strongest evidence in the file: libwebp's
encoder uses the predictor / cross-color / subtract-green transforms,
meta-prefix groups, the color cache and 2-D distance codes — paths a
self-round-trip alone cannot reach — and our decoder must agree with
libwebp's own decoder bit-for-bit on every byte stream it emits.
"""

from __future__ import annotations

import ctypes
import struct

import numpy as np
import pytest

from nekton_spark.functions.webp import (
    _BitReader,
    _BitWriter,
    _DIST_MAP,
    _canonical_decode,
    _cl_ops,
    _plane_code_to_distance,
    _prefix_encode,
    _prefix_value,
    webp_decode,
    webp_encode_lossless,
    webp_encode_palette,
)


def _load_libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    return lib


_LIBWEBP = _load_libwebp()


def _ref_encode(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIBWEBP.WebPEncodeLosslessRGBA(
        img.tobytes(), w, h, w * 4, ctypes.byref(out)
    )
    assert n > 0
    data = ctypes.string_at(out, n)
    _LIBWEBP.WebPFree(out)
    return data


def _ref_decode(data: bytes) -> np.ndarray:
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIBWEBP.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p
    arr = (
        np.frombuffer(
            ctypes.string_at(p, w.value * h.value * 4), dtype=np.uint8
        )
        .reshape(h.value, w.value, 4)
        .copy()
    )
    _LIBWEBP.WebPFree(p)
    return arr


class TestBitsAndCodes:
    def test_bit_reader_writer_mirror(self):
        bw = _BitWriter()
        fields = [(0x2A, 7), (1, 1), (0x3FFF, 14), (0, 3), (5, 4), (0x155, 9)]
        for v, n in fields:
            bw.write(v, n)
        br = _BitReader(bw.getvalue())
        for v, n in fields:
            assert br.read(n) == v

    def test_bit_reader_truncation_refuses(self):
        br = _BitReader(b"\xff")
        br.read(6)
        br.read(2)
        with pytest.raises(ValueError, match="truncated WebP"):
            br.read(1)

    def test_prefix_value_encode_inverse(self):
        """_prefix_encode is the exact inverse of _prefix_value over
        the whole LZ77 length range and well into distance range."""
        for v in list(range(1, 5000)) + [100_000, 786_432, 1_048_576]:
            p, ebits, extra = _prefix_encode(v)
            bw = _BitWriter()
            bw.write(extra, ebits)
            br = _BitReader(bw.getvalue() or b"\x00")
            assert _prefix_value(p, br) == v

    def test_distance_map_shape(self):
        assert len(_DIST_MAP) == 120
        assert len(set(_DIST_MAP)) == 120
        # every entry addresses the already-decoded neighborhood
        for dx, dy in _DIST_MAP:
            assert 0 <= dy <= 7 and -8 <= dx <= 8
            assert dy > 0 or dx > 0
        # linear codes above the map; clamped-to-1 map entries exist
        assert _plane_code_to_distance(121, 99) == 1
        assert _plane_code_to_distance(130, 99) == 10
        assert _plane_code_to_distance(1, 10) == 10  # (0,1) on width 10
        assert _plane_code_to_distance(2, 10) == 1  # (1,0)

    def test_canonical_incomplete_code_refuses(self):
        with pytest.raises(ValueError, match="Huffman"):
            _canonical_decode([2, 2, 2, 0])  # kraft 3/4
        with pytest.raises(ValueError, match="Huffman"):
            _canonical_decode([1, 1, 1])  # oversubscribed

    def test_cl_ops_cover_alphabet(self):
        lengths = [8] * 200 + [0] * 56 + [5, 5, 5] + [0] * 21
        ops = _cl_ops(lengths)
        # replay the ops
        out = []
        prev = None
        for sym, _, extra in ops:
            if sym < 16:
                out.append(sym)
                if sym:
                    prev = sym
            elif sym == 16:
                out.extend([prev] * (3 + extra))
            elif sym == 17:
                out.extend([0] * (3 + extra))
            else:
                out.extend([0] * (11 + extra))
        assert out == lengths


class TestRoundTrip:
    def test_truecolor_all_encoder_modes(self):
        rng = np.random.default_rng(7)
        for h, w in [(1, 1), (8, 8), (11, 13), (3, 40), (14, 16)]:
            img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
            for kw in [
                dict(),
                dict(subtract_green=True),
                dict(cache_bits=4),
                dict(use_rle=True),
                dict(subtract_green=True, cache_bits=6, use_rle=True),
            ]:
                out = webp_decode(webp_encode_lossless(img, **kw))
                assert out.shape == img.shape
                assert (out == img).all(), kw

    def test_rle_runs_use_copy_tokens(self):
        """An image of long constant runs must round-trip through the
        LZ77 length/distance layer (and compress accordingly)."""
        img = np.zeros((32, 32, 4), dtype=np.uint8)
        img[..., 3] = 255
        img[:16] = (10, 200, 30, 255)
        plain = webp_encode_lossless(img)
        rle = webp_encode_lossless(img, use_rle=True)
        assert (webp_decode(rle) == img).all()
        assert len(rle) < len(plain)

    def test_palette_all_bundle_widths(self):
        rng = np.random.default_rng(9)
        for n in (2, 3, 4, 7, 16, 17, 256):
            pal = rng.integers(0, 256, (n, 4), dtype=np.uint8)
            idx = rng.integers(0, n, (9, 14), dtype=np.uint8)
            out = webp_decode(webp_encode_palette(idx, pal))
            assert (out == pal[idx]).all(), n

    def test_palette_bundling_edge_widths(self):
        # widths that don't divide the bundle size exercise the
        # partial final packed pixel of each row
        pal = np.array([[1, 2, 3, 255], [9, 8, 7, 255]], dtype=np.uint8)
        for w in (1, 7, 8, 9, 15):
            idx = (np.arange(5 * w).reshape(5, w) % 2).astype(np.uint8)
            out = webp_decode(webp_encode_palette(idx, pal))
            assert (out == pal[idx]).all(), w

    def test_vp8x_extended_container(self):
        """A VP8X-wrapped VP8L (extended container without the
        animation flag — e.g. alpha/ICC metadata layouts) decodes by
        walking past the VP8X and metadata chunks to the image."""
        img = np.full((6, 9, 4), 3, dtype=np.uint8)
        img[..., 3] = 200
        simple = webp_encode_lossless(img)
        vp8l_at = simple.index(b"VP8L")
        vp8l_chunk = simple[vp8l_at:]
        # VP8X body: flags(1) + reserved(3) + canvas w-1 (3) + h-1 (3)
        vp8x = (
            b"VP8X" + struct.pack("<I", 10) + bytes([0x10]) + b"\x00\x00\x00"
            + bytes([8, 0, 0]) + bytes([5, 0, 0])
        )
        icc = b"ICCP" + struct.pack("<I", 3) + b"abc\x00"  # odd size, padded
        body = b"WEBP" + vp8x + icc + vp8l_chunk
        payload = b"RIFF" + struct.pack("<I", len(body)) + body
        out = webp_decode(payload)
        assert (out == img).all()

    def test_alpha_channel_preserved(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (10, 10, 4), dtype=np.uint8)
        img[..., 3] = rng.integers(0, 256, (10, 10), dtype=np.uint8)
        assert (webp_decode(webp_encode_lossless(img)) == img).all()


class TestRefusals:
    def test_not_riff(self):
        with pytest.raises(ValueError, match="not a WebP"):
            webp_decode(b"GIF89a" + b"\x00" * 20)

    def test_riff_but_not_webp(self):
        with pytest.raises(ValueError, match="not a WebP"):
            webp_decode(b"RIFF" + struct.pack("<I", 12) + b"WAVE" + b"\x00" * 8)

    def test_lossy_vp8_reason_coded(self):
        payload = (
            b"RIFF"
            + struct.pack("<I", 16)
            + b"WEBP"
            + b"VP8 "
            + struct.pack("<I", 4)
            + b"\x00" * 4
        )
        with pytest.raises(ValueError, match="lossy WebP"):
            webp_decode(payload)

    def test_animation_reason_coded(self):
        vp8x = bytes([0x02]) + b"\x00" * 9  # animation flag set
        payload = (
            b"RIFF"
            + struct.pack("<I", 22)
            + b"WEBP"
            + b"VP8X"
            + struct.pack("<I", 10)
            + vp8x
        )
        with pytest.raises(ValueError, match="animated WebP"):
            webp_decode(payload)

    def test_truncated_stream(self):
        img = np.full((8, 8, 4), 77, dtype=np.uint8)
        data = webp_encode_lossless(img)
        with pytest.raises(ValueError, match="truncated WebP|no image chunk"):
            webp_decode(data[: len(data) - 6])

    def test_bad_vp8l_signature_and_version(self):
        img = np.full((4, 4, 4), 1, dtype=np.uint8)
        data = bytearray(webp_encode_lossless(img))
        sig_at = data.index(b"VP8L") + 8
        data[sig_at] = 0x30
        with pytest.raises(ValueError, match="VP8L signature"):
            webp_decode(bytes(data))
        data[sig_at] = 0x2F
        data[sig_at + 4] |= 0xE0  # version bits live at the top of byte 4
        with pytest.raises(ValueError, match="version"):
            webp_decode(bytes(data))

    def test_refusal_codes_mapped(self):
        from nekton_spark.functions.multimodal import _refusal_code

        assert _refusal_code(ValueError("lossy WebP (VP8) is ...")) == "lossy_webp"
        assert _refusal_code(ValueError("animated WebP is ...")) == "webp_animation"
        assert _refusal_code(ValueError("not a WebP (RIFF/WEBP) container")) == "bad_webp"
        assert (
            _refusal_code(ValueError("broken Huffman code in WebP stream"))
            == "bad_entropy"
        )
        assert (
            _refusal_code(ValueError("truncated WebP stream (bit reader)"))
            == "truncated"
        )


@pytest.mark.skipif(_LIBWEBP is None, reason="libwebp not in environment")
class TestLibwebpParity:
    """Bidirectional bit-exact parity with the reference codec."""

    def test_reference_bytes_decode_identically(self):
        rng = np.random.default_rng(42)
        for trial in range(40):
            h = int(rng.integers(1, 80))
            w = int(rng.integers(1, 80))
            kind = trial % 5
            if kind == 0:
                img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
            elif kind == 1:  # smooth gradients → predictor transform
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [
                        (yy * 3 + xx * 2) % 256,
                        (yy * 5) % 256,
                        (xx * 7) % 256,
                        np.full((h, w), 255),
                    ],
                    axis=2,
                ).astype(np.uint8)
            elif kind == 2:  # few colors → palette path
                pal = rng.integers(
                    0, 256, (int(rng.integers(2, 30)), 4), dtype=np.uint8
                )
                img = pal[rng.integers(0, len(pal), (h, w))]
            elif kind == 3:  # tiled → LZ77 2-D distances
                tile = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
                img = np.tile(tile, (h // 4 + 1, w // 4 + 1, 1))[:h, :w]
            else:  # half smooth, half noise → meta-prefix group split
                img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
                img[:, : w // 2] = 9
            data = _ref_encode(img)
            exp = _ref_decode(data)
            got = webp_decode(data)
            assert got.shape == exp.shape
            assert (got == exp).all(), f"trial {trial} {h}x{w} kind {kind}"

    def test_our_bytes_decode_identically_in_reference(self):
        rng = np.random.default_rng(13)
        for _ in range(8):
            h = int(rng.integers(1, 40))
            w = int(rng.integers(1, 40))
            img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
            for kw in [
                dict(),
                dict(subtract_green=True, cache_bits=5, use_rle=True),
            ]:
                back = _ref_decode(webp_encode_lossless(img, **kw))
                assert (back == img).all(), kw
            n = int(rng.integers(2, 20))
            pal = rng.integers(0, 256, (n, 4), dtype=np.uint8)
            idx = rng.integers(0, n, (h, w), dtype=np.uint8)
            back = _ref_decode(webp_encode_palette(idx, pal))
            assert (back == pal[idx]).all()


class TestSparkWiring:
    def test_synth_decode_matches_closed_form(self, spark):
        import pandas as pd
        from nekton_spark.functions.multimodal import (
            decode_image,
            synth_webp_media,
        )

        keys = list(range(0, 24))
        df = spark.createDataFrame(pd.DataFrame({"doc_id": keys}))
        rows = {
            r["doc_id"]: r
            for r in decode_image(synth_webp_media(df)).collect()
        }
        for k in keys:
            w, h = 8 + k % 9, 8 + k % 7
            leg = k % 3
            ak = k % 5 == 0
            exp = np.zeros((h, w, 4), dtype=np.int64)
            yy, xx = np.mgrid[0:h, 0:w]
            if leg < 2:
                ex = xx - xx % 3 if leg == 1 else xx
                for c in range(4):
                    exp[..., c] = (k * 31 + yy * 17 + ex * 7 + c * 11) % 256
                if not ak:
                    exp[..., 3] = 255
            else:
                d = (1, 2, 4, 8)[k % 4]
                n = 1 << d
                idx = (k + 3 * yy + xx) % n
                for c in range(3):
                    exp[..., c] = (k * 7 + idx * 13 + c * 29) % 256
                exp[..., 3] = (k * 7 + idx * 13 + 97) % 256 if ak else 255
            r = rows[k]
            assert (r["dec_height"], r["dec_width"]) == (h, w)
            assert r["pixels"] == exp.ravel().tolist(), k

    def test_decode_coverage_webp_paths(self, spark):
        import pandas as pd
        from nekton_spark.functions.multimodal import decode_coverage

        ok = webp_encode_lossless(np.full((4, 4, 4), 5, dtype=np.uint8))
        lossy = (
            b"RIFF"
            + struct.pack("<I", 16)
            + b"WEBP"
            + b"VP8 "
            + struct.pack("<I", 4)
            + b"\x00" * 4
        )
        bad = b"RIFX" + b"\x00" * 20
        pdf = pd.DataFrame(
            {
                "media": [
                    {"payload": ok, "mime": "image/webp", "meta": {}},
                    {"payload": lossy, "mime": "image/webp", "meta": {}},
                    {"payload": bad, "mime": "image/webp", "meta": {}},
                ]
            }
        )
        df = spark.createDataFrame(
            pdf,
            schema="media struct<payload:binary,mime:string,meta:map<string,string>>",
        )
        got = {
            (r["decode_status"], r["decode_reason"])
            for r in decode_coverage(df).collect()
        }
        assert got == {
            ("ok", "webp"),
            ("refused", "lossy_webp"),
            ("refused", "bad_webp"),
        }


class TestMetadataScrub:
    def _with_metadata(self):
        img = np.full((5, 7, 4), 42, dtype=np.uint8)
        simple = webp_encode_lossless(img)
        vp8l_chunk = simple[simple.index(b"VP8L"):]
        vp8x = (
            b"VP8X" + struct.pack("<I", 10)
            + bytes([0x20 | 0x08 | 0x04]) + b"\x00\x00\x00"
            + bytes([6, 0, 0]) + bytes([4, 0, 0])
        )
        icc = b"ICCP" + struct.pack("<I", 5) + b"prof!" + b"\x00"
        exif = b"EXIF" + struct.pack("<I", 8) + b"II*\x00\x00\x00\x00\x00"
        xmp = b"XMP " + struct.pack("<I", 4) + b"<x/>"
        body = b"WEBP" + vp8x + icc + vp8l_chunk + exif + xmp
        return img, b"RIFF" + struct.pack("<I", len(body)) + body

    def test_scrub_drops_metadata_keeps_pixels(self):
        from nekton_spark.functions.webp import webp_strip_metadata

        img, payload = self._with_metadata()
        clean = webp_strip_metadata(payload)
        assert len(clean) < len(payload)
        for tag in (b"EXIF", b"XMP ", b"ICCP"):
            assert tag not in clean
        # VP8X survives with feature flags cleared
        at = clean.index(b"VP8X") + 8
        assert clean[at] & (0x20 | 0x08 | 0x04) == 0
        assert (webp_decode(clean) == img).all()
        # idempotent, and plain containers pass through byte-exact
        assert webp_strip_metadata(clean) == clean
        plain = webp_encode_lossless(img)
        assert webp_strip_metadata(plain) == plain

    def test_scrub_media_operator_handles_webp(self, spark):
        import pandas as pd
        from nekton_spark.functions.exif import scrub_media_metadata

        img, payload = self._with_metadata()
        pdf = pd.DataFrame(
            {"media": [{"payload": payload, "mime": "image/webp", "meta": {}}]}
        )
        df = spark.createDataFrame(
            pdf,
            schema="media struct<payload:binary,mime:string,meta:map<string,string>>",
        )
        row = scrub_media_metadata(df).first()
        assert row.scrubbed_bytes == len(payload) - len(
            __import__(
                "nekton_spark.functions.webp", fromlist=["webp_strip_metadata"]
            ).webp_strip_metadata(payload)
        )
        assert (webp_decode(bytes(row.media.payload)) == img).all()

    @pytest.mark.skipif(_LIBWEBP is None, reason="libwebp not in environment")
    def test_scrubbed_bytes_still_decode_in_reference(self):
        from nekton_spark.functions.webp import webp_strip_metadata

        img, payload = self._with_metadata()
        back = _ref_decode(webp_strip_metadata(payload))
        assert (back == img).all()


class TestAnimation:
    """r15: VP8X/ANIM/ANMF animated WebP — every frame a genuine VP8L
    stream; composition (blend / no-blend / dispose-to-background)
    pinned on hand-computed canvases."""

    def test_compose_blend_and_dispose(self):
        from nekton_spark.functions.webp import (
            webp_decode_frames,
            webp_encode_anim,
            webp_frame_count,
        )

        rng = np.random.default_rng(3)
        cw, ch = 12, 10
        f0 = rng.integers(0, 256, (ch, cw, 4), dtype=np.uint8)
        f0[..., 3] = 255
        patch = rng.integers(0, 256, (4, 6, 4), dtype=np.uint8)
        patch[..., 3] = 255
        half = patch.copy()
        half[..., 3] = 128
        p = webp_encode_anim(
            [
                {"rgba": f0, "x": 0, "y": 0, "blend": False},
                {"rgba": patch, "x": 2, "y": 4, "blend": False, "dispose": 1},
                {"rgba": half, "x": 2, "y": 2, "blend": True},
            ],
            (cw, ch),
        )
        assert webp_frame_count(p) == 3
        frames = webp_decode_frames(p)
        assert len(frames) == 3
        assert (frames[0] == f0).all()
        exp1 = f0.copy()
        exp1[4:8, 2:8] = patch
        assert (frames[1] == exp1).all()
        # dispose-to-background cleared [4:8, 2:8]; the half-alpha
        # patch then blends over [2:6, 2:8] with the documented
        # integer 'over' semantics
        base = exp1.copy()
        base[4:8, 2:8] = 0
        dst = base[2:6, 2:8].astype(np.int64)
        src = half.astype(np.int64)
        sa = src[..., 3:4]
        df = dst[..., 3:4] * (255 - sa) // 255
        ba = sa + df
        rgb = (src[..., :3] * sa + dst[..., :3] * df) // np.maximum(ba, 1)
        out = np.concatenate([rgb, ba], axis=2)
        out[ba[..., 0] == 0] = 0
        exp2 = base.copy()
        exp2[2:6, 2:8] = out.astype(np.uint8)
        assert (frames[2] == exp2).all()

    def test_opaque_blend_equals_overwrite(self):
        from nekton_spark.functions.webp import (
            webp_decode_frames,
            webp_encode_anim,
        )

        rng = np.random.default_rng(5)
        f0 = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
        f0[..., 3] = 255
        patch = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
        patch[..., 3] = 255
        outs = []
        for blend in (False, True):
            p = webp_encode_anim(
                [
                    {"rgba": f0, "x": 0, "y": 0, "blend": False},
                    {"rgba": patch, "x": 2, "y": 2, "blend": blend},
                ],
                (8, 8),
            )
            outs.append(webp_decode_frames(p)[-1])
        assert (outs[0] == outs[1]).all()

    def test_still_container_single_frame(self):
        from nekton_spark.functions.webp import (
            webp_decode_frames,
            webp_frame_count,
        )

        img = np.full((5, 6, 4), 9, dtype=np.uint8)
        p = webp_encode_lossless(img)
        assert webp_frame_count(p) == 1
        frames = webp_decode_frames(p)
        assert len(frames) == 1 and (frames[0] == img).all()

    def test_lossy_frame_refuses(self):
        from nekton_spark.functions.webp import webp_decode_frames

        vp8x = bytes([0x02]) + b"\x00\x00\x00" + bytes([7, 0, 0, 7, 0, 0])
        anmf_head = bytes(16)
        lossy = b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
        anmf = anmf_head + lossy
        body = (
            b"WEBP"
            + b"VP8X" + struct.pack("<I", 10) + vp8x
            + b"ANIM" + struct.pack("<I", 6) + bytes(6)
            + b"ANMF" + struct.pack("<I", len(anmf)) + anmf
        )
        payload = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(ValueError, match="lossy WebP"):
            webp_decode_frames(payload)

    def test_frame_exceeds_canvas_refuses(self):
        from nekton_spark.functions.webp import (
            webp_decode_frames,
            webp_encode_anim,
        )

        big = np.zeros((6, 6, 4), dtype=np.uint8)
        p = webp_encode_anim(
            [{"rgba": big, "x": 0, "y": 0}], (6, 6)
        )
        # corrupt the stored x offset to push the frame off-canvas
        at = p.index(b"ANMF") + 8
        p = p[:at] + bytes([2]) + p[at + 1 :]
        with pytest.raises(ValueError, match="exceeds canvas"):
            webp_decode_frames(p)

    def test_odd_offsets_refused_by_encoder(self):
        from nekton_spark.functions.webp import webp_encode_anim

        f = np.zeros((2, 2, 4), dtype=np.uint8)
        with pytest.raises(ValueError, match="even"):
            webp_encode_anim([{"rgba": f, "x": 1, "y": 0}], (8, 8))

    def test_frame_sample_spark_path(self, spark):
        from nekton_spark.functions.multimodal import (
            frame_sample,
            synth_webp_anim_media,
        )

        keys = list(range(12))
        df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
        rows = frame_sample(synth_webp_anim_media(df), every=2).collect()
        by_key = {}
        for r in rows:
            by_key.setdefault(r.doc_id, []).append(r.frame_idx)
        for k in keys:
            n = 2 + k % 3
            assert sorted(by_key[k]) == list(range(0, n, 2)), k
        # spot-check frame 2 pixels for one key against the closed form
        k = 4  # n_frames=4, w=12, h=12 -> wait h=8+4%7=12? 4%7=4 -> h=12
        w, h = 8 + k % 9, 8 + k % 7
        r2 = next(
            r for r in rows if r.doc_id == k and r.frame_idx == 2
        )
        yy, xx = np.mgrid[0:h, 0:w]
        exp = np.zeros((h, w, 4), dtype=np.int64)
        for c in range(3):
            exp[..., c] = (k * 31 + yy * 17 + xx * 7 + c * 11) % 256
        exp[..., 3] = 255
        pyy, pxx = np.mgrid[0 : h - 4, 0 : w - 4]
        for c in range(3):
            exp[2 : h - 2, 2 : w - 2, c] = (
                k * 31 + 2 * 53 + pyy * 17 + pxx * 7 + c * 11
            ) % 256
        assert r2.pixels == exp.ravel().tolist()
