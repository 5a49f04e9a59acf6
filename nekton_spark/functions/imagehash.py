r"""Perceptual image hashing + image near-dup mining (dHash).

The multimodal twin of the text dedup family: a 100 TB image corpus
needs near-duplicate removal (re-encodes, resizes, small crops of the
same picture), and the standard cheap signal is the difference hash
(dHash, public: Krawetz 2013 "Kind of Like That") — block-mean
downsample to a 9×8 luma grid, one bit per horizontal gradient, 64
bits total. Re-encodes and mild resizes preserve most gradients, so
near-dups sit at small Hamming distance.

Pipeline shape mirrors :func:`dedup.simhash_near_dup_pairs` exactly:

    decode_image → image_dhash (one Arrow pass, no shuffle)
                 → band the 64-bit hash into 4×16-bit sub-keys
                 → self equi-join on (band, key)  [the only shuffle]
                 → exact popcount verify (codegen xor/bit_count)

By pigeonhole, recall is EXACT for ``max_hamming <= bands - 1`` —
a pair within Hamming 3 agrees on at least one of 4 bands. Never
all-pairs; bucket population is the scale knob, same story as the
text-side banding.

Determinism contract (what the SQL oracle replays): integer luma
``(299 R + 587 G + 114 B) // 1000``, block-mean cells with floor
boundaries (``sum // count``), strict ``>`` gradient bits. Images
smaller than the 9×8 grid REFUSE (a thumbnail pipeline upsizes before
hashing; silently hashing degenerate grids would collide everything).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..materialize import materialize

_GRID_H, _GRID_W = 8, 9  # dHash grid: 8 rows × 9 columns → 8×8 bits


def dhash64(pixels: np.ndarray) -> int:
    """64-bit dHash of an (h, w[, ch]) uint8 image — the single-image
    kernel, shared by the Spark surface and tests."""
    a = np.asarray(pixels, dtype=np.int64)
    if a.ndim == 3:
        if a.shape[2] >= 3:
            a = (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
        else:
            a = a[:, :, 0]
    h, w = a.shape
    if h < _GRID_H or w < _GRID_W:
        raise ValueError(
            f"image {h}x{w} smaller than the {_GRID_H}x{_GRID_W} dHash grid"
        )
    cells = np.empty((_GRID_H, _GRID_W), dtype=np.int64)
    for y in range(_GRID_H):
        y0, y1 = y * h // _GRID_H, (y + 1) * h // _GRID_H
        for x in range(_GRID_W):
            x0, x1 = x * w // _GRID_W, (x + 1) * w // _GRID_W
            blk = a[y0:y1, x0:x1]
            cells[y, x] = int(blk.sum()) // blk.size
    bits = cells[:, :-1] > cells[:, 1:]
    val = 0
    for y in range(_GRID_H):
        for x in range(_GRID_W - 1):
            if bits[y, x]:
                val |= 1 << (y * 8 + x)
    # fold to signed int64 (bit 63 set → negative; banding/xor agree
    # on both engines)
    return val - (1 << 64) if val >= (1 << 63) else val


def image_dhash(
    df: DataFrame,
    pixels_col: str = "pixels",
    h_col: str = "dec_height",
    w_col: str = "dec_width",
    out_col: str = "dhash",
) -> DataFrame:
    """Attach the 64-bit dHash to decoded-image rows (the output shape
    of ``decode_image`` / ``frame_sample``). One Arrow pass, map-only."""

    @F.pandas_udf("long")
    def _dh(pixels: pd.Series, hh: pd.Series, ww: pd.Series) -> pd.Series:
        out = []
        for p, h, w in zip(pixels, hh, ww):
            a = np.asarray(p, dtype=np.int64)
            ch = len(a) // (int(h) * int(w))
            out.append(dhash64(a.reshape(int(h), int(w), ch)))
        return pd.Series(out, dtype="int64")

    from .similarity import VEC_BYTES_PER_SLICE, ensure_parallelism

    # fan out below the hash (r15 opt): a 1-split synth input would
    # run the Arrow pass on one task; no-op at scale / on already-
    # repartitioned decode output. Vector-kernel slice size (r16):
    # the dHash is µs/row numpy — see VEC_BYTES_PER_SLICE
    df = ensure_parallelism(df, VEC_BYTES_PER_SLICE)
    return df.withColumn(out_col, _dh(F.col(pixels_col), F.col(h_col), F.col(w_col)))


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    pixels_col: str = "pixels",
    h_col: str = "dec_height",
    w_col: str = "dec_width",
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = None,
    salt_tile: int | None = None,
) -> DataFrame:
    """Image near-dup pairs ``(id_a, id_b, hamming)`` over decoded
    frames — the simhash_near_dup_pairs plan on the dHash. Exact
    recall for ``max_hamming <= bands - 1`` (pigeonhole); the banded
    equi-join is the only shuffle and the verify is codegen
    xor/popcount.

    Hot buckets: N byte-identical images share every band key, so the
    TRUE pair set — and therefore the output — is quadratic in N;
    that is pair semantics, not a plan defect (same exposure as the
    text-side simhash pairs). The right pipeline order removes exact
    duplicates (hash-groupBy on the payload) BEFORE perceptual
    pairing; two knobs govern what happens when a corpus arrives
    dirty anyway:

    - ``max_bucket`` — REFUSE (engine policy, rather than silently
      materialize N²/2 rows) when any (band, key) bucket exceeds it;
    - ``salt_tile`` (r13, the embedding_near_dup tile salt ported to
      the equi-join plan; r14 factored into the SHARED
      functions/banding.py helper so the text MinHash path uses the
      identical construction) — opt INTO completion with the
      quadratic work SPREAD across the cluster instead of one
      straggler task; pair set IDENTICAL to the unsalted plan (pinned
      by test). See banding.salted_band_pairs for the construction."""
    if not 1 <= bands <= 64 or 64 % bands:
        raise ValueError(f"bands must divide 64, got {bands}")
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming {max_hamming} > bands-1 {bands - 1} breaks the "
            "pigeonhole recall guarantee; raise bands"
        )
    if max_bucket is not None and max_bucket < 2:
        raise ValueError(f"max_bucket must be >= 2, got {max_bucket}")
    if salt_tile is not None and salt_tile < 2:
        raise ValueError(f"salt_tile must be >= 2, got {salt_tile}")
    r = 64 // bands
    mask = (1 << r) - 1
    base = image_dhash(df, pixels_col, h_col, w_col).select(
        F.col(id_col).alias("id"), F.col("dhash").alias("dh")
    )
    # the self-join would re-run the Python hash per branch; (id, hash)
    # is 16 bytes/row — materialize once
    base = base.transform(materialize)
    banded = base.select(
        "id",
        "dh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("dh", b * r).bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            )
        ).alias("band", "key"),
    )
    from .banding import salted_band_pairs

    cand = salted_band_pairs(
        banded,
        ["band", "key"],
        id_col="id",
        carry=("dh",),
        max_bucket=max_bucket,
        salt_tile=salt_tile,
        what="dHash band bucket",
    ).distinct()
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("dh_a").bitwiseXOR(F.col("dh_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def orient_pixels(a: np.ndarray, orientation: int | None) -> np.ndarray:
    """Apply the EXIF orientation's DISPLAY transform (TIFF/EP tag
    274): stored pixels → upright pixels. 1/None = identity, 2 =
    mirror, 3 = rotate 180, 4 = vertical flip, 5 = transpose, 6 =
    rotate 90 CW, 7 = transverse, 8 = rotate 90 CCW. Works on
    (h, w[, ch]) arrays; 5–8 swap the output dims."""
    o = 1 if orientation is None else int(orientation)
    if o == 1:
        return a
    if o == 2:
        return a[:, ::-1]
    if o == 3:
        return a[::-1, ::-1]
    if o == 4:
        return a[::-1, :]
    if o == 5:
        return np.swapaxes(a, 0, 1)
    if o == 6:
        return np.rot90(a, k=-1, axes=(0, 1))
    if o == 7:
        # Transverse: upright[i, j] = stored[H-1-j, W-1-i] (anti-
        # transpose). NOT rot90(-1)[:, ::-1] — that simplifies to the
        # plain transpose, i.e. orientation 5 (r13 ADVICE, medium).
        return np.rot90(a, k=-1, axes=(0, 1))[::-1, :]
    if o == 8:
        return np.rot90(a, k=1, axes=(0, 1))
    raise ValueError(f"EXIF orientation {o} out of range 1..8")


def auto_orient(
    df: DataFrame,
    pixels_col: str = "pixels",
    h_col: str = "dec_height",
    w_col: str = "dec_width",
    orient_col: str = "orientation",
) -> DataFrame:
    """Rotate/flip decoded pixels upright per the row's EXIF
    orientation (r12 verdict #8): camera-rotated re-shoots of the same
    picture hash to the SAME dHash once normalized, so image dedup is
    robust to orientation metadata. NULL orientation = 1 (upright).
    One Arrow pass, map-only; rewrites pixels and swaps the dims for
    orientations 5–8. Compose decode_media → exif_extract →
    auto_orient → image_dhash."""
    out_schema = T.StructType(
        [
            f
            if f.name not in (pixels_col, h_col, w_col)
            else T.StructField(f.name, f.dataType, True)
            for f in df.schema.fields
        ]
    )

    def run(batches):
        for pdf in batches:
            px, hh, ww = [], [], []
            for p, h, w, o in zip(
                pdf[pixels_col], pdf[h_col], pdf[w_col], pdf[orient_col]
            ):
                a = np.asarray(p, dtype=np.int64)
                ch = len(a) // (int(h) * int(w))
                a = a.reshape(int(h), int(w), ch)
                u = orient_pixels(a, None if pd.isna(o) else int(o))
                px.append(u.ravel().tolist())
                hh.append(u.shape[0])
                ww.append(u.shape[1])
            yield pdf.assign(**{pixels_col: px, h_col: hh, w_col: ww})

    return df.mapInPandas(run, out_schema)


def synth_oriented_frames(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Driver-row synth for orientation normalization: the UPRIGHT
    image is synth_gray_frames' even-doc base pattern (8×9); the
    STORED pixels are that image passed through the INVERSE of the
    display transform for orientation (key % 8) + 1 — ALL EIGHT tag
    values, so the degenerate-transform class of bug (r13 ADVICE:
    orientation 7 collapsing to the orientation-5 transpose) is pinned
    by the driver row itself — tagged with that orientation; auto_orient
    must land every row back on the same upright pixels and image_dhash
    on the same closed-form hash the image_dhash oracle replays."""

    def _inverse(o: int, a: np.ndarray) -> np.ndarray:
        if o == 1:
            return a
        if o == 2:  # mirror is an involution
            return a[:, ::-1]
        if o == 3:
            return a[::-1, ::-1]
        if o == 4:
            return a[::-1, :]
        if o == 5:  # transpose is an involution
            return np.swapaxes(a, 0, 1)
        if o == 6:  # display rotates 90 CW → store rotated 90 CCW
            return np.rot90(a, k=1, axes=(0, 1))
        if o == 7:  # anti-transpose is an involution
            return np.swapaxes(a[::-1, ::-1], 0, 1)
        if o == 8:
            return np.rot90(a, k=-1, axes=(0, 1))
        raise AssertionError(o)

    out_schema = T.StructType(
        [
            df.schema[key_col],
            T.StructField("orientation", T.IntegerType(), True),
            T.StructField("pixels", T.ArrayType(T.LongType()), True),
            T.StructField("dec_height", T.IntegerType(), True),
            T.StructField("dec_width", T.IntegerType(), True),
        ]
    )

    def run(batches):
        def one(key: int):
            q = key
            yy, xx = np.mgrid[0:_GRID_H, 0:_GRID_W]
            base = (
                q * 131 + yy * 17 + xx * 23 + (q * (yy + 1) * (xx + 1)) % 97
            ) % 251
            o = key % 8 + 1
            stored = _inverse(o, base)
            return (
                o,
                stored.ravel().tolist(),
                stored.shape[0],
                stored.shape[1],
            )

        for pdf in batches:
            cols = [one(int(k)) for k in pdf[key_col]]
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col],
                    "orientation": [c[0] for c in cols],
                    "pixels": [c[1] for c in cols],
                    "dec_height": [c[2] for c in cols],
                    "dec_width": [c[3] for c in cols],
                }
            )

    from .similarity import VEC_BYTES_PER_SLICE, ensure_parallelism

    # fan out BELOW the synth (r15 opt): 1-split corpus would run
    # the per-row inverse-orient build on one task (µs/row numpy —
    # vector-kernel slice size, r16)
    return ensure_parallelism(df, VEC_BYTES_PER_SLICE).mapInPandas(run, out_schema)


def synth_gray_frames(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Synthetic decoded-frame rows for the dHash driver rows: an
    8×9 single-channel image (identity downsample, so the oracle
    replays the hash without block means). Docs pair up (2q, 2q+1):
    the even doc carries base pattern gray(y, x) = (q*131 + y*17 +
    x*23 + (q*(y+1)*(x+1)) % 97) % 251 — the nonlinear term keeps the
    250 group hashes nearly all-distinct (249/250, cross-group
    Hamming ≤ 3 collisions: 2, replayed identically by the oracle);
    the odd doc is the SAME pattern with gray(0,0) altered to flip
    exactly dHash bit 0 — a planted Hamming-1 near-dup per pair,
    replayable closed-form."""
    # NOTE (r15 opt): deliberately NOT fanned out here — a Repartition
    # below this Project lets Catalyst collapse the 72-term pixel
    # expression INTO the downstream dhash UDF's argument list, where
    # it evaluates interpreted per row (measured 10.3 s vs 1.8 s at
    # sf0.1). image_dhash fans out ABOVE the built arrays instead,
    # which keeps this Project codegen'd and feeds the Arrow pass from
    # all cores.
    key = F.col(key_col)
    q = (key / 2).cast("long")
    base = lambda y, x: (  # noqa: E731
        q * 131 + y * 17 + x * 23 + (q * (y + 1) * (x + 1)) % 97
    ) % 251
    px = []
    for y in range(8):
        for x in range(9):
            g = base(y, x)
            if y == 0 and x == 0:
                # variant: bit0 = g(0,0) > g(0,1); flip it
                flipped = F.when(
                    base(0, 0) > base(0, 1), F.lit(0).cast("long")
                ).otherwise(base(0, 1) + 1)
                g = F.when(key % 2 == 1, flipped).otherwise(g)
            px.append(g.cast("int"))
    return df.select(
        key,
        F.array(*px).alias("pixels"),
        F.lit(8).alias("dec_height"),
        F.lit(9).alias("dec_width"),
    )
