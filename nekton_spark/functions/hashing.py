"""Portable deterministic hashing shared by dedup/similarity operators.

Spark's builtin ``hash``/``xxhash64`` and DuckDB's ``hash`` use
different algorithms, so every operator that must be oracle-checkable
uses an md5-derived 60-bit hash both engines compute identically:

    Spark : conv(substring(md5(concat(seed, ':', s)), 1, 15), 16, 10) :: bigint
    DuckDB: ('0x' || substr(md5(seed || ':' || s), 1, 15)) :: bigint

60 bits keeps the value positive in a signed int64 in both engines.
All of this stays JVM-side in Spark (codegen'd expressions — no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column, seed: int | Column = 0) -> Column:
    seed_col = F.lit(seed) if isinstance(seed, int) else seed
    payload = F.concat(seed_col.cast("string"), F.lit(":"), col.cast("string"))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str, seed: str = "0") -> str:
    """The equivalent DuckDB SQL fragment."""
    return f"(('0x' || substr(md5(({seed})::VARCHAR || ':' || ({expr})::VARCHAR), 1, 15))::BIGINT)"


def hash60_py(s: str, seed: int = 0) -> int:
    """The same hash computed driver-side (for embedding constants —
    e.g. LSH hyperplanes — as literals instead of per-row md5)."""
    import hashlib

    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)


# universal rehash family for minhash: one md5 base hash per shingle,
# then k transforms h_i(s) = (A_i * h0 + B_i) mod 2^45 with A_i odd
# 20-bit, B_i 40-bit, h0 40-bit. The modulus is what de-correlates the
# argmins across seeds (without it every component picks the same
# min-h0 shingle); odd A_i makes x -> A_i*x a bijection mod 2^45.
# Products stay < 2^60: overflow-free in both Spark (silent wrap would
# be wrong) and DuckDB (which raises on int64 overflow).
H0_MOD = 1 << 40
REHASH_MASK = (1 << 45) - 1


def affine_consts(k: int) -> tuple[list[int], list[int]]:
    a = [(hash60_py(str(i), 998) % (1 << 20)) | 1 for i in range(k)]
    b = [hash60_py(str(i), 999) % H0_MOD for i in range(k)]
    return a, b
