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


# affine rehash family for minhash: one md5 per shingle, then k cheap
# affine transforms h_i = (2i+1)*h0 + B_i with h0 < 2^40, B_i < 2^40 —
# products stay < 2^46, overflow-free in both Spark (silent wrap would
# be wrong) and DuckDB (which would raise).
H0_MOD = 1 << 40


def affine_consts(k: int) -> list[int]:
    return [hash60_py(str(i), 999) % H0_MOD for i in range(k)]
