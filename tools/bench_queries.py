"""Time arbitrary driver queries against an arbitrary sf dir.

Usage: python tools/bench_queries.py <sf_dir> <query> [query ...]

Same discipline as bench.py (warm session, min of two runs per query);
prints one `name<TAB>rows<TAB>sec` line per query plus a JSON tail.
Used for scale/skew rehearsals where bench.py's fixed headline set and
fixed SF dir do not fit.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    import __spark_entry__ as entrymod

    from nekton_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("nekton-bench-queries")
    qs = entrymod.queries()
    qs["q01_pricing_summary"](spark, sf_dir).count()  # warm JVM
    times: dict[str, float] = {}
    for name in names:
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        print(f"{name}\t{n}\t{times[name]:.2f}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": times}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
