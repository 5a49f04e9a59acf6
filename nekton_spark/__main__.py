"""CLI entry point (reference ``src/main.rs`` + ``src/lib.rs:96-122``).

``python -m nekton_spark -c pipeline.yml`` — config path from
``-c/--config_file``, env ``CONFIG_FILE``, or default ``nekton.yml``,
matching the reference's structopt surface exactly. Streaming specs
run until terminated; batch specs run to completion.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="nekton_spark")
    parser.add_argument(
        "-c",
        "--config_file",
        default=os.environ.get("CONFIG_FILE", "nekton.yml"),
        help="pipeline spec YAML (env: CONFIG_FILE; default: nekton.yml)",
    )
    args = parser.parse_args(argv)

    from .session import get_spark
    from .spec import Spec, run_spec

    spark = get_spark("nekton_spark_cli")
    try:
        result = run_spec(spark, Spec.from_file(args.config_file))
        if result is not None and hasattr(result, "awaitTermination"):
            result.awaitTermination()
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
