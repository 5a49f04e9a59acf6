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
    parser.add_argument(
        "--explain",
        action="store_true",
        help="print the optimized physical plan for the spec and exit "
        "(no execution; shows pushdown/broadcast/exchange decisions)",
    )
    args = parser.parse_args(argv)

    from .session import get_spark
    from .spec import Spec, run_spec

    try:
        spec = Spec.from_file(args.config_file)
    except FileNotFoundError:
        print(f"error: config file not found: {args.config_file}", file=sys.stderr)
        return 1
    except Exception as e:  # YAML parse errors
        print(f"error: invalid spec {args.config_file}: {e}", file=sys.stderr)
        return 1

    from pyspark.sql import SparkSession

    # embedded callers (tests, notebooks) own their session — only stop
    # what this entry point itself created
    pre_existing = SparkSession.getActiveSession() is not None
    spark = get_spark("nekton_spark_cli")
    try:
        if args.explain:
            from .plans import formatted_plan
            from .spec import compile_spec

            df, _ = compile_spec(spark, spec)
            print(formatted_plan(df))
            return 0
        result = run_spec(spark, spec)
        if result is not None and hasattr(result, "awaitTermination"):
            result.awaitTermination()
        return 0
    except ValueError as e:  # unknown type tags / bad operator config
        print(f"error: {e}", file=sys.stderr)
        return 1
    finally:
        if not pre_existing:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
