import os

import pytest
from hypothesis import settings as _hyp_settings

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM light

# Gate suites must be REPRODUCIBLE (r8 verdict #2): two consecutive
# full pytest runs must have byte-identical pass/fail. derandomize=True
# makes every @given draw its examples deterministically from the test
# itself (no RNG, no example database), so a green run stays green.
# Open-ended random exploration belongs in tools/fuzz_oracle.py (which
# takes explicit seeds), not here. Per-test @settings(...) inherit
# unspecified fields from this profile.
_hyp_settings.register_profile("gate", derandomize=True)
_hyp_settings.load_profile("gate")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from nekton_spark.session import get_spark

    s = get_spark("nekton-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from nekton_spark.sources.files import load_tables

    return load_tables(spark, sf_dir)
