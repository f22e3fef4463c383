import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def make_spark(app="pdt-tests"):
    return (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '4')}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", "8")
        # keep catalog-table staging out of the repo root (r9 nit #1)
        .config("spark.sql.warehouse.dir",
                os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))),
                    ".tmp_stream", "warehouse"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


# Pin the whole session's ANSI mode (e.g. SPARK_GRAFT_ANSI=false to test
# the legacy posture); unset leaves the Spark 4 default (true).
_ANSI_ENV = os.environ.get("SPARK_GRAFT_ANSI")


@pytest.fixture(scope="session")
def spark():
    s = make_spark()
    if _ANSI_ENV is not None:
        s.conf.set("spark.sql.ansi.enabled", _ANSI_ENV)
    yield s


@pytest.fixture(scope="session", params=["true", "false"],
                ids=["ansi-on", "ansi-off"])
def ansi_mode(request):
    """Session-scoped ANSI parametrization: modules that declare
    ``pytestmark = pytest.mark.usefixtures("ansi_both")`` run every test
    under both spark.sql.ansi.enabled settings.  The engine contract is
    mode-independence — null-on-edge division/mod/cast(strict=False)
    semantics identical to the DuckDB oracle either way."""
    return request.param


@pytest.fixture()
def ansi_both(spark, ansi_mode):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", ansi_mode)
    yield ansi_mode
    spark.conf.set("spark.sql.ansi.enabled", old)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
