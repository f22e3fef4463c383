"""Capture .explain('formatted') for bench queries into
plans/r15/<query>_<suffix>.txt (suffix 'before'/'after' from argv).

Usage: python scripts/capture_plans_r15.py before [query ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from bench import BENCH_QUERIES

    suffix = sys.argv[1]
    names = sys.argv[2:] or BENCH_QUERIES

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pdt-plans")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.warehouse.dir",
                os.path.join(here, ".tmp_stream", "warehouse"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", f"{name}_{suffix}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
