"""Pre-flight the driver contract: run every ``__spark_entry__.queries()``
entry at sf0.01 and compare against its ``oracle_sql()`` with the same
row-count + schema + order-insensitive value-hash check the driver uses.

Run manually (not collected by pytest):

    python tests/preflight_contract.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_util import compare, duckdb_con  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.warehouse.dir",
                os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), ".tmp_stream",
                    "warehouse"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    import __spark_entry__ as se

    qs = se.queries()
    oracles = se.oracle_sql()
    con = duckdb_con(sf_dir)

    n_ok = n_bad = n_weak = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            sql = oracles.get(name)
            if sql is None:
                cnt = df.count()
                n_weak += 1
                print(f"  WEAK {name}: rows-only ({cnt} rows) "
                      f"[{time.time()-t0:.1f}s]")
                continue
            ok, msg = compare(df, con, sql, name)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"{name}: EXCEPTION {type(e).__name__}: {e}"
        if ok:
            n_ok += 1
            print(f"  OK   {msg} [{time.time()-t0:.1f}s]")
        else:
            n_bad += 1
            failures.append(msg)
            print(f"  FAIL {msg} [{time.time()-t0:.1f}s]")

    extra_oracles = set(oracles) - set(qs)
    if extra_oracles:
        print(f"!! oracle_sql keys with no query: {sorted(extra_oracles)}")

    print(f"\n{n_ok} ok, {n_weak} weak (rows-only), {n_bad} failed "
          f"of {len(qs)} queries")
    if failures:
        print("\nFailures:")
        for f in failures:
            print(" -", f)
        sys.exit(1)


if __name__ == "__main__":
    main()
