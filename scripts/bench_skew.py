"""Measured evidence for the skew toolkit (extras/skew.py): time a
shuffled equi-join where ONE key owns most of the probe side, naive vs
salted, with AQE and auto-broadcast disabled (the regime the toolkit
targets: mid-size build side, known hot key, deterministic plan wanted).

Measured regime note: the salted plan wins once the hot key's single
reducer task dominates the stage (here 60% of 40M rows on one key;
n_salt should be ~= the cluster's parallelism).  At mild skew the
n_salt-fold build-side replication costs more than the straggler saves
— detect first with heavy_hitters(), then salt.

Prints one JSON line:
  {"metric": "skew_join_speedup", "naive_sec": ..., "salted_sec": ...,
   "speedup": ..., "rows": N, "hot_fraction": 0.6, "n_salt": 32}

Run SOLO (no concurrent Spark/pytest on the box) — shared cores inflate
timings 3-6x.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras.skew import salted_join

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = int(os.environ.get("SKEW_BENCH_ROWS", 40_000_000))
HOT_FRACTION = 0.6
N_SALT = int(os.environ.get("SKEW_BENCH_SALT", 32))


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-skew")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    hot = int(N * HOT_FRACTION)
    # probe: one hot key (0) + uniform cold tail; build: 200k keys with
    # a few payload columns — too big to broadcast by policy above
    left = spark.range(N).select(
        F.when(F.col("id") < hot, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(199_999)) + 1)
        .alias("k"),
        (F.col("id") % 1000).alias("lv"),
    )
    right = spark.range(200_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("rv"),
    )

    def timed(df):
        t0 = time.time()
        # count() drains the join without collecting rows to the driver
        n = df.select(F.count(F.lit(1))).collect()[0][0]
        return time.time() - t0, n

    # warm both inputs once (JIT + file-free, purely generated)
    left.select(F.count(F.lit(1))).collect()
    right.select(F.count(F.lit(1))).collect()

    # min-of-2 each, interleaved, so neither side gets the cold JVM
    naive = left.join(right, on=["k"], how="inner")
    salted = salted_join(left, right, on=["k"], n_salt=N_SALT, how="inner")
    naive_t, n1 = timed(naive)
    salted_t, n2 = timed(salted)
    naive_t = min(naive_t, timed(naive)[0])
    salted_t = min(salted_t, timed(salted)[0])
    assert n1 == n2, (n1, n2)

    spark.stop()
    print(json.dumps({
        "metric": "skew_join_speedup",
        "naive_sec": round(naive_t, 3),
        "salted_sec": round(salted_t, 3),
        "speedup": round(naive_t / salted_t, 2),
        "rows": N,
        "hot_fraction": HOT_FRACTION,
        "n_salt": N_SALT,
        "joined_rows": n1,
    }))


if __name__ == "__main__":
    main()
