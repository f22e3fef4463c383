"""Cell-assignment cost sweep over k (r7 verdict #2 evidence).

Measures wall-clock and plan size for assign_cells' strategies at
k in {64, 1024, 8192} on the sf embeddings table, materialized with the
noop sink.  Shows that the numpy (broadcast-matrix mapInPandas) path's
PLAN stays flat in k and its per-row cost grows only with the BLAS
matmul (k*dim FLOPs), while the literal path's plan grows ~linearly in
k*dim and its interpreted fold cost explodes — i.e. why literal is
capped at max_literal_k and SemDeDup's "raise k until a cell fits a
task" rule is now viable to the paper's ~110k cells.

Usage: python scripts/assign_sweep.py [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    import numpy as np
    from pyspark.sql import SparkSession

    from pydiverse_transform_spark.extras import similarity as sim

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("assign-sweep")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .select("vec_id", "embedding")
    n_rows = emb.count()
    rng = np.random.default_rng(7)

    def run(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    results = []
    for k in (64, 1024, 8192):
        cents = rng.random((k, 64)).tolist()
        row = {"k": k, "n_rows": n_rows}
        for method in ("literal", "numpy", "join"):
            if method == "literal" and k > 1024:
                row[method] = None  # interpreted fold + plan literal:
                continue            # the exact ceiling being retired
            kw = {"id_col": "vec_id"} if method == "join" else {}
            df = sim.assign_cells(emb, cents, method=method, **kw)
            plan_chars = len(df._jdf.queryExecution()
                             .optimizedPlan().toString())
            times = [run(df) for _ in range(2)]
            row[method] = {
                "sec": min(times),
                "us_per_row": round(min(times) / n_rows * 1e6, 2),
                "plan_chars": plan_chars,
            }
        results.append(row)
        print(json.dumps(row))
    spark.stop()
    out = {"sf_dir": SF_DIR, "cpus": int(CPUS), "sweep": results}
    path = sys.argv[1] if len(sys.argv) > 1 else None
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
