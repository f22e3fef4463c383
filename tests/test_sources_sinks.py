"""Round-trip tests for every file/catalog source and sink."""

import os
import shutil

import pytest

import pydiverse_transform_spark as pdt

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".tmp_test", "sources")


@pytest.fixture(scope="module", autouse=True)
def _cleanup():
    shutil.rmtree(TMP, ignore_errors=True)
    yield
    shutil.rmtree(TMP, ignore_errors=True)


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return pdt.read_parquet(spark, f"{sf_dir}/nation.parquet")


def _pdf(t):
    return (t >> pdt.export(pdt.Pandas)).sort_values("n_nationkey") \
        .reset_index(drop=True)


def test_csv_roundtrip(spark, nation):
    path = os.path.join(TMP, "nation_csv")
    nation >> pdt.write_csv(path, mode="overwrite")
    back = pdt.read_csv(spark, path)
    assert _pdf(back)["n_name"].tolist() == _pdf(nation)["n_name"].tolist()


def test_json_roundtrip(spark, nation):
    path = os.path.join(TMP, "nation_json")
    nation >> pdt.write_json(path, mode="overwrite")
    back = pdt.read_json(spark, path)
    assert _pdf(back)["n_name"].tolist() == _pdf(nation)["n_name"].tolist()


def test_orc_roundtrip(spark, nation):
    path = os.path.join(TMP, "nation_orc")
    nation >> pdt.write_orc(path, mode="overwrite")
    back = pdt.read_orc(spark, path)
    assert _pdf(back)["n_name"].tolist() == _pdf(nation)["n_name"].tolist()


def test_catalog_roundtrip(spark, nation):
    from test_bucketed_join import _fresh_table

    _fresh_table(spark, "nation_cat_test")
    nation >> pdt.save_as_table("nation_cat_test", mode="overwrite")
    back = pdt.read_table(spark, "nation_cat_test")
    assert _pdf(back)["n_name"].tolist() == _pdf(nation)["n_name"].tolist()
    spark.sql("DROP TABLE IF EXISTS nation_cat_test")


def test_from_rows_and_polars(spark):
    t = pdt.from_rows(spark, [(1, "a"), (2, "b")], schema=["k", "v"])
    assert (t >> pdt.export(pdt.Pandas))["v"].tolist() == ["a", "b"]
    try:
        import polars as pl
    except ImportError:
        pytest.skip("polars not installed")
    t2 = pdt.from_polars(spark, pl.DataFrame({"x": [1, 2, 3]}))
    assert sorted((t2 >> pdt.export(pdt.Polars))["x"].to_list()) == [1, 2, 3]


# --------------------------------------------------------------------------
# r6: compaction + manifest
# --------------------------------------------------------------------------

def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    from pydiverse_transform_spark.sources.sinks import (
        _hadoop_files,
        compact_parquet,
    )

    src = str(tmp_path / "frag")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(24).write.parquet(src)
    before = _hadoop_files(spark, src)
    assert len(before) >= 24
    out = str(tmp_path / "compact")
    stats = compact_parquet(spark, src, out,
                            target_file_bytes=1 << 40)  # everything -> 1
    after = _hadoop_files(spark, out)
    assert stats["n_files_target"] == 1 and len(after) == 1
    assert spark.read.parquet(out).count() == docs.count()
    # the coalesce path must not shuffle
    df = spark.read.parquet(src).coalesce(1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_compact_parquet_partitioned_layout(spark, sf_dir, tmp_path):
    from pydiverse_transform_spark.sources.sinks import (
        _hadoop_files,
        compact_parquet,
    )

    src = str(tmp_path / "bylang")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(16).write.partitionBy("lang").parquet(src)
    n_before = len(_hadoop_files(spark, src))
    out = str(tmp_path / "bylang_c")
    compact_parquet(spark, src, out, target_file_bytes=1 << 40,
                    partition_by=["lang"])
    n_after = len(_hadoop_files(spark, out))
    assert n_after < n_before
    got = spark.read.parquet(out)
    assert got.count() == docs.count()
    assert set(got.select("lang").distinct().toPandas()["lang"]) == \
        set(docs.select("lang").distinct().toPandas()["lang"])


def test_compact_refuses_in_place(spark, sf_dir, tmp_path):
    import pytest as _pytest

    from pydiverse_transform_spark.sources.sinks import compact_parquet

    src = str(tmp_path / "x")
    spark.read.parquet(f"{sf_dir}/documents.parquet").write.parquet(src)
    with _pytest.raises(ValueError, match="out_path must differ"):
        compact_parquet(spark, src, src)


def test_write_manifest_sidecar(spark, sf_dir, tmp_path):
    import json
    import os

    from pydiverse_transform_spark.sources.sinks import write_manifest

    src = str(tmp_path / "man")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.write.partitionBy("lang").parquet(src)
    man = write_manifest(spark, src, partition_cols=["lang"])
    assert man["n_rows"] == docs.count()
    assert man["n_files"] >= 1 and man["total_bytes"] > 0
    per = {p["values"]["lang"]: p["n_rows"] for p in man["partitions"]}
    want = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").count().withColumnRenamed("count", "n")
            .collect()}
    assert per == {k: v for k, v in want.items()}
    # sidecar exists and is scan-invisible
    assert os.path.exists(os.path.join(src, "_manifest.json"))
    loaded = json.load(open(os.path.join(src, "_manifest.json")))
    assert loaded["n_rows"] == man["n_rows"]
    assert spark.read.parquet(src).count() == docs.count()


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """write_jdbc -> read_jdbc through Spark's bundled embedded Derby
    (r9, VERDICT r8 stretch #8): values, types wide enough for the
    content, and mode='overwrite' re-runs must all hold.  Embedded
    Derby is single-JVM — the local-mode test shape; write_jdbc's
    docstring carries the cluster contract."""
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    t = pdt.read_parquet(spark, "/root/testdata/sf0.001/nation.parquet")
    t >> pdt.write_jdbc(url, "nation_rt", mode="overwrite", **props)
    back = pdt.read_jdbc(spark, url, "nation_rt", **props)
    got = (back >> pdt.arrange(back.n_nationkey)
           >> pdt.export(pdt.DictOfLists))
    want = (t >> pdt.arrange(t.n_nationkey)
            >> pdt.export(pdt.DictOfLists))
    assert got == want
    # overwrite drops + recreates: a second write is not an append
    t >> pdt.write_jdbc(url, "nation_rt", mode="overwrite", **props)
    n = pdt.read_jdbc(spark, url, "nation_rt", **props) \
        >> pdt.summarize(n=pdt.C.n_nationkey.count()) \
        >> pdt.export(pdt.Scalar)
    assert n == 25
    # mode='error' on an existing table raises
    with pytest.raises(Exception, match="(?i)exists|SaveMode"):
        t >> pdt.write_jdbc(url, "nation_rt", **props)


def test_jdbc_partitioned_read(spark, tmp_path):
    """Partitioned read_jdbc (r10, VERDICT r9 next #7): the four
    partitioning options fan the read out into num_partitions
    range-predicated tasks (the single-stream read was the r9 gap);
    rows outside the bounds still arrive, in the edge partitions."""
    url = f"jdbc:derby:{tmp_path}/pdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    t = pdt.read_parquet(spark, "/root/testdata/sf0.001/supplier.parquet")
    t >> pdt.write_jdbc(url, "supplier_p", mode="overwrite", **props)
    back = pdt.read_jdbc(
        spark, url, "supplier_p",
        partition_column="s_suppkey", lower_bound=3, upper_bound=8,
        num_partitions=4, **props)
    df = back >> pdt.export(pdt.Spark)
    assert df.rdd.getNumPartitions() == 4
    # bounds steer stride only — the full table round-trips
    want = (t >> pdt.arrange(t.s_suppkey) >> pdt.export(pdt.DictOfLists))
    got = (back >> pdt.arrange(back.s_suppkey)
           >> pdt.export(pdt.DictOfLists))
    assert got == want
    # incomplete partitioning spec fails loudly, not silently serial
    with pytest.raises(ValueError, match="together"):
        pdt.read_jdbc(spark, url, "supplier_p",
                      partition_column="s_suppkey", **props)
