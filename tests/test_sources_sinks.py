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
