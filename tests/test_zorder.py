"""Z-order clustered layout (sources/sinks.py write_zorder, r11).

Contracts pinned here:
- content neutrality: the z-ordered copy is row-identical to the input;
- the layout actually CLUSTERS: a 2-D box predicate's row-group
  envelope intersection (parquet footer stats, measured with pyarrow —
  the same stats Spark's parquet reader prunes on) reads a strict
  minority of row groups, while the same box over a randomly-laid-out
  copy reads essentially all of them;
- pruning holds on EACH single dimension too (the property plain
  write_sorted only gives for its first key);
- the plan shape: one range exchange on the z key, no extra shuffles;
- quantile-bucketing handles skew (duplicate boundaries collapse) and
  the geometry guard rejects bits*dims > 60.
"""

import datetime
import os
import shutil

import pytest
from pyspark.sql import functions as F

import pydiverse_transform_spark as pdt
from pydiverse_transform_spark.sources.sinks import (
    rowgroup_pruning_stats,
    write_zorder,
    zorder_key,
)

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".tmp_test", "zorder")


@pytest.fixture(scope="module", autouse=True)
def _cleanup():
    shutil.rmtree(TMP, ignore_errors=True)
    yield
    shutil.rmtree(TMP, ignore_errors=True)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def layouts(spark, events):
    zo, raw = os.path.join(TMP, "zo"), os.path.join(TMP, "raw")
    t = pdt.Table(events)
    t >> write_zorder(zo, ["user_id", "ts"], bits=8, num_files=16)
    events.repartition(16).write.mode("overwrite").parquet(raw)
    return zo, raw


def _box(events):
    r = events.agg(
        F.min("user_id").alias("umn"), F.max("user_id").alias("umx"),
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("tmn"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("tmx"),
    ).collect()[0]
    lo_u = r.umn + (r.umx - r.umn) * 45 // 100
    hi_u = r.umn + (r.umx - r.umn) * 55 // 100
    epoch = datetime.datetime(1970, 1, 1)
    lo_t = epoch + datetime.timedelta(
        microseconds=r.tmn + (r.tmx - r.tmn) * 45 // 100)
    hi_t = epoch + datetime.timedelta(
        microseconds=r.tmn + (r.tmx - r.tmn) * 55 // 100)
    return lo_u, hi_u, lo_t, hi_t


def test_content_neutral(spark, events, layouts):
    zo, _ = layouts
    back = spark.read.parquet(zo)
    assert back.count() == events.count()
    assert back.exceptAll(events).count() == 0
    assert events.exceptAll(back).count() == 0


def test_2d_box_prunes(spark, events, layouts):
    zo, raw = layouts
    lo_u, hi_u, lo_t, hi_t = _box(events)
    pred = {"user_id": (lo_u, hi_u), "ts": (lo_t, hi_t)}
    s_zo = rowgroup_pruning_stats(zo, pred)
    s_raw = rowgroup_pruning_stats(raw, pred)
    # random layout: a 10% x 10% box intersects ~every row group
    assert s_raw["row_groups_read"] >= s_raw["row_groups_total"] - 1
    # z-ordered: strict minority
    assert s_zo["row_groups_read"] * 2 <= s_zo["row_groups_total"], s_zo
    assert s_zo["rows_read_upper_bound"] < s_zo["rows_total"] // 2


def test_single_dim_prunes_both_ways(spark, events, layouts):
    zo, _ = layouts
    lo_u, hi_u, lo_t, hi_t = _box(events)
    s_u = rowgroup_pruning_stats(zo, {"user_id": (lo_u, hi_u)})
    s_t = rowgroup_pruning_stats(zo, {"ts": (lo_t, hi_t)})
    assert s_u["row_groups_read"] < s_u["row_groups_total"], s_u
    assert s_t["row_groups_read"] < s_t["row_groups_total"], s_t


def test_filter_results_equal_raw(spark, events, layouts):
    zo, _ = layouts
    lo_u, hi_u, lo_t, hi_t = _box(events)
    cond = (F.col("user_id").between(lo_u, hi_u)
            & F.col("ts").between(F.lit(lo_t), F.lit(hi_t)))
    a = spark.read.parquet(zo).where(cond)
    b = events.where(cond)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0


def test_plan_one_range_exchange(spark, events):
    zdf, meta = zorder_key(events, ["user_id", "ts"], bits=6)
    staged = zdf.repartitionByRange(8, "__z").sortWithinPartitions("__z")
    plan = staged._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange rangepartitioning") == 1
    assert "Exchange hashpartitioning" not in plan
    assert meta["bits"] == 6 and set(meta["bounds"]) == {"user_id", "ts"}
    # bucket boundaries are distinct and sorted
    for c, bs in meta["bounds"].items():
        assert bs == sorted(bs) and len(bs) == len(set(bs))


def test_skewed_column_collapses_boundaries(spark):
    # 90% of the mass on one value: duplicate quantiles must collapse
    df = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id"))
        .cast("double").alias("x"),
        F.col("id").cast("double").alias("y"),
    )
    zdf, meta = zorder_key(df, ["x", "y"], bits=8)
    assert len(meta["bounds"]["x"]) < 255  # collapsed
    assert zdf.count() == 1000  # still total, no rows lost


def test_geometry_guard(spark, events):
    # per-dimension plan-size cap (r12): 2^bits quantile probes and
    # when-tree leaves per dim — a "legal 60-bit" call like bits=31 on
    # one dim must be rejected long before the interleave cap
    with pytest.raises(ValueError, match="1..12"):
        zorder_key(events, ["user_id", "ts"], bits=31)
    with pytest.raises(ValueError, match="1..12"):
        zorder_key(events, ["ts"], bits=20)
    # 6 dims x 12 bits = 72 > 60: the interleave cap still guards
    with pytest.raises(ValueError, match="60"):
        zorder_key(events, ["ts"] * 6, bits=12)
    with pytest.raises(ValueError, match="non-empty"):
        zorder_key(events, [], bits=8)


def test_compact_with_zorder(spark, events, tmp_path):
    from pydiverse_transform_spark.sources.sinks import compact_parquet

    frag = str(tmp_path / "frag")
    out = str(tmp_path / "zc")
    events.repartition(24).write.mode("overwrite").parquet(frag)
    # tiny target so the small fixture still yields enough output
    # files/row groups for pruning to be observable
    stats = compact_parquet(spark, frag, out,
                            target_file_bytes=4 << 10,
                            zorder_by=["user_id", "ts"])
    assert stats["files_before"] >= 24
    back = spark.read.parquet(out)
    assert back.exceptAll(events).count() == 0
    assert events.exceptAll(back).count() == 0
    lo_u, hi_u, lo_t, hi_t = _box(events)
    s = rowgroup_pruning_stats(
        out, {"user_id": (lo_u, hi_u), "ts": (lo_t, hi_t)})
    assert s["row_groups_read"] * 2 <= s["row_groups_total"], s


def test_compact_zorder_rejects_conflicting_layouts(spark, events,
                                                    tmp_path):
    import pytest as _pytest

    from pydiverse_transform_spark.sources.sinks import compact_parquet

    frag = str(tmp_path / "frag2")
    events.limit(100).write.mode("overwrite").parquet(frag)
    with _pytest.raises(ValueError, match="mutually exclusive"):
        compact_parquet(spark, frag, str(tmp_path / "x"),
                        zorder_by=["user_id"], shuffle=True)
