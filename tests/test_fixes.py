"""Regression tests for the round-2 defect fixes (VERDICT r1 / ADVICE)."""

import datetime as dt

import pytest

import pydiverse_transform_spark as pdt
from pydiverse_transform_spark import C


def _tbl(spark, data: dict, name="t"):
    return pdt.from_dict(spark, data, name=name)


# 1. validate= join must be lazy (no Spark job at build) and fail at
#    execution when the cardinality is violated
def test_validate_join_lazy_and_failing(spark):
    left = _tbl(spark, {"k": [1, 2, 2], "a": [10, 20, 21]}, "l")
    right = _tbl(spark, {"k": [1, 2], "b": [100, 200]}, "r")

    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    joined = left >> pdt.inner_join(right, on=left.k == right.k,
                                    validate="1:m")
    jobs_after = len(tracker.getJobIdsForGroup(None) or [])
    assert jobs_after == jobs_before, "building a validated join ran a job"

    with pytest.raises(Exception, match="duplicate keys on left side"):
        joined >> pdt.export(pdt.Pandas)

    # the passing direction executes fine
    ok = left >> pdt.inner_join(right, on=left.k == right.k, validate="m:1")
    pdf = ok >> pdt.export(pdt.Pandas)
    assert len(pdf) == 3


def test_validate_join_1_1_ok(spark):
    a = _tbl(spark, {"k": [1, 2, 3], "a": [1, 2, 3]}, "a")
    b = _tbl(spark, {"k": [1, 2, 3], "b": [4, 5, 6]}, "b")
    out = (
        a >> pdt.inner_join(b, on=a.k == b.k, validate="1:1")
        >> pdt.export(pdt.Pandas)
    )
    assert len(out) == 3


# 2. bare order-dependent window ops raise instead of silently being
#    nondeterministic
def test_bare_window_requires_order(spark):
    t = _tbl(spark, {"a": [3, 1, 2]})
    with pytest.raises(ValueError, match="requires an ordering"):
        t >> pdt.mutate(rn=pdt.row_number(arrange=[])) >> pdt.export(pdt.Pandas)
    with pytest.raises(ValueError, match="requires an ordering"):
        t >> pdt.mutate(cs=t.a.cum_sum()) >> pdt.export(pdt.Pandas)
    # with an explicit arrange it works
    out = (
        t >> pdt.mutate(cs=t.a.cum_sum(arrange=[t.a]))
        >> pdt.export(pdt.Pandas)
    )
    assert sorted(out["cs"]) == [1, 3, 6]
    # a preceding arrange() verb also provides the ordering
    out2 = (
        t >> pdt.arrange(t.a) >> pdt.mutate(cs=t.a.cum_sum())
        >> pdt.export(pdt.Pandas)
    )
    assert sorted(out2["cs"]) == [1, 3, 6]


# 3. is_in with zero values is vacuously false (not a crash)
def test_is_in_empty(spark):
    t = _tbl(spark, {"a": [1, 2, None]})
    out = t >> pdt.mutate(x=t.a.is_in()) >> pdt.export(pdt.Pandas)
    assert (out["x"] == False).all()  # noqa: E712


def test_is_in_null_semantics(spark):
    t = _tbl(spark, {"a": [1.0, 2.0, None]})
    out = (
        t >> pdt.mutate(x=t.a.is_in(pdt.lit(1.0), pdt.lit(9.0)))
        >> pdt.export(pdt.Pandas)
    )
    vals = out["x"].tolist()
    assert vals[0] == True and vals[1] == False  # noqa: E712
    assert vals[2] is None or vals[2] != vals[2]  # null propagates


# 4. alias keeps computed-expression sort keys as the default window order
def test_alias_keeps_expr_order(spark):
    t = _tbl(spark, {"a": [1, 3, 2], "b": [10, 0, 5]})
    t2 = t >> pdt.arrange(t.a + t.b) >> pdt.alias("t2")
    out = t2 >> pdt.mutate(rn=pdt.row_number(arrange=[])) \
        >> pdt.export(pdt.Pandas)
    by_rn = out.sort_values("rn")
    assert by_rn["a"].tolist() == [3, 2, 1]  # a+b = 3, 7, 11


# 5. lit with explicit dtype is physically cast
def test_lit_explicit_dtype(spark):
    t = _tbl(spark, {"a": [1, 2]})
    out = (
        t >> pdt.mutate(x=pdt.lit(1, pdt.Float64()))
        >> pdt.export(pdt.Spark)
    )
    assert dict(out.dtypes)["x"] == "double"


# 6. summarize rejects bare columns mixed into aggregate expressions
def test_summarize_mixed_bare_col_rejected(spark):
    t = _tbl(spark, {"g": [1, 1, 2], "a": [1, 2, 3], "b": [4, 5, 6]})
    with pytest.raises(ValueError, match="outside an aggregate"):
        t >> pdt.group_by(t.g) >> pdt.summarize(x=t.a.sum() + t.b)
    # aggregate-of-expression is fine
    out = (
        t >> pdt.group_by(t.g) >> pdt.summarize(x=(t.a + t.b).sum())
        >> pdt.export(pdt.Pandas)
    )
    assert sorted(out["x"]) == [9, 12]


# 7. join suffix collision against existing right-side names
def test_join_suffix_collision(spark):
    left = _tbl(spark, {"x": [1, 2]}, "l")
    right = pdt.from_dict(
        spark, {"x": [1, 2], "x_r": [7, 8], "k": [1, 2]}, name="r"
    )
    out = (
        left >> pdt.inner_join(right, on=left.x == right.k, suffix="_r")
        >> pdt.export(pdt.Pandas)
    )
    assert len(set(out.columns)) == len(out.columns), out.columns


# 8. negative epoch microseconds reconstruct the correct NTZ timestamp
def test_ntz_from_epoch_us_negative(spark):
    import pyspark.sql.functions as F

    from pydiverse_transform_spark.extras.events import ntz_from_epoch_us

    df = spark.range(1).select(
        ntz_from_epoch_us(F.lit(-1).cast("long")).alias("a"),
        ntz_from_epoch_us(F.lit(-86_400_000_000).cast("long")).alias("b"),
        ntz_from_epoch_us(F.lit(1).cast("long")).alias("c"),
    )
    row = df.collect()[0]
    assert row["a"] == dt.datetime(1969, 12, 31, 23, 59, 59, 999999)
    assert row["b"] == dt.datetime(1969, 12, 31, 0, 0, 0)
    assert row["c"] == dt.datetime(1970, 1, 1, 0, 0, 0, 1)


# 9. collect materializes and stays usable with captured references
def test_collect_keeps_refs(spark):
    t = _tbl(spark, {"a": [1, 2, 3]})
    t2 = t >> pdt.mutate(b=t.a * 2) >> pdt.collect()
    out = t2 >> pdt.filter(t.a > 1) >> pdt.export(pdt.Pandas)
    assert out["b"].tolist() == [4, 6]


# 10. Enum cast validates membership
def test_enum_cast(spark):
    t = _tbl(spark, {"s": ["a", "b", "x", None]})
    ok = (
        t >> pdt.mutate(e=t.s.cast(pdt.types.Enum("a", "b"), strict=False))
        >> pdt.export(pdt.Pandas)
    )
    assert ok["e"].tolist()[:2] == ["a", "b"]
    assert ok["e"].isna().tolist() == [False, False, True, True]
    strict = t >> pdt.mutate(e=t.s.cast(pdt.types.Enum("a", "b")))
    with pytest.raises(Exception, match="invalid value 'x'"):
        strict >> pdt.export(pdt.Pandas)


# 11. the two minhash verification strategies produce identical pairs
def test_minhash_strategies_agree(spark, sf_dir):
    from pydiverse_transform_spark.extras import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    small = dedup.minhash_dedup_pairs(docs, persist_shingles=True)
    big = dedup.minhash_dedup_pairs(docs, persist_shingles=False)
    rows = lambda df: sorted(map(tuple, df.collect()))
    assert rows(small) == rows(big)
    assert small.columns == big.columns


# 12. (ADVICE r5) NULL text fingerprints like '' — NULL/empty/whitespace
# docs dedup into ONE explicitly-keyed group instead of silently
# collapsing under a NULL group key
def test_exact_dedup_null_text_is_empty(spark):
    from pydiverse_transform_spark.extras import dedup

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "real doc"), (5, None)],
        "doc_id int, text string",
    )
    # NULL and '' share fp(md5('')); '   ' normalizes to ' ' (own group)
    rows = dedup.exact_dedup_rows(df, "text", "doc_id").collect()
    assert sorted(r.doc_id for r in rows) == [1, 3, 4]
    agg = {r.doc_id: r.n_copies
           for r in dedup.exact_dedup(df, "text", "doc_id").collect()}
    assert agg == {1: 3, 3: 1, 4: 1}
    # the group key is a real md5, never NULL
    from pyspark.sql import functions as F
    from pydiverse_transform_spark.extras.text import fingerprint
    fps = df.select(fingerprint(F.col("text")).alias("fp")).collect()
    assert all(r.fp is not None for r in fps)
