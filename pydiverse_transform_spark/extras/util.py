"""Shared helpers for the extras operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fan_out", "plan_size_bytes", "SMALL_CORPUS_BYTES"]


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Guarantee enough partitions before heavy narrow per-row compute
    (shingling, minhashing, per-token scans, vector math).

    A small input — one parquet file, or one unsplittable row group —
    arrives as a single split, which serializes the expensive map stage
    on one core even on a 32-core machine.  At the 100-TB target the
    input has thousands of splits and this probe is a no-op: we only
    repartition when the current partition count is below the cluster's
    default parallelism, so no gratuitous shuffle of raw text is ever
    added on large inputs.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# below this estimated (compressed) input size, pipelines that would
# otherwise re-scan the corpus may persist an intermediate projection
# instead; above it, the scalable no-materialization path is used.
SMALL_CORPUS_BYTES = 2 << 20


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for the optimized plan — free
    (no job), the same statistic AQE uses for broadcast decisions."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:
        return 1 << 62  # unknown -> assume large (the scalable path)


def bind(col: Column, body) -> Column:
    """Let-expression for array/struct pipelines: evaluate ``col`` ONCE
    and hand the bound value to ``body`` (transform over a
    single-element struct array — the lambda variable holds the
    evaluated result).

    Why it exists: higher-order functions are interpreted, so a
    COMPUTED subexpression captured inside their lambda re-evaluates
    for every element — a shingle builder that slices a captured
    ``split(...)`` re-tokenizes the document per shingle, O(n_words^2)
    regexp work per doc (measured 27 s vs ~1 s per pass on the bigram
    LM path at 5k docs).  Column references are cheap to capture;
    computed trees are not — bind them."""
    return F.element_at(
        F.transform(F.array(F.struct(col.alias("v"))),
                    lambda s: body(s["v"])),
        1,
    )
