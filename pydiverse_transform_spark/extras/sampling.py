"""Deterministic sampling / splitting / mixing for training-data
pipelines.

Everything here is keyed on ``md5(id || salt)`` rather than Spark's
seed-based ``df.sample`` because at 100 TB the sampling decision must be

- **reproducible**: re-running the pipeline (or recovering a failed
  task) must select the SAME rows — seed-based Bernoulli sampling
  depends on partition layout, hash sampling depends only on the row;
- **portable**: the same rows are selected by any engine with md5, so
  the selection is oracle-checkable and downstream consumers can verify
  a split without Spark;
- **stable under data growth**: a row's split assignment never changes
  when other rows are added/removed (critical for train/test hygiene —
  a test document must never silently migrate into train).

The uniformity source is the first 8 hex chars of md5 → a 32-bit int →
``u/2^32 ∈ [0,1)`` (reference analogue: the reference has no sampling
surface; this extends it for the LLM-pipeline target per SURVEY §7).

All pure Catalyst expressions — no UDFs, no shuffles beyond what the
caller's plan already has: sampling is a pushable filter, splitting is a
projection.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_uniform",
    "hash_sample",
    "hash_split",
    "stratified_sample",
    "weighted_mix",
    "topk_per_group",
    "pack_sequences",
    "deterministic_shuffle",
    "filter_by_quantile",
    "take_token_budget",
]

_U32 = float(1 << 32)

# Above this Catalyst size estimate, an UNPARTITIONED ordered window
# (pack_sequences / take_token_budget / filter_by_quantile(exact=True)
# with partition_by=None) is flagged: a global ordered window funnels the
# whole input through ONE reducer, which is fine for a dev-sized table
# and a cliff at corpus scale.  1 GiB ~ the point where a single sort
# task stops being obviously cheap.
UNPARTITIONED_WINDOW_WARN_BYTES = 1 << 30


def _warn_global_window(df: DataFrame, fn_name: str) -> None:
    """Enforce the "partition_by REQUIRED at scale" contract of the
    global-ordered-window operators: warn when the input's Catalyst size
    estimate exceeds :data:`UNPARTITIONED_WINDOW_WARN_BYTES` (the same
    free statistic AQE uses for broadcast decisions — no job runs).
    Stats-unknown inputs (RDD-backed frames from ``createDataFrame`` —
    driver-created, so small by construction; every file/table scan at
    corpus scale carries stats) are exempt."""
    from .util import plan_size_bytes

    size = plan_size_bytes(df)
    if size >= (1 << 62):  # unknown: driver-created input, not a scan
        return
    if size > UNPARTITIONED_WINDOW_WARN_BYTES:
        warnings.warn(
            f"{fn_name}: partition_by=None builds ONE global ordered "
            f"window over an input whose plan-size estimate is {size} "
            "bytes — a single-reducer funnel at scale. Pass partition_by "
            "to shard the work (e.g. by source/lang), or ignore this for "
            "known-small inputs.",
            ResourceWarning,
            stacklevel=3,
        )


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic uniform [0,1) from a row key.

    DuckDB-equivalent (used by every oracle below)::

        ('0x' || substr(md5(key || salt), 1, 8))::BIGINT / 4294967296.0
    """
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(_U32))


def hash_sample(df: DataFrame, fraction: float, key_col: str,
                salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by row-key hash.

    A plain filter: scales as a map-only stage, combines with predicate
    pushdown (the md5 itself can't push into parquet, but every OTHER
    filter in the plan still does), and never reshuffles.  Change
    ``salt`` to draw an independent sample."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_uniform(F.col(key_col), salt) < F.lit(fraction))


def hash_split(df: DataFrame, weights: dict[str, float], key_col: str,
               salt: str = "", split_col: str = "split") -> DataFrame:
    """Assign every row to exactly one named split (train/val/test, ...)
    by cumulative hash ranges.  Weights must sum to 1 (±1e-9).

    A projection — zero shuffles; the assignment of a row is permanent
    under appends, deletes, repartitioning, and engine changes."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = hash_uniform(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        branch = F.when(u < F.lit(acc), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(acc),
                                                     F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def stratified_sample(df: DataFrame, fractions: dict, stratum_col: str,
                      key_col: str, salt: str = "",
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum hash sampling (e.g. keep 100% of rare languages, 1%
    of the dominant one).  Still a pure filter — no groupBy, no count
    pass, no sampleByKey job: the per-stratum threshold is a CASE
    expression, so one map stage regardless of stratum count."""
    u = hash_uniform(F.col(key_col), salt)
    thr = None
    for stratum, frac in fractions.items():
        cond = F.col(stratum_col) == F.lit(stratum)
        thr = (F.when(cond, F.lit(float(frac))) if thr is None
               else thr.when(cond, F.lit(float(frac))))
    thr = (F.lit(float(default_fraction)) if thr is None
           else thr.otherwise(F.lit(float(default_fraction))))
    return df.filter(u < thr)


def weighted_mix(sources: list[tuple[DataFrame, float]], key_col: str,
                 salt: str = "", source_col: str | None = None
                 ) -> DataFrame:
    """Mix datasets by per-source sampling rates then UNION ALL —
    the standard training-mixture recipe (e.g. 3 epochs of wiki = rate
    1.0 three salts, 0.3 of web crawl).  Rates are per-source keep
    fractions, not normalized shares.  Plan: N filtered scans + a
    metadata-only union, zero shuffles."""
    parts = []
    for i, (df, rate) in enumerate(sources):
        part = hash_sample(df, rate, key_col, salt=f"{salt}#{i}")
        if source_col is not None:
            part = part.withColumn(source_col, F.lit(i))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def topk_per_group(df: DataFrame, group_cols: list[str],
                   order_col: str, k: int, descending: bool = True,
                   tiebreak_col: str | None = None) -> DataFrame:
    """Keep the top-k rows per group (e.g. k best-quality docs per
    domain).  ONE hash-partition shuffle on the group key; the rank
    filter is applied before anything downstream, so only k·groups rows
    survive the stage.  ``tiebreak_col`` makes the cut deterministic
    when ``order_col`` has ties (always supply one for reproducible
    pipelines)."""
    from pyspark.sql import Window

    order = [F.col(order_col).desc() if descending
             else F.col(order_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def pack_sequences(df: DataFrame, token_col: str, *, budget: int,
                   order_by: str, partition_by: str | None = None
                   ) -> DataFrame:
    """Concat-and-split sequence packing: documents are laid out in
    ``order_by`` order and cut into bins of ``budget`` tokens — each row
    gets ``bin_id`` (which context window it starts in) and ``bin_pos``
    (its token offset inside that bin).  This is the deterministic
    streaming packing used for LLM pre-training batches (greedy
    first-fit would need stateful iteration; concat-and-split is a pure
    window cum-sum and packs equally tightly when documents are chunked
    to <= budget first).

    ``partition_by`` shards the packing (e.g. by source): REQUIRED at
    scale — an unpartitioned ordered window funnels through a single
    reducer, fine only below ~10M rows (enforced: a ``ResourceWarning``
    fires when the input's size estimate exceeds
    :data:`UNPARTITIONED_WINDOW_WARN_BYTES`).  Within a shard the
    layout is one shuffle on the shard key.
    """
    if partition_by is None:
        _warn_global_window(df, "pack_sequences")
    w = Window.orderBy(order_by) if partition_by is None else \
        Window.partitionBy(partition_by).orderBy(order_by)
    before = F.coalesce(
        F.sum(token_col).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return df.withColumns({
        "bin_id": F.floor(before / F.lit(budget)).cast("long"),
        "bin_pos": (before % F.lit(budget)).cast("long"),
    })


def deterministic_shuffle(df: DataFrame, key_col: str, salt: str = "",
                          n_shards: int = 256,
                          tiebreak_col: str | None = None) -> DataFrame:
    """Deterministic global shuffle for training-corpus ordering: every
    row gets a ``(shard, shard_pos)`` address, where ``shard`` is the
    first byte-pair of ``md5(key || salt)`` (mod ``n_shards``) and
    ``shard_pos`` ranks rows within the shard by the full hash.  Reading
    shards in order (shard asc, shard_pos asc) yields the same
    pseudo-random permutation on ANY engine and any partitioning —
    unlike ``df.orderBy(rand())``, which changes per run, or a global
    ``row_number()`` over the hash, which funnels 100 TB through ONE
    reducer.

    Scale shape: one hash-partition shuffle on ``shard`` (bounded,
    uniform md5 buckets), per-shard sort inside the window — each shard
    sorts ~1/n_shards of the corpus in parallel.  Raise ``n_shards`` so
    a shard fits an executor's spill budget (256 shards × ~400 GB at
    100 TB; 4096 for tighter memory).

    Determinism contract: ``key_col`` values must be UNIQUE per row, or
    a ``tiebreak_col`` must be given — duplicate keys hash identically,
    so their relative ``shard_pos`` would otherwise be engine/run
    dependent.  This is ENFORCED: without ``tiebreak_col``, a duplicate
    key fails the job at runtime (the check is a ``lag`` over the same
    shard window — duplicate keys sort adjacent — so it adds no shuffle
    and no extra job).  With ``tiebreak_col``, ties order by it (it
    must make ``(key_col, tiebreak_col)`` unique).  NULL keys hash the
    same as the empty string prefixed with a sentinel
    (``md5(concat(NULL, ...))`` would be NULL and silently drop the row
    out of the ordering).
    """
    if n_shards < 1 or n_shards > 65536:
        raise ValueError(f"n_shards must be in [1, 65536], got {n_shards}")
    key_s = F.coalesce(F.col(key_col).cast("string"), F.lit("\x00null"))
    h = F.md5(F.concat(key_s, F.lit(salt)))
    shard = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
             % F.lit(n_shards))
    order = [F.col("__h").asc(), F.col(key_col).asc_nulls_first()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc_nulls_first())
    w = Window.partitionBy("shard").orderBy(*order)
    pos = F.row_number().over(w).cast("long")
    if tiebreak_col is None:
        # Duplicate keys share a hash, land in the same shard, and sort
        # adjacent under (__h, key) — one lag over the SAME window spec
        # detects them without an extra shuffle.  Folding the assert
        # into shard_pos keeps Catalyst from pruning it away.
        dup = F.lag("__h").over(w).eqNullSafe(F.col("__h"))
        guard = F.assert_true(
            ~dup,
            F.concat(
                F.lit("deterministic_shuffle: duplicate value in "
                      f"key_col {key_col!r} ("),
                F.col(key_col).cast("string"),
                F.lit(") — shard_pos would be engine/run dependent; "
                      "pass tiebreak_col to break ties deterministically"),
            ),
        )
        pos = F.when(guard.isNull(), pos)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("shard_pos", pos)
        .drop("__h")
    )


def filter_by_quantile(df: DataFrame, score_col: str,
                       min_quantile: float,
                       partition_by: list[str] | None = None,
                       exact: bool = True,
                       approx_accuracy: int = 10000,
                       keep_quantile_col: bool = False) -> DataFrame:
    """Quality-gate a corpus by score percentile: keep rows whose
    ``score_col`` is at or above the group's ``min_quantile``-th
    DISCRETE quantile — the smallest score ``t`` in the group such that
    at least ``min_quantile`` of the group's rows have score <= ``t``
    (e.g. drop the bottom 30% quality per language:
    ``filter_by_quantile(docs, "quality", 0.3, ["lang"])``).

    ONE keep-semantics for both physical strategies — the cut is always
    a value threshold, ``score >= t``, so **ties at the threshold are
    kept** (a boundary tie-group survives or is dropped as a unit, never
    split by arbitrary rank order), a singleton group always keeps its
    row for any ``min_quantile`` (its only score IS the group's every
    quantile), and a group minimum survives whenever ``min_quantile``
    rounds down to it.  Two physical paths to the same contract:

    - ``exact=True``: the threshold is rank-exact, computed with
      ``cume_dist()`` over the group (``t = min score with cume_dist >=
      q`` — exactly DuckDB's ``quantile_disc``; both are engine-portable
      SQL, so the filter is oracle-checkable), at the cost of a full
      sort shuffle of the group.  Right up to ~memory-sized groups; an
      unpartitioned call on a large input warns (see
      :data:`UNPARTITIONED_WINDOW_WARN_BYTES`).
    - ``exact=False`` — the 100-TB path: a per-group
      ``approx_percentile`` threshold (mergeable quantile sketch,
      map-side combined: the shuffle carries one sketch per task, never
      rows), broadcast back and applied as a pushable ``score >= t``
      filter.  No sort of the corpus at all.  The sketch picks a
      threshold whose RANK is within ``1/approx_accuracy`` of exact —
      but the number of rows that rank error moves is tie-sensitive: if
      the neighboring score is a heavy tie-group, stepping one rank over
      the boundary moves the whole tie-group in or out, so the ROW
      divergence from ``exact=True`` can exceed ``n/approx_accuracy``
      on low-cardinality scores (e.g. scores rounded to 4 decimals).
      The threshold semantics are still identical; only its position
      can be off by the sketch error.

    NULL scores are dropped by both paths (a NULL can't be ranked).
    ``keep_quantile_col=True`` keeps the diagnostic ``__thr`` column
    (the group's score threshold) on both paths.
    """
    if not 0.0 <= min_quantile <= 1.0:
        raise ValueError(f"min_quantile must be in [0, 1], got {min_quantile}")
    pby = partition_by or []
    scored = df.filter(F.col(score_col).isNotNull())
    if exact:
        if not pby:
            _warn_global_window(scored, "filter_by_quantile(exact=True)")
        wo = (Window.partitionBy(*pby) if pby
              else Window.partitionBy()).orderBy(F.col(score_col).asc())
        wg = Window.partitionBy(*pby) if pby else Window.partitionBy()
        out = (
            scored.withColumn("__cd", F.cume_dist().over(wo))
            .withColumn(
                "__thr",
                F.min(
                    F.when(F.col("__cd") >= F.lit(min_quantile),
                           F.col(score_col))
                ).over(wg),
            )
            .filter(F.col(score_col) >= F.col("__thr"))
            .drop("__cd")
        )
        return out if keep_quantile_col else out.drop("__thr")
    thr = scored.groupBy(*pby).agg(
        F.percentile_approx(
            F.col(score_col), F.lit(min_quantile), F.lit(approx_accuracy)
        ).alias("__thr")
    )
    if pby:
        joined = scored.join(F.broadcast(thr), pby)
    else:
        joined = scored.crossJoin(F.broadcast(thr))
    out = joined.filter(F.col(score_col) >= F.col("__thr"))
    return out if keep_quantile_col else out.drop("__thr")


def take_token_budget(df: DataFrame, token_col: str, budget: int,
                      order_by: str,
                      partition_by: list[str] | None = None,
                      descending: bool = False,
                      tiebreak_col: str | None = None) -> DataFrame:
    """Fill a per-group token budget: walk the group in ``order_by``
    order and keep rows until ``budget`` tokens are reached (the row
    that crosses the budget IS kept, so every non-empty group fills to
    at least ``budget`` — the standard training-mix contract: you state
    how many tokens of each source you want, the last document may
    overflow slightly).

    ONE window cumsum per group — no iteration, no driver loop; a row is
    kept iff the cumulative count BEFORE it is under budget.  Rows with
    NULL ``token_col`` are dropped (their budget position is undefined).
    Supply ``tiebreak_col`` whenever ``order_by`` can tie, for the same
    reproducibility reason as :func:`topk_per_group`.  ``partition_by``
    is REQUIRED at scale — an unpartitioned call on a large input warns
    (see :data:`UNPARTITIONED_WINDOW_WARN_BYTES`)."""
    pby = partition_by or []
    if not pby:
        _warn_global_window(df, "take_token_budget")
    order = [F.col(order_by).desc() if descending
             else F.col(order_by).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = (
        (Window.partitionBy(*pby) if pby else Window.partitionBy())
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return (
        df.withColumn("__cum", cum)
        .filter((F.col("__cum") - F.col(token_col)) < budget)
        .drop("__cum")
    )
