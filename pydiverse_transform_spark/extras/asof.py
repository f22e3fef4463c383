"""As-of (nearest-predecessor) join — an operator Spark lacks natively.

``asof_join(left, right, on, by)`` matches every left row to the single
right row with the greatest (``backward``) / smallest (``forward``)
``on``-timestamp not after / not before the left row's, within the same
``by`` keys — the classic point-in-time join used for feature lookups
("state of the account when the event happened") and market data.

Spark-first plan (no range join, no per-row scan):

1. tag and union the two inputs on (by, on) — a pure map stage;
2. one window over ``partitionBy(by).orderBy(on, side)`` carrying the
   last-seen right payload forward with
   ``last(struct(...), ignorenulls=True)``;
3. keep the left rows, unpack the payload struct.

Cost at any scale is exactly ONE shuffle of |left| + |right| rows on the
``by`` keys — the same price as the sessionization operator — instead of
the quadratic candidate explosion a naive range-join (`l.ts >= r.ts`)
produces.  Hot ``by`` keys are the usual skew caveat; pre-split with
``extras.skew.heavy_hitters`` if one key dominates.

The payload travels inside a struct so that a matched right row whose
payload *value* is NULL is still a match (a bare ``last(col,
ignorenulls)`` would skip over it to an older row — wrong semantics).

Semantics match DuckDB's native ``ASOF JOIN`` (inclusive comparison;
left-join null padding), which the driver oracle uses to verify this
operator.  Reference repo has no as-of join; this is a beyond-reference
operator for the training-data-pipeline surface.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "asof_join_scalable", "asof_join_colocated"]

_SIDE = "__asof_is_left__"
_MATCHED_ON = "__asof_matched_on__"
_PAYLOAD = "__asof_payload__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    *,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join ``left`` to ``right`` on time column ``on`` within
    equality groups ``by``.

    direction="backward": match the latest right row with
    ``right.on <= left.on`` (inclusive); "forward": the earliest right
    row with ``right.on >= left.on``.

    ``tolerance`` (a ``datetime.timedelta`` for timestamp ``on`` columns,
    or a number for numeric ones) voids matches farther than that from
    the left timestamp — the matched columns become NULL, the left row
    is kept (pandas ``merge_asof`` semantics).

    Output = all left columns + right payload columns (non-``by``,
    non-``on``), collision-renamed with ``suffix``, plus ``on + suffix``
    carrying the matched right timestamp (NULL = no match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = list(by or [])
    payload_cols = [c for c in right.columns if c not in by and c != on]
    left_names = set(left.columns)
    out_names = {
        c: (c + suffix if c in left_names else c) for c in payload_cols
    }
    matched_on_name = on + suffix

    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias(_SIDE),
        F.struct(
            F.col(on).alias(_MATCHED_ON),
            *[F.col(c) for c in payload_cols],
        ).alias(_PAYLOAD),
    )
    l = left.select(  # noqa: E741
        "*",
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    lcols = [c for c in left.columns]
    unioned = l.select(
        *[F.struct(*[F.col(c) for c in lcols]).alias("__asof_lrow__")],
        *by, F.col(on), F.col(_SIDE), F.col(_PAYLOAD),
    ).unionByName(
        r.select(
            F.lit(None).cast(
                l.select(
                    F.struct(*[F.col(c) for c in lcols]).alias("x")
                ).schema["x"].dataType
            ).alias("__asof_lrow__"),
            *by, F.col(on), F.col(_SIDE), F.col(_PAYLOAD),
        )
    )

    # At equal timestamps the right row must be visible to the left row
    # (inclusive comparison) ⇒ right (side=0) sorts before left (side=1)
    # in scan direction.
    if direction == "backward":
        order = [F.col(on).asc_nulls_first(), F.col(_SIDE).asc()]
    else:
        order = [F.col(on).desc_nulls_last(), F.col(_SIDE).asc()]
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.col(_PAYLOAD), ignorenulls=True).over(w)

    out = (
        unioned.withColumn(_PAYLOAD, carried)
        .filter(F.col(_SIDE) == 1)
        .drop(_SIDE)
    )

    if tolerance is not None:
        gap = (
            F.col(on) - F.col(f"{_PAYLOAD}.{_MATCHED_ON}")
            if direction == "backward"
            else F.col(f"{_PAYLOAD}.{_MATCHED_ON}") - F.col(on)
        )
        out = out.withColumn(
            _PAYLOAD,
            F.when(gap <= F.lit(tolerance), F.col(_PAYLOAD)),
        )

    sel: list[Column] = [
        F.col(f"__asof_lrow__.{c}").alias(c) for c in lcols
    ]
    sel.append(F.col(f"{_PAYLOAD}.{_MATCHED_ON}").alias(matched_on_name))
    sel.extend(
        F.col(f"{_PAYLOAD}.{c}").alias(out_names[c]) for c in payload_cols
    )
    return out.select(*sel)


def asof_join_colocated(
    events: DataFrame,
    on: str,
    by: list[str] | None = None,
    *,
    side_col: str,
    payload: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """As-of join where BOTH sides are row-subsets of the SAME table —
    the event-log case (clicks matched to the user's latest preceding
    purchase, both living in ``events``).  ``asof_join`` tags and
    UNIONS two scans; the union's output ordering/partitioning is
    unknown to Spark, so the window behind it always re-shuffles and
    re-sorts.  This variant runs the same carry-forward window over ONE
    scan: when ``events`` is a :func:`events.write_event_log` layout
    (bucketed by ``by``, files sorted by ``(by, on, side_col)``), the
    plan is Scan -> Filter -> Window — NO Exchange, NO Sort, fully
    map-side at any scale (plan pinned in
    tests/test_event_log_layout.py; on an unsorted input it degrades
    gracefully to the ordinary one-shuffle window).

    ``side_col`` is the stored tie-break column: 0 = right side (the
    rows whose state is carried forward), 1 = left side (the rows that
    receive it), anything else / NULL = not participating.  0 < 1 makes
    a right row at EQUAL ``on`` sort before its left reader, which is
    exactly the inclusive (``right.on <= left.on``) backward semantics
    — and it must be a real column, not a derived expression, because
    the window can only skip its sort when it orders by the columns the
    files are physically sorted by.  Forward direction needs the
    mirrored layout (descending ``on``); use ``asof_join`` for that.

    Output: the left rows with all ``events`` columns except
    ``side_col``, plus ``on + suffix`` (the matched right timestamp,
    NULL = no match) and each payload column as ``name + suffix``
    (payload columns also exist on left rows — the suffixed copy is the
    MATCHED right row's value)."""
    by = list(by or [])
    side = F.col(side_col)
    pay = F.when(
        side == 0,
        F.struct(F.col(on).alias(_MATCHED_ON),
                 *[F.col(c) for c in payload]),
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(F.col(on).asc(), side.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        events.filter(side.isin(0, 1))
        .withColumn(_PAYLOAD, F.last(pay, ignorenulls=True).over(w))
        .filter(side == 1)
    )
    keep = [c for c in events.columns if c != side_col]
    sel = [F.col(c) for c in keep]
    sel.append(F.col(f"{_PAYLOAD}.{_MATCHED_ON}").alias(on + suffix))
    sel.extend(F.col(f"{_PAYLOAD}.{c}").alias(c + suffix)
               for c in payload)
    return out.select(*sel)


def _signed_line(df: DataFrame, col: str, sign: int) -> Column:
    """Orderable integer time line (epoch-µs for timestamps), negated
    for direction='forward' so both directions run the same
    carry-forward logic.

    Fractional numeric columns are rejected: the line must preserve the
    column's exact order (a truncating cast would collapse values that
    differ only in the fraction and silently mis-match them).  Timestamps
    are exact at µs precision; integers are exact by definition."""
    t = df.schema[col].dataType
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        from .events import epoch_us

        line = epoch_us(F.col(col))
    elif isinstance(t, T.DateType):
        from .events import epoch_us

        line = epoch_us(F.col(col).cast("timestamp_ntz"))
    elif isinstance(t, (T.ByteType, T.ShortType, T.IntegerType,
                        T.LongType)):
        line = F.col(col).cast("long")
    else:
        raise ValueError(
            f"asof_join_scalable needs a timestamp/date/integer `on` "
            f"column (got {t.simpleString()}); scale fractional values "
            "to integers first, or use asof_join"
        )
    return line * F.lit(sign)


def asof_join_scalable(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    *,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_right",
    chunk=None,
) -> DataFrame:
    """Skew-proof two-level as-of join, exact-equal to ``asof_join``.

    ``asof_join`` windows over ALL rows of a ``by`` key — one hot key
    (a bot user with 10^9 events at 100 TB) serializes on a single
    reducer.  This variant bounds per-task work independently of key
    skew, the same two-level trick as ``events.sessionize_scalable``:

    1. *local pass*: the carry-forward window partitions by
       ``(by, time-chunk)`` — a hot key's timeline spreads over many
       tasks;
    2. *chunk summaries*: per ``(by, chunk)``, the last right payload in
       that chunk (a groupBy max over a struct — map-side combinable);
    3. *carry-in*: one tiny window over the per-chunk summaries (rows ∝
       number of chunks, not events) finds each chunk's
       latest-earlier-chunk payload;
    4. left rows with no local match take the chunk's carry-in.

    Exact for unique timestamps per key (ties within one timestamp are
    resolved by payload struct-max here vs arbitrary window order in
    ``asof_join`` — both are only deterministic when (by, on) is
    unique).  ``chunk`` is a ``datetime.timedelta`` (default 1 day) for
    timestamp columns, or an integer width for numeric ones (required).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = list(by or [])
    sign = 1 if direction == "backward" else -1

    if chunk is None:
        t = left.schema[on].dataType
        if isinstance(t, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            chunk = _dt.timedelta(days=1)
        else:
            raise ValueError("numeric `on` columns need an explicit chunk=")
    if isinstance(chunk, _dt.timedelta):
        chunk_w = int(chunk / _dt.timedelta(microseconds=1))
    else:
        chunk_w = int(chunk)

    payload_cols = [c for c in right.columns if c not in by and c != on]
    left_names = set(left.columns)
    out_names = {
        c: (c + suffix if c in left_names else c) for c in payload_cols
    }
    matched_on_name = on + suffix
    lcols = list(left.columns)

    def add_line(df, col):
        line = _signed_line(df, col, sign)
        # exact integer floor-division chunk id (µs epochs overflow
        # double mantissa headroom)
        chunk_id = F.call_function(
            "div", line - F.pmod(line, F.lit(chunk_w)), F.lit(chunk_w)
        )
        return df.withColumn("__us", line).withColumn("__chunk", chunk_id)

    payload = F.struct(
        F.col(on).alias(_MATCHED_ON),
        *[F.col(c) for c in payload_cols],
    )
    r = add_line(right, on).select(
        *by, "__us", "__chunk", F.lit(0).alias(_SIDE),
        payload.alias(_PAYLOAD),
    )
    lrow_t = left.select(
        F.struct(*[F.col(c) for c in lcols]).alias("x")
    ).schema["x"].dataType
    l = add_line(left, on).select(  # noqa: E741
        F.struct(*[F.col(c) for c in lcols]).alias("__asof_lrow__"),
        *by, "__us", "__chunk", F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    u = l.unionByName(
        r.withColumn("__asof_lrow__", F.lit(None).cast(lrow_t)),
        allowMissingColumns=False,
    )

    # 1. local carry within (by, chunk)
    w_local = (
        Window.partitionBy(*by, "__chunk")
        .orderBy(F.col("__us").asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = u.withColumn(
        "__local", F.last(F.col(_PAYLOAD), ignorenulls=True).over(w_local)
    )

    # 2. per-(by, chunk) last right payload — struct-max on the line
    summ = r.groupBy(*by, "__chunk").agg(
        F.max(F.struct(F.col("__us"), F.col(_PAYLOAD))).alias("__m")
    ).select(*by, "__chunk", F.col(f"__m.{_PAYLOAD}").alias("__sp"))

    # 3. carry-in per chunk = last summary payload of any EARLIER chunk
    chunks = u.select(*by, "__chunk").distinct()
    w_carry = (
        Window.partitionBy(*by)
        .orderBy(F.col("__chunk").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        chunks.join(summ, [*by, "__chunk"], "left")
        .withColumn("__carry",
                    F.last(F.col("__sp"), ignorenulls=True).over(w_carry))
        .select(*by, "__chunk", "__carry")
    )

    # 4. resolve: local match, else the chunk's carry-in
    out = (
        local.filter(F.col(_SIDE) == 1)
        .join(carry, [*by, "__chunk"], "left")
        .withColumn(_PAYLOAD, F.coalesce(F.col("__local"), F.col("__carry")))
    )

    if tolerance is not None:
        mo = F.col(f"{_PAYLOAD}.{_MATCHED_ON}")
        lo = F.col(f"__asof_lrow__.{on}")
        gap = (lo - mo) if direction == "backward" else (mo - lo)
        out = out.withColumn(
            _PAYLOAD, F.when(gap <= F.lit(tolerance), F.col(_PAYLOAD))
        )

    sel: list[Column] = [
        F.col(f"__asof_lrow__.{c}").alias(c) for c in lcols
    ]
    sel.append(F.col(f"{_PAYLOAD}.{_MATCHED_ON}").alias(matched_on_name))
    sel.extend(
        F.col(f"{_PAYLOAD}.{c}").alias(out_names[c]) for c in payload_cols
    )
    return out.select(*sel)
