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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]

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
