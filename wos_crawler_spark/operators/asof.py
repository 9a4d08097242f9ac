"""As-of join (SURVEY.md §2.3 J7 — marked "not needed v1" there; added
round 2 because a crawl/training-data pipeline keeps needing it: join
each fetch/event to the most recent prior state row per key — robots
snapshot in force at fetch time, latest quality score before a cutoff,
most recent click before a view).

Spark has no native ASOF JOIN. The scale-correct plan is the
UNION-AND-FILL trick, not a range join: tag right rows as state
carriers, union both sides, and run ONE window
``last(value, ignorenulls=True)`` over (key, ts) — every left row
inherits the nearest preceding right row. Cost: a single shuffle on
the key (the same partitioning both inputs would need anyway), zero
row amplification — where an inequality join would explode to
|left|·|right per key| candidates and a BroadcastNestedLoopJoin.

Semantics (direction="backward", inclusive): for each left row, the
right row with the greatest ``right.ts <= left.ts`` within the same
``by`` key; ties on (key, ts) must be pre-deduplicated on the right
(enforced — nondeterministic matches are a bug, not a feature).
``tolerance``: matches older than ``left.ts - tolerance`` are nulled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    tolerance: float | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: left columns + each ``value_cols``
    column from the most recent right row with ``right.ts <= left.ts``
    per ``by`` key (plus ``asof_ts`` = that row's timestamp; all null
    when no prior right row, or outside ``tolerance``).

    ``ts_col`` must be numeric or timestamp, identically named on both
    sides. The right side must be unique per (by, ts)."""
    by = by or []
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (*by, ts_col)
        ]
    l_tag = left.select(
        *by,
        ts_col,
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in (*by, ts_col)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_r_ts"),
    )
    r_tag = right.select(
        *by,
        ts_col,
        F.lit(0).alias("_is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (*by, ts_col)
        ],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(ts_col).alias("_r_ts"),
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal ts → inclusive match
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_f_ts"),
    )
    out = filled.filter(F.col("_is_left") == 1)
    in_tol = (
        F.lit(True)
        if tolerance is None
        else (F.col(ts_col) - F.col("_f_ts")) <= F.lit(tolerance)
    )
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        *[
            F.when(in_tol, F.col(f"_f_{c}")).alias(f"asof_{c}")
            for c in value_cols
        ],
        F.when(in_tol, F.col("_f_ts")).alias("asof_ts"),
    )
