"""As-of join (SURVEY.md §2.3 J7 — marked "not needed v1" there; added
round 2 because a crawl/training-data pipeline keeps needing it: join
each fetch/event to the most recent prior state row per key — robots
snapshot in force at fetch time, latest quality score before a cutoff,
most recent click before a view).

Spark has no native ASOF JOIN. The scale-correct plan is the
UNION-AND-FILL trick, not a range join: tag right rows as state
carriers, union both sides, and run ONE window
``last(struct, ignorenulls=True)`` over (key, ts) — every left row
inherits the nearest preceding right row. Cost: a single shuffle on
the key (the same partitioning both inputs would need anyway), zero
row amplification — where an inequality join would explode to
|left|·|right per key| candidates and a BroadcastNestedLoopJoin.

The fill carries the matched right row as ONE struct, never as
per-column fills: a per-column ``last(ignorenulls)`` would tear the
row apart (a NULL value inside the matched row would be silently
replaced by a stale value from an older row, stitching columns from
different rows together).

Semantics (backward, inclusive): for each left row, the right row
with the greatest ``right.ts <= left.ts`` within the same ``by`` key.
Duplicate right rows on (by, ts) resolve DETERMINISTICALLY to the
greatest value-struct (window also orders by the carried struct) —
data-derived, never partition-order dependent. ``tolerance``: matches
older than ``left.ts - tolerance`` are nulled (timestamp ts columns
compare in epoch seconds).
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
    per ``by`` key (as ``asof_<col>``, plus ``asof_ts`` = that row's
    timestamp; all null when no prior right row, or outside
    ``tolerance``).

    ``ts_col`` must be numeric or timestamp, identically named on both
    sides."""
    by = by or []
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*by, ts_col)]
    # the matched right row travels as ONE nullable struct (_r): null
    # for left rows, the whole row for right rows — so the window fill
    # below can never mix columns from different right rows.
    r_struct = F.struct(
        F.col(ts_col).alias("_ts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    left_extra = [c for c in left.columns if c not in (*by, ts_col)]
    l_tag = left.select(
        *by,
        ts_col,
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_extra],
        F.lit(None)
        .cast(
            "struct<_ts:"
            + right.schema[ts_col].dataType.simpleString()
            + ","
            + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in value_cols
            )
            + ">"
        )
        .alias("_r"),
    )
    r_tag = right.select(
        *by,
        ts_col,
        F.lit(0).alias("_is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_extra
        ],
        r_struct.alias("_r"),
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal ts → inclusive match;
    # _r as a trailing sort key makes duplicate (key, ts) right rows
    # resolve deterministically (greatest struct wins the last()).
    w = (
        Window.partitionBy(*by)
        .orderBy(
            F.col(ts_col).asc(), F.col("_is_left").asc(), F.col("_r").asc()
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_f")
    )
    out = filled.filter(F.col("_is_left") == 1)
    if tolerance is None:
        in_tol = F.lit(True)
    else:
        # timestamps compare in epoch seconds; numerics pass through
        in_tol = (
            F.col(ts_col).cast("double") - F.col("_f._ts").cast("double")
        ) <= F.lit(float(tolerance))
    return out.select(
        *left.columns,
        *[
            F.when(in_tol, F.col(f"_f.{c}")).alias(f"asof_{c}")
            for c in value_cols
        ],
        F.when(in_tol, F.col("_f._ts")).alias("asof_ts"),
    )
