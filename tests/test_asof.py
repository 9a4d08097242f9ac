"""As-of join (J7): planted-fixture semantics + tolerance + no-match
nulls. The sf-scale equivalence vs DuckDB's native ASOF JOIN runs in
the driver's oracle gate (entry j7_asof_join)."""

from pyspark.sql import functions as F

from wos_crawler_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", 10),
            (2, "u1", 20),
            (3, "u1", 5),   # before any right row → nulls
            (4, "u2", 100),
            (5, "u3", 50),  # key with no right rows at all → nulls
        ],
        "event_id long, user_id string, s long",
    )
    right = spark.createDataFrame(
        [
            ("u1", 10, 1.5),   # equal ts: inclusive match for event 1
            ("u1", 18, 2.5),
            ("u2", 40, 9.0),
        ],
        "user_id string, s long, value double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["asof_value"], r["asof_ts"])
        for r in asof_join(
            left, right, ts_col="s", by=["user_id"], value_cols=["value"]
        ).collect()
    }
    assert out[1] == (1.5, 10)   # equal ts matches (inclusive)
    assert out[2] == (2.5, 18)   # most recent prior, not the first
    assert out[3] == (None, None)
    assert out[4] == (9.0, 40)
    assert out[5] == (None, None)


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            left, right, ts_col="s", by=["user_id"], value_cols=["value"],
            tolerance=5,
        ).collect()
    }
    assert out[1] == 1.5        # gap 0 ≤ 5
    assert out[2] == 2.5        # gap 2 ≤ 5
    assert out[4] is None       # gap 60 > 5 → nulled


def test_asof_null_value_in_matched_row_not_torn(spark):
    """A NULL value INSIDE the matched right row must surface as NULL —
    never be back-filled from an older row (row-tearing bug class)."""
    left = spark.createDataFrame(
        [(1, "u1", 30)], "event_id long, user_id string, s long"
    )
    right = spark.createDataFrame(
        [("u1", 10, 5.0), ("u1", 20, None)],
        "user_id string, s long, value double",
    )
    r = asof_join(
        left, right, ts_col="s", by=["user_id"], value_cols=["value"]
    ).first()
    assert r["asof_ts"] == 20
    assert r["asof_value"] is None  # matched row's own NULL, not 5.0


def test_asof_duplicate_right_rows_deterministic(spark):
    """Duplicate (key, ts) right rows resolve to the greatest value
    struct — same answer on every run/partitioning."""
    left = spark.createDataFrame(
        [(1, "u1", 9)], "event_id long, user_id string, s long"
    )
    right = spark.createDataFrame(
        [("u1", 5, 1.0), ("u1", 5, 2.0)],
        "user_id string, s long, value double",
    )
    for _ in range(3):
        r = asof_join(
            left.repartition(4), right.repartition(3),
            ts_col="s", by=["user_id"], value_cols=["value"],
        ).first()
        assert r["asof_value"] == 2.0


def test_asof_timestamp_ts_with_tolerance(spark):
    """tolerance works on TIMESTAMP ts columns (epoch-second compare)."""
    left = spark.createDataFrame(
        [(1, "u1", "2024-01-01 00:02:00"), (2, "u1", "2024-01-01 01:00:00")],
        "event_id long, user_id string, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", 7.0)],
        "user_id string, ts_s string, value double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    out = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            left, right, ts_col="ts", by=["user_id"], value_cols=["value"],
            tolerance=300,
        ).collect()
    }
    assert out[1] == 7.0      # 120 s gap ≤ 300
    assert out[2] is None     # 3600 s gap > 300


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized (seeded) equivalence vs pandas.merge_asof — an
    independent as-of implementation — over hash-derived frames with
    duplicates-per-key, gaps, and keys missing on either side."""
    import pandas as pd

    from wos_crawler_spark.fixtures.wosgen import h

    lrows = [
        (i, f"k{h(i, 1) % 7}", int(h(i, 2) % 1000)) for i in range(300)
    ]
    rrows = {
        (f"k{h(j, 3) % 9}", int(h(j, 4) % 1000)): float(j)
        for j in range(120)
    }
    left = spark.createDataFrame(lrows, "event_id long, key string, s long")
    right = spark.createDataFrame(
        [(k, s, v) for (k, s), v in rrows.items()],
        "key string, s long, value double",
    )
    got = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            left, right, ts_col="s", by=["key"], value_cols=["value"]
        ).collect()
    }
    lp = pd.DataFrame(lrows, columns=["event_id", "key", "s"]).sort_values("s")
    rp = (
        pd.DataFrame(
            [(k, s, v) for (k, s), v in rrows.items()],
            columns=["key", "s", "value"],
        )
        .sort_values("s")
    )
    exp = pd.merge_asof(lp, rp, on="s", by="key", direction="backward")
    for _, row in exp.iterrows():
        e = got[row["event_id"]]
        if pd.isna(row["value"]):
            assert e is None, row["event_id"]
        else:
            assert e == row["value"], row["event_id"]


def test_asof_single_shuffle_plan(spark):
    """The union-and-fill plan must not contain a join at all — one
    exchange on the key, zero row amplification."""
    left, right = _frames(spark)
    plan = asof_join(
        left, right, ts_col="s", by=["user_id"], value_cols=["value"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # one per union branch pre-sort
