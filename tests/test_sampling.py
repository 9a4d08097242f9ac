"""Deterministic sampling operators: stability across partitionings,
rate monotonicity (subset property), disjoint/exhaustive splits,
per-stratum rates."""

from pyspark.sql import functions as F

from wos_crawler_spark.operators.sampling import (
    deterministic_sample,
    split_train_holdout,
    stratified_sample,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("zh"), F.lit("de"), F.lit("es")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )


def test_sample_stable_across_partitionings(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in deterministic_sample(df.repartition(3), "doc_id", 0.2).collect()}
    b = {r["doc_id"] for r in deterministic_sample(df.repartition(17), "doc_id", 0.2).collect()}
    assert a == b and len(a) > 0


def test_sample_rate_monotone_subset(spark):
    df = _docs(spark)
    s10 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.1).collect()}
    s30 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.3).collect()}
    assert s10 <= s30
    # rates land near nominal (md5 uniformity; generous tolerance)
    assert 0.05 < len(s10) / 2000 < 0.15
    assert 0.24 < len(s30) / 2000 < 0.36


def test_salt_gives_independent_samples(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.3, salt="x").collect()}
    b = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.3, salt="y").collect()}
    assert a != b
    overlap = len(a & b) / max(len(a), 1)
    assert 0.1 < overlap < 0.5  # ~rate under independence (0.3)


def test_split_disjoint_exhaustive(spark):
    df = _docs(spark)
    train, hold = split_train_holdout(df, "doc_id", holdout_rate=0.25)
    t = {r["doc_id"] for r in train.collect()}
    h = {r["doc_id"] for r in hold.collect()}
    assert t.isdisjoint(h)
    assert len(t) + len(h) == 2000
    assert 0.18 < len(h) / 2000 < 0.32


def test_null_keys_not_lost(spark):
    # NULL keys must land in EXACTLY one side of a split (the
    # exhaustiveness contract) — pre-fix they vanished from both.
    df = spark.range(100).select(
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id").cast("string"))
        .alias("doc_id")
    )
    train, hold = split_train_holdout(df, "doc_id", holdout_rate=0.25)
    assert train.count() + hold.count() == 100
    # all-NULL block moves together (one shared draw)
    n_null_t = train.filter(F.col("doc_id").isNull()).count()
    n_null_h = hold.filter(F.col("doc_id").isNull()).count()
    assert (n_null_t, n_null_h) in {(10, 0), (0, 10)}
    # deterministic_sample keeps-or-drops the NULL block atomically too
    kept = deterministic_sample(df, "doc_id", 0.5).filter(
        F.col("doc_id").isNull()
    ).count()
    assert kept in (0, 10)


def test_stratified_rates(spark):
    df = _docs(spark)
    out = stratified_sample(
        df, "doc_id", "lang", rates={"en": 0.8, "zh": 0.1}, default_rate=0.0
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(by_lang) <= {"en", "zh"}  # default 0 drops de/es entirely
    assert by_lang["en"] / 500 > 0.65
    assert by_lang.get("zh", 0) / 500 < 0.2


def _skewed(spark, n=4000):
    """80/15/4/1 percent source mixture."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 100 < 80, "web")
        .when(F.col("id") % 100 < 95, "news")
        .when(F.col("id") % 100 < 99, "books")
        .otherwise("wiki")
        .alias("source"),
    )


def test_mixture_rates_binding_stratum_and_shares(spark):
    from wos_crawler_spark.operators.sampling import mixture_rates

    df = _skewed(spark)
    rates = {r["stratum"]: r["rate"] for r in
             mixture_rates(df, "source", alpha=0.5).collect()}
    # alpha < 1 flattens: the rarest source binds at rate 1.0
    assert rates["wiki"] == 1.0
    assert rates["web"] < rates["news"] < rates["books"] < 1.0
    # thinning realizes shares ∝ p^alpha: rate_s ∝ p_s^(alpha-1),
    # so rate_web/rate_wiki == (p_web/p_wiki)^(-0.5) == (80)^-0.5
    assert abs(rates["web"] - 0.8 ** -0.5 / 0.01 ** -0.5) < 1e-12
    # alpha = 1 keeps everything
    r1 = {r["stratum"]: r["rate"] for r in
          mixture_rates(df, "source", alpha=1.0).collect()}
    assert set(r1.values()) == {1.0}


def test_mixture_sample_deterministic_and_flattening(spark):
    import pytest as _pytest

    from wos_crawler_spark.operators.sampling import mixture_sample

    df = _skewed(spark)
    a = sorted(
        r["doc_id"]
        for r in mixture_sample(
            df.repartition(1), "source", "doc_id", alpha=0.5
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in mixture_sample(
            df.repartition(17), "source", "doc_id", alpha=0.5
        ).collect()
    )
    assert a == b and 0 < len(a) < 4000
    # kept shares move toward uniform: web share drops below its 80%
    kept = mixture_sample(df, "source", "doc_id", alpha=0.5)
    shares = {
        r["source"]: r["n"]
        for r in kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    tot = sum(shares.values())
    assert shares["web"] / tot < 0.8
    assert shares["wiki"] == 40  # binding stratum keeps all rows
    assert set(kept.columns) == {"doc_id", "source"}
    with _pytest.raises(ValueError):
        mixture_sample(df, "source", "doc_id", alpha=0.0)


# ---------------------------------------------------------------- upsampling


def _py_draw(key, salt):
    import hashlib

    return int(hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:8], 16) / 2**32


def _py_copies(key, rate, salt="rep"):
    n_full = int(rate)
    frac = float(rate) - n_full
    return n_full + (1 if _py_draw(key, salt) < frac else 0)


def test_upsample_matches_python_twin_and_is_partitioning_invariant(spark):
    from wos_crawler_spark.operators.sampling import upsample_with_repetition

    df = _docs(spark, 500)
    got = sorted(
        (r["doc_id"], r["epoch"])
        for r in upsample_with_repetition(df.repartition(7), "doc_id", 2.3).collect()
    )
    got17 = sorted(
        (r["doc_id"], r["epoch"])
        for r in upsample_with_repetition(df.repartition(17), "doc_id", 2.3).collect()
    )
    assert got == got17
    want = sorted(
        (i, e) for i in range(500) for e in range(_py_copies(i, 2.3))
    )
    assert got == want
    # realized multiplicity lands near the nominal rate
    assert 2.15 < len(got) / 500 < 2.45


def test_upsample_integral_rate_and_epoch_prefix_monotonicity(spark):
    from wos_crawler_spark.operators.sampling import upsample_with_repetition

    df = _docs(spark, 300)
    # integral rate: exactly 3 copies per row, epochs 0..2
    r3 = upsample_with_repetition(df, "doc_id", 3.0)
    per = {
        r["doc_id"]: r["n"]
        for r in r3.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(per.values()) == {3} and len(per) == 300
    # epoch sets are prefixes: rate r corpus ⊆ rate r+1 corpus
    lo = {(r["doc_id"], r["epoch"]) for r in upsample_with_repetition(df, "doc_id", 1.4).collect()}
    hi = {(r["doc_id"], r["epoch"]) for r in upsample_with_repetition(df, "doc_id", 2.4).collect()}
    assert lo <= hi


def test_upsample_subunit_rate_equals_deterministic_sample(spark):
    from wos_crawler_spark.operators.sampling import (
        deterministic_sample,
        upsample_with_repetition,
    )

    df = _docs(spark, 800)
    up = upsample_with_repetition(df, "doc_id", 0.3, salt="s")
    assert {r["epoch"] for r in up.collect()} == {0}
    assert {r["doc_id"] for r in up.collect()} == {
        r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.3, salt="s").collect()
    }


def test_upsample_null_key_block_and_negative_rate_raise(spark):
    import pytest as _pytest

    from wos_crawler_spark.operators.sampling import upsample_with_repetition

    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), (1, "c")], "k int, v string"
    )
    out = upsample_with_repetition(df, "k", 2.7).collect()
    # NULL keys share one sentinel draw: both NULL rows get the SAME count
    counts = {}
    for r in out:
        counts.setdefault((r["k"], r["v"]), 0)
        counts[(r["k"], r["v"])] += 1
    assert counts[(None, "a")] == counts[(None, "b")] >= 2
    with _pytest.raises(ValueError):
        upsample_with_repetition(df, "k", -0.1)


def test_stratified_upsample_rates_table(spark):
    from wos_crawler_spark.operators.sampling import stratified_upsample

    df = _docs(spark, 400)  # lang cycles en/zh/de/es
    out = stratified_upsample(
        df, "doc_id", "lang",
        rates={"en": 3.0, "zh": 0.5}, default_rate=1.0,
    )
    per_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_lang["en"] == 300  # 100 en rows x exactly 3
    assert per_lang["de"] == 100 and per_lang["es"] == 100  # default x1
    assert 25 < per_lang["zh"] < 75  # ~half kept
    # python twin for the fractional stratum
    zh_ids = {r["doc_id"] for r in out.filter(F.col("lang") == "zh").collect()}
    want = {i for i in range(400) if i % 4 == 1 and _py_draw(i, "rep") < 0.5}
    assert zh_ids == want


# ------------------------------------------------------------ per-group cap


def _capped_fixture(spark):
    # skewed: host h0 gets 300 docs, h1..h4 get 25 each; n_chars collides
    # on purpose (i % 13) so the doc_id tie-break is load-bearing
    return spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 300, "h0")
        .otherwise(F.concat(F.lit("h"), ((F.col("id") - 300) % 4 + 1)))
        .alias("host"),
        (F.col("id") % 13).alias("n_chars"),
    )


def test_cap_per_group_matches_python_twin(spark):
    from wos_crawler_spark.operators.sampling import cap_per_group

    df = _capped_fixture(spark)
    out = cap_per_group(
        df, "host", 10,
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
    )
    got = sorted((r["host"], r["doc_id"]) for r in out.collect())
    rows = [(r["doc_id"], r["host"], r["n_chars"]) for r in df.collect()]
    want = []
    for h in {r[1] for r in rows}:
        grp = sorted(
            (r for r in rows if r[1] == h), key=lambda r: (-r[2], r[0])
        )[:10]
        want += [(h, r[0]) for r in grp]
    assert got == sorted(want)
    # cap enforced on the hot group, small groups kept whole? h1..h4 have
    # 25 rows each — also capped to 10 here
    per = {}
    for h, _ in got:
        per[h] = per.get(h, 0) + 1
    assert per == {"h0": 10, "h1": 10, "h2": 10, "h3": 10, "h4": 10}


def test_cap_per_group_salted_two_phase_identical(spark):
    from wos_crawler_spark.operators.sampling import cap_per_group

    df = _capped_fixture(spark)
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    plain = sorted(
        (r["host"], r["doc_id"])
        for r in cap_per_group(df, "host", 7, order).collect()
    )
    for s in (2, 5, 16):
        salted = sorted(
            (r["host"], r["doc_id"])
            for r in cap_per_group(
                df.repartition(11), "host", 7, order,
                salt_key="doc_id", salt_buckets=s,
            ).collect()
        )
        assert salted == plain, f"salt_buckets={s}"


def test_cap_per_group_small_groups_and_guards(spark):
    import pytest as _pytest

    from wos_crawler_spark.operators.sampling import cap_per_group

    df = _capped_fixture(spark)
    # k larger than every group: identity
    out = cap_per_group(
        df, "host", 1000, [F.col("doc_id").asc()], salt_key="doc_id",
        salt_buckets=4,
    )
    assert out.count() == 400
    assert set(out.columns) == {"doc_id", "host", "n_chars"}
    with _pytest.raises(ValueError):
        cap_per_group(df, "host", 0, [F.col("doc_id")])
    with _pytest.raises(ValueError):
        cap_per_group(df, "host", 5, [F.col("doc_id")], salt_buckets=3)
