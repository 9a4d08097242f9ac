"""Model-based quality classification: a fastText-style linear
classifier over hashed word n-gram features (Joulin et al. 2016,
"Bag of Tricks for Efficient Text Classification") — the model-based
corpus gate the published LLM pipelines run after the heuristic rules
(CCNet's fastText LM filter; Llama's "quality classifier"). The
reference crawler has no analog; this belongs to the training-data
family layered over SURVEY.md §2.

Model shape (deterministic, engine-recomputable): features are word
unigrams + adjacent word bigrams over the shared ``norm_text``
normalization (ALL occurrences, fastText-style, not deduplicated);
each feature hashes into one of ``n_buckets`` buckets; the model is a
single integer milli-weight per bucket; a document's logit is the MEAN
bucket weight. Integer weights keep the oracle exact: ``w_sum`` and
``n_feat`` are order-independent integer aggregates, and the keep
decision ``w_sum > n_feat * threshold_milli`` is the same integer
cross-multiplication idiom as the Gopher rules — no float boundary
ever decides a row. The float ``clf_score`` (sigmoid of the mean) is
derived FROM those exact integers for ranking convenience.

Two flavors, same contract (test-pinned equal):

- **Arrow scale path** (default, `classifier_score`): the weight
  vector (8 B × n_buckets — a few MiB at the fastText-typical 2^21)
  ships once per executor inside a ``mapInPandas`` closure; each batch
  tokenizes, hashes (first-4-md5-bytes big-endian, the winnow/sampling
  idiom) and gathers weights in numpy. ZERO shuffles, zero joins — the
  corpus is annotated in place during its own scan, which is the only
  plan that survives 100 TB (the expr path's score join-back would
  re-shuffle the corpus on id).
- **Expr oracle mirror** (`classifier_score_expr`): explode features →
  broadcast-join the weights table → one partial-aggregated exchange
  of ``(id, w_sum, n_feat)``. Every step is plain SQL, so the DuckDB
  oracle recomputes the entire pipeline from scratch (md5 bucket ids
  included — no snapshot pinning needed).

Rows whose text is NULL are dropped from both outputs (documented;
the expr explode drops them and the Arrow path mirrors that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wos_crawler_spark.operators.textdedup import words_of

DEFAULT_BUCKETS = 1 << 21  # fastText's default hash-table scale


def bigrams_of(w: Column) -> Column:
    """Adjacent word bigrams (all occurrences). ``w`` must be an
    already-materialized attribute reference — the lambda captures it
    (same HOF-materialization caveat as shingles_from_words). The
    interpreted transform is the oracle-mirror path only; the Arrow
    flavor never builds this array."""
    head = F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0)))
    return F.transform(
        head, lambda t, i: F.concat_ws(" ", t, F.get(w, i + 1))
    )


def feature_bucket(f: Column, n_buckets: int, digest: str = "md5") -> Column:
    """Feature → bucket id in [0, n_buckets). md5 flavor = first 4
    digest bytes big-endian (conv(hex[0:8]), recomputable in DuckDB);
    xxhash64 = the cheaper scale flavor (same plan, JVM hash)."""
    if digest == "md5":
        h = F.conv(F.substring(F.md5(f), 1, 8), 16, 10).cast("long")
    elif digest == "xxhash64":
        h = F.xxhash64(f)
    else:
        raise ValueError(f"unknown digest {digest!r} (md5|xxhash64)")
    return F.pmod(h, F.lit(n_buckets))


def classifier_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    digest: str = "md5",
    drop_empty: bool = False,
) -> DataFrame:
    """``(id, bucket)`` — one row per feature OCCURRENCE (unigrams +
    bigrams). Chained projections so the bigram lambda only captures a
    materialized word array; the explode never leaves the source
    row's partition (map-side).

    ``drop_empty``: an empty/whitespace doc tokenizes to ``['']`` and
    would emit ONE phantom ``''`` feature (non-empty docs never yield
    empty tokens after whitespace collapse). The classifier keeps it
    (its pinned oracle scores empty docs by that bucket); DSIR drops
    it so empty docs have no features and can never be selected."""
    w = df.select(F.col(id_col), words_of(F.col(text_col)).alias("_w"))
    feats = w.select(
        F.col(id_col),
        F.concat(F.col("_w"), bigrams_of(F.col("_w"))).alias("_f"),
    )
    exploded = feats.select(F.col(id_col), F.explode("_f").alias("_feat"))
    if drop_empty:
        exploded = exploded.filter(F.col("_feat") != "")
    return exploded.select(
        F.col(id_col),
        feature_bucket(F.col("_feat"), n_buckets, digest).alias("bucket"),
    )


def _with_derived(scored: DataFrame, threshold_milli: int) -> DataFrame:
    """clf_keep (exact integers) + clf_score (sigmoid of the mean
    milli-weight) from (w_sum, n_feat)."""
    mean_logit = F.col("w_sum") / (F.col("n_feat") * F.lit(1000.0))
    return scored.withColumn(
        "clf_keep", F.col("w_sum") > F.col("n_feat") * F.lit(threshold_milli)
    ).withColumn("clf_score", F.lit(1.0) / (F.lit(1.0) + F.exp(-mean_logit)))


def classifier_score_expr(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    digest: str = "md5",
    threshold_milli: int = 0,
) -> DataFrame:
    """Oracle-mirror flavor: ``(id, w_sum, n_feat, clf_keep,
    clf_score)``. ``weights`` is ``(bucket long, weight int/long)``
    in milli-units; unmapped buckets weigh 0. One exchange — the
    per-document partial aggregate — and a broadcast hash join; the
    corpus text never shuffles. Returns scores only (no join-back:
    re-joining scores onto the corpus is a full corpus shuffle — use
    the Arrow flavor to annotate in place)."""
    feats = classifier_features(df, id_col, text_col, n_buckets, digest)
    scored = (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("weight"), F.lit(0))).alias("w_sum"),
            F.count(F.lit(1)).alias("n_feat"),
        )
    )
    return _with_derived(scored, threshold_milli)


def classifier_score(
    df: DataFrame,
    weights,  # numpy int64 array of length n_buckets
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
    threshold_milli: int = 0,
    drop_empty: bool = False,
) -> DataFrame:
    """Arrow scale path: annotate ``df`` in place with ``w_sum,
    n_feat, clf_keep, clf_score`` — zero shuffles, zero joins. md5
    bucketing, bit-equal to the expr flavor (test-pinned): Java-\\s
    normalization (NOT python's unicode \\s), ``strip(" ")`` (Spark
    trim strips spaces only), first-4-md5-bytes big-endian ==
    conv(hex[0:8]). NULL-text rows are dropped (expr-flavor parity).
    ``drop_empty`` mirrors ``classifier_features(drop_empty=True)``:
    empty/whitespace docs (whose only feature would be the phantom
    ``''``) are dropped from the output instead of scored.
    """
    import numpy as np

    wvec = np.ascontiguousarray(weights, dtype=np.int64)
    nb = int(n_buckets if n_buckets is not None else len(wvec))
    if len(wvec) != nb:
        raise ValueError(f"weights has {len(wvec)} buckets, expected {nb}")
    # sc.broadcast, not closure capture: a closure-pickled vector rides
    # every task's serialized command (16 MB at 2^21 buckets); the
    # broadcast value deserializes once per executor and is shared.
    bW = df.sparkSession.sparkContext.broadcast(wvec)
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        df.schema.fields
        + [StructField("w_sum", LongType()), StructField("n_feat", LongType())]
    )

    def _score(batches):
        import hashlib
        import re

        import pandas as pd

        ws = re.compile(r"[ \t\n\x0b\f\r]+")

        def _feats(t: str) -> list[str]:
            toks = ws.sub(" ", t.lower()).strip(" ").split(" ")
            if drop_empty:
                toks = [w for w in toks if w]
            return toks + [
                toks[j] + " " + toks[j + 1] for j in range(len(toks) - 1)
            ]

        for pdf in batches:
            keep_idx: list[int] = []
            sums: list[int] = []
            ns: list[int] = []
            wv = bW.value
            for pos, t in enumerate(pdf[text_col]):
                if not isinstance(t, str):
                    continue
                fs = _feats(t)
                if not fs:
                    continue
                bks = np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.md5(f.encode("utf-8")).digest()[:4], "big"
                        )
                        % nb
                        for f in fs
                    ),
                    dtype=np.int64,
                    count=len(fs),
                )
                keep_idx.append(pos)
                sums.append(int(wv[bks].sum()))
                ns.append(len(fs))
            out = pdf.iloc[keep_idx].copy()
            out["w_sum"] = pd.Series(sums, index=out.index, dtype="int64")
            out["n_feat"] = pd.Series(ns, index=out.index, dtype="int64")
            yield out

    annotated = df.mapInPandas(_score, out_schema)
    return _with_derived(annotated, threshold_milli)


def train_quality_classifier(
    labeled: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = DEFAULT_BUCKETS,
    digest: str = "md5",
    epochs: int = 3,
    lr_num: int = 2000,
    lr_den: int = 1,
) -> DataFrame:
    """Distributed logistic-regression fit over the SAME hashed
    unigram+bigram features :func:`classifier_score` consumes — the
    step that produces the fastText-style gate's weights from labeled
    seed sets (Joulin et al. 2016 training objective, full-batch
    gradient descent, mean-pooled bag of features), instead of
    requiring a caller-supplied model.

    Returns the ``(bucket, weight)`` integer milli-weight table
    (non-zero rows only; absent = 0) that
    :func:`classifier_score_expr` / :func:`weights_from_table` accept
    directly.

    Cross-engine float discipline (the lmscore/pagerank protocol —
    every step is restatable in static SQL and bit-stable across
    engines and partitionings):

    - Features pre-aggregate ONCE to ``(id, bucket, occ)`` + per-doc
      ``n_feat`` — the only corpus-scale pass; epochs run on this
      bounded table.
    - Epoch logit ``x = w_sum / (n_feat * 1000.0)`` is a single IEEE
      division of exact integers; ``p = 1/(1+exp(-x))`` applies the
      one transcendental to that identical double (the lm_score
      precedent for ``ln`` over exact integer inputs).
    - The residual floor-quantizes immediately:
      ``err_nano = floor((p - label) * 1e9)`` BIGINT; the per-doc
      gradient share ``floor(err_nano * occ / n_feat)`` and the
      per-bucket sum are exact integer arithmetic — summation order
      can never matter.
    - The update ``w -= floor(g * lr_num / (n_docs * lr_den * 1e6))``
      (nano → milli) is one floored IEEE quotient of exact integers.

    Per epoch: one (id)-keyed partial-aggregated exchange (doc logits)
    + one bucket-keyed exchange capped at ``n_buckets`` rows; the
    weight table broadcasts. Labeled seed sets are small by published
    practice (10^4–10^7 docs); ``n_docs`` > 4e6 raises rather than
    silently overflowing the 2^53-exact integer window of
    ``g * lr_num``."""
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    if lr_num < 1 or lr_den < 1:
        raise ValueError("learning rate must be a positive ratio")
    spark = labeled.sparkSession
    feats = classifier_features(labeled, id_col, text_col, n_buckets, digest)
    occ = (
        feats.groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("occ"))
        .localCheckpoint(eager=True)
    )
    per_doc = (
        occ.groupBy(id_col)
        .agg(F.sum("occ").alias("n_feat"))
        .join(
            labeled.select(
                F.col(id_col), F.col(label_col).cast("double").alias("_y")
            ),
            id_col,
        )
        .localCheckpoint(eager=True)
    )
    n_docs = per_doc.count()
    if n_docs == 0:
        raise ValueError("no labeled documents with features")
    if n_docs > 4_000_000:
        raise ValueError(
            f"n_docs={n_docs} exceeds the 2^53-exact training window; "
            "sample the labeled seed set (published gates train on "
            "10^4-10^7 docs)"
        )
    weights = spark.createDataFrame([], "bucket long, weight long")
    denom = F.lit(n_docs * lr_den * 1_000_000).cast("double")
    for _epoch in range(epochs):
        w_sum = (
            occ.join(F.broadcast(weights), "bucket", "left")
            .groupBy(id_col)
            .agg(
                F.sum(
                    F.col("occ") * F.coalesce(F.col("weight"), F.lit(0))
                ).alias("w_sum")
            )
        )
        x = F.col("w_sum").cast("double") / (
            F.col("n_feat") * F.lit(1000.0)
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-x))
        err = per_doc.join(w_sum, id_col).select(
            F.col(id_col),
            "n_feat",
            F.floor((p - F.col("_y")) * F.lit(1e9))
            .cast("long")
            .alias("err_nano"),
        )
        grad = (
            occ.join(err, id_col)
            .select(
                "bucket",
                F.floor(
                    (F.col("err_nano") * F.col("occ")).cast("double")
                    / F.col("n_feat")
                )
                .cast("long")
                .alias("_c"),
            )
            .groupBy("bucket")
            .agg(F.sum("_c").alias("g"))
        )
        weights = (
            weights.join(grad, "bucket", "full")
            .select(
                "bucket",
                (
                    F.coalesce(F.col("weight"), F.lit(0))
                    - F.floor(
                        (F.coalesce(F.col("g"), F.lit(0)) * F.lit(lr_num))
                        .cast("double")
                        / denom
                    ).cast("long")
                ).alias("weight"),
            )
            .filter(F.col("weight") != 0)
            .localCheckpoint(eager=True)
        )
    return weights


def weights_from_table(weights: DataFrame, n_buckets: int):
    """Collect a (bucket, weight) table into the dense numpy vector
    the Arrow flavor ships — driver-scale by contract (n_buckets
    rows, ≤ a few 10^6; this is model loading, not data movement)."""
    import numpy as np

    if n_buckets > (1 << 24):
        raise ValueError(
            f"n_buckets={n_buckets} exceeds the driver-collect ceiling "
            "(2^24); store the model as a file and load executor-side"
        )
    vec = np.zeros(n_buckets, dtype=np.int64)
    for r in weights.select("bucket", "weight").collect():
        b = int(r["bucket"])
        if not 0 <= b < n_buckets:
            raise ValueError(
                f"bucket {b} outside [0, {n_buckets}) — negative ids "
                "would silently alias the vector tail via numpy "
                "negative indexing"
            )
        vec[b] = int(r["weight"])
    return vec
