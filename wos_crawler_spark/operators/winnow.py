"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
— the MOSS local fingerprinting algorithm): select the minimum k-gram
hash in every sliding window of ``w`` consecutive k-grams, so any
shared substring of length ≥ ``w + k - 1`` characters between two
documents is GUARANTEED to surface at least one shared fingerprint
(the paper's coverage property). This is the exact-substring-overlap
detector the training-data-dedup literature uses alongside MinHash
(e.g. Lee et al. 2022's "deduplicating training data" exact-substring
pass targets the same failure mode: verbatim boilerplate embedded in
otherwise-distinct pages, invisible to whole-document digests and
diluted below MinHash thresholds).

Engine notes:

- Everything is a Catalyst higher-order-function pipeline over the
  normalized text (char k-grams → md5-prefix hashes → per-window
  minima → distinct), evaluated per row, map-side, no Python. The
  hash is the first 8 hex digits of md5 as a BIGINT — identical in
  every engine (same trick as operators/sampling.py), so the DuckDB
  oracle recomputes fingerprints FROM SCRATCH, no snapshot.
- Interpreted-HOF cost caveat (same class as the old hyperplane expr
  path): md5-per-gram is O(len·k) work outside whole-stage codegen.
  At corpus scale prefer ``winnow_fingerprints`` over full pages only
  after cheaper gates (exact dedup, length rules) have pruned; the
  selection density is ~2/(w+1) of all grams (paper §3), so the
  OUTPUT stays small even though the scan is linear.
- ``winnow_pairs`` blocks on fingerprint equality — one explode (rows
  stay map-side), one key-only shuffle to group fingerprint owners,
  pair counts over ``(fp, id_a, id_b)``. Like every
  blocking-by-equality scheme it is quadratic INSIDE a fingerprint
  bucket, so hot fingerprints (site boilerplate shared by millions of
  pages) are capped by ``bucket_cap`` exactly like SimHash's banded
  blocking — a capped fingerprint still participates via its other,
  rarer fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wos_crawler_spark.operators.textdedup import norm_text


def _gram_hash(g: Column) -> Column:
    """First 8 md5 hex digits as BIGINT — cross-engine uniform 32-bit."""
    return F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")


def _gram_hashes(n: Column, k: int) -> Column:
    """array<bigint> of char-k-gram hashes of an ALREADY-MATERIALIZED
    normalized-text attribute reference. ``n`` must be a plain column,
    not a computed expression: it is captured inside the ``transform``
    lambda, and Catalyst's subexpression elimination does not reach
    into higher-order-function bodies — a computed ``n`` (e.g.
    ``norm_text(text)`` inline) would re-run the whole normalization
    regex once PER GRAM, turning the scan O(len²·regex). Same contract
    as textdedup.shingles_from_words."""
    n_grams = F.greatest(F.length(n) - (k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        # Column.substr (not F.substring) — takes Column positions
        lambda i: _gram_hash(n.substr(i, F.lit(k))),
    )
    # NULL text must yield a NULL ARRAY (greatest() skips the NULL
    # length, so transform would otherwise produce a [NULL] singleton
    # that survives into the fingerprint explode)
    return F.when(n.isNull(), F.lit(None).cast("array<bigint>")).otherwise(
        grams
    )


def _window_mins(hashes: Column, w: int) -> Column:
    """Distinct per-window minima over an ALREADY-MATERIALIZED hash
    array. Same capture contract as :func:`_gram_hashes`: passing the
    gram-hash EXPRESSION here would re-evaluate the full O(len)
    array once per window — O(len³) per row with the normalization
    inside. Both stages must be separate projections."""
    n_windows = F.greatest(F.size(hashes) - (w - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda j: F.array_min(F.slice(hashes, j, w)),
    )
    # NULL text → empty set (greatest() skips the NULL size, so
    # without the guard a [NULL] singleton would explode to a NULL fp)
    return F.when(hashes.isNull(), F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(mins)
    )


def _fingerprints_arrow(
    df: DataFrame, id_col: str, text_col: str, k: int, w: int
) -> DataFrame:
    """Arrow scale path: one mapInPandas pass — hashlib md5 per gram
    (~1 µs) + a numpy sliding-window min, vs the interpreted expr
    tree's ~15 ms/doc (measured 541 docs/s on 8 cores at sf0.1; this
    path is ~25× that). Bit-identical to the expr flavor by contract
    (test-pinned): Java-\\s normalization (textquality twin pattern,
    NOT python's unicode \\s), ``.strip(" ")`` (Spark trim strips
    spaces only), first-4-md5-bytes big-endian == conv(hex[0:8])."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def _fp(batches):
        import hashlib
        import re

        import numpy as np
        from numpy.lib.stride_tricks import sliding_window_view

        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        for pdf in batches:
            ids_out: list = []
            fps_out: list = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(t, str):
                    continue
                n = ws.sub(" ", t.lower()).strip(" ")
                g = max(len(n) - (k - 1), 1)
                hs = np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.md5(
                                n[j : j + k].encode("utf-8")
                            ).digest()[:4],
                            "big",
                        )
                        for j in range(g)
                    ),
                    dtype=np.int64,
                    count=g,
                )
                if g >= w:
                    mins = sliding_window_view(hs, w).min(axis=1)
                else:
                    mins = hs.min(keepdims=True)
                uniq = pd.unique(mins)  # first-occurrence order, like
                ids_out.extend([i] * len(uniq))  # array_distinct
                fps_out.extend(uniq.tolist())
            yield pd.DataFrame({id_col: ids_out, "fp": fps_out})

    return df.select(id_col, text_col).mapInPandas(
        _fp, f"{id_col} {id_type}, fp long"
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    use_arrow: bool = True,
) -> DataFrame:
    """``(id, fp)`` — one row per distinct fingerprint per document.

    Default = the Arrow batch path (:func:`_fingerprints_arrow`);
    ``use_arrow=False`` is the pure-Catalyst twin — three chained
    projections (normalize → gram hashes → window minima), each
    materializing the attribute the next stage's lambdas capture so
    the expr stays O(len·k) per row. The two flavors are bit-equal
    (pinned in tests); the expr twin is what the from-scratch SQL
    oracle mirrors shape-for-shape."""
    if use_arrow:
        return _fingerprints_arrow(df, id_col, text_col, k, w)
    normed = df.select(
        F.col(id_col), norm_text(F.col(text_col)).alias("_n")
    )
    hashed = normed.select(
        F.col(id_col), _gram_hashes(F.col("_n"), k).alias("_hs")
    )
    return hashed.select(
        F.col(id_col),
        F.explode(_window_mins(F.col("_hs"), w)).alias("fp"),
    )


def winnow_fingerprint_set(
    text: Column, k: int = 5, w: int = 4
) -> Column:
    """Distinct winnowed fingerprints (array<bigint>) of the
    normalized text: min hash of each window of ``w`` consecutive
    char-``k``-gram hashes. Documents shorter than ``k`` chars
    fingerprint their whole text as one gram; shorter than
    ``k + w - 1`` collapse to a single window.

    SINGLE-EXPRESSION convenience form for one-off/test use ONLY —
    inlining both stages makes Catalyst re-evaluate the gram array per
    window (see :func:`_window_mins`). Corpus scans must use
    :func:`winnow_fingerprints`."""
    n = norm_text(text)
    return _window_mins(_gram_hashes(n, k), w)


def winnow_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    bucket_cap: int = 200,
    use_arrow: bool = True,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowed fingerprints
    (``id_a < id_b``, with ``n_shared``). Fingerprint buckets larger
    than ``bucket_cap`` are dropped from PAIR GENERATION (boilerplate
    guard — the quadratic blowup protection, mirroring SimHash's
    banded blocking); their member docs still pair via rarer
    fingerprints."""
    fps = winnow_fingerprints(
        df, id_col, text_col, k=k, w=w, use_arrow=use_arrow
    )
    # two-pass cap: per-fp counts first (never materializes a bucket's
    # member list anywhere), then the bucket self-join over surviving
    # fps only — the exact shape of simhash_near_pairs' banded
    # blocking. Both aggregations and the join share the fp key, so
    # the exchange is reused across stages.
    sizes = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
    ok = sizes.filter(
        (F.col("_n") >= 2) & (F.col("_n") <= bucket_cap)
    ).select("fp")
    fps_ok = fps.join(ok, "fp")
    a = fps_ok.select("fp", F.col(id_col).alias("id_a"))
    b = fps_ok.select("fp", F.col(id_col).alias("id_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
