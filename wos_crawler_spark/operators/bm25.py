"""BM25 top-k retrieval over the documents corpus — the query-time
complement of the curation family: decontamination, quality gates and
dedup decide what ENTERS the corpus; BM25 is how a training-data
pipeline then FINDS things in it (benchmark-leak forensics: "which
training docs score highest against this eval question", targeted
subset mining, nearest-neighbor text retrieval without embeddings).
Okapi BM25 with the Robertson/Lucene idf variant
``ln(1 + (N - df + 0.5)/(df + 0.5))`` (Robertson & Zaragoza 2009,
public formula).

Tokenization is the engine's shared rule (``textdedup.words_of`` ≡
the oracle ``_WORDS`` spelling); empty tokens are dropped and
``dl`` counts the non-empty tokens, so empty/whitespace docs have
dl=0 and can never match.

Determinism protocol (the float-sum trap): a double BM25 score is a
SUM over matched terms, and summation order differs between Spark's
partial aggregates and any oracle — same math, different rounding,
flapping ranks. So each per-(term, doc) contribution — computed by an
identical IEEE expression tree in both engines from exact integers
(tf, dl, df, N) — is quantized to integer NANO-units via ``floor(x *
1e9)`` (floor, not round: round-half rules differ across engines;
floor of a double is exact in both), and the score is the BIGINT sum
of those integers: order-independent, overflow-safe (score ≤ ~30
nano-units · 1e9 per term · terms), and byte-identical across
engines. Rank ties break on doc_id ascending.

Scale design (10^9-doc corpus, handful-to-10^5 queries): the corpus
side is filtered to QUERY TERMS before any aggregation — explode →
broadcast semi-join on the distinct query-term set → tf groupBy —
so the only full-corpus exchange carries (doc, query-term) pairs,
never the whole postings list; df for a query term is derived from
that same filtered set (count of docs carrying it), so no
full-vocabulary shuffle ever happens. Doc lengths ride the same scan
map-side. The final top-k window partitions by q_id; its input is
already collapsed to (q_id, doc) scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wos_crawler_spark.operators.textdedup import words_of

#: fixed-point quantum for per-term contributions (nano-nats).
_QUANTUM = 1_000_000_000.0


def corpus_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, term, tf)`` — term frequencies per doc, empty
    tokens dropped. Exposed for tests/reuse; ``bm25_topk`` inlines a
    query-term-filtered variant so the full postings list is never
    shuffled."""
    w = F.explode(words_of(F.col(text_col))).alias("term")
    return (
        docs.select(F.col(id_col).alias("doc_id"), w)
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, dl)`` — non-empty token count per doc (0 for
    NULL/empty text). Map-side only."""
    ws = words_of(F.coalesce(F.col(text_col), F.lit("")))
    dl = F.size(F.filter(ws, lambda x: x != ""))
    return docs.select(F.col(id_col).alias("doc_id"), dl.alias("dl"))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_id_col: str = "q_id",
    q_text_col: str = "q_text",
) -> DataFrame:
    """``(q_id, doc_id, n_terms, score_nano, rank)`` — top-k docs per
    query by quantized BM25 (see module docstring). Query term
    multiplicity is ignored (distinct query terms — the common
    qtf-free Okapi form). Queries are assumed broadcast-scale
    (anything up to ~10^5 rows of short text)."""
    # distinct query terms (broadcast twice: semi-join + score join)
    qterms = (
        queries.select(
            F.col(q_id_col).alias("q_id"),
            F.explode(words_of(F.col(q_text_col))).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    term_set = qterms.select("term").distinct()

    # corpus stats: N over ALL docs, avgdl = sum(dl)/N — one map-side
    # scan + a 1-row aggregate, broadcast back via crossJoin.
    dls = doc_lengths(docs, id_col, text_col)
    stats = dls.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )

    # postings restricted to query terms BEFORE the tf aggregation:
    # the groupBy exchange carries only (doc, query-term) pairs. dl
    # rides the exploded rows into the groupBy key (constant per doc,
    # so cardinality is unchanged) — carrying it is one long per row
    # and saves a corpus-wide doc_id join (two exchanges) against a
    # separate doc-lengths table.
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        words_of(F.coalesce(F.col(text_col), F.lit(""))).alias("_w"),
    ).withColumn("dl", F.size(F.filter(F.col("_w"), lambda x: x != "")))
    hits = (
        base.select("doc_id", "dl", F.explode("_w").alias("term"))
        .filter(F.col("term") != "")
        .join(F.broadcast(term_set), "term", "left_semi")
        .groupBy("doc_id", "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df per (query) term as a WINDOW over the same hits — a
    # groupBy(term) + join-back would re-evaluate the whole corpus
    # explode subtree a second time (no cache, and exchange reuse is
    # a runtime courtesy, not a plan guarantee); the window costs one
    # exchange of the already-small (doc, query-term) set instead.
    hits = hits.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )

    scored_terms = hits.crossJoin(F.broadcast(stats)).join(
        F.broadcast(qterms), "term"
    )
    n = F.col("n_docs").cast("double")
    dfc = F.col("df").cast("double")
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n
    idf = F.ln(F.lit(1.0) + (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)))
    tfpart = (tf * F.lit(k1 + 1.0)) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl)
    )
    contrib = F.floor(idf * tfpart * F.lit(_QUANTUM)).cast("long")

    scores = (
        scored_terms.select("q_id", "doc_id", contrib.alias("c"))
        .groupBy("q_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("c").alias("score_nano"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("score_nano"), F.asc("doc_id")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "doc_id", "n_terms", "score_nano", "rank")
    )


def containment_join(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_id_col: str = "q_id",
    q_text_col: str = "q_text",
) -> DataFrame:
    """Boolean-AND retrieval — ``(q_id, doc_id)`` for every document
    whose distinct token set CONTAINS every distinct query token
    (q ⊆ d). The exact complement to :func:`bm25_topk`'s ranked-OR:
    "which training docs contain ALL of this eval question's tokens"
    is the strict form of benchmark-leak forensics, and the all-
    integer contract (match counts vs query sizes) needs no float
    protocol at all.

    Scale shape (the bm25 move): the corpus side explodes to
    DISTINCT (doc, term) pairs and is immediately semi-joined to the
    broadcast query-term set, so the only corpus-wide exchange
    carries query-term postings — never the vocabulary; matches then
    collapse per (q, doc) and a doc qualifies iff its matched-term
    count equals the query's token count. Empty/whitespace queries
    match NOTHING (a vacuous ⊆ would return the whole corpus —
    refused by contract)."""
    qtok = (
        queries.select(
            F.col(q_id_col).alias("q_id"),
            F.explode(
                F.array_distinct(words_of(F.col(q_text_col)))
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    qn = qtok.groupBy("q_id").agg(F.count(F.lit(1)).alias("_nq"))
    dterms = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(words_of(F.col(text_col)))
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .join(
            F.broadcast(qtok.select("term").distinct()),
            "term",
            "left_semi",
        )
    )
    return (
        dterms.join(F.broadcast(qtok), "term")
        .groupBy("q_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("_nh"))
        .join(F.broadcast(qn), "q_id")
        .filter(F.col("_nh") == F.col("_nq"))
        .select("q_id", "doc_id")
    )


def tfidf_topk_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_num: int | None = None,
    max_df_den: int = 1,
) -> DataFrame:
    """Per-document TF-IDF keyword extraction — the corpus-statistics
    text-analysis op next to BM25's query-time retrieval:
    ``(doc_id, term, tf, df, score_nano, rank)`` for each doc's top-k
    terms under the sklearn-smooth idf ``ln((1+N)/(1+df)) + 1`` (never
    zero, defined at df = N). Same determinism protocol as BM25: the
    score is a single per-(doc, term) product of exact integers
    through an identical IEEE expression tree in both engines,
    floor-quantized to nano-units — no sum exists here at all, so not
    even ordering can flap; rank ties break on term ascending.

    Scale note — and why this op's plan differs from BM25's: keyword
    extraction needs df for EVERY term of every doc (the rare terms
    ARE the keywords), so the vocabulary-keyed exchange BM25 engineers
    away is inherent here: one (doc, term) postings exchange, one
    partial-aggregated df exchange capped at vocabulary size, one
    term-keyed join, then the per-doc top-k window. ``max_df_num /
    max_df_den`` (rational, integer cross-multiplied) drops corpus-
    boilerplate terms BEFORE the window — at web scale always set it:
    it prunes exactly the terms with the largest join fan-out."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    post = corpus_postings(docs, id_col, text_col)
    dfc = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # N = docs with ≥1 token, computed from the docs scan directly —
    # a countDistinct over the postings would re-evaluate the whole
    # explode/agg subtree and add an expand + distinct shuffle for
    # the same single number
    nd = (
        docs.select(words_of(F.col(text_col)).alias("_w"))
        .filter(F.size(F.filter(F.col("_w"), lambda t: t != "")) > 0)
        .agg(F.count(F.lit(1)).alias("_N"))
    )
    j = post.join(dfc, "term").crossJoin(F.broadcast(nd)).filter(
        F.col("df") >= min_df
    )
    if max_df_num is not None:
        # keep iff df/N <= max_df_num/max_df_den, all-integer
        j = j.filter(
            F.col("df") * max_df_den <= F.col("_N") * max_df_num
        )
    idf = F.ln(
        (F.lit(1.0) + F.col("_N")) / (F.lit(1.0) + F.col("df"))
    ) + F.lit(1.0)
    scored = j.withColumn(
        "score_nano",
        F.floor(F.col("tf") * idf * F.lit(_QUANTUM)).cast("long"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_nano").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id", "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score_nano",
            F.col("rank").cast("int").alias("rank"),
        )
    )
