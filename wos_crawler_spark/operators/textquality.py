"""Text-analysis operators for the training-data pipeline: language
ID, quality scoring, token counting, document fingerprinting. All pure
Catalyst exprs (codegen'd, oracle-checkable in DuckDB) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wos_crawler_spark.operators.textdedup import norm_text, words_of

#: Tiny per-language stopword lists for the n-gram/stopword heuristic
#: language ID. Deterministic data, shared with the DuckDB oracle.
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "for", "with", "on"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "dans", "pour", "que"],
}

#: BPE-ish token regex: word pieces, numbers, or single non-space
#: symbols — a deterministic stand-in for a real tokenizer's pre-split.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    w = words_of(text)
    return [
        (lang, F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in sw]))))
        for lang, sw in sorted(STOPWORDS.items())
    ]


def lang_id(text: Column) -> Column:
    """Stopword-hit argmax; ties break to the lexicographically first
    language; zero hits → 'und'. Deterministic, SQL-expressible."""
    scores = lang_scores(text)
    best_lang, best_score = scores[0]
    best_lang = F.lit(best_lang)
    for lang, score in scores[1:]:
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return F.when(best_score > 0, best_lang).otherwise(F.lit("und"))


def token_count_ws(text: Column) -> Column:
    """Whitespace token count. Empty/whitespace-only (or null) text is
    0 tokens — ``split('', ' ')`` yields ``['']`` (size 1), which would
    hand empty documents one phantom word and let them sneak past
    length-based quality filters."""
    n = norm_text(text)
    return F.when(
        n.isNull() | (n == ""), F.lit(0)
    ).otherwise(F.size(words_of(text)))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish regex token count (pre-tokenizer pieces)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio features + a composite
    quality score in [0,1] (weights documented inline — deterministic
    contract, not a learned model)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = token_count_ws(t)
    avg_word_len = (F.length(norm_text(t)) - (n_words - 1)) / F.greatest(n_words, F.lit(1))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0)))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    all_stop = sorted({w for sw in STOPWORDS.values() for w in sw})
    stop_hits = F.size(
        F.array_intersect(words_of(t), F.array(*[F.lit(s) for s in all_stop]))
    )
    stopword_ratio = stop_hits / F.greatest(n_words, F.lit(1))
    # composite: reward mid-length docs and low punctuation noise
    length_score = F.least(n_words / F.lit(100.0), F.lit(1.0))
    quality = (
        F.lit(0.5) * length_score
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.2) * F.least(stopword_ratio * 5, F.lit(1.0))
    )
    return df.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_words.alias("q_n_words"),
        F.round(avg_word_len, 4).alias("q_avg_word_len"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(stopword_ratio, 6).alias("q_stopword_ratio"),
        F.round(quality, 6).alias("q_score"),
    )


#: Gopher repetition-free quality rules require a handful of English
#: function words to appear (Rae et al. 2021 §A1.1 uses
#: the/be/to/of/and/that/have/with — public heuristic).
GOPHER_REQUIRED_STOPWORDS = [
    "the", "be", "to", "of", "and", "that", "have", "with",
]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_required_stop: int = 2,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, §A1.1) as pure
    Catalyst exprs: per-rule boolean columns plus the conjunctive
    ``gopher_keep``. Every ratio threshold is evaluated as an INTEGER
    cross-multiplication (``10*n_sym < n_words`` instead of
    ``n_sym/n_words < 0.1``) so the DuckDB oracle can recompute the
    exact same booleans with zero IEEE-boundary risk — the same
    discipline as pipeline_curation's quality gate.

    Rules (names = emitted columns):
      r_word_count     word count within [min_words, max_words]
      r_mean_word_len  mean word length within [min, max] (integral
                       bounds, exact via sum-of-lengths bounds)
      r_symbol_ratio   '#'/ellipsis symbol-to-word ratio < 0.1
      r_bullet_lines   < 90% of lines start with a bullet
      r_ellipsis_lines < 30% of lines end with an ellipsis
      r_alpha_words    > 80% of words contain a letter
      r_stopwords      >= min_required_stop distinct required stopwords

    NULL text is treated as empty (all rules false, keep false) —
    without the coalesce, ``split(NULL)`` yields NULL arrays whose
    ``size`` is -1 and the line-rule booleans go nondeterministic.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    w = words_of(t)
    n_words = token_count_ws(t)
    # norm_text joins words with single spaces, so the word-length sum
    # is its length minus the (n_words-1) separators.
    sum_word_len = F.length(norm_text(t)) - (n_words - F.lit(1))
    lines = F.split(t, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).startswith("-")
            | F.trim(l).startswith("*")
            | F.trim(l).startswith("•"),
        )
    )
    n_ellipsis_end = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).endswith("...")
            | F.rtrim(l).endswith("…"),
        )
    )
    n_symbols = F.regexp_count(t, F.lit(r"#|\.\.\.|…"))
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
    n_stop = F.size(
        F.array_intersect(
            w, F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS])
        )
    )
    rules = {
        "r_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r_mean_word_len": (
            sum_word_len >= n_words * min_mean_word_len
        ) & (sum_word_len <= n_words * max_mean_word_len),
        "r_symbol_ratio": n_symbols * 10 < n_words,
        "r_bullet_lines": n_bullet * 10 < n_lines * 9,
        "r_ellipsis_lines": n_ellipsis_end * 10 < n_lines * 3,
        "r_alpha_words": n_alpha * 5 > n_words * 4,
        "r_stopwords": n_stop >= min_required_stop,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    return df.select(
        "*",
        *(c.alias(name) for name, c in rules.items()),
        keep.alias("gopher_keep"),
    )


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 hex of normalized text
    (the rolling-hash family's degenerate whole-doc case; windowed
    rolling fingerprints live in textdedup.word_shingles + xxhash64)."""
    return F.md5(norm_text(text))


def rolling_fingerprints(text: Column, window: int = 8) -> Column:
    """Winnowing-style rolling fingerprints: xxhash64 of each
    ``window``-word shingle → array<long>. Min-sampled variants are a
    downstream array_min over slices. Empty text → empty array (not
    one fingerprint of '')."""
    w = words_of(text)
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(w) - (window - 1)))
    fps = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(w, i, window)))
    )
    return F.when(norm_text(text) == "", F.array().cast("array<bigint>")).otherwise(fps)
