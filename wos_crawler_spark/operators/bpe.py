"""Distributed BPE vocabulary training + encoding (Sennrich, Haddow &
Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units") — the tokenizer-construction step of a training-data pipeline,
upstream of token counting / sequence packing / shard writing.

No reference-crawler analog (SURVEY.md has no tokenizer row) — part of
the training-data family the brief adds, next to
``textquality.token_count_bpe``'s regex approximation: this is the
real, learned merge table.

Algorithm (word-level BPE, the published formulation):

1. Pre-tokenize the corpus on whitespace; aggregate to DISTINCT words
   with corpus frequencies.
2. Represent each word as a symbol sequence: its characters plus a
   final ``</w>`` end-of-word marker token.
3. Repeat ``n_merges`` times: count adjacent symbol pairs weighted by
   word frequency; take the most frequent pair (ties broken by
   lexicographic ``(left, right)`` — deterministic across engines and
   partitionings); merge that pair everywhere in one left-to-right
   non-overlapping pass.

Scale shape — why this is the right 100 TB decomposition:

- The ONLY corpus-scale stage is the initial word count: one
  partially-aggregated exchange whose output is vocab-bounded
  (~10^7-10^8 distinct words at web scale, versus 10^12+ corpus
  tokens). Everything after runs on the distinct-word table.
- Each merge iteration is: one pair-count aggregation over the word
  table (partial agg caps the exchange at distinct-pair cardinality),
  one single-row argmax collect (driver-scale by construction), one
  map-side merge application. ``n_merges`` iterations deepen lineage,
  so the word table is ``localCheckpoint``-truncated every
  ``checkpoint_every`` rounds — the label-propagation discipline from
  :mod:`textdedup`.
- The merge-application pass is a Catalyst ``F.aggregate`` fold (no
  Python): interpreted, but over the vocab-bounded word table, never
  the corpus.
- Encoding is a ZERO-shuffle Arrow ``mapInPandas`` pass: the learned
  merge list broadcasts in the closure, per-batch memoization encodes
  each distinct word once.

Merge-pass semantics (pinned by tests and shared with the oracle):
one pass per merge, scanning left to right, non-overlapping — i.e.
``[a,a,a]`` under merge ``(a,a)`` becomes ``[aa,a]``, and a symbol
created by this pass never re-merges within the same pass. This is
exactly the semantics of a plain string ``replace`` over the
wrap-encoded sequence (every token wrapped in single spaces, so
internal boundaries carry two spaces) — which is how the DuckDB
oracle recomputes the whole training loop from scratch in static SQL
(see ``__spark_entry__._bpe_oracle_sql``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: End-of-word marker appended as a standalone final symbol.
END_OF_WORD = "</w>"

#: Pre-tokenizer: whitespace runs. Shared verbatim with the oracle
#: (Java-regex ∩ RE2 identical).
WORD_SPLIT_RE = r"\s+"


def corpus_word_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``(word, n)`` distinct-word frequencies — the one corpus-scale
    stage. Empty tokens (split artifacts) are dropped in both engines.
    """
    words = df.select(
        F.explode(
            F.filter(
                F.split(F.col(text_col), WORD_SPLIT_RE),
                lambda x: x != "",
            )
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count("*").alias("n"))


def _initial_symbols() -> F.Column:
    """Characters + trailing END_OF_WORD token, from ``word``."""
    return F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
    )


def _merge_pass(syms_col, left: str, right: str) -> F.Column:
    """One left-to-right non-overlapping merge pass of (left, right) →
    left+right over a symbol array, as a Catalyst fold.

    The fold appends each symbol unless the accumulator's last element
    equals ``left`` and the incoming symbol equals ``right``, in which
    case the last element is replaced by the merged symbol. Because
    ``left+right != left`` always, a symbol created by this pass can
    never act as the left side again within the pass — bit-equal to
    the oracle's wrap-encoded ``replace`` (pinned in tests).
    """
    merged = F.lit(left + right)
    # F.get (0-based, NULL out of range) instead of element_at: ANSI
    # mode raises INVALID_ARRAY_INDEX on the empty accumulator, and
    # Catalyst's And does not guarantee short-circuit evaluation.
    return F.aggregate(
        syms_col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _apply_merges(syms_col, pairs: list[tuple[str, str]]) -> F.Column:
    """Apply a round's merges as ONE wrap-encoded replace chain —
    the engine-side use of the same provable equivalence the DuckDB
    oracle rests on: with every token wrapped in single spaces
    (internal boundaries carry exactly two), a plain
    ``replace(seq, ' a  b ', ' ab ')`` IS one left-to-right
    non-overlapping merge pass, and tokens never contain spaces
    (whitespace-split words; merges only concatenate). Native
    codegen'd string ops run an order of magnitude faster than the
    interpreted per-merge :func:`_merge_pass` fold over the word
    table — the fold remains as the semantic reference (test-pinned
    equal)."""
    seq = F.concat(
        F.lit(" "), F.array_join(syms_col, "  "), F.lit(" ")
    )
    for a, b in pairs:
        seq = F.replace(
            seq, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
        )
    applied = F.split(F.trim(seq), "  ")
    # split('') yields [''], not [] — preserve empty-syms inputs as-is
    return F.when(F.size(syms_col) == 0, syms_col).otherwise(applied)


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the word table, weighted by
    word count. Partial aggregation caps the exchange at
    distinct-pair cardinality."""
    # sequence(0, -1) DESCENDS in Spark: a single-symbol word would
    # generate [0, -1] and trip ANSI INVALID_ARRAY_INDEX — guard with
    # an explicit empty-pairs branch.
    pairs = words.select(
        "n",
        F.explode(
            F.expr(
                "CASE WHEN size(syms) < 2"
                " THEN CAST(array() AS array<struct<a:string,b:string>>)"
                " ELSE transform(sequence(0, size(syms) - 2),"
                " i -> struct(syms[i] AS a, syms[i + 1] AS b)) END"
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("n").alias("cnt")
    )


def select_merge_batch(
    ranked: list[tuple[str, str, int]],
    batch: int,
    saw_all: bool,
) -> list[tuple[str, str, int]]:
    """Pick the longest prefix-of-safe-merges from one round's ranked
    pair counts such that applying them together is PROVABLY equal to
    running the sequential argmax loop merge-by-merge.

    ``ranked`` is the top-K slice of the current pair-count table in
    the total order ``(cnt DESC, left ASC, right ASC)``; ``saw_all``
    says whether the slice is the whole table. Rules (each justified
    against the sequential algorithm):

    1. **Symbol-disjointness.** Scan in rank order, selecting while the
       candidate shares no symbol with any earlier selection's
       ``{left, right, left+right}`` footprint; STOP at the first
       overlap. Merging (a,b) only changes counts of pairs touching
       ``a``/``b``/``ab``: a disjoint pair's occurrences (and hence its
       count AND its recorded ``pair_n``) are untouched, so every
       selected pair is still the exact argmax at its sequential step —
       except for the tie case rule 2 closes.
    2. **Strict descent at the cut.** New pairs created by a merge
       (``(x, ab)``, ``(ab, y)``) have counts bounded by the OLD counts
       of the overlapping pairs ``(x, a)`` / ``(b, y)``; every
       overlapping unselected pair ranks at/after the stop point, so
       its count is ≤ the stop candidate's. A created pair could
       therefore TIE a later selection's count and win the
       lexicographic tie-break under a different name — so drop the
       selected tail down to counts STRICTLY ABOVE the stop
       candidate's count.
    3. If rule 2 empties the selection, keep the rank-1 pair alone
       (a batch of one is the sequential step itself, always exact).

    When the slice is exhausted without a stop and ``saw_all`` is
    False, unseen pairs may tie the last row — the cut count is the
    last row's own count (rule 2 then pops it and its ties). With
    ``saw_all`` True there is nothing below the slice and no cut."""
    selected: list[tuple[str, str, int]] = []
    footprint: set[str] = set()
    cut_cnt: int | None = None
    for a, b, cnt in ranked:
        if len(selected) == batch or a in footprint or b in footprint:
            cut_cnt = cnt
            break
        selected.append((a, b, cnt))
        footprint.update((a, b, a + b))
    else:
        if not saw_all and ranked:
            cut_cnt = ranked[-1][2]
    if cut_cnt is not None:
        while selected and selected[-1][2] <= cut_cnt:
            selected.pop()
    if not selected and ranked:
        selected = [ranked[0]]
    return selected


def bpe_train(
    words: DataFrame,
    n_merges: int,
    checkpoint_every: int = 8,
    batch: int = 8,
    progress=None,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a ``(word, n)`` table.

    Returns ``(merges, final_words)`` where ``merges`` is the ordered
    list of ``(left, right, pair_count)`` and ``final_words`` the word
    table with its post-merge symbol sequences (``word, n, syms``).

    Stops early if no adjacent pair remains. Argmax ties break on
    lexicographic ``(left, right)`` — deterministic across engines
    and partitionings.

    ``batch`` > 1 amortizes the driver round-trips: each round collects
    the top-``4*batch`` pair counts ONCE and applies the longest
    provably-sequential-equal prefix (see :func:`select_merge_batch`),
    so the merge list is bit-identical to ``batch=1`` while the number
    of sequential Spark jobs drops from ``n_merges`` to about
    ``n_merges / batch`` — the difference between ~10^5 and ~10^3
    driver round-trips for a production 32k-merge vocabulary. The
    selected merges chain as nested Catalyst folds in ONE projection
    (map-side, no extra jobs); lineage still truncates every
    ``checkpoint_every`` APPLIED merges."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if batch < 1:
        raise ValueError("batch must be >= 1")
    cur = words.select("word", "n", _initial_symbols().alias("syms"))
    merges: list[tuple[str, str, int]] = []
    since_ckpt = 0
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        k = 4 * want + 1
        top = (
            _pair_counts(cur)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(k)
            .collect()
        )
        if not top:
            break
        picked = select_merge_batch(
            [(r.a, r.b, int(r.cnt)) for r in top], want, saw_all=len(top) < k
        )
        merges.extend(picked)
        cur = cur.withColumn(
            "syms",
            _apply_merges(F.col("syms"), [(a, b) for a, b, _ in picked]),
        )
        since_ckpt += len(picked)
        if progress is not None:
            # measurement hook (tools/bench_bpe_merges): called with
            # the applied-merge count after each round — no effect on
            # the merge list or the plan
            progress(len(merges))
        if since_ckpt >= checkpoint_every:
            # LAZY checkpoint: the next round's pair-count job (or the
            # caller's first action) materializes it as a side effect —
            # lineage still truncates every round, but no dedicated
            # materialization job runs per checkpoint (with batch=B
            # that halves the trainer's job count)
            cur = cur.localCheckpoint(eager=False)
            since_ckpt = 0
    return merges, cur


def merges_table(
    spark: SparkSession, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """The learned merge list as a DataFrame
    ``(step, left, right, merged, pair_n)`` — the persistable index
    artifact (1-based step = merge priority)."""
    rows = [
        (i + 1, a, b, a + b, n) for i, (a, b, n) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "step int, left string, right string, merged string, pair_n bigint"
    )


def save_bpe(
    spark: SparkSession,
    merges: list[tuple[str, str, int]],
    path: str,
) -> None:
    """Persist the learned merge list as the pipeline artifact every
    downstream job shares: ``<path>/merges`` parquet (step-ordered)
    plus a ``_meta.json`` carrying the end-of-word marker and
    pre-tokenizer so a drifted loader cannot silently mis-tokenize
    (the :mod:`annindex` param-guard discipline)."""
    import json
    import os

    merges_table(spark, merges).write.mode("overwrite").parquet(
        os.path.join(path, "merges")
    )
    with open(os.path.join(path, "_meta.json"), "w") as fh:
        json.dump(
            {
                "kind": "bpe",
                "end_of_word": END_OF_WORD,
                "word_split_re": WORD_SPLIT_RE,
                "n_merges": len(merges),
            },
            fh,
            sort_keys=True,
        )


def load_bpe(
    spark: SparkSession, path: str
) -> list[tuple[str, str, int]]:
    """Step-ordered merge list from :func:`save_bpe`; raises on a
    non-BPE artifact or a marker/pre-tokenizer mismatch with this
    build of the engine."""
    import json
    import os

    with open(os.path.join(path, "_meta.json")) as fh:
        meta = json.load(fh)
    if meta.get("kind") != "bpe":
        raise ValueError(f"not a BPE artifact: {meta.get('kind')!r}")
    if (
        meta["end_of_word"] != END_OF_WORD
        or meta["word_split_re"] != WORD_SPLIT_RE
    ):
        raise ValueError(
            "BPE artifact was built with a different end-of-word "
            "marker or pre-tokenizer than this engine build"
        )
    rows = (
        spark.read.parquet(os.path.join(path, "merges"))
        .orderBy("step")
        .collect()
    )
    if meta["n_merges"] != len(rows):
        raise ValueError("BPE artifact truncated: merge count mismatch")
    return [(r.left, r.right, r.pair_n) for r in rows]


def _encode_word(
    word: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Sequential per-merge application (one pass per merge, in
    learned order) — the exact training semantics, matching the
    oracle's replace chain literally."""
    syms = list(word) + [END_OF_WORD]
    for a, b in merges:
        out: list[str] = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        syms = out
    return syms


def bpe_encode_documents(
    df: DataFrame,
    merges: list[tuple[str, str]] | list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize a corpus with a learned merge list: zero-shuffle Arrow
    ``mapInPandas``, merge list broadcast in the closure, per-batch
    memoization over distinct words. NULL text → NULL tokens."""
    ms = [(m[0], m[1]) for m in merges]
    import re

    splitter = re.compile(WORD_SPLIT_RE)
    # id type derived from the input (the textdedup.py pattern) — a
    # hardcoded 'long' crashes the Arrow serializer on string-keyed
    # corpora (url ids)
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {out_col} array<string>"

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc(text: str | None) -> list[str] | None:
            if text is None:
                return None
            toks: list[str] = []
            for w in splitter.split(text):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = _encode_word(w, ms)
                    cache[w] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: pdf[text_col].map(enc),
                }
            )

    return df.select(id_col, text_col).mapInPandas(_encode, schema)
