"""BPE training/encoding: classic toy-corpus pin, independent
python-twin equality (training AND encoding), merge-pass overlap
semantics, tie-breaks, partitioning invariance, checkpointed-lineage
path, early stop, NULL/empty docs, guards."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode_documents,
    bpe_train,
    corpus_word_counts,
    merges_table,
)


# ------------------------------------------------------- python twin
def _ref_pass(syms, a, b):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _ref_train(word_counts, n_merges):
    vocab = {
        w: (list(w) + [END_OF_WORD], n) for w, n in word_counts.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((a, b, cnt))
        vocab = {
            w: (_ref_pass(syms, a, b), n)
            for w, (syms, n) in vocab.items()
        }
    return merges, vocab


def _wc(docs):
    c = Counter()
    for t in docs:
        if t:
            c.update(w for w in t.split() if w)
    return dict(c)


# ------------------------------------------------------------- tests
SENNRICH = [
    (0, "low low low low low"),
    (1, "lower lower"),
    (2, "newest newest newest"),
    (3, "widest"),
]


@pytest.fixture(scope="module")
def toy(spark):
    docs = spark.createDataFrame(SENNRICH, "doc_id long, text string")
    merges, final = bpe_train(corpus_word_counts(docs), 6)
    return docs, merges, final


def test_toy_merges_classic(toy):
    _, merges, _ = toy
    assert merges == [
        ("l", "o", 7),
        ("lo", "w", 7),
        ("low", END_OF_WORD, 5),
        ("e", "s", 4),
        ("es", "t", 4),
        ("est", END_OF_WORD, 4),
    ]


def test_toy_encode(toy):
    docs, merges, _ = toy
    got = {
        r.doc_id: r.tokens
        for r in bpe_encode_documents(docs, merges).collect()
    }
    assert got[0] == ["low</w>"] * 5
    assert got[2] == ["n", "e", "w", "est</w>"] * 3
    assert got[3] == ["w", "i", "d", "est</w>"]


def test_python_twin_property(spark):
    rng = random.Random(42)
    alphabet = "abcdefg"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        for _ in range(60)
    ]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(3, 30))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges, final = bpe_train(corpus_word_counts(df), 25)
    ref_merges, ref_vocab = _ref_train(_wc([t for _, t in docs]), 25)
    assert merges == ref_merges
    # final symbol sequences match the twin word-for-word
    got = {r.word: r.syms for r in final.collect()}
    assert got == {w: syms for w, (syms, _) in ref_vocab.items()}
    # encoding matches the twin's per-word application
    enc = {
        r.doc_id: r.tokens
        for r in bpe_encode_documents(df, merges).collect()
    }
    for i, t in docs:
        want = []
        for w in t.split():
            syms = list(w) + [END_OF_WORD]
            for a, b, _ in ref_merges:
                syms = _ref_pass(syms, a, b)
            want.extend(syms)
        assert enc[i] == want, i


def test_overlap_single_pass_semantics(spark):
    # one pass is left-to-right non-overlapping: aaaa -> [aa, aa];
    # aaa -> [aa, a]. 'a  a' dominates pair counts by weight.
    df = spark.createDataFrame(
        [(0, " ".join(["aaaa"] * 6 + ["aaa"] * 5))],
        "doc_id long, text string",
    )
    merges, final = bpe_train(corpus_word_counts(df), 1)
    assert merges[0][:2] == ("a", "a")
    # 6*3 (aaaa has 3 adjacent aa) + 5*2 = 28
    assert merges[0][2] == 28
    syms = {r.word: r.syms for r in final.collect()}
    assert syms["aaaa"] == ["aa", "aa", END_OF_WORD]
    assert syms["aaa"] == ["aa", "a", END_OF_WORD]


def test_tiebreak_lexicographic(spark):
    # 'ab' and 'cd' each appear 3 times -> pairs (a,b) and (c,d) tie
    # (as do the (x,</w>) pairs); lexicographically smallest wins
    df = spark.createDataFrame(
        [(0, "ab ab ab cd cd cd")], "doc_id long, text string"
    )
    merges, _ = bpe_train(corpus_word_counts(df), 1)
    assert merges[0][:2] == ("a", "b")


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(SENNRICH, "doc_id long, text string")
    m1, _ = bpe_train(corpus_word_counts(df.repartition(1)), 6)
    m7, _ = bpe_train(corpus_word_counts(df.repartition(7)), 6)
    assert m1 == m7


def test_checkpointed_path_equal(spark):
    df = spark.createDataFrame(SENNRICH, "doc_id long, text string")
    m_plain, _ = bpe_train(
        corpus_word_counts(df), 6, checkpoint_every=100
    )
    m_ckpt, final = bpe_train(
        corpus_word_counts(df), 6, checkpoint_every=2
    )
    assert m_plain == m_ckpt
    assert final.count() == 4  # word table survives checkpointing


def test_batched_equals_sequential(spark):
    """batch>1 must be bit-identical to the sequential argmax loop —
    select_merge_batch's whole contract (symbol-disjoint prefix +
    strict descent at the cut). Random corpus over a tiny alphabet so
    ties and overlapping-pair hazards are dense."""
    rng = random.Random(7)
    alphabet = "abcd"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(40)
    ]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(3, 20))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    wc = corpus_word_counts(df)
    m_seq, _ = bpe_train(wc, 30, batch=1)
    ref_merges, _ = _ref_train(_wc([t for _, t in docs]), 30)
    assert m_seq == ref_merges
    for b in (2, 8, 64):
        m_b, final_b = bpe_train(wc, 30, batch=b)
        assert m_b == m_seq, f"batch={b}"
    # the final word table matches the twin's post-merge state too
    got = {r.word: r.syms for r in final_b.collect()}
    _, ref_vocab = _ref_train(_wc([t for _, t in docs]), 30)
    assert got == {w: syms for w, (syms, _) in ref_vocab.items()}


def test_select_merge_batch_strict_descent():
    from wos_crawler_spark.operators.bpe import select_merge_batch

    # overlap cut: ('b','c') shares 'b' → stop; tie with the cut count
    # pops ('x','y') (rule 2); survivors strictly above the cut
    ranked = [("a", "b", 10), ("x", "y", 5), ("b", "c", 5), ("q", "r", 4)]
    assert select_merge_batch(ranked, 4, saw_all=True) == [("a", "b", 10)]
    # no overlap, saw_all: everything selected, no cut
    ranked = [("a", "b", 10), ("c", "d", 10), ("e", "f", 10)]
    assert select_merge_batch(ranked, 4, saw_all=True) == ranked
    # not saw_all: unseen rows may tie the tail → tail ties popped
    assert select_merge_batch(ranked, 4, saw_all=False) == [
        ("a", "b", 10)
    ]  # rule 3 keeps rank-1 after rule 2 empties the tie run
    # merged-symbol collision counts as overlap: 'ab' created by #1
    ranked = [("a", "b", 10), ("ab", "z", 6)]
    assert select_merge_batch(ranked, 4, saw_all=True) == [("a", "b", 10)]


def test_early_stop(spark):
    # single-char words exhaust their pairs quickly
    df = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    merges, _ = bpe_train(corpus_word_counts(df), 10)
    # a</w> and b</w> merges only — then no adjacent pairs remain
    assert len(merges) == 2
    assert {m[:2] for m in merges} == {
        ("a", END_OF_WORD), ("b", END_OF_WORD)
    }


def test_null_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(0, "low low"), (1, None), (2, "   ")],
        "doc_id long, text string",
    )
    merges, _ = bpe_train(corpus_word_counts(df), 2)
    got = {
        r.doc_id: r.tokens
        for r in bpe_encode_documents(df, merges).collect()
    }
    assert got[1] is None
    assert got[2] == []


def test_merges_table_shape(spark, toy):
    _, merges, _ = toy
    rows = merges_table(spark, merges).orderBy("step").collect()
    assert [r.step for r in rows] == [1, 2, 3, 4, 5, 6]
    assert rows[1].merged == "low"
    assert rows[2].merged == "low" + END_OF_WORD


def test_guard(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_train(corpus_word_counts(df), 0)


def test_save_load_roundtrip(spark, toy, tmp_path):
    from wos_crawler_spark.operators.bpe import load_bpe, save_bpe

    docs, merges, _ = toy
    p = str(tmp_path / "bpe_idx")
    save_bpe(spark, merges, p)
    loaded = load_bpe(spark, p)
    assert loaded == merges
    # encoding from the loaded artifact is identical
    a = {r.doc_id: r.tokens for r in bpe_encode_documents(docs, merges).collect()}
    b = {r.doc_id: r.tokens for r in bpe_encode_documents(docs, loaded).collect()}
    assert a == b


def test_load_guards(spark, toy, tmp_path):
    import json
    import os

    from wos_crawler_spark.operators.bpe import load_bpe, save_bpe

    _, merges, _ = toy
    p = str(tmp_path / "bpe_bad")
    save_bpe(spark, merges, p)
    meta = json.load(open(os.path.join(p, "_meta.json")))
    meta["end_of_word"] = "##"
    json.dump(meta, open(os.path.join(p, "_meta.json"), "w"))
    with pytest.raises(ValueError):
        load_bpe(spark, p)
    meta["end_of_word"] = END_OF_WORD
    meta["kind"] = "ivf"
    json.dump(meta, open(os.path.join(p, "_meta.json"), "w"))
    with pytest.raises(ValueError):
        load_bpe(spark, p)


def test_encode_string_id_column(spark, toy):
    _, merges, _ = toy
    df = spark.createDataFrame(
        [("u/1", "low low"), ("u/2", None)], "doc_id string, text string"
    )
    got = {
        r.doc_id: r.tokens
        for r in bpe_encode_documents(df, merges).collect()
    }
    assert got["u/1"] == ["low</w>", "low</w>"] and got["u/2"] is None
