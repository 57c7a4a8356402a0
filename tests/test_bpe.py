"""BPE vocabulary learning + distributed encode: exact merge order on the
classic corpus (hand-computed under this module's END-marker convention),
driver/distributed equivalence, encode correctness, and the loud
truncation bound."""

import warnings

import pytest
from pyspark.sql import functions as F

from sparkfuse.bpe import (
    END,
    _merge_pair,
    apply_bpe,
    bpe_vocab,
    encode_word,
    learn_bpe,
    learn_bpe_distributed,
    learn_bpe_from_counts,
    word_frequency_table,
)

# Sennrich et al.'s corpus. Under our convention (every word ends in
# char+END), the exact merge order is hand-computable:
#   l o w</w> x5 | l o w e r</w> x2 | n e w e s t</w> x6 | w i d e s t</w> x3
#   (e,s)=9 -> es | (es,t</w>)=9 -> est</w> | (l,o)=7 -> lo |
#   tie at 6 among (e,w),(n,e),(w,est</w>) -> lexicographic: (e,w)
CORPUS_COUNTS = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
EXPECTED_MERGES_4 = [("e", "s"), ("es", "t" + END), ("l", "o"), ("e", "w")]


def test_merge_order_on_classic_corpus():
    assert learn_bpe_from_counts(CORPUS_COUNTS, 4) == EXPECTED_MERGES_4


def test_merge_loop_exhausts_gracefully():
    merges = learn_bpe_from_counts([("ab", 3)], 100)
    # a b</w> has exactly one pair; after merging it nothing remains
    assert merges == [("a", "b" + END)]


def test_encode_word_applies_ranks_in_order():
    ranks = {p: i for i, p in enumerate(EXPECTED_MERGES_4)}
    assert encode_word("lowest", ranks) == ["lo", "w", "est" + END]
    assert encode_word("low", ranks) == ["lo", "w" + END]
    # unseen word falls back to characters (+ any applicable merges)
    assert encode_word("xyz", ranks) == ["x", "y", "z" + END]


def test_encode_word_concat_reconstructs_word():
    ranks = {p: i for i, p in enumerate(learn_bpe_from_counts(CORPUS_COUNTS, 10))}
    for w in ["low", "lower", "newest", "widest", "lowest", "news"]:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = []
    for i, (w, c) in enumerate(CORPUS_COUNTS):
        # words spread across documents; counts preserved
        rows.extend((100 * i + j, w) for j in range(c))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # plus a multi-word document exercising tokenization
    extra = spark.createDataFrame(
        [(999, "low  lower\tnewest\nwidest")], "doc_id long, text string"
    )
    return df.unionByName(extra)


def test_word_frequency_table(spark, corpus_df):
    wf = dict(
        (r["word"], r["count"]) for r in word_frequency_table(corpus_df, "text").collect()
    )
    assert wf == {"low": 6, "lower": 3, "newest": 7, "widest": 4}


def test_learn_bpe_distributed_equals_driver(spark, corpus_df):
    merges = learn_bpe(corpus_df, "text", 4)
    wf = [("low", 6), ("lower", 3), ("newest", 7), ("widest", 4)]
    assert merges == learn_bpe_from_counts(wf, 4)


def test_distributed_merge_rounds_equal_driver_loop(spark, corpus_df):
    # checkpoint_interval=2 exercises the mid-loop localCheckpoint boundary
    wf = [("low", 6), ("lower", 3), ("newest", 7), ("widest", 4)]
    merges = learn_bpe_distributed(corpus_df, "text", 6, checkpoint_interval=2)
    assert merges == learn_bpe_from_counts(wf, 6)


def _merge_once_py(syms, pair):
    # reference greedy left-to-right single-pair merge
    out, j = [], 0
    while j < len(syms):
        if j + 1 < len(syms) and (syms[j], syms[j + 1]) == pair:
            out.append(pair[0] + pair[1])
            j += 2
        else:
            out.append(syms[j])
            j += 1
    return out


def test_merge_pair_fold_overlap_semantics(spark):
    cases = [
        (["l", "l", "l"], ("l", "l")),  # greedy: first two merge, third survives
        (["a", "b", "a", "b"], ("a", "b")),  # two disjoint merges in one pass
        (["a", "a", "b", "b"], ("a", "b")),  # middle merge; no (a,b) re-created
        (["x"], ("x", "x")),  # single symbol untouched
        (["a", "b"], ("b", "a")),  # absent pair untouched (guard branch)
        (["ab", "c", "ab", "c", "c"], ("ab", "c")),  # multi-char symbols
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(cases)], "id long, syms array<string>"
    )
    for i, (syms, pair) in enumerate(cases):
        got = (
            df.filter(F.col("id") == i)
            .select(_merge_pair(F.col("syms"), *pair).alias("m"))
            .first()["m"]
        )
        assert got == _merge_once_py(syms, pair), (syms, pair)


def test_distributed_rounds_equal_driver_on_random_corpus(spark):
    # non-ASCII alphabet char exercises code-point splitting + the UTF-8
    # binary vs Python code-point tie-break ordering equivalence
    import random

    rng = random.Random(7)
    words = [
        "".join(rng.choice("abcé") for _ in range(rng.randint(1, 6)))
        for _ in range(120)
    ]
    docs = [(i, " ".join(rng.sample(words, rng.randint(1, 8)))) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    wf = [(r["word"], r["count"]) for r in word_frequency_table(df, "text").collect()]
    n = 12
    assert learn_bpe_distributed(df, "text", n, checkpoint_interval=5) == (
        learn_bpe_from_counts(wf, n)
    )


def test_distributed_rounds_exhaust_gracefully(spark):
    # "ab" -> (a, b</w>) is the only possible merge; the loop must stop
    # early when every word is a single symbol (empty pair table)
    df = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    assert learn_bpe_distributed(df, "text", 5) == [("a", "b" + END)]


def test_apply_bpe_matches_per_word_encode(spark, corpus_df):
    merges = learn_bpe(corpus_df, "text", 6)
    ranks = {p: i for i, p in enumerate(merges)}
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in apply_bpe(corpus_df, "text", merges).collect()
    }
    assert out[999] == (
        encode_word("low", ranks)
        + encode_word("lower", ranks)
        + encode_word("newest", ranks)
        + encode_word("widest", ranks)
    )
    assert out[0] == encode_word("low", ranks)


def test_apply_bpe_null_and_empty(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   ")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["bpe_tokens"]
           for r in apply_bpe(df, "text", [("a", "b")]).collect()}
    assert out == {0: [], 1: [], 2: []}


def test_apply_bpe_plan_has_no_exchange(spark, corpus_df):
    plan = (
        apply_bpe(corpus_df, "text", [("e", "s")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_learn_bpe_truncation_warns_and_bounds(spark, corpus_df):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        merges = learn_bpe(corpus_df, "text", 2, max_words=2)
    assert any("token mass" in str(x.message) for x in w)
    # the kept head is (newest:7, low:6) — merges come from those alone
    assert merges == learn_bpe_from_counts([("newest", 7), ("low", 6)], 2)


def test_bpe_vocab_inventory():
    merges = learn_bpe_from_counts(CORPUS_COUNTS, 3)
    vocab = bpe_vocab(merges, CORPUS_COUNTS)
    assert "es" in vocab and "est" + END in vocab and "lo" in vocab
    assert "w" + END in vocab  # char-with-END variant from 'low'


def test_real_documents_roundtrip(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text").limit(200)
    )
    merges = learn_bpe(docs, "text", 64)
    enc = apply_bpe(docs, "text", merges)
    joined = enc.select(
        "doc_id",
        F.array_join(F.col("bpe_tokens"), "").alias("glued"),
        F.concat_ws("", F.transform(
            F.filter(F.split(F.trim("text"), r"[ \t\n\r\f]+"), lambda w: w != ""),
            lambda w: F.concat(w, F.lit(END)),
        )).alias("want"),
    )
    bad = joined.filter(F.col("glued") != F.col("want")).count()
    assert bad == 0
