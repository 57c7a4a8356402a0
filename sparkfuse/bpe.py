"""Byte-pair-encoding vocabulary learning and application — the
industrial distributed shape (Sennrich et al. 2016, the subword-nmt /
GPT-2 training recipe).

The trick that makes BPE training distributable is that after whitespace
pre-tokenization, merges never cross word boundaries — so the corpus
reduces LOSSLESSLY to its word-frequency table before any merge work
happens:

1. **Distributed word count** (the only pass over the corpus): scan →
   explode(tokens) → groupBy(word).count() — pure codegen, partial
   aggregation absorbs the zipf head, one shuffle of (word, count).
   At 100 TB this is the same plan as every word-count; the OUTPUT is
   bounded by vocabulary growth (Heaps' law), not corpus size.
2. **Merge loop** on the word-frequency table — inherently sequential
   (merge i+1's counts depend on merge i), with two interchangeable
   engines producing the SAME merge list:
   - ``learn_bpe``: driver-side incremental loop. NOT a driver-size
     cheat at ordinary scale — the table is orders of magnitude smaller
     than the corpus — and ``max_words`` bounds driver memory LOUDLY
     (tail truncated by frequency, dropped mass reported).
   - ``learn_bpe_distributed``: the word table never leaves the cluster;
     each round is one Spark pair-count aggregation (output bounded by
     the live pair vocabulary) plus a JVM-side fold rewriting only the
     affected words. Use it when the distinct-word table is past driver
     memory — the regime where ``max_words`` truncation would drop real
     pair mass.
3. **Distributed encode**: broadcast the learned ranks; a pandas UDF
   applies merges per word with a PER-BATCH MEMO over distinct words —
   zipf means a 65k-row Arrow batch hits a few thousand distinct words,
   so the per-word Python loop amortizes ~10-100x. (Merge application is
   inherently iterative per word; this is the honest Pandas-UDF case the
   brief's UDF ladder reserves for semantics built-ins can't express.)

Determinism: pair-count ties break on the lexicographically smaller pair,
so the learned merge list is a pure function of the word-frequency table
(and therefore of the corpus) — same property the filter builds guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfuse.textops import tokens_col

END = "</w>"  # end-of-word marker: lets a merge distinguish suffix position


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + END,)


def learn_bpe_from_counts(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The sequential merge loop over a (word, count) table — exact BPE:
    repeatedly merge the globally most frequent adjacent symbol pair,
    ties to the lexicographically smaller pair. Pair counts are updated
    incrementally (only words containing the merged pair are revisited),
    the subword-nmt approach."""
    words: list[tuple[tuple[str, ...], int]] = [
        (_word_symbols(w), c) for w, c in word_counts if w
    ]
    # pair -> total count; pair -> set of word indexes containing it
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def scan_word(idx: int, sign: int) -> None:
        syms, cnt = words[idx]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + sign * cnt
            if sign > 0:
                pair_words.setdefault((a, b), set()).add(idx)

    for i in range(len(words)):
        scan_word(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        for pair, cnt in pair_counts.items():
            if cnt <= 0:
                continue
            if best is None or cnt > pair_counts[best] or (
                cnt == pair_counts[best] and pair < best
            ):
                best = pair
        if best is None:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for idx in list(pair_words.get(best, ())):
            syms, cnt = words[idx]
            scan_word(idx, -1)
            out = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[idx] = (tuple(out), cnt)
            scan_word(idx, +1)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def word_frequency_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over whitespace tokens — the corpus's lossless
    reduction for BPE purposes. Pure codegen + one partial-agg shuffle."""
    return (
        df.select(F.explode(tokens_col(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def learn_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    max_words: int = 5_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a corpus: distributed word count,
    bounded driver merge loop (module docstring has the scale argument).

    If the vocabulary exceeds ``max_words``, the frequency tail is
    truncated deterministically (count DESC, word ASC) and the dropped
    token mass is reported in the raised-or-logged message — truncation
    changes pair counts by at most the dropped mass, the standard
    industrial bound."""
    wf = word_frequency_table(df, text_col)
    # deterministic driver fetch: top-(max_words+1) by (count DESC, word)
    head = wf.orderBy(F.desc("count"), F.asc("word")).limit(max_words + 1).collect()
    if len(head) > max_words:
        total = wf.agg(F.sum("count")).first()[0]
        head = head[:max_words]
        kept = sum(r["count"] for r in head)
        import warnings

        warnings.warn(
            f"learn_bpe: vocabulary exceeds max_words={max_words}; "
            f"truncated tail carries {1 - kept / total:.2%} of token mass",
            stacklevel=2,
        )
    return learn_bpe_from_counts([(r["word"], r["count"]) for r in head], n_merges)


def symbols_table(df: DataFrame, text_col: str) -> DataFrame:
    """``(syms: array<string>, count: long)`` — the word-frequency table
    with each word pre-split into BPE symbols (characters, last one
    carrying the ``</w>`` marker). Pure codegen; the distributed merge
    loop's working table."""
    return word_frequency_table(df, text_col).select(
        F.expr(
            "transform(sequence(1, length(word)), i -> "
            "if(i = length(word), concat(substring(word, i, 1), '</w>'), "
            "substring(word, i, 1)))"
        ).alias("syms"),
        "count",
    )


def _pair_hit(syms, la, lb):
    """Boolean column: does ``syms`` contain the adjacent pair (la, lb)?"""
    return F.exists(
        F.transform(
            F.slice(syms, 1, F.size(syms) - 1),
            lambda s, i: (s == la) & (F.element_at(syms, i + F.lit(2)) == lb),
        ),
        lambda x: x,
    )


def _merge_pair(syms, a: str, b: str):
    """Rewrite ``syms`` with every left-to-right non-overlapping (a, b)
    adjacency replaced by the concatenated token — exact greedy BPE merge
    as a left fold. Overlap correctness ("lll" with pair (l, l) merges
    only the first two): the fold merges when the LAST accumulated symbol
    equals ``a``; a just-merged token is ``a + b`` which can never equal
    ``a`` (b is nonempty), so it is never re-used as a left side."""
    la, lb, merged = F.lit(a), F.lit(b), F.lit(a + b)

    def step(acc, s):
        last = F.try_element_at(acc, F.lit(-1))  # null on empty acc (ANSI-safe)
        return F.when(
            last.isNotNull() & (last == la) & (s == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s)))

    folded = F.aggregate(syms, F.array().cast("array<string>"), step)
    return F.when(_pair_hit(syms, la, lb), folded).otherwise(syms)


def learn_bpe_distributed(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    checkpoint_interval: int = 8,
) -> list[tuple[str, str]]:
    """Learn BPE merges with the word table NEVER leaving the cluster —
    the scale path past ``learn_bpe``'s ``max_words`` driver bound (at
    10^12 tokens the distinct-word table can reach billions of rows;
    truncation there drops real pair mass).

    Per merge round (one Spark job each, n_merges rounds total):
      1. pair counts: explode adjacent symbol pairs → partial+final agg
         (the output is bounded by the LIVE PAIR vocabulary, not corpus
         or word count — KBs to low MBs);
      2. the single best (count DESC, pair ASC) row comes to the driver
         — 3 values, nothing else ever does;
      3. affected words (guard predicate ``_pair_hit``) are rewritten by
         a JVM-side fold (``_merge_pair``); untouched words pass through
         column-identical.

    The result is bit-identical to ``learn_bpe_from_counts`` on the same
    word-frequency table: same greedy merge, same (count DESC, lexicographic
    pair ASC) tie-break — Spark's UTF8 binary ordering equals Python's
    code-point ordering because UTF-8 byte order preserves code points.
    The driver loop recomputes pair counts incrementally; here each round
    re-scans the word table — the honest distributed trade (n_merges
    bounded passes over a table that would not fit on any driver).

    ``checkpoint_interval``: every k rounds the working table is
    materialized via ``localCheckpoint`` so the iterative plan cannot
    grow past k layers (same hygiene as graph.connected_components;
    at cluster scale prefer a reliable checkpoint directory)."""
    words = symbols_table(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for round_idx in range(n_merges):
        pair_counts = (
            words.select(
                F.expr(
                    "explode(transform(slice(syms, 1, size(syms) - 1), "
                    "(s, i) -> struct(s as a, syms[i + 1] as b)))"
                ).alias("p"),
                "count",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("count").alias("cnt"))
        )
        best = (
            pair_counts.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:  # every word is a single symbol — nothing left to merge
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        words = words.withColumn("syms", _merge_pair(F.col("syms"), a, b))
        if (round_idx + 1) % checkpoint_interval == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word, lowest-rank-first — exact BPE
    inference (identical to the training-side merge order)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_j = None, -1
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        syms[best_j : best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    return syms


def apply_bpe(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode ``text_col`` into an ``array<string>`` of BPE tokens.

    Broadcast-by-closure ranks (KBs–MBs); scalar pandas UDF with a
    per-batch memo over distinct words (zipf amortization — module
    docstring). The plan is scan → project, no exchange."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def _encode(texts):
        import re

        import pandas as pd

        # EXACTLY tokens_col's class — Python str.split() also splits on
        # \x0b, which the learned vocabulary (built over tokens_col words)
        # never saw (textops' Java-vs-RE2 whitespace rationale)
        split = re.compile(r"[ \t\n\r\f]+").split
        memo: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return []
            out: list[str] = []
            for w in split(text.strip(" \t\n\r\f")):
                if not w:
                    continue
                toks = memo.get(w)
                if toks is None:
                    toks = encode_word(w, ranks)
                    memo[w] = toks
                out.extend(toks)
            return out

        return pd.Series([enc(t) for t in texts])

    return df.withColumn(out_col, _encode(F.col(text_col)))


def bpe_vocab(merges: list[tuple[str, str]], word_counts) -> list[str]:
    """The token inventory the merges induce over a corpus sample:
    single characters (with END variants) plus one token per merge."""
    chars = set()
    for w, _ in word_counts:
        if w:
            chars.update(_word_symbols(w))
    return sorted(chars) + [a + b for a, b in merges]
