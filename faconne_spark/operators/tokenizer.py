"""Distributed tokenizer training: BPE merge learning over a corpus.

BPE (Sennrich et al. 2016, arXiv:1508.07909) operates on the WORD
FREQUENCY TABLE, not the raw corpus — so after one corpus-sized groupBy
every merge iteration runs on a vocabulary-sized relation (≪ corpus at
any scale).  That observation is what makes the algorithm
Spark-shaped: the expensive part is a single map-side-combined count,
and the iterative part touches only bounded data.

All symbol-array rewriting happens in Catalyst lambda expressions
(aggregate/zip_with) — no UDFs, no driver-side loops over rows.  The
greedy left-to-right non-overlapping merge semantics match the
reference BPE implementation exactly (pytest replays it in plain
Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from faconne_spark.functions import tokens_ws
from faconne_spark.session import spread

# split each word into single-character symbols, dropping the empty
# strings Spark's ''-split emits at the boundaries
_CHARS = "filter(split(word, ''), x -> x != '')"

# adjacent symbol pairs of one word: zip the array with itself shifted
_PAIRS = (
    "zip_with(slice(syms, 1, size(syms) - 1),"
    " slice(syms, 2, size(syms) - 1),"
    " (a, b) -> struct(a as left, b as right))"
)

# greedy left-to-right non-overlapping merge of the (l, r) pair inside
# one word's symbol array — the state machine carries (out, merged_last)
# so a symbol produced by a merge is never the left side of another
# merge in the same pass
_MERGE = (
    "aggregate(syms,"
    " named_struct('out', cast(array() as array<string>), 'ml', false),"
    " (s, x) -> if(NOT s.ml AND size(s.out) > 0"
    "            AND element_at(s.out, -1) = l AND x = r,"
    "   named_struct('out', concat(slice(s.out, 1, size(s.out) - 1),"
    "                              array(concat(l, r))), 'ml', true),"
    "   named_struct('out', concat(s.out, array(x)), 'ml', false)),"
    " s -> s.out)"
)


def word_freqs(docs: DataFrame) -> DataFrame:
    """(word, freq) over the whitespace-tokenized corpus — the ONE
    corpus-sized pass of BPE training (map-side combined)."""
    toks = tokens_ws("lower(text)", "spark")
    return (
        spread(docs)
        .select(F.explode(F.expr(toks)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_pair_counts(docs: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent character-pair counts — the table
    the FIRST merge decision reads.  Corpus → word freqs (one shuffle)
    → per-word pair explode weighted by freq (vocabulary-sized input,
    map-side combined groupBy)."""
    words = word_freqs(docs).withColumn("syms", F.expr(_CHARS))
    return (
        words.filter(F.expr("size(syms) >= 2"))
        .select("freq", F.explode(F.expr(_PAIRS)).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("pair_freq"))
    )


def learn_bpe(
    docs: DataFrame, n_merges: int = 10, return_vocab: bool = False
):
    """Learn ``n_merges`` BPE merges: per iteration, pick the highest
    frequency-weighted adjacent symbol pair (ties → lexicographically
    smallest left, then right — deterministic) and rewrite every word's
    symbol array with the greedy non-overlapping merge.  Returns the
    merge table (rank, left, right, pair_freq) — the artifact a
    tokenizer ships.  Stops early (shorter table) when the pair space
    is exhausted before ``n_merges`` — the same termination rule as
    reference BPE trainers.

    Scale: iterations run on the word-frequency table (vocabulary-
    sized); each one is a pair-count groupBy, a 1-row argmax broadcast
    back, and a map-only array rewrite.  The table is checkpointed per
    iteration so lineage stays flat; the 1-row best-pair relation is
    checkpointed too (the merge log would otherwise re-run every
    iteration's pair count when finally evaluated).  No driver
    collect anywhere — ranks ride in as literals, merges as a union of
    1-row DataFrames.
    """
    if n_merges < 1:
        raise ValueError(f"learn_bpe needs n_merges >= 1, got {n_merges}")
    from faconne_spark.operators.dedup import _checkpoint

    # the word string is only needed when the caller wants the final
    # vocabulary back — the merge-table-only path keeps its checkpoints
    # at the original (freq, syms) footprint
    carry = ["word", "freq", "syms"] if return_vocab else ["freq", "syms"]
    words = _checkpoint(
        word_freqs(docs).withColumn("syms", F.expr(_CHARS)).select(*carry)
    )
    merges = []
    for rank in range(n_merges):
        pairs = (
            words.filter(F.expr("size(syms) >= 2"))
            .select("freq", F.explode(F.expr(_PAIRS)).alias("p"))
            .groupBy(
                F.col("p.left").alias("l"), F.col("p.right").alias("r")
            )
            .agg(F.sum("freq").alias("pair_freq"))
        )
        best = _checkpoint(
            pairs.orderBy(
                F.col("pair_freq").desc(), F.col("l"), F.col("r")
            ).limit(1)
        )
        # pair table exhausted (every word a single symbol): stop with
        # the merges learned so far — continuing would cross-join the
        # word table with an EMPTY best relation and wipe it, then
        # churn checkpoint jobs on empty data.  isEmpty() on the
        # 1-row checkpointed relation is a control-flow probe, not a
        # data collect (the same class as CC's observe() counters).
        if best.isEmpty():
            break
        merges.append(best.select(F.lit(rank).alias("rank"), "l", "r", "pair_freq"))
        words = _checkpoint(
            words.crossJoin(F.broadcast(best.select("l", "r")))
            .withColumn("syms", F.expr(_MERGE))
            .select(*carry)
        )
    if not merges:
        # corpus of single-character words: nothing to merge at all —
        # an empty merge table with the contract schema
        table = best.select(
            F.lit(0).alias("rank"), F.col("l").alias("left"),
            F.col("r").alias("right"), "pair_freq",
        )
        return (table, words) if return_vocab else table
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    table = out.select(
        "rank",
        F.col("l").alias("left"),
        F.col("r").alias("right"),
        "pair_freq",
    )
    return (table, words) if return_vocab else table


def bpe_token_counts(docs: DataFrame, n_merges: int = 10) -> DataFrame:
    """Segment the corpus with the merges :func:`learn_bpe` just
    learned: per document, the BPE token count, the whitespace word
    count, and the compression ratio — the gauge a tokenizer-training
    run reports.

    Spark shape: training already holds the final (word → symbol
    array) VOCABULARY relation, so tokenization is one broadcast join
    of the exploded word stream against it (vocabulary-sized build
    side) + a per-doc aggregation — the corpus shuffles once, on
    doc_id.  No re-derivation of merges, no per-merge passes over the
    corpus.
    """
    table, vocab = learn_bpe(docs, n_merges, return_vocab=True)
    toks = tokens_ws("lower(text)", "spark")
    stream = spread(docs).select(
        "doc_id", F.explode(F.expr(toks)).alias("word")
    )
    return (
        stream.join(
            F.broadcast(vocab.select("word", F.expr("size(syms)").alias("_n"))),
            "word",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("_n").alias("n_bpe_tokens"),
        )
        .withColumn(
            "tokens_per_word",
            F.expr(
                "round(cast(n_bpe_tokens as double) / cast(n_words as double), 6)"
            ),
        )
    )
