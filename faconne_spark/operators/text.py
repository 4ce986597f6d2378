"""Text analysis operators for training-data pipelines.

Language ID (stopword profiles), quality scoring, token counting, and
document fingerprinting — all as Catalyst expressions from the portable
builders, so the DuckDB oracle reproduces them exactly. Zero UDFs: at
100 TB these run entirely inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from faconne_spark.session import spread
from faconne_spark.functions import (
    LANG_PROFILES,
    lang_array_sql,
    phash60,
    tokens_bpe_count,
    tokens_ws,
    word_shingles,
)


def lang_scores_exprs(dialect: str) -> dict:
    """Per-language stopword-hit counts over the token set."""
    toks = tokens_ws("lower(text)", dialect)
    out = {}
    for lang in LANG_PROFILES:
        arr = lang_array_sql(lang, dialect)
        if dialect == "spark":
            out[lang] = f"size(array_intersect(array_distinct({toks}), {arr}))"
        else:
            out[lang] = f"len(list_intersect(list_distinct({toks}), {arr}))"
    return out


def lang_id(docs: DataFrame) -> DataFrame:
    """Best-scoring language profile per document (ties → lexicographic
    first, deterministic).

    Staged so tokenize+distinct runs ONCE per row (`_toksd` column,
    referenced by all 5 profile intersections) and the argmax struct is
    built once (`_best`, referenced twice). CollapseProject keeps
    multiply-referenced non-cheap aliases as separate projections, so
    neither is re-inlined — all within one codegen stage."""
    toks = tokens_ws("lower(text)", "spark")
    pairs = ", ".join(
        f"struct(size(array_intersect(_toksd, {lang_array_sql(lang, 'spark')}))"
        f" as score, '{lang}' as lang)"
        for lang in sorted(LANG_PROFILES)
    )
    return (
        spread(docs)
        .withColumn("_toksd", F.expr(f"array_distinct({toks})"))
        .withColumn("_best", F.expr(f"array_max(array({pairs}))"))
        .select(
            "doc_id",
            "lang",
            F.col("_best.lang").alias("pred_lang"),
            F.col("_best.score").alias("pred_score"),
        )
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features: length, token stats, punctuation /
    non-alpha ratio, stopword ratio, repetition (distinct-token ratio).

    The token array is staged as a column so the split runs once per
    row; the 6 feature expressions all reference `_toks`."""
    toks = tokens_ws("text", "spark")
    en = lang_array_sql("en", "spark")
    return (
        spread(docs)
        .withColumn("_toks", F.expr(toks))
        .select(
            "doc_id",
            F.expr("length(text)").alias("n_chars"),
            F.expr("size(_toks)").alias("n_tokens"),
            F.expr(
                "round(cast(size(array_distinct(_toks)) as double) /"
                " cast(size(_toks) as double), 6)"
            ).alias("distinct_ratio"),
            F.expr(
                "round(cast(length(regexp_replace(text, '[a-zA-Z0-9 ]', '')) as double)"
                " / cast(greatest(length(text), 1) as double), 6)"
            ).alias("punct_ratio"),
            F.expr(
                f"round(cast(size(filter(_toks, t -> array_contains({en}, lower(t)))) as double)"
                " / cast(greatest(size(_toks), 1) as double), 6)"
            ).alias("stopword_ratio"),
            F.expr(
                "round(cast(aggregate(_toks, 0, (a, t) -> a + length(t)) as double)"
                " / cast(greatest(size(_toks), 1) as double), 6)"
            ).alias("mean_token_len"),
        )
    )


GATE_CHECKS = [
    ("too_short", "n_tokens < 5"),
    ("low_diversity", "distinct_ratio < 0.3"),
    ("punct_heavy", "punct_ratio > 0.3"),
    ("no_stopwords", "stopword_ratio < 0.01"),
]


def quality_gate_verdicts(docs: DataFrame) -> DataFrame:
    """Per-document keep/drop with an auditable reject-reason string —
    the decision record a curation run ships alongside the kept corpus.
    Map-only over :func:`quality_score`; shared by the batch registry
    query (queries/pipeline.py) and the streaming variant
    (streaming/stats.py) so the two gates cannot drift."""
    feats = quality_score(docs)
    reason = "concat_ws(',', " + ", ".join(
        f"if({cond}, '{name}', null)" for name, cond in GATE_CHECKS
    ) + ")"
    return feats.select(
        "doc_id",
        F.expr(
            " AND ".join(f"NOT ({cond})" for _, cond in GATE_CHECKS)
        ).alias("keep"),
        F.expr(f"nullif({reason}, '')").alias("reject_reasons"),
    )


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document (map-only)."""
    toks = tokens_ws("text", "spark")
    return spread(docs).select(
        "doc_id",
        F.expr(f"size({toks})").alias("n_ws_tokens"),
        F.expr(tokens_bpe_count("text", "spark")).alias("n_bpe_tokens"),
        F.expr("length(text)").alias("n_chars"),
    )


def readability(docs: DataFrame) -> DataFrame:
    """Flesch reading-ease approximation per document — the classic
    prose-difficulty score, a standard quality feature for curation.

    Syllables are approximated as vowel runs (the dictionary-free
    heuristic); sentences as terminal-punctuation runs, floored at 1 so
    fragments don't divide by zero.  Map-only Catalyst expressions:
    three regexp counts per row, no shuffle, no UDF.  Ratios round to
    6 dp before the score so both engines combine identical doubles."""
    toks = tokens_ws("text", "spark")
    return (
        spread(docs)
        .select(
            "doc_id",
            F.expr(f"size({toks})").alias("n_words"),
            F.expr(
                "greatest(size(regexp_extract_all(text, '[.!?]+', 0)), 1)"
            ).alias("n_sentences"),
            F.expr(
                "size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"
            ).alias("n_syllables"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_sentences",
            "n_syllables",
            F.expr(
                "round(cast(n_words as double) / n_sentences, 6)"
            ).alias("words_per_sentence"),
            F.expr(
                "round(cast(n_syllables as double) / greatest(n_words, 1), 6)"
            ).alias("syllables_per_word"),
        )
        .select(
            "*",
            F.expr(
                "round(206.835 - 1.015 * words_per_sentence"
                " - 84.6 * syllables_per_word, 6)"
            ).alias("flesch"),
        )
    )


def fingerprint(docs: DataFrame, n_shingle: int = 4) -> DataFrame:
    """Winnowing-style fingerprint: min / max / count of shingle hashes
    (a compact, order-invariant sketch usable as a near-dup prefilter)."""
    sh = word_shingles("text", n_shingle, "spark")
    hashed = f"transform({sh}, s -> {phash60('s', 'spark')})"
    return spread(docs).select(
        "doc_id",
        F.expr(f"array_min({hashed})").alias("fp_min"),
        F.expr(f"array_max({hashed})").alias("fp_max"),
        F.expr(f"size({hashed})").alias("n_shingles"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing / sampling / contamination — training-data hygiene ops
# ---------------------------------------------------------------------------

# Backslash-free patterns: valid and identical in Java regex (Spark) and
# RE2 (DuckDB), and safe to embed in single-quoted SQL literals in both
# dialects without any escaping.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(docs: DataFrame, text_expr: str) -> DataFrame:
    """Redact emails/phones from ``text_expr`` (a SQL expression string);
    returns per-doc redaction counts plus a 60-bit hash of the scrubbed
    text, so an oracle can verify the ENTIRE redacted output without
    shipping full strings.

    Scale: pure regexp Catalyst expressions — codegen'd, no UDF, no
    shuffle; at 100 TB this is a map-only pass over the scan."""
    return (
        spread(docs)
        .withColumn(
            "scrubbed",
            F.expr(
                f"regexp_replace(regexp_replace({text_expr},"
                f" '{PII_EMAIL}', '<EMAIL>'), '{PII_PHONE}', '<PHONE>')"
            ),
        )
        .select(
            "doc_id",
            F.expr(
                f"size(regexp_extract_all({text_expr}, '{PII_EMAIL}', 0))"
            ).alias("n_emails"),
            F.expr(
                f"size(regexp_extract_all({text_expr}, '{PII_PHONE}', 0))"
            ).alias("n_phones"),
            F.length("scrubbed").alias("scrubbed_len"),
            F.expr(phash60("scrubbed", "spark")).alias("scrubbed_hash"),
        )
    )


def stratified_sample(docs: DataFrame, rates: dict, mod: int = 100) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff
    ``hash(doc_id) % mod < rates[lang]``.

    ``sampleBy`` draws from a seeded RNG whose stream depends on row
    order / partitioning — not reproducible across engines or runs at
    scale. A content-hash Bernoulli filter is order-independent,
    restart-safe, and pushes down as a plain predicate (map-only)."""
    h = phash60("cast(doc_id as string)", "spark")
    rate = "CASE " + " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(rates.items())
    ) + " ELSE 0 END"
    return spread(docs).filter(F.expr(f"{h} % {mod} < {rate}")).select(
        "doc_id", "lang", "source", "n_chars"
    )


def contamination_check(
    docs: DataFrame, n_shingle: int = 5, bench_mod: int = 20
) -> DataFrame:
    """Benchmark-contamination scan: which training docs share an
    n-gram shingle with the (deterministically chosen) benchmark set,
    and how many distinct shingles overlap.

    Scale: explode to (shingle_hash, doc_id) pairs and JOIN ON HASH —
    never a doc×doc product. The benchmark side (5 % of docs) aggregates
    to distinct shingle hashes and broadcasts at typical benchmark
    sizes; the big side is one explode + one shuffle-free broadcast
    probe."""
    sh = word_shingles("text", n_shingle, "spark")
    hashed = F.expr(f"transform({sh}, s -> {phash60('s', 'spark')})")
    base = spread(docs).select(
        "doc_id", F.explode(hashed).alias("sh_hash")
    )
    bench = (
        base.filter(F.expr(f"doc_id % {bench_mod} = 0"))
        .select("sh_hash")
        .distinct()
    )
    train = base.filter(F.expr(f"doc_id % {bench_mod} <> 0"))
    return (
        train.join(F.broadcast(bench), "sh_hash")
        .groupBy("doc_id")
        .agg(F.countDistinct("sh_hash").alias("n_shared_shingles"))
    )


def length_histogram(docs: DataFrame, bucket_chars: int = 50, n_buckets: int = 10) -> DataFrame:
    """Char-length histogram with capped top bucket + per-bucket stats."""
    bucket = F.expr(
        f"least(cast(floor(n_chars / {bucket_chars}) as int), {n_buckets})"
    )
    return (
        spread(docs)
        .groupBy(bucket.alias("len_bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


def bigrams_all(expr: str, dialect: str) -> str:
    """ALL word bigrams (with repeats — unlike the deduped
    :func:`faconne_spark.functions.word_shingles`, repetition analysis
    needs the multiset). Token array let-bound so the split runs once."""
    toks = tokens_ws(expr, dialect)
    if dialect == "spark":
        body = (
            "transform(sequence(1, greatest(size(tk) - 1, 1)),"
            " i -> concat_ws(' ', slice(tk, i, 2)))"
        )
        return f"transform(array({toks}), tk -> {body})[0]"
    return (
        f"list_transform(range(1, greatest(len({toks}) - 1, 1) + 1),"
        f" i -> array_to_string({toks}[i:i+1], ' '))"
    )


def repetition_signals(docs: DataFrame, top_frac_flag: float = 0.2) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-token
    fraction and the fraction of all bigrams taken by the single most
    frequent bigram (boilerplate/spam indicator), plus a flag.

    Scale design: fully MAP-ONLY — zero shuffles.  The per-doc max
    bigram frequency is the longest run in the SORTED bigram array,
    computed by one aggregate() lambda with (prev, run, best) struct
    state; the earlier explode → two-groupBy formulation shuffled the
    entire bigram stream, which at 100 TB is the corpus rewritten ~2×.
    (The DuckDB oracle keeps its unnest+groupBy formulation — same
    result, different engine-appropriate mechanism.)"""
    toks = tokens_ws("lower(text)", "spark")
    bgs = bigrams_all("lower(text)", "spark")
    top_run = (
        "aggregate(array_sort(_bgs),"
        " struct(cast(null as string) as prev, 0 as run, 0 as best),"
        " (s, x) -> struct(x as prev,"
        "   if(x <=> s.prev, s.run + 1, 1) as run,"
        "   greatest(s.best, if(x <=> s.prev, s.run + 1, 1)) as best),"
        " s -> s.best)"
    )
    return (
        spread(docs)
        .withColumn("_toks", F.expr(toks))
        .withColumn("_bgs", F.expr(bgs))
        .withColumn("_top", F.expr(top_run))
        .select(
            "doc_id",
            F.expr(
                "round(1.0 - cast(size(array_distinct(_toks)) as double)"
                " / cast(size(_toks) as double), 6)"
            ).alias("dup_token_frac"),
            F.expr(
                "round(cast(_top as double) / cast(size(_bgs) as double), 6)"
            ).alias("top_bigram_frac"),
            F.expr(
                f"cast(_top as double) / cast(size(_bgs) as double)"
                f" >= {top_frac_flag}"
            ).alias("repetitive"),
        )
    )


def corpus_topk_ngrams(docs: DataFrame, n: int = 3, k: int = 20) -> DataFrame:
    """Corpus-level most frequent word n-grams (with counts) — the
    frequency-analysis primitive behind boilerplate detection and
    contamination triage.  One explode → one groupBy(ngram) with
    map-side combine → tiny top-k sort; ties broken lexicographically
    so the cut is total-ordered and deterministic in both engines."""
    sh = word_shingles("lower(text)", n, "spark")
    return (
        spread(docs)
        .select(F.explode(F.expr(sh)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("ngram"))
        .limit(k)
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Perplexity-proxy quality score: mean unigram log-probability of
    each document under the corpus's own unigram distribution.

    Two passes over the token stream: (1) corpus frequency table (one
    groupBy, map-side combined; vocabulary-sized output), (2) token →
    frequency broadcast join + per-doc mean.  The corpus total rides in
    as a 1-row broadcast cross-join, never a driver collect.  At 100 TB
    the frequency table is vocabulary-sized (≪ corpus), so the join
    stays broadcast."""
    toks = tokens_ws("lower(text)", "spark")
    tok_stream = spread(docs).select(
        "doc_id", F.explode(F.expr(toks)).alias("tok")
    )
    freqs = tok_stream.groupBy("tok").agg(F.count("*").alias("tok_cnt"))
    total = freqs.agg(F.sum("tok_cnt").alias("corpus_toks"))
    return (
        tok_stream.join(F.broadcast(freqs), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.avg(
                    F.expr(
                        "ln(cast(tok_cnt as double) / cast(corpus_toks as double))"
                    )
                ),
                6,
            ).alias("mean_logprob"),
            F.count("*").alias("n_toks"),
        )
    )


def vocab_coverage(docs: DataFrame, k: int = 50) -> DataFrame:
    """Top-k token vocabulary with cumulative corpus coverage — the
    statistic behind tokenizer-vocab sizing ("how many types cover 95%
    of the stream?").

    One explode → groupBy(token) with map-side combine; the coverage
    window then runs over the top-k relation ONLY (k rows, one
    partition is fine — the full vocabulary never sorts globally).
    Ranks are total-ordered (count desc, token asc) so the cut and the
    running sum are deterministic in both engines."""
    toks = tokens_ws("lower(text)", "spark")
    freqs = (
        spread(docs)
        .select(F.explode(F.expr(toks)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    total = freqs.agg(F.sum("cnt").alias("total"))
    topk = (
        freqs.orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(k)
        .crossJoin(F.broadcast(total))
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.desc("cnt"), F.asc("tok"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return topk.select(
        F.row_number().over(w).alias("rank"),
        "tok",
        "cnt",
        F.expr("round(cast(cnt as double) / cast(total as double), 6)").alias(
            "frac"
        ),
        F.round(
            F.sum(F.expr("cast(cnt as double) / cast(total as double)")).over(w),
            6,
        ).alias("cum_coverage"),
    )


def tfidf_keywords(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k TF-IDF keywords per document — the classic salience
    primitive for tagging / routing / near-dup triage.

    Token stream explodes once and feeds both the per-doc term counts
    and the document-frequency table; N arrives as a 1-row broadcast
    (never a collect), DF joins back as a broadcast (vocabulary-sized).
    Scores are rounded to 6 dp BEFORE ranking so the rank comparison is
    on identical values in Spark and the DuckDB oracle (ln() may differ
    in the last ulp between libm implementations); ties break on the
    token, making the top-k cut total-ordered."""
    from pyspark.sql import Window

    toks = tokens_ws("lower(text)", "spark")
    stream = spread(docs).select(
        "doc_id", F.explode(F.expr(toks)).alias("tok")
    )
    tf = stream.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df_tab = (
        stream.select("doc_id", "tok").distinct()
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("tok")
    )
    return (
        tf.join(F.broadcast(df_tab), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.expr(
                "round(cast(tf as double)"
                " * ln(cast(n_docs as double) / cast(df as double)), 6)"
            ).alias("tfidf"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def winnow_fp_expr(n_shingle: int, w: int, dialect: str) -> str:
    """Winnowing fingerprint set (MOSS algorithm): hash every word
    n-gram IN ORDER, then keep the minimum hash of each sliding window
    of ``w`` consecutive shingle hashes, deduped.  Guarantees any
    shared run of ≥ w+n-1 tokens between two documents shares ≥ 1
    fingerprint — local similarity with ~2/(w+1) selection density.
    Both arrays are let-bound so tokenization and hashing run once."""
    toks = tokens_ws("lower(text)", dialect)
    if dialect == "spark":
        hs = (
            f"transform(array({toks}), tk ->"
            f" transform(sequence(1, greatest(size(tk) - {n_shingle - 1}, 1)),"
            f" i -> {phash60(f'''concat_ws(' ', slice(tk, i, {n_shingle}))''', 'spark')}))[0]"
        )
        return (
            f"transform(array({hs}), hs ->"
            f" array_distinct(transform("
            f"  sequence(1, greatest(size(hs) - {w - 1}, 1)),"
            f"  j -> array_min(slice(hs, j, {w})))))[0]"
        )
    hs = (
        f"list_transform(range(1, greatest(len({toks}) - {n_shingle - 1}, 1) + 1),"
        f" i -> {phash60(f'''array_to_string({toks}[i:i+{n_shingle - 1}], ' ')''', 'duckdb')})"
    )
    return (
        f"list_distinct(list_transform("
        f" range(1, greatest(len({hs}) - {w - 1}, 1) + 1),"
        f" j -> list_min({hs}[j:j+{w - 1}])))"
    )


def winnowing_pairs(
    docs: DataFrame, n_shingle: int = 3, w: int = 4,
    min_shared: int = 2, max_df: int = 20,
) -> DataFrame:
    """Local-similarity candidate pairs from shared winnowing
    fingerprints — detects documents sharing verbatim PASSAGES (plagiarism
    / chunk reuse), which whole-document Jaccard dilutes away.

    Same scale shape as the containment index: fingerprints with
    document frequency > max_df are dropped before pair generation
    (bounded posting lists), pairs keep a count of shared fingerprints.

    Pairs come from IN-ROW expansion of each rare fingerprint's
    posting list (sorted-distinct, ≤ max_df entries) rather than a
    rare⋈rare self-join — one groupBy shuffle instead of two join
    exchanges, the same rewrite as the containment index.  Each pair
    appears at most once per fingerprint (the list is distinct), so a
    plain count equals the old countDistinct(fp)."""
    fps = winnow_fp_expr(n_shingle, w, "spark")
    rel = spread(docs).select(
        "doc_id", F.explode(F.expr(fps)).alias("fp")
    )
    rare = rel.join(
        rel.groupBy("fp").agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp"),
        "fp",
    )
    return (
        rare.groupBy("fp")
        .agg(
            F.expr("array_distinct(array_sort(collect_list(doc_id)))")
            .alias("ids")
        )
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids)),"
                    " y -> struct(x AS id_a, y AS id_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.id_a", "p.id_b")
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def cap_per_group(
    docs: DataFrame, group_col: str = "source", n: int = 10
) -> DataFrame:
    """Deterministic per-group cap — the domain-balancing primitive
    ("at most N documents per source/domain").  Selection order is a
    content hash (then doc_id), not arrival order, so the kept set is
    stable across partitionings, runs, and engines.  One shuffle on the
    group key; WindowGroupLimit prunes beyond-rank rows before the
    final sort at scale."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.expr(phash60("text", "spark")), F.col("doc_id")
    )
    return (
        spread(docs)
        .withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= n)
        .select("doc_id", group_col, "lang", "pick_rank")
    )


def token_entropy(docs: DataFrame) -> DataFrame:
    """Per-document unigram entropy in bits — low entropy flags
    repetitive/boilerplate text, high flags noise; a standard quality
    signal alongside the repetition ratios.

    One explode → groupBy(doc_id, tok) with map-side combine → per-doc
    entropy from the count distribution (the doc-total rides along via
    a window-free second groupBy: Σc and Σ c·log2(c) are both plain
    sums, and H = log2(n) - (Σ c·log2(c))/n — no join back)."""
    toks = tokens_ws("lower(text)", "spark")
    per_tok = (
        spread(docs)
        .select("doc_id", F.explode(F.expr(toks)).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    return per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_toks"),
        F.round(
            F.expr(
                "log2(cast(sum(c) as double))"
                " - sum(cast(c as double) * log2(cast(c as double)))"
                " / cast(sum(c) as double)"
            ),
            6,
        ).alias("entropy_bits"),
    )


def char_trigrams(expr: str, dialect: str) -> str:
    """All character trigrams (with repeats) of a text expression."""
    if dialect == "spark":
        return (
            f"transform(array({expr}), t -> transform("
            f" sequence(1, greatest(length(t) - 2, 1)),"
            f" i -> substring(t, i, 3)))[0]"
        )
    return (
        f"list_transform(range(1, greatest(length({expr}) - 2, 1) + 1),"
        f" i -> {expr}[i:i+2])"
    )


def lang_id_trained(docs: DataFrame, top_m: int = 40) -> DataFrame:
    """Cavnar–Trenkle-style language ID TRAINED ON THE CORPUS ITSELF:
    pass 1 builds per-language character-trigram profiles (top-m most
    frequent trigrams per labeled language), pass 2 scores every
    document by profile overlap and predicts the argmax — the
    train-then-apply shape of corpus-fit models, all in Catalyst.

    Scale: profile training is one explode → groupBy(lang, trigram)
    with map-side combine and a top-m window over the tiny per-lang
    counts; the profile relation (langs × m rows) broadcasts back onto
    the per-doc trigram stream, and the per-doc argmax is the max_by
    groupBy (co-located candidates, partial agg)."""
    from pyspark.sql import Window

    tgs = char_trigrams("lower(text)", "spark")
    stream = spread(docs).select(
        "doc_id", "lang", F.explode(F.expr(tgs)).alias("tg")
    )
    counts = stream.groupBy("lang", "tg").agg(F.count("*").alias("c"))
    wp = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tg"))
    profiles = F.broadcast(
        counts.withColumn("prk", F.row_number().over(wp))
        .filter(F.col("prk") <= top_m)
        .select(F.col("lang").alias("p_lang"), "tg")
    )
    scores = (
        stream.select("doc_id", "tg").distinct()
        .join(profiles, "tg")
        .groupBy("doc_id", "p_lang")
        .agg(F.count("*").alias("hits"))
    )
    best = scores.groupBy("doc_id").agg(
        F.expr(
            "max_by(struct(p_lang, hits), struct(hits, p_lang))"
        ).alias("_b")
    )
    return (
        spread(docs).select("doc_id", "lang")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("_b.p_lang"), F.lit("unknown")).alias(
                "pred_lang"
            ),
            F.coalesce(F.col("_b.hits"), F.lit(0)).alias("pred_hits"),
        )
    )


def sqrt_temperature_sample(
    docs: DataFrame, budget_frac: float = 0.5, salt: str = "samp"
) -> DataFrame:
    """Temperature-weighted mixture sampling (α = 0.5): per-source
    acceptance budgets proportional to sqrt(source size), so
    low-resource sources are up-weighted relative to their share — the
    standard multilingual/multi-source rebalancing step before
    training. Returns the per-source plan with realized keep counts.

    Window-free and collect-free: membership is decided per document by
    comparing its portable hash (mod the source size) against the
    source's budget — ``hash_mod * Σw < budget * w_s`` rearranged so
    only DECIMAL(38,0) multiplications appear (no division whose
    last-place rounding could differ between engines; sqrt is IEEE
    correctly-rounded in both). The per-source stats relation is tiny
    and broadcast; the corpus is scanned once, map-side."""
    from faconne_spark.functions import phash60, sqrt_weight_micro

    w_expr = sqrt_weight_micro("n_docs")
    stats = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = stats.agg(
        F.sum("n_docs").alias("_total"),
        F.sum(F.expr(w_expr)).alias("_sum_w"),
    )
    st = (
        stats.withColumn("_w", F.expr(w_expr))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_budget",
            F.expr(
                f"cast(round(_total * {budget_frac}, 0) as decimal(38,0))"
            ),
        )
    )
    h = phash60(f"concat('{salt}', cast(doc_id as string))", "spark")
    kept = (
        docs.select("doc_id", "source")
        .join(F.broadcast(st), "source")
        .withColumn(
            "_keep",
            F.expr(
                f"cast(pmod({h}, n_docs) as decimal(38,0)) * _sum_w"
                f" < _budget * _w"
            ),
        )
    )
    return kept.groupBy("source").agg(
        F.max("n_docs").alias("n_docs"),
        F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("n_kept"),
    )


def boilerplate_segments(
    docs: DataFrame, seg_tokens: int = 5, min_docs: int = 2
) -> DataFrame:
    """Cross-document boilerplate removal, the C4/CCNet cleaning step:
    any text SEGMENT that recurs verbatim in ``min_docs`` distinct
    documents (nav bars, cookie banners, license footers) is dropped
    from EVERY document, and each doc reports how much survived plus a
    hash of its cleaned text.

    The segment unit is a run of ``seg_tokens`` consecutive whitespace
    tokens (C4 segments on newlines; this corpus is single-line, so the
    fixed-token segmenter is the equivalent unit — swap the segment
    expression for a newline split on real crawl text).

    Scale shape: one explode → one groupBy(segment) with a partial
    count-distinct → one equi-join back on the segment, then a per-doc
    aggregate that reassembles the kept segments in position order
    inside the aggregate (sorted structs — no window).  At 100 TB the
    join key should be the segment's 60-bit hash rather than its text;
    here the raw segment keeps the oracle comparison byte-exact."""
    toks = tokens_ws("text", "spark")
    segs = (
        f"transform(array({toks}), tk ->"
        f" transform(sequence(1, cast(ceil(size(tk) / {seg_tokens}.0) as int)),"
        f" i -> concat_ws(' ', slice(tk, (i - 1) * {seg_tokens} + 1,"
        f" {seg_tokens}))))[0]"
    )
    segd = spread(docs).select(
        "doc_id", F.posexplode(F.expr(segs)).alias("pos", "seg")
    )
    common = (
        segd.groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("seg", F.lit(True).alias("is_bp"))
    )
    flagged = segd.join(common, "seg", "left").withColumn(
        "is_bp", F.coalesce("is_bp", F.lit(False))
    )
    clean_concat = (
        "concat_ws(' ', transform(array_sort("
        "collect_list(case when not is_bp then struct(pos, seg) end)),"
        " x -> x.seg))"
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.when(F.col("is_bp"), 1).otherwise(0)).alias("n_boilerplate"),
        F.coalesce(
            F.sum(
                F.when(~F.col("is_bp"), F.expr("size(split(seg, ' '))"))
            ),
            F.lit(0),
        ).alias("clean_n_tokens"),
        F.expr(phash60(clean_concat, "spark")).alias("clean_hash"),
    )


def packing_plan(
    docs: DataFrame, budget: int = 512, n_shards: int = 16
) -> DataFrame:
    """Concat-then-chunk packing plan — where each document's tokens
    land when the corpus is concatenated and cut into fixed
    ``budget``-token training chunks (the standard pretraining
    sample-packing layout; a doc may straddle a chunk boundary).

    The concatenation order must be deterministic AND parallel:
    documents pack per (source, shard) where shard is a content-hash
    bucket, so every packing partition is an independent bounded
    stream — the window never sees more than one shard of one source
    (the scale fix for the classic per-source global-sort packing;
    shard count scales with the cluster, not the corpus).  Within a
    shard the order is (content hash, doc_id): stable across runs,
    partitionings, and engines."""
    from pyspark.sql import Window

    h = phash60("text", "spark")
    base = spread(docs).select(
        "doc_id",
        "source",
        F.expr(f"pmod({h}, {n_shards})").alias("shard"),
        F.expr(f"cast(size({tokens_ws('text', 'spark')}) as bigint)").alias(
            "n_tokens"
        ),
        F.expr(h).alias("_ord"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("_ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("_cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "source",
            "shard",
            "n_tokens",
            F.expr(f"(_cum - n_tokens) div {budget}").alias("start_chunk"),
            F.expr(
                f"greatest((_cum - n_tokens) div {budget},"
                f" (_cum - 1) div {budget})"
            ).alias("end_chunk"),
        )
        .withColumn(
            "n_chunks", F.expr("end_chunk - start_chunk + 1")
        )
    )


def chunk_documents(
    docs: DataFrame, win: int = 64, stride: int = 48
) -> DataFrame:
    """Overlapping token-window chunking — the 1→N split every RAG /
    long-context training pipeline runs before embedding or packing
    (stride < win makes consecutive chunks overlap so no boundary
    context is lost).

    Pure map-side 1→N explode: chunk starts are a strided sequence over
    the token array, each chunk slices ``win`` tokens; zero shuffles,
    stays inside whole-stage codegen.  Every doc yields ≥ 1 chunk (a
    short doc is its own chunk)."""
    toks = tokens_ws("text", "spark")
    chunks = (
        f"transform(array({toks}), tk ->"
        f" transform(sequence(1, greatest(size(tk), 1), {stride}),"
        f" s -> struct(s AS start_tok,"
        f" concat_ws(' ', slice(tk, s, {win})) AS chunk)))[0]"
    )
    return spread(docs).select(
        "doc_id",
        F.posexplode(F.expr(chunks)).alias("chunk_id", "c"),
    ).select(
        "doc_id",
        "chunk_id",
        F.col("c.start_tok").alias("start_tok"),
        F.expr("cast(size(split(c.chunk, ' ')) as bigint)").alias(
            "chunk_tokens"
        ),
        F.expr(phash60("c.chunk", "spark")).alias("chunk_hash"),
    )


def bigram_logprob(docs: DataFrame) -> DataFrame:
    """Bigram-LM quality score: mean log-probability of each document's
    token bigrams under an add-one-smoothed bigram model trained on the
    corpus itself — the perplexity-proxy step up from the unigram
    scorer (repetitive/boilerplate text scores high, token soup low).

    Scale shape: one bigram explode feeds both the model counts and
    the scoring join.  The HISTORY counts and vocab size are
    vocabulary-sized → forced broadcast; the BIGRAM count table is NOT
    (distinct bigrams grow near-linearly with corpus size for natural
    text), so its join carries no broadcast hint — AQE broadcasts it
    while it fits and falls back to a shuffle join on 'bg' at scale.
    Documents with < 2 tokens have no bigrams and drop out (inner-join
    semantics, mirrored by the oracle)."""
    toks = tokens_ws("lower(text)", "spark")
    bigrams = (
        f"transform(array({toks}), tk -> case when size(tk) < 2"
        f" then array() else transform(sequence(1, size(tk) - 1),"
        f" i -> concat_ws(' ', slice(tk, i, 2))) end)[0]"
    )
    stream = spread(docs).select(
        "doc_id",
        F.explode(F.expr(bigrams)).alias("bg"),
    ).withColumn("w1", F.expr("split(bg, ' ')[0]"))
    bg_freq = stream.groupBy("bg").agg(F.count("*").alias("bg_cnt"))
    hist_freq = stream.groupBy("w1").agg(F.count("*").alias("hist_cnt"))
    vocab = (
        spread(docs)
        .select(F.explode(F.expr(toks)).alias("tok"))
        .agg(F.countDistinct("tok").alias("v_size"))
    )
    return (
        stream.join(bg_freq, "bg")
        .join(F.broadcast(hist_freq), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.avg(
                    F.expr(
                        "ln((cast(bg_cnt as double) + 1.0)"
                        " / (cast(hist_cnt as double)"
                        " + cast(v_size as double)))"
                    )
                ),
                6,
            ).alias("mean_bigram_logprob"),
            F.count("*").alias("n_bigrams"),
        )
    )


# Gopher quality-rule thresholds (Rae et al. 2021, arXiv:2112.11446
# §A1.1 — word-level document filters, adapted to whitespace tokens)
GOPHER_MIN_WORDS = 5
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_LEN = (3.0, 10.0)
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOPWORDS = 2


def gopher_rules(docs: DataFrame) -> DataFrame:
    """Gopher-style quality rules per document (Rae et al. 2021): word
    count bounds, mean word length in [3, 10], symbol-to-word ratio
    (``#`` and ``...``), fraction of words containing an alphabetic
    character, and a required-stopword count — each as its own boolean
    plus the conjunction ``keep``.  Complements
    :func:`quality_score`/:func:`repetition_signals` (ratio features and
    repetition live there); this is the named rule-set a curation run
    cites when it drops a document.

    Scale: map-only — one tokenize per row staged as a column, every
    rule an expression over it; zero shuffles, no UDFs.  The DuckDB
    oracle computes the same expressions with list_* functions.
    """
    toks = tokens_ws("lower(text)", "spark")
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + ")"
    lo, hi = GOPHER_MEAN_LEN
    return (
        spread(docs)
        .withColumn("_toks", F.expr(toks))
        .withColumn("n_words", F.expr("size(_toks)"))
        .withColumn(
            "mean_word_len",
            F.expr(
                "round(cast(aggregate(_toks, 0, (a, t) -> a + length(t)) as double)"
                " / cast(greatest(size(_toks), 1) as double), 6)"
            ),
        )
        .withColumn(
            "symbol_ratio",
            F.expr(
                "round(cast(size(regexp_extract_all(text, '#|\\\\.\\\\.\\\\.', 0)) as double)"
                " / cast(greatest(size(_toks), 1) as double), 6)"
            ),
        )
        .withColumn(
            "alpha_frac",
            F.expr(
                "round(cast(size(filter(_toks, t -> t rlike '[a-z]')) as double)"
                " / cast(greatest(size(_toks), 1) as double), 6)"
            ),
        )
        .withColumn(
            "n_stopwords",
            F.expr(f"size(filter({stop_arr}, s -> array_contains(_toks, s)))"),
        )
        .select(
            "doc_id",
            "n_words",
            "mean_word_len",
            "symbol_ratio",
            "alpha_frac",
            "n_stopwords",
            F.expr(
                f"n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}"
            ).alias("pass_word_count"),
            F.expr(f"mean_word_len BETWEEN {lo} AND {hi}").alias(
                "pass_mean_len"
            ),
            F.expr(f"symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}").alias(
                "pass_symbols"
            ),
            F.expr(f"alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}").alias(
                "pass_alpha"
            ),
            F.expr(f"n_stopwords >= {GOPHER_MIN_STOPWORDS}").alias(
                "pass_stopwords"
            ),
        )
        .withColumn(
            "keep",
            F.expr(
                "pass_word_count AND pass_mean_len AND pass_symbols"
                " AND pass_alpha AND pass_stopwords"
            ),
        )
    )


def importance_weights(docs: DataFrame, target_source: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023,
    arXiv:2302.03169): score every document by how much more likely its
    tokens are under a TARGET distribution (here: the docs of one
    source) than under the raw-corpus distribution — the selection
    signal for importance resampling toward a high-quality domain.
    Per-doc weight = mean over tokens of
    ln p_target(t) - ln p_raw(t), with add-one smoothing over the raw
    vocabulary; ``selected`` = weight > 0 (more target-like than raw).

    Scale (100 TB): two token-stream groupBys (map-side combined,
    vocabulary-sized outputs), then ONE broadcast join of the smoothed
    ratio table back onto the token stream — the corpus shuffles only
    for the per-doc aggregation on doc_id.  Totals and vocabulary size
    ride in as 1-row broadcast cross-joins, never a driver collect.
    Determinism: same ln/avg/round-6 contract as
    :func:`unigram_logprob` (the DuckDB oracle computes identical
    doubles from identical integer counts).
    """
    toks = tokens_ws("lower(text)", "spark")
    tok_stream = spread(docs).select(
        "doc_id", "source", F.explode(F.expr(toks)).alias("tok")
    )
    raw = tok_stream.groupBy("tok").agg(F.count("*").alias("cnt_raw"))
    tgt = (
        tok_stream.filter(F.col("source") == target_source)
        .groupBy("tok")
        .agg(F.count("*").alias("cnt_tgt"))
    )
    stats = (
        raw.agg(
            F.sum("cnt_raw").alias("total_raw"),
            F.count("*").alias("vocab"),
        )
        .crossJoin(
            tgt.agg(F.coalesce(F.sum("cnt_tgt"), F.lit(0)).alias("total_tgt"))
        )
    )
    table = (
        raw.join(tgt, "tok", "left")
        .na.fill({"cnt_tgt": 0})
        .crossJoin(F.broadcast(stats))
        .select(
            "tok",
            F.expr(
                "ln(cast(cnt_tgt + 1 as double) / cast(total_tgt + vocab as double))"
                " - ln(cast(cnt_raw + 1 as double) / cast(total_raw + vocab as double))"
            ).alias("lnr"),
        )
    )
    return (
        tok_stream.join(F.broadcast(table), "tok")
        .groupBy("doc_id")
        .agg(
            F.any_value(F.col("source")).alias("source"),
            F.count("*").alias("n_toks"),
            # + 0.0 canonicalizes IEEE negative zero: a doc whose ratio
            # sum is a tiny negative rounds to -0.0 here but 0.0 in
            # DuckDB — numerically equal, string-hash different
            (F.round(F.avg("lnr"), 6) + F.lit(0.0)).alias("weight"),
        )
        .withColumn("selected", F.col("weight") > 0)
    )


def cardinality_report(
    docs: DataFrame, rsd: float = 0.02
) -> DataFrame:
    """Per-source cardinality gauge: exact distinct fingerprints next
    to the HyperLogLog++ estimate (``approx_count_distinct``) and the
    relative error — at 100 TB the exact count is a full shuffle of the
    fingerprint space while the sketch is a fixed-size mergeable
    register set per group, so production dashboards run the sketch and
    this report is the calibration that says when that's safe.

    The estimate is deterministic for a given dataset and rsd (HLL
    hashes are seedless), but not portable to other engines — so this
    operator is pytest-verified (error bound vs the exact side) rather
    than DuckDB-oracled, the same evidence class as the streaming
    processors."""
    from faconne_spark.functions import phash60
    from faconne_spark.operators.dedup import NORM

    fp = spread(docs).select(
        "source", F.expr(phash60(NORM, "spark")).alias("fingerprint")
    )
    return (
        fp.groupBy("source")
        .agg(
            F.countDistinct("fingerprint").alias("n_exact"),
            F.approx_count_distinct("fingerprint", rsd).alias("n_approx"),
        )
        .withColumn(
            "rel_error",
            F.expr(
                "round(abs(cast(n_approx as double) - cast(n_exact as double))"
                " / cast(greatest(n_exact, 1) as double), 6)"
            ),
        )
    )


def tokenizer_fertility(docs: DataFrame) -> DataFrame:
    """Per-language tokenizer fertility gauges: BPE-ish regex tokens
    per whitespace word (``fertility`` — the standard multilingual
    tokenizer-quality metric: a tokenizer that fragments a language
    into many sub-word pieces inflates its effective sequence length
    and training cost) and characters per BPE token (compression).

    Scale: one map pass computing three per-doc integers, then ONE
    language-keyed groupBy with map-side partial sums — no joins, no
    second corpus pass.  All-integer sums; the ratios divide once at
    the end (positive, so no negative-zero canon needed;
    chars_per_token is NULL for a language whose docs tokenize to zero
    BPE tokens — Spark's ANSI mode would otherwise throw where DuckDB
    yields NULL, a crash AND an oracle divergence on degenerate
    corpora)."""
    ws = tokens_ws("text", "spark")
    return (
        spread(docs)
        .select(
            "lang",
            F.expr(f"size({ws})").alias("_ws"),
            F.expr(tokens_bpe_count("text", "spark")).alias("_bpe"),
            F.length("text").cast("bigint").alias("_chars"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_ws").alias("ws_tokens"),
            F.sum("_bpe").alias("bpe_tokens"),
            F.sum("_chars").alias("n_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "ws_tokens",
            "bpe_tokens",
            "n_chars",
            F.expr(
                "round(cast(bpe_tokens as double)"
                " / cast(ws_tokens as double), 6)"
            ).alias("fertility"),
            F.expr(
                "CASE WHEN bpe_tokens = 0 THEN cast(NULL as double)"
                " ELSE round(cast(n_chars as double)"
                " / cast(bpe_tokens as double), 6) END"
            ).alias("chars_per_token"),
        )
    )


def shingle_novelty(docs: DataFrame, n: int = 5) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct word
    ``n``-gram shingles that occur in NO other document — the
    memorization/duplication complement of the dedup family (novelty
    ≈ 0 marks a doc assembled entirely from corpus-recurring text even
    when no single pair-level duplicate exists).

    Scale: explode distinct shingles → one shingle-keyed groupBy with
    map-side partial counts (shingles are distinct per doc, so
    count(*) IS document frequency) → one equi-join back → per-doc
    aggregation on doc_id.  The shingle relation feeds BOTH sides of
    that join, so it is persisted — without it the tokenize + n-gram
    construction (the expensive half) re-executes for the join-back.
    At 100 TB the join key should be the shingle's 60-bit hash rather
    than its text; here the raw shingle keeps the oracle comparison
    byte-exact."""
    from faconne_spark.operators.dedup import _persist_sig

    sh = word_shingles("text", n, "spark")
    rel = _persist_sig(
        spread(docs).select("doc_id", F.explode(F.expr(sh)).alias("s")),
        docs,
    )
    df_counts = rel.groupBy("s").agg(F.count("*").alias("df"))
    return (
        rel.join(df_counts, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.expr(
                "round(cast(n_novel as double)"
                " / cast(n_shingles as double), 6)"
            ),
        )
    )


def cdc_chunk_relation(
    docs: DataFrame, avg_tokens: int = 16, persist: bool = True
) -> DataFrame:
    """The (doc_id, _chunk, n_tokens, chunk_hash) relation of
    content-defined chunking — shared by :func:`cdc_chunks` (per-doc
    gauge) and :func:`faconne_spark.operators.dedup.cdc_pairs`
    (chunk-level near-dup candidate pairs).  ``persist`` should be True
    when the CALLER references the relation more than once (cdc_chunks
    joins it back to itself, so the tokenize + per-doc window + chunk
    aggregation would otherwise run twice); cdc_pairs consumes it in a
    single lineage and passes False — caching a once-read relation is
    pure overhead."""
    from faconne_spark.operators.dedup import _persist_sig

    toks = tokens_ws("text", "spark")
    h = phash60("concat('cdc:', tok)", "spark")
    tokd = spread(docs).select(
        "doc_id", F.posexplode(F.expr(toks)).alias("pos", "tok")
    )
    flagged = tokd.withColumn(
        "_bp", F.expr(f"({h}) % {avg_tokens} = 0")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = flagged.withColumn(
        "_chunk",
        F.sum(F.when(F.col("_bp"), 1).otherwise(0)).over(w)
        - F.when(F.col("_bp"), 1).otherwise(0),
    )
    chunk_text = (
        "concat_ws(' ', transform(array_sort(collect_list(struct(pos, tok))),"
        " x -> x.tok))"
    )
    chunks = chunked.groupBy("doc_id", "_chunk").agg(
        F.count("*").alias("n_tokens"),
        F.expr(phash60(chunk_text, "spark")).alias("chunk_hash"),
    )
    return _persist_sig(chunks, docs) if persist else chunks


def cdc_chunks(docs: DataFrame, avg_tokens: int = 16) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/FastCDC idea applied to
    token streams): a token is a chunk BOUNDARY when its content hash
    ≡ 0 (mod ``avg_tokens``), so chunk edges are decided by local
    content — an insertion near the head of a document shifts only the
    one chunk it lands in, where fixed-width chunking shifts every
    subsequent chunk.  Emits per doc the chunk count, how many of its
    chunks recur verbatim in other documents (by 60-bit chunk hash),
    and the shared-content ratio — the shift-resistant dedup gauge the
    fixed-window `pack_training_chunks` cannot provide.

    Scale: tokenize → posexplode → ONE per-doc window (partitioned by
    doc_id — no global sort, the fill_forward rule) computing the
    running boundary count → chunk aggregation on (doc_id, chunk) →
    chunk-hash df groupBy → join back on the hash.  Expected chunk
    length is geometric with mean ``avg_tokens``; the boundary test is
    a pure integer mod of the token hash, identical in both engines."""
    chunks = cdc_chunk_relation(docs, avg_tokens)
    dfreq = chunks.groupBy("chunk_hash").agg(
        F.countDistinct("doc_id").alias("cdf")
    )
    return (
        chunks.join(dfreq, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("cdf") >= 2, 1).otherwise(0)).alias(
                "n_shared_chunks"
            ),
            F.sum(
                F.when(F.col("cdf") >= 2, F.col("n_tokens")).otherwise(0)
            ).alias("shared_tokens"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .withColumn(
            "shared_ratio",
            F.expr(
                "round(cast(shared_tokens as double)"
                " / cast(total_tokens as double), 6)"
            ),
        )
    )


def token_cms_topk(
    docs: DataFrame, width: int = 1024, depth: int = 4, k: int = 20
) -> DataFrame:
    """Count-min-sketch heavy hitters over the token stream (Cormode &
    Muthukrishnan 2005): ``depth`` seeded hash rows × ``width``
    counters; a token's estimate is the MIN of its counters, an upper
    bound on its true count.  Emits the top-``k`` tokens by estimate
    with the exact count alongside and the collision inflation
    (est - exact ≥ 0 always) — the calibration that says whether a
    width×depth budget is safe before deploying the sketch alone.

    Scale: the sketch table is width·depth rows REGARDLESS of corpus
    size (here ≤4096); counters are plain sums, so sketches from
    different partitions/days MERGE by addition, the property that
    makes CMS a streaming/distributed primitive.  The corpus is scanned
    ONCE: the vocabulary groupBy is the only corpus-sized stage, is
    persisted, and the counters are built FROM the counts (sum of cnt
    per bucket ≡ count of raw occurrences — bit-identical, one pass
    cheaper than the textbook per-occurrence formulation).  Estimation
    joins the vocabulary relation to the broadcast sketch; top-k is a
    TakeOrdered, never a global sort.  Hashes are the portable 60-bit
    md5 primitive with per-row salts — both engines replay the sketch
    bit-identically."""
    from faconne_spark.operators.dedup import _persist_sig

    toks = tokens_ws("lower(text)", "spark")
    stream = spread(docs).select(F.explode(F.expr(toks)).alias("tok"))
    vocab = _persist_sig(
        stream.groupBy("tok").agg(F.count("*").alias("exact")), docs
    )
    sketch = cms_sketch_from_counts(
        vocab.select("tok", F.col("exact").alias("cnt")), width, depth
    )
    return cms_rank_candidates(vocab, sketch, width, depth, k)


def cms_sketch_from_counts(
    counts: DataFrame, width: int, depth: int
) -> DataFrame:
    """The (r, bucket, c) counter relation of a count-min sketch, built
    from a pre-aggregated (tok, cnt) relation — Σcnt per bucket is
    bit-identical to counting raw occurrences, but the expansion runs
    over the VOCABULARY, not the token stream.  ≤ width·depth rows,
    mergeable across partitions/epochs/days by plain addition of ``c``
    (the property the streaming face relies on)."""
    h = phash60("concat('cms', cast(r as string), ':', tok)", "spark")
    return (
        counts.select(
            "tok", "cnt",
            F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("r"),
        )
        .select(
            "r", F.expr(f"({h}) % {width}").alias("bucket"), "cnt"
        )
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("c"))
    )


def cms_rank_candidates(
    vocab: DataFrame, sketch: DataFrame, width: int, depth: int, k: int
) -> DataFrame:
    """Estimate every (tok, exact) candidate against a CMS counter
    relation and return the top-``k`` by (estimate desc, token asc) —
    shared by the batch operator and the streaming state reader so the
    two faces rank identically."""
    h = phash60("concat('cms', cast(r as string), ':', tok)", "spark")
    probes = vocab.select(
        "tok", "exact",
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("r"),
    ).select(
        "tok", "exact", "r", F.expr(f"({h}) % {width}").alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("tok", "exact")
        .agg(F.min("c").alias("est"))
        .select(
            "tok",
            "est",
            "exact",
            (F.col("est") - F.col("exact")).alias("overcount"),
        )
        .orderBy(F.col("est").desc(), F.col("tok"))
        .limit(k)
    )


def dsir_resample(
    docs: DataFrame, target_source: str, k: int = 200
) -> DataFrame:
    """The resampling half of DSIR: draw the ``k`` documents to keep,
    ranked by importance weight with a deterministic content-hash
    dither as the tiebreak/jitter.  Priority = weight (micro-units,
    integer) ⊕ hash-jitter in the low 20 bits — monotone in the DSIR
    weight, uniform among near-equal weights, and bit-reproducible
    across engines and runs.

    Deliberate delta from the paper's stochastic draw: production
    pipelines need the SAME manifest from every re-run, so the Gumbel
    noise is replaced by the hash dither (the same determinism trade as
    `sample_stratified`'s content-hash Bernoulli).  A true
    weight-proportional draw changes only the jitter expression.

    Scale: the weight relation is :func:`importance_weights` (its
    shuffles); the draw itself adds NO shuffle beyond a TakeOrdered
    top-k — no global sort, no window."""
    wts = importance_weights(docs, target_source)
    jitter = phash60("concat('rs:', cast(doc_id as string))", "spark")
    return (
        wts.select(
            "doc_id",
            "source",
            "weight",
            F.expr(
                f"cast(round(weight * 1000000, 0) as bigint) * 1048576"
                f" + ({jitter}) % 1048576"
            ).alias("priority"),
        )
        .orderBy(F.col("priority").desc(), F.col("doc_id"))
        .limit(k)
    )


# ------------------------------------------------- priority sampling

PRIO_K = 50  # sample size
PRIO_SCALE = 1_000_000  # hash → uniform granularity


def priority_sample(docs: DataFrame, k: int = PRIO_K) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup 2007): a deterministic
    weighted sample of k documents whose ADJUSTED weights give unbiased
    subset-sum estimates — the principled way to estimate corpus-wide
    statistics (total chars, per-source mass) from a fixed-size sample.

    Priority = w / u with u a hash-derived uniform in (0, 1); keep the
    top-k by priority; τ = the (k+1)-th priority; every kept item's
    adjusted weight is max(w, τ) — E[Σ adjusted over kept ∩ S] = Σ w
    over S for ANY subset S.  The draw is reproducible run-to-run
    (hash-uniform, not random()).

    Scale (100 TB): one map pass computes priorities; the top-(k+1)
    is a TakeOrdered (size-k heap per partition, no global sort); the
    only driver-sized object is the k-row sample itself.
    """
    h = phash60("concat('prio:', cast(doc_id as string))", "spark")
    scored = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("double").alias("w"),
        (
            (F.expr(h) % PRIO_SCALE).cast("double") + F.lit(0.5)
        ).alias("_u_raw"),
    ).select(
        "doc_id",
        "source",
        "w",
        (F.col("w") * PRIO_SCALE / F.col("_u_raw")).alias("priority"),
    )
    top = scored.orderBy(
        F.col("priority").desc(), F.col("doc_id")
    ).limit(k + 1)
    # τ = the (k+1)-th priority (min of the limited relation); when the
    # corpus has ≤ k documents everything is kept and τ = 0 (adjusted
    # weight = true weight — the estimator is exact, not inflated)
    tau = top.agg(
        F.when(F.count("*") <= k, F.lit(0.0))
        .otherwise(F.min("priority"))
        .alias("tau")
    )
    kept = (
        top.orderBy(F.col("priority").desc(), F.col("doc_id"))
        .limit(k)
        .crossJoin(F.broadcast(tau))
    )
    return kept.select(
        "doc_id",
        "source",
        F.round("w", 6).alias("weight"),
        F.round(F.greatest("w", "tau"), 6).alias("adjusted_weight"),
    )


def source_lang_kl(docs: DataFrame) -> DataFrame:
    """Per-source language-mixture divergence: KL(P(lang | source) ‖
    P(lang)) — the source-balance gauge a multilingual corpus build
    watches (a source drifting monolingual shows up as rising KL).
    Zero-count languages contribute nothing (0·ln 0 = 0 by
    convention, and P(lang)=0 cannot occur for an observed language).

    Scale (100 TB): two map-side-combined groupBys ((source, lang) and
    lang) + one broadcast join of the language marginals; exchanges
    carry ≤ sources × languages rows."""
    sl = docs.groupBy("source", "lang").agg(F.count("*").alias("n_sl"))
    s = sl.groupBy("source").agg(F.sum("n_sl").alias("n_s"))
    l = sl.groupBy("lang").agg(F.sum("n_sl").alias("n_l"))
    tot = sl.agg(F.sum("n_sl").alias("n_tot"))
    return (
        sl.join(F.broadcast(s), "source")
        .join(F.broadcast(l), "lang")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.max("n_s").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            (
                F.round(
                    F.sum(
                        (F.col("n_sl") / F.col("n_s"))
                        * F.log(
                            (F.col("n_sl") * F.col("n_tot")).cast("double")
                            / (F.col("n_s") * F.col("n_l"))
                        )
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("kl_lang_mix"),
        )
    )


# ------------------------------------------------- NB quality classifier

NB_MICRO = 1_000_000  # fixed-point scale for log-likelihood ratios


def nb_scored_heldout(docs: DataFrame) -> DataFrame:
    """The naive-Bayes scoring relation (doc_id, source, keep,
    score_micro) over the held-out folds — the shared first stage of
    :func:`nb_quality_classifier` (per-source accuracy rollup) and the
    reliability-curve gauge (per-score-bin predicted-vs-actual rates),
    so the trained model exists exactly once.  See
    :func:`nb_quality_classifier` for the training/determinism/scale
    contract."""
    from faconne_spark.operators.dedup import split_expr

    labeled = docs.select(
        "doc_id",
        "source",
        "text",
        F.expr(split_expr("spark")).alias("split"),
    ).join(quality_gate_verdicts(docs).select("doc_id", "keep"), "doc_id")

    toks = labeled.select(
        "doc_id",
        "source",
        "split",
        "keep",
        F.explode(
            F.expr(f"array_distinct({tokens_ws('lower(text)', 'spark')})")
        ).alias("tok"),
    )
    train = toks.filter(F.col("split") == "train")

    counts = train.groupBy("tok").agg(
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("c_keep"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("c_drop"),
    )
    tot = train.agg(
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("n_drop"),
        F.countDistinct("tok").alias("v"),
    )
    llr = counts.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.expr(
            f"cast(round({NB_MICRO} * ln("
            " (cast(c_keep + 1 as double) / (n_keep + v))"
            " / (cast(c_drop + 1 as double) / (n_drop + v))"
            "), 0) as bigint)"
        ).alias("llr_micro"),
    )

    train_docs = labeled.filter(F.col("split") == "train")
    prior = train_docs.agg(
        F.expr(
            f"cast(round({NB_MICRO} * ln("
            " cast(sum(if(keep, 1, 0)) + 1 as double)"
            " / (sum(if(keep, 0, 1)) + 1)"
            "), 0) as bigint)"
        ).alias("prior_micro")
    )

    held = toks.filter(F.col("split") != "train")
    # left join: tokens unseen at train time contribute 0, and a doc of
    # only-unseen tokens still scores (prior alone) instead of vanishing
    return (
        held.join(F.broadcast(llr), "tok", "left")
        .groupBy("doc_id", "source", "keep")
        .agg(F.sum(F.coalesce("llr_micro", F.lit(0))).alias("tok_score"))
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            "source",
            "keep",
            (F.col("tok_score") + F.col("prior_micro")).alias("score_micro"),
        )
    )


def nb_quality_classifier(docs: DataFrame) -> DataFrame:
    """In-engine TRAINED quality classifier (the fastText-style linear
    quality-filter stage): Bernoulli-presence naive Bayes over distinct
    tokens, trained on the hash-split train fold against the heuristic
    quality gate's verdict, evaluated on the held-out folds.

    Determinism: every token's log-likelihood ratio is quantized to
    integer micro-units (round(1e6·ln(...))) at train time, so each
    document's score is an EXACT integer sum — no float summation
    order anywhere; the single ln per vocab entry is the only float
    op, and it is rounded before use.

    Scale (100 TB): training is two map-side-combined counting
    groupBys (per-(token, label) presence counts → vocabulary-sized
    llr table); scoring broadcast-joins that table onto the exploded
    held-out token stream and integer-sums per doc.  The llr relation
    is vocabulary-sized — the only state the "model" needs.

    Output per source: held-out doc count, predicted-keep count, and
    agreement rate with the heuristic gate (rounded).
    """
    scored = nb_scored_heldout(docs)
    return scored.groupBy("source").agg(
        F.count("*").alias("n_heldout"),
        F.sum(F.when(F.col("score_micro") > 0, 1).otherwise(0)).alias(
            "n_pred_keep"
        ),
        F.round(
            F.sum(
                F.when(
                    (F.col("score_micro") > 0) == F.col("keep"), 1
                ).otherwise(0)
            )
            / F.count("*"),
            6,
        ).alias("gate_agreement"),
    )
