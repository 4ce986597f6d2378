"""Round-8 gate keys.

The LAST two mergeable states read off the MERGE through the driver
gate (VERDICT r7 ask #3): the Bloom word bitmap (words merge by
``bit_or``) and the Poisson-bootstrap part sums (replicate partials
merge by addition).  Same shape as the round-7 merged-state proofs
(events_hll_merged, docs_cms_topk_merged, …): per-shard state from
DISJOINT id-parity shards, one bounded-relation merge, the statistic
read off the merge — and the oracle is a single full pass, so the
green row IS the mergeability proof.  This completes the S-family:
every mergeable state in the engine (HLL, CMS, KS, KMV, AUC, value
bins, mergeable stats, Bloom, bootstrap) now has a driver-gated
merge-equals-full-pass row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from faconne_spark.queries import T

QUERIES: dict = {}
ORACLES: dict = {}


# ------------------------------------------------ merged Bloom bitmap

# Pinned bitmap exponent: shards can only merge word tables built on
# the SAME (m_bits, k) bin space — the pinned-bounds-histogram
# contract applied to the Bloom state (bloom_prefilter_summary sizes
# its bitmap from a driver-side count instead, which is exactly what a
# multi-shard build cannot do shard-locally).
BLOOM_MERGED_P = 17


def dedup_bloom_merged(spark, sf):
    """The full Bloom WORD TABLE read off MERGED shard bitmaps:
    even/odd doc_id shards each fold their fingerprints into their own
    (word, bits) relation on the pinned 2^17-bit space, the merge is
    ``bit_or`` per word, and the output is the merged table itself
    (word, bits, n_set) — bit-for-bit the single-pass build over all
    documents (the oracle), because OR is associative/commutative over
    any partition of the input (the property streaming/stats.py's
    bloom_epoch rolls up on; dedup.py bloom_word_bits:1099).

    Scale: each shard's exchange carries ≤ 2^11 word rows (2^17 bits
    / 64), bit_or partial-aggregated map-side; the merge is a groupBy
    over ≤ 2 × 2^11 rows.  The corpus is scanned once per shard and
    never again — the backfill + daily-increment shape."""
    from faconne_spark.operators.dedup import NORM, bloom_word_bits
    from faconne_spark.functions import phash60

    m_bits = 1 << BLOOM_MERGED_P
    docs = T(spark, sf, "documents")
    fp = F.expr(phash60(NORM, "spark")).alias("fp")

    def shard(parity: int):
        return bloom_word_bits(
            docs.filter(F.col("doc_id") % 2 == parity).select(fp), m_bits
        )

    merged = (
        shard(0)
        .unionByName(shard(1))
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    return merged.select(
        "word",
        "bits",
        F.expr("cast(bit_count(bits) as int)").alias("n_set"),
    )


def _oracle_bloom_merged() -> str:
    from faconne_spark.functions import bit_mask64, phash60
    from faconne_spark.operators.dedup import BLOOM_K, NORM_DUCK

    fp_h = phash60(NORM_DUCK, "duckdb")
    probe_h = phash60("('bf' || i || ':' || fp::VARCHAR)", "duckdb")
    mask = bit_mask64("pos % 64", "duckdb")
    return f"""
WITH fps AS (SELECT ({fp_h}) AS fp FROM documents),
ks AS (SELECT unnest(range(0, {BLOOM_K})) AS i),
pos AS (
  SELECT (({probe_h}) % {1 << BLOOM_MERGED_P}) AS pos FROM fps, ks)
SELECT (pos >> 6)::BIGINT AS word, bit_or({mask})::BIGINT AS bits,
       bit_count(bit_or({mask}))::INT AS n_set
FROM pos GROUP BY pos >> 6
"""


QUERIES["dedup_bloom_merged"] = dedup_bloom_merged
ORACLES["dedup_bloom_merged"] = _oracle_bloom_merged()


# --------------------------------------- merged bootstrap part sums

def events_bootstrap_merged(spark, sf):
    """Per-type Poisson-bootstrap mean + CI read off MERGED replicate
    part-sums: even/odd event_id shards each build their own
    (type, b, nw, sw) replicate partials and (type, n, svm) base
    partials, both merge by plain ADDITION, and the order-statistic CI
    reads off the merge via the SAME bootstrap_ci_from_parts the batch
    operator uses (evalstats.py:131) — must equal the single-pass
    bootstrap (the oracle: events_value_bootstrap's full-pass SQL,
    verbatim) because the per-replicate sums are sums of row-local
    hash-weighted terms and event ids are unique across the shard
    union (the documented precondition).

    Scale: each shard's exchange carries ≤ types × B partial rows;
    the merge is a groupBy over ≤ 2 × types × B rows; the corpus is
    scanned once per shard."""
    from faconne_spark.operators.evalstats import (
        bootstrap_base,
        bootstrap_ci_from_parts,
        bootstrap_reps,
    )
    from faconne_spark.queries.bank_r6 import BOOT_B, BOOT_MICRO

    ev = T(spark, sf, "events")

    def reps(parity: int):
        return bootstrap_reps(
            ev.filter(F.col("event_id") % 2 == parity),
            ["event_type"], "value", "event_id", BOOT_B, BOOT_MICRO,
        )

    def base(parity: int):
        return bootstrap_base(
            ev.filter(F.col("event_id") % 2 == parity),
            ["event_type"], "value", BOOT_MICRO,
        )

    merged_reps = (
        reps(0)
        .unionByName(reps(1))
        .groupBy("event_type", "__b")
        .agg(F.sum("__nw").alias("__nw"), F.sum("__sw").alias("__sw"))
    )
    merged_base = (
        base(0)
        .unionByName(base(1))
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("__svm").alias("__svm"))
    )
    return bootstrap_ci_from_parts(
        merged_reps, merged_base, ["event_type"], BOOT_MICRO
    )


def _oracle_bootstrap_merged() -> str:
    # the single-pass oracle text, verbatim — the merge proof
    from faconne_spark.queries.bank_r6 import _oracle_value_bootstrap

    return _oracle_value_bootstrap()


QUERIES["events_bootstrap_merged"] = events_bootstrap_merged
ORACLES["events_bootstrap_merged"] = _oracle_bootstrap_merged()


# --------------------------------------- BPE through the driver gate

BPE_MERGES = 10


def docs_bpe_token_counts(spark, sf):
    """Per-document BPE token counts with the merges LEARNED on this
    corpus (operators/tokenizer.py — the word-frequency-table
    formulation; VERDICT r7 ask #5: previously pytest-only because
    DuckDB's list_reduce cannot express the greedy merge fold).

    The oracle now learns the merges too: on a separator-joined symbol
    string, the greedy left-to-right non-overlapping merge of pair
    (l, r) is EXACTLY ``replace(s, l‖SEP‖r, l‖r)`` (leftmost
    non-overlapping replacement — the same scan order and the same
    cannot-reuse-the-just-merged-symbol property as the _MERGE state
    machine), so each learning iteration unrolls to three MATERIALIZED
    CTEs (pair counts → argmax → rewrite) — the pagerank/kcore
    unrolled-oracle precedent.  An exhausted pair table LEFT-JOINs to
    NULL and leaves the words untouched, mirroring learn_bpe's early
    stop.  Separator is chr(31) (US), absent from whitespace-token
    text."""
    from faconne_spark.operators.tokenizer import bpe_token_counts

    return bpe_token_counts(T(spark, sf, "documents"), BPE_MERGES)


def _oracle_bpe_token_counts(n_merges: int = BPE_MERGES) -> str:
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "duckdb")
    sep = "chr(31)"
    ctes = [
        f"""words AS MATERIALIZED (
  SELECT word, count(*)::BIGINT AS freq FROM (
    SELECT unnest({toks}) AS word FROM documents) GROUP BY word)""",
        f"""w0 AS MATERIALIZED (
  SELECT word, freq, array_to_string(string_split(word, ''), {sep}) AS s
  FROM words)""",
    ]
    for k in range(n_merges):
        ctes.append(f"""p{k} AS MATERIALIZED (
  SELECT p.l AS l, p.r AS r, sum(freq)::BIGINT AS pf
  FROM (
    SELECT freq,
           unnest(list_transform(range(1, len(syms)),
                  i -> {{'l': syms[i], 'r': syms[i + 1]}})) AS p
    FROM (SELECT freq, string_split(s, {sep}) AS syms FROM w{k}))
  GROUP BY 1, 2)""")
        ctes.append(f"""b{k} AS MATERIALIZED (
  SELECT l, r FROM p{k} ORDER BY pf DESC, l, r LIMIT 1)""")
        ctes.append(f"""w{k + 1} AS MATERIALIZED (
  SELECT word, freq,
         CASE WHEN b.l IS NULL THEN s
              ELSE replace(s, b.l || {sep} || b.r, b.l || b.r) END AS s
  FROM w{k} LEFT JOIN b{k} b ON true)""")
    ctes.append(f"""vocab AS MATERIALIZED (
  SELECT word, len(string_split(s, {sep}))::BIGINT AS n_syms
  FROM w{n_merges})""")
    ctes.append(f"""stream AS (
  SELECT doc_id, unnest({toks}) AS word FROM documents)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT doc_id, count(*)::BIGINT AS n_words,
       sum(n_syms)::BIGINT AS n_bpe_tokens,
       round(sum(n_syms)::DOUBLE / count(*)::DOUBLE, 6) AS tokens_per_word
FROM stream JOIN vocab USING (word)
GROUP BY doc_id"""
    )


QUERIES["docs_bpe_token_counts"] = docs_bpe_token_counts
ORACLES["docs_bpe_token_counts"] = _oracle_bpe_token_counts()


# ------------------------------------------- PNG decode through the gate

def mm_png_decode(spark, sf):
    """REAL PNG decode end-to-end through the gate (VERDICT r7 ask #4):
    one stdlib-zlib PNG per document (rows encoded with the r % 5
    filter cycle — every image exercises ALL FIVE defilter paths),
    fully decoded back to pixels, reduced to (width, height,
    n_px_bytes, pixel_sum).  The oracle replays the EXPECTED pixel sum
    in closed form from md5(text) (pixels are the tiled digest), so a
    green row proves the inflate + defilter pipeline byte-exactly —
    the zlib payload itself has no closed-form size, which is why the
    proof rides on decoded CONTENT (operators/multimodal.py
    png_pixels; encode/decode share one predictor function)."""
    from faconne_spark.operators import multimodal as MM

    docs = T(spark, sf, "documents")
    return MM.extract_png_pixel_stats(MM.synthesize_png(docs))


def _oracle_png_decode() -> str:
    # digest byte i of md5(text) = value of hex digits 2i+1..2i+2
    hexb = (
        "((strpos('0123456789abcdef', substr(md5(text), {p}, 1)) - 1) * 16"
        " + strpos('0123456789abcdef', substr(md5(text), {p1}, 1)) - 1)"
    )
    b = [hexb.format(p=2 * i + 1, p1=2 * i + 2) for i in range(16)]
    # pixels = digest tiled to n = 3*w*h bytes: byte i contributes
    # (n // 16) full repeats plus one more iff i < n % 16
    tile_sum = " + ".join(
        f"{b[i]} * (n // 16 + CASE WHEN {i} < n % 16 THEN 1 ELSE 0 END)"
        for i in range(16)
    )
    return f"""
WITH dims AS (
  SELECT doc_id,
         (4 + {b[0]} % 12) AS w,
         (4 + {b[1]} % 12) AS h,
         text
  FROM documents),
sized AS (
  SELECT doc_id, w, h, (3 * w * h)::BIGINT AS n, text FROM dims)
SELECT doc_id, w::INTEGER AS width, h::INTEGER AS height,
       n AS n_px_bytes,
       ({tile_sum})::BIGINT AS pixel_sum
FROM sized
"""


QUERIES["mm_png_decode"] = mm_png_decode
ORACLES["mm_png_decode"] = _oracle_png_decode()
