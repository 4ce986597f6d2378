"""Round-10 STAGING bank: pairs built and cross-engine-proven in
round 9, deliberately left unregistered so next round's opening move
inherits already-proven work (the bank_r6…bank_r9/staged_r9
precedent).  tests/test_bank_r10.py carries the 3-SF driver-style
proofs + the partitioning-invariance sweep; registration is the
round-10 move (QUERIES/ORACLES aliases + _merged() import + window
entries + snapshots + bench + SURVEY §2 rows + SCALING)."""

from __future__ import annotations

from pyspark.sql import functions as F

from faconne_spark.queries import T

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}


# ----------------------------- does priority actually ship faster?

# the synthetic ship lag spans roughly [-2400, 2500] days (shipdate
# is not orderdate-correlated in this generator) — the grid covers it
SHIPLAG_LO, SHIPLAG_WIDTH, SHIPLAG_BINS = -2560.0, 40.0, 128


def orders_priority_shiplag_ks(spark, sf):
    """One-vs-rest binned KS of the SHIP-LAG distribution per order
    priority — the SLA audit that asks whether priority classes
    actually ship on different schedules, distribution-wide, not just
    on average (a mean shift and a tail shift read identically to an
    avg; KS separates them).  Same ks_drift operator and grid
    discipline as the events/lineitem/catalog KS keys."""
    from faconne_spark.operators.evalstats import ks_drift

    lags = (
        T(spark, sf, "lineitem")
        .select("l_orderkey", F.expr("to_date(l_shipdate)").alias("sd"))
        .join(
            T(spark, sf, "orders").select(
                F.col("o_orderkey").alias("l_orderkey"),
                F.expr("to_date(o_orderdate)").alias("od"),
                "o_orderpriority",
            ),
            "l_orderkey",
        )
        .select(
            "o_orderpriority",
            F.expr("cast(datediff(sd, od) as double)").alias("lag"),
        )
    )
    return ks_drift(
        lags, "o_orderpriority", "lag",
        SHIPLAG_LO, SHIPLAG_WIDTH, SHIPLAG_BINS,
    )


ORACLE_PRIORITY_SHIPLAG_KS = f"""
WITH lags AS (
  SELECT o.o_orderpriority,
         (l.l_shipdate::DATE - o.o_orderdate::DATE)::DOUBLE AS lag
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
binned AS (
  SELECT o_orderpriority AS grp,
         cast(least(greatest(floor((lag - {SHIPLAG_LO!r})
           / {SHIPLAG_WIDTH!r}), 0), {SHIPLAG_BINS - 1}) AS INT) AS bin,
         count(*)::BIGINT AS n_gb
  FROM lags WHERE lag IS NOT NULL GROUP BY 1, 2),
grid AS (
  SELECT g.grp, b.bin
  FROM (SELECT DISTINCT grp FROM binned) g
  CROSS JOIN (SELECT DISTINCT bin FROM binned) b),
tot AS (SELECT bin, sum(n_gb)::BIGINT AS n_b FROM binned GROUP BY 1),
cells AS (
  SELECT grid.grp, grid.bin,
         coalesce(n_gb, 0) AS n_in_b,
         n_b - coalesce(n_gb, 0) AS n_out_b
  FROM grid
  LEFT JOIN binned ON binned.grp = grid.grp AND binned.bin = grid.bin
  JOIN tot ON tot.bin = grid.bin),
cum AS (
  SELECT grp,
         sum(n_in_b) OVER (PARTITION BY grp ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_in,
         sum(n_out_b) OVER (PARTITION BY grp ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_out,
         sum(n_in_b) OVER (PARTITION BY grp) AS n_in,
         sum(n_out_b) OVER (PARTITION BY grp) AS n_out
  FROM cells)
SELECT grp AS o_orderpriority,
       max(n_in)::BIGINT AS n_in, max(n_out)::BIGINT AS n_out,
       CASE WHEN max(n_in) > 0 AND max(n_out) > 0 THEN
         round(max(abs(c_in * n_out - c_out * n_in))
               / (max(n_in)::DOUBLE * max(n_out)::DOUBLE), 6)
       END AS ks_d
FROM cum GROUP BY grp
"""

BANK_QUERIES["orders_priority_shiplag_ks"] = orders_priority_shiplag_ks
BANK_ORACLES["orders_priority_shiplag_ks"] = ORACLE_PRIORITY_SHIPLAG_KS


# ------------------------------ engagement concentration per cohort

def events_active_days_gini(spark, sf):
    """Per signup-cohort (first-activity month) Gini of users' ACTIVE
    DAY counts — engagement concentration inside each cohort (a high
    Gini says a thin power-user crust carries the cohort; retention
    averages hide that).  Same exact integer rank-sum Gini as
    orders_revenue_gini; the rank window partitions by cohort — never
    partition-less."""
    from pyspark.sql import Window

    per_user = (
        T(spark, sf, "events")
        .select("user_id", F.expr("to_date(ts)").alias("d"))
        .distinct()
        .groupBy("user_id")
        .agg(
            F.count("*").alias("active_days"),
            F.expr("trunc(min(d), 'MM')").alias("cohort"),
        )
    )
    w = Window.partitionBy("cohort").orderBy("active_days", "user_id")
    ranked = per_user.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("cohort"))
    )
    return ranked.groupBy("cohort").agg(
        F.count("*").alias("n_users"),
        F.sum("active_days").alias("total_active_days"),
        F.round(
            (
                2.0 * F.sum(F.col("rk") * F.col("active_days"))
                - (F.count("*") + 1) * F.sum("active_days")
            )
            / (F.count("*") * F.sum("active_days")),
            6,
        ).alias("gini"),
        F.round(
            F.sum(
                F.when(
                    F.col("rk") * 10 > F.col("n") * 9, F.col("active_days")
                ).otherwise(0)
            )
            / F.sum("active_days"),
            6,
        ).alias("top_decile_share"),
    )


ORACLE_ACTIVE_DAYS_GINI = """
WITH per_user AS (
  SELECT user_id, count(*)::BIGINT AS active_days,
         date_trunc('month', min(d))::DATE AS cohort
  FROM (SELECT DISTINCT user_id, ts::DATE AS d FROM events)
  GROUP BY 1),
ranked AS (
  SELECT cohort, user_id, active_days,
         row_number() OVER (PARTITION BY cohort
                            ORDER BY active_days, user_id) AS rk,
         count(*) OVER (PARTITION BY cohort) AS n
  FROM per_user)
SELECT cohort, count(*)::BIGINT AS n_users,
       sum(active_days)::BIGINT AS total_active_days,
       round((2.0 * sum(rk * active_days)
              - (count(*) + 1) * sum(active_days))
             / (count(*) * sum(active_days)), 6) AS gini,
       round(sum(CASE WHEN rk * 10 > n * 9 THEN active_days ELSE 0 END)
             / sum(active_days), 6) AS top_decile_share
FROM ranked GROUP BY 1
"""

BANK_QUERIES["events_active_days_gini"] = events_active_days_gini
BANK_ORACLES["events_active_days_gini"] = ORACLE_ACTIVE_DAYS_GINI


# ------------------------------------ transition-flow asymmetry

def events_transition_asymmetry(spark, sf):
    """Directional asymmetry of the event-type transition graph: for
    each unordered type pair, the net flow (n_ab − n_ba)/(n_ab + n_ba)
    in half-up integer micro — the funnel-direction detector behind
    events_markov_transitions' raw matrix (a strongly positive
    view→purchase asymmetry is a funnel; symmetric flows are browsing
    noise).  Everything after the one corpus pass runs on the ≤ types²
    relation; the asymmetry keeps Spark's div truncation semantics on
    a non-negative numerator by orienting each pair a < b and signing
    at the end."""
    from pyspark.sql import Window

    ev = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(
            F.col("next_type").isNotNull()
            & (F.col("next_type") != F.col("event_type"))
        )
        .groupBy(
            F.col("event_type").alias("src"),
            F.col("next_type").alias("dst"),
        )
        .agg(F.count("*").alias("n"))
    )
    fwd = trans.select(
        F.expr("least(src, dst)").alias("a"),
        F.expr("greatest(src, dst)").alias("b"),
        F.expr("if(src < dst, n, cast(0 as bigint))").alias("n_ab"),
        F.expr("if(src > dst, n, cast(0 as bigint))").alias("n_ba"),
    )
    pair = fwd.groupBy("a", "b").agg(
        F.sum("n_ab").alias("n_ab"), F.sum("n_ba").alias("n_ba")
    )
    return pair.select(
        F.col("a").alias("type_a"), F.col("b").alias("type_b"),
        "n_ab", "n_ba",
        F.expr(
            "cast(if(n_ab >= n_ba, 1, -1)"
            " * ((2000000 * abs(n_ab - n_ba) + (n_ab + n_ba))"
            " div (2 * (n_ab + n_ba))) as bigint)"
        ).alias("asymmetry_micro"),
    )


ORACLE_TRANSITION_ASYMMETRY = """
WITH trans AS (
  SELECT src, dst, count(*)::BIGINT AS n FROM (
    SELECT event_type AS src,
           lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS dst
    FROM events)
  WHERE dst IS NOT NULL AND dst != src GROUP BY 1, 2),
pair AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
         sum(CASE WHEN src < dst THEN n ELSE 0 END)::BIGINT AS n_ab,
         sum(CASE WHEN src > dst THEN n ELSE 0 END)::BIGINT AS n_ba
  FROM trans GROUP BY 1, 2)
SELECT a AS type_a, b AS type_b, n_ab, n_ba,
       ((CASE WHEN n_ab >= n_ba THEN 1 ELSE -1 END)
        * ((2000000 * abs(n_ab - n_ba) + (n_ab + n_ba))
           // (2 * (n_ab + n_ba))))::BIGINT AS asymmetry_micro
FROM pair
"""

BANK_QUERIES["events_transition_asymmetry"] = events_transition_asymmetry
BANK_ORACLES["events_transition_asymmetry"] = ORACLE_TRANSITION_ASYMMETRY


# ------------------------------------- effective vocabulary (Simpson)

def docs_source_simpson_diversity(spark, sf):
    """Inverse-Simpson effective vocabulary per source: N(N−1)/Σc(c−1)
    — "how many equally-common words would produce this repeat
    probability?" — the concentration end of the lexical-richness
    family (hapax reads the rare end; TTR/Heaps read the growth
    curve).  A source whose effective vocabulary is tiny relative to
    its raw vocab is template text no matter how many distinct words
    it technically contains.

    Exactness: pure integer counting — λ's numerator Σc(c−1) and
    denominator N(N−1) are exact BIGINTs; both reported figures are
    half-up micro divisions of exact integers."""
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "spark")
    cnt = (
        T(spark, sf, "documents")
        .select("source", F.explode(F.expr(toks)).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    return cnt.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("vocab"),
        F.expr(
            "cast((2000000 * sum(c * (c - 1)) + sum(c) * (sum(c) - 1))"
            " div (2 * sum(c) * (sum(c) - 1)) as bigint)"
        ).alias("simpson_lambda_micro"),
        F.expr(
            "case when sum(c * (c - 1)) > 0 then"
            " cast((2000000 * sum(c) * (sum(c) - 1)"
            " + sum(c * (c - 1))) div (2 * sum(c * (c - 1))) as bigint)"
            " end"
        ).alias("effective_vocab_micro"),
    )


def _oracle_simpson_diversity() -> str:
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "duckdb")
    return f"""
WITH cnt AS (
  SELECT source, w, count(*)::BIGINT AS c
  FROM (SELECT source, unnest({toks}) AS w FROM documents)
  GROUP BY 1, 2)
SELECT source, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS vocab,
       ((2000000 * sum(c * (c - 1)) + sum(c) * (sum(c) - 1))
        // (2 * sum(c) * (sum(c) - 1)))::BIGINT AS simpson_lambda_micro,
       CASE WHEN sum(c * (c - 1)) > 0 THEN
         ((2000000 * sum(c) * (sum(c) - 1) + sum(c * (c - 1)))
          // (2 * sum(c * (c - 1))))::BIGINT END AS effective_vocab_micro
FROM cnt GROUP BY 1
"""


BANK_QUERIES["docs_source_simpson_diversity"] = docs_source_simpson_diversity
BANK_ORACLES["docs_source_simpson_diversity"] = _oracle_simpson_diversity()


# ----------------------------------------- Wald–Wolfowitz runs test

def events_daily_runs_test(spark, sf):
    """Wald–Wolfowitz runs test on daily event volume vs its median:
    is the above/below-median sequence RANDOM, or do high days clump
    (momentum/weekly cycles) or alternate (correction dynamics)?  The
    non-parametric randomness gate under every i.i.d.-assuming
    bootstrap upstream.  Days exactly AT the median drop (the
    test's standard treatment).

    Exactness: daily counts are integers and the 2×median is an exact
    integer (midpoint of two integers in both engines), so the
    above/below labels are exact; R, n₁, n₂ are integer counts off a
    lag over the bounded calendar relation; μ_R, σ_R, z are
    final-expression doubles.

    Scale: one events pass to the ≤ days relation; the lag window
    runs on the bounded calendar spine."""
    from pyspark.sql import Window as W

    daily = (
        T(spark, sf, "events")
        .groupBy(F.expr("to_date(ts)").alias("d"))
        .agg(F.count("*").alias("c"))
    )
    med = daily.groupBy().agg(
        F.expr("cast(floor(2 * percentile(c, 0.5) + 0.5) as bigint)").alias(
            "m2"
        )
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.expr("2 * c != m2"))
        .select(
            "d", F.expr("if(2 * c > m2, 1, 0)").alias("s")
        )
    )
    lagged = signed.withColumn(
        "chg",
        F.expr(
            "if(lag(s) over (order by d) is null, 1,"
            " if(s != lag(s) over (order by d), 1, 0))"
        ),
    )
    agg = lagged.groupBy().agg(
        F.sum("chg").alias("r"),
        F.sum("s").alias("n1"),
        F.sum(F.expr("1 - s")).alias("n2"),
    )
    mu = (
        "(2.0 * n1 * n2 / (n1 + n2) + 1.0)"
    )
    var = (
        "(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)"
        " / ((cast(n1 + n2 as double)) * (n1 + n2) * (n1 + n2 - 1)))"
    )
    return agg.select(
        F.col("r").cast("long").alias("n_runs"),
        F.col("n1").cast("long").alias("n_above"),
        F.col("n2").cast("long").alias("n_below"),
        F.expr(
            f"case when n1 > 0 and n2 > 0 and {var} > 0 then"
            f" round((r - {mu}) / sqrt({var}), 6) + 0.0 end"
        ).alias("z_stat"),
    )


ORACLE_DAILY_RUNS_TEST = """
WITH daily AS (
  SELECT ts::DATE AS d, count(*)::BIGINT AS c FROM events GROUP BY 1),
med AS (
  SELECT floor(2 * quantile_cont(c, 0.5) + 0.5)::BIGINT AS m2 FROM daily),
signed AS (
  SELECT d, CASE WHEN 2 * c > m2 THEN 1 ELSE 0 END AS s
  FROM daily CROSS JOIN med WHERE 2 * c != m2),
lagged AS (
  SELECT s, CASE WHEN lag(s) OVER (ORDER BY d) IS NULL THEN 1
                 WHEN s != lag(s) OVER (ORDER BY d) THEN 1 ELSE 0 END AS chg
  FROM signed),
agg AS (
  SELECT sum(chg)::BIGINT AS r, sum(s)::BIGINT AS n1,
         sum(1 - s)::BIGINT AS n2
  FROM lagged)
SELECT r AS n_runs, n1 AS n_above, n2 AS n_below,
       CASE WHEN n1 > 0 AND n2 > 0
                 AND 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                     / ((n1 + n2)::DOUBLE * (n1 + n2) * (n1 + n2 - 1)) > 0
            THEN round((r - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                       / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                              / ((n1 + n2)::DOUBLE * (n1 + n2)
                                 * (n1 + n2 - 1))), 6) + 0.0 END AS z_stat
FROM agg
"""

BANK_QUERIES["events_daily_runs_test"] = events_daily_runs_test
BANK_ORACLES["events_daily_runs_test"] = ORACLE_DAILY_RUNS_TEST


# ------------------------------------------- Spearman by avg ranks

def part_size_price_spearman(spark, sf):
    """Spearman rank correlation between part size and retail price —
    the tie-correct, monotone-association twin of the Pearson key
    (part_size_vs_price_corr): Pearson on average tie-ranks from
    `distributed_avg_ranks` (its third consumer after
    Kruskal–Wallis and Wilcoxon — the primitive earns its keep).

    Exactness: both rank vectors are exact ×2 BIGINT average ranks
    computed on the two distinct-value relations (size domain ~50
    values, price domain ~10³ — both bounded); the five moment sums
    run in BIGINT/DECIMAL(38,0) and ρ is one final double."""
    from faconne_spark.operators.evalstats import spearman_rho

    return spearman_rho(
        T(spark, sf, "part"),
        "cast(p_size as bigint)",
        "cast(floor(p_retailprice * 100 + 0.5) as bigint)",
    ).select(F.col("n_rows").alias("n_parts"), "spearman_rho")


ORACLE_SIZE_PRICE_SPEARMAN = """
WITH base AS (
  SELECT p_size::BIGINT AS sz,
         floor(p_retailprice * 100 + 0.5)::BIGINT AS pc
  FROM part),
ranked AS (
  SELECT 2 * rank() OVER (ORDER BY sz)
           + count(*) OVER (PARTITION BY sz) - 1 AS r_size,
         2 * rank() OVER (ORDER BY pc)
           + count(*) OVER (PARTITION BY pc) - 1 AS r_price
  FROM base),
m AS (
  SELECT count(*)::BIGINT AS n, sum(r_size)::BIGINT AS sx,
         sum(r_price)::BIGINT AS sy,
         sum(r_size::DECIMAL(38,0) * r_price::DECIMAL(38,0)) AS sxy,
         sum(r_size::DECIMAL(38,0) * r_size::DECIMAL(38,0)) AS sxx,
         sum(r_price::DECIMAL(38,0) * r_price::DECIMAL(38,0)) AS syy
  FROM ranked)
SELECT n AS n_parts,
       CASE WHEN n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0
             AND n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE > 0 THEN
         round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
               / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                      * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
               6) + 0.0 END AS spearman_rho
FROM m
"""

BANK_QUERIES["part_size_price_spearman"] = part_size_price_spearman
BANK_ORACLES["part_size_price_spearman"] = ORACLE_SIZE_PRICE_SPEARMAN


# ----------------------------------------- GIF cross-codec hash pin

def mm_gif_ahash(spark, sf):
    """Average-hash over DECODED GIF pixels: synthesize_gif's
    grayscale payloads go through the full container walk +
    variable-width LZW decode inside extract_image_ahash (its filter
    admits image/gif), and the oracle replays the hash in closed form
    from md5(text) — grid cell g samples stored index
    (sy·w + sx) of the tiled digest, 1-channel luma = 3× the sample
    (ahash64_real's grayscale rule), completing the cross-codec hash
    pin for the fourth image container."""
    from faconne_spark.operators import multimodal as MM

    docs = T(spark, sf, "documents")
    # optimization r13 (guide §4): fused single Arrow pass
    return MM.fused_media_stats(
        docs, MM.gif_payload_for_doc, MM.image_ahash_row,
        MM.AHASH_SCHEMA,
    )


def _oracle_gif_ahash() -> str:
    from faconne_spark.functions import bit_mask64

    dig = (
        "list_transform(range(0, 16), i ->"
        " (strpos('0123456789abcdef', substr(hx, (2 * i + 1)::INTEGER, 1)) - 1) * 16"
        " + strpos('0123456789abcdef', substr(hx, (2 * i + 2)::INTEGER, 1)) - 1)"
    )
    # pixels = digest tiled to w*h; grid cell g samples stored pixel
    # (sy, sx) with sy = ((g//8)*h)//8, sx = ((g%8)*w)//8; grayscale
    # luma = 3 * sample
    luma = (
        "3 * d[(((((g // 8) * h) // 8) * w"
        " + (((g % 8) * w) // 8)) % 16) + 1]"
    )
    mask = bit_mask64("g", "duckdb")
    return f"""
WITH img AS (
  SELECT doc_id, md5(text) AS hx FROM documents),
digest AS (
  SELECT doc_id, {dig} AS d FROM img),
geom AS (
  SELECT doc_id, d,
         (8 + (d[1] % 24)) AS w, (8 + (d[2] % 24)) AS h
  FROM digest),
lum AS (
  SELECT doc_id, w, h,
         list_transform(range(0, 64), g -> {luma}) AS ls
  FROM geom),
tot AS (
  SELECT doc_id, w, h, ls, list_sum(ls) AS total FROM lum)
SELECT doc_id, w::INTEGER AS width, h::INTEGER AS height,
       list_sum(list_transform(range(0, 64), g ->
         CASE WHEN 64 * ls[(g + 1)::INTEGER] > total
              THEN {mask} ELSE 0 END))::BIGINT AS ahash64
FROM tot
"""


BANK_QUERIES["mm_gif_ahash"] = mm_gif_ahash
BANK_ORACLES["mm_gif_ahash"] = _oracle_gif_ahash()


# ------------------------------------------- PMI collocation mining

def docs_bigram_pmi_top(spark, sf):
    """Top-20 word collocations by pointwise mutual information over
    the corpus bigram stream (Church & Hanks 1990) — phrase mining:
    which adjacent word pairs co-occur far beyond what their margins
    predict (min count 5 filters the noise hapax pairs that dominate
    raw PMI).  The phrase inventory feeds tokenizer/vocab decisions
    upstream of any frequency model.

    Exactness: PMI = ln(c₁₂·N / (c_L(w₁)·c_R(w₂))) over the bigram
    stream's own margins — one micro ln of an exact BIGINT ratio per
    surviving pair, so the micro PMI is the SORT KEY and the top-20
    cut is identical in both engines (ties break on the words).

    Scale: one bigram explode feeds the pair counts and both margin
    relations (margins are vocabulary-sized → broadcast); the top-20
    is a TakeOrdered, no global sort materializes."""
    from faconne_spark.functions import tokens_ws
    from faconne_spark.session import spread

    toks = tokens_ws("lower(text)", "spark")
    bigrams = (
        f"transform(array({toks}), tk -> case when size(tk) < 2"
        f" then array() else transform(sequence(1, size(tk) - 1),"
        f" i -> concat_ws(' ', slice(tk, i, 2))) end)[0]"
    )
    stream = (
        spread(T(spark, sf, "documents"))
        .select(F.explode(F.expr(bigrams)).alias("bg"))
        .select(
            F.expr("split(bg, ' ')[0]").alias("w1"),
            F.expr("split(bg, ' ')[1]").alias("w2"),
        )
    )
    pairs = stream.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    left = stream.groupBy("w1").agg(F.count("*").alias("cl"))
    right = stream.groupBy("w2").agg(F.count("*").alias("cr"))
    tot = stream.groupBy().agg(F.count("*").alias("n"))
    scored = (
        pairs.filter(F.col("c12") >= 5)
        .join(F.broadcast(left), "w1")
        .join(F.broadcast(right), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.expr(
                "cast(floor(ln(cast(c12 as double) * n"
                " / (cast(cl as double) * cr)) * 1000000 + 0.5)"
                " as bigint)"
            ).alias("pmi_micro"),
        )
    )
    return scored.orderBy(
        F.desc("pmi_micro"), F.asc("w1"), F.asc("w2")
    ).limit(20)


def _oracle_bigram_pmi() -> str:
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "duckdb")
    return f"""
WITH tk AS (
  SELECT doc_id, {toks} AS t FROM documents),
stream AS (
  SELECT t[g.i] AS w1, t[g.i + 1] AS w2
  FROM tk, generate_series(1, 4000) g(i)
  WHERE g.i <= len(t) - 1),
pairs AS (
  SELECT w1, w2, count(*)::BIGINT AS c12 FROM stream GROUP BY 1, 2),
lft AS (SELECT w1, count(*)::BIGINT AS cl FROM stream GROUP BY 1),
rgt AS (SELECT w2, count(*)::BIGINT AS cr FROM stream GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS n FROM stream)
SELECT w1, w2, c12,
       floor(ln(c12::DOUBLE * n / (cl::DOUBLE * cr)) * 1000000
             + 0.5)::BIGINT AS pmi_micro
FROM pairs JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN tot
WHERE c12 >= 5
ORDER BY pmi_micro DESC, w1 ASC, w2 ASC LIMIT 20
"""


BANK_QUERIES["docs_bigram_pmi_top"] = docs_bigram_pmi_top
BANK_ORACLES["docs_bigram_pmi_top"] = _oracle_bigram_pmi()


# ---------------------------------- quality-length confound audit

def docs_quality_length_spearman(spark, sf):
    """Spearman ρ between the distinct-token ratio (the repetition
    quality feature) and document length — the length-confound audit:
    type-token ratios mechanically DECLINE with length (Herdan/Heaps),
    so a corpus gate on distinct_ratio without length stratification
    silently becomes a length gate.  A strong negative ρ here says
    exactly that; composition of the quality_score operator with
    evalstats.spearman_rho (rank-based, so the heavy length tail
    cannot dominate the answer the way Pearson would let it).

    Exactness: distinct_ratio is already 6-rounded, so its micro
    scaling is an exact integer; the ranks and moments follow the
    spearman_rho discipline."""
    from faconne_spark.operators.evalstats import spearman_rho
    from faconne_spark.operators.text import quality_score

    q = quality_score(T(spark, sf, "documents"))
    return spearman_rho(
        q,
        "cast(floor(distinct_ratio * 1000000 + 0.5) as bigint)",
        "cast(n_chars as bigint)",
    ).select(F.col("n_rows").alias("n_docs"), "spearman_rho")


def _oracle_quality_length_spearman() -> str:
    from faconne_spark.queries.pipeline import ORACLE_QUALITY

    return f"""
WITH q AS ({ORACLE_QUALITY.strip()}),
base AS (
  SELECT floor(distinct_ratio * 1000000 + 0.5)::BIGINT AS x,
         n_chars::BIGINT AS y
  FROM q),
ranked AS (
  SELECT 2 * rank() OVER (ORDER BY x)
           + count(*) OVER (PARTITION BY x) - 1 AS r_x,
         2 * rank() OVER (ORDER BY y)
           + count(*) OVER (PARTITION BY y) - 1 AS r_y
  FROM base),
m AS (
  SELECT count(*)::BIGINT AS n, sum(r_x)::BIGINT AS sx,
         sum(r_y)::BIGINT AS sy,
         sum(r_x::DECIMAL(38,0) * r_y::DECIMAL(38,0)) AS sxy,
         sum(r_x::DECIMAL(38,0) * r_x::DECIMAL(38,0)) AS sxx,
         sum(r_y::DECIMAL(38,0) * r_y::DECIMAL(38,0)) AS syy
  FROM ranked)
SELECT n AS n_docs,
       CASE WHEN n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0
             AND n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE > 0 THEN
         round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
               / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                      * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
               6) + 0.0 END AS spearman_rho
FROM m
"""


BANK_QUERIES["docs_quality_length_spearman"] = docs_quality_length_spearman
BANK_ORACLES["docs_quality_length_spearman"] = _oracle_quality_length_spearman()


# ------------------------------------------ weekday value Kruskal

def events_value_kruskal_by_dow(spark, sf):
    """Kruskal–Wallis across the seven days of the week on event
    value — does ANY weekday's value distribution differ, rank-based
    (the weekend key pairs WITHIN users; this compares the seven
    whole populations with no normality assumption)?  Second consumer
    of evalstats.kruskal_wallis after the brand-price key — the
    operator works over any relation + integer expression."""
    from faconne_spark.operators.evalstats import kruskal_wallis

    ev = T(spark, sf, "events").select(
        F.expr(
            "cast(datediff(to_date(ts), DATE'1970-01-01') % 7 as int)"
        ).alias("dw"),
        F.expr("cast(floor(value * 1000000 + 0.5) as bigint)").alias("v"),
    )
    return kruskal_wallis(ev, "dw", "v").select(
        F.col("n_rows").alias("n_events"),
        F.col("k_groups").alias("k_days"),
        "df",
        "h_stat",
        "tie_correction",
        "h_adj",
    )


ORACLE_VALUE_KRUSKAL_DOW = """
WITH ranked AS (
  SELECT dw,
         2 * rank() OVER (ORDER BY v)
           + count(*) OVER (PARTITION BY v) - 1 AS avg2_rank,
         count(*) OVER (PARTITION BY v) AS t
  FROM (SELECT (ts::DATE - DATE '1970-01-01') % 7 AS dw,
               floor(value * 1000000 + 0.5)::BIGINT AS v
        FROM events)),
per_g AS (
  SELECT dw, count(*)::BIGINT AS n_j, sum(avg2_rank)::BIGINT AS s2_j
  FROM ranked GROUP BY 1),
cells AS (
  SELECT n_j,
         floor(s2_j::DOUBLE * s2_j::DOUBLE / n_j + 0.5)::BIGINT AS cell
  FROM per_g),
ties AS (
  SELECT sum(t * t - 1)::BIGINT AS tie_sum, count(*)::BIGINT AS n
  FROM ranked)
SELECT min(n)::BIGINT AS n_events, count(*)::BIGINT AS k_days,
       (count(*) - 1)::BIGINT AS df,
       round(3.0 * sum(cell) / (min(n)::DOUBLE * (min(n) + 1))
             - 3.0 * (min(n) + 1), 6) + 0.0 AS h_stat,
       round(1.0 - min(tie_sum)::DOUBLE
             / (min(n)::DOUBLE * min(n) * min(n) - min(n)), 9) + 0.0
         AS tie_correction,
       CASE WHEN 1.0 - min(tie_sum)::DOUBLE
                  / (min(n)::DOUBLE * min(n) * min(n) - min(n)) > 0
            THEN round((3.0 * sum(cell)
                        / (min(n)::DOUBLE * (min(n) + 1))
                        - 3.0 * (min(n) + 1))
                       / (1.0 - min(tie_sum)::DOUBLE
                          / (min(n)::DOUBLE * min(n) * min(n) - min(n))),
                       6) + 0.0 END AS h_adj
FROM cells CROSS JOIN ties
"""

BANK_QUERIES["events_value_kruskal_by_dow"] = events_value_kruskal_by_dow
BANK_ORACLES["events_value_kruskal_by_dow"] = ORACLE_VALUE_KRUSKAL_DOW


# ------------------------------------------------ Friedman blocked test

def events_weekday_friedman(spark, sf):
    """Friedman rank test of the weekday volume pattern across weeks
    (Friedman 1937): each COMPLETE week is a block, its seven daily
    counts are ranked within the block, and χ²_F asks whether any
    weekday consistently ranks high or low ACROSS weeks — the blocked
    companion to the one-way Kruskal key (weeks are repeated
    measures, not independent samples; pooling them hides a weekly
    pattern behind between-week volume drift).  Ties take average
    ranks; the tie-corrected statistic divides by
    1 − Σ(t³−t)/(n·k·(k²−1)).

    Exactness: within-block average ranks are ×2 BIGINTs from a
    WEEK-PARTITIONED window (block size ≤ 7 — bounded, parallel);
    rank sums, their squares, and the tie term are exact integers;
    χ²_F and the correction are final-expression doubles.

    Scale: one events pass to (week, weekday) counts; every window
    partitions by week; the weekday rollup is 7 rows."""
    from pyspark.sql import Window as W

    daily = (
        T(spark, sf, "events")
        .groupBy(
            F.expr("trunc(to_date(ts), 'week')").alias("wk"),
            F.expr(
                "cast(datediff(to_date(ts), DATE'1970-01-01') % 7 as int)"
            ).alias("dw"),
        )
        .agg(F.count("*").alias("c"))
    )
    complete = (
        daily.groupBy("wk")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") == 7)
        .select("wk")
    )
    blocks = daily.join(complete, "wk")
    win = W.partitionBy("wk")
    ranked = blocks.select(
        "wk",
        "dw",
        (
            2 * F.expr("rank() over (partition by wk order by c)")
            + F.count("*").over(win.partitionBy("wk", "c"))
            - 1
        ).alias("avg2"),
        F.count("*").over(win.partitionBy("wk", "c")).alias("t"),
    )
    per_dw = ranked.groupBy("dw").agg(F.sum("avg2").alias("r2"))
    cells = per_dw.select(
        F.expr("r2 * r2").alias("r2sq")
    )
    meta = ranked.groupBy().agg(
        F.expr("count(distinct wk)").alias("n"),
        F.sum(F.expr("t * t - 1")).alias("tie_sum"),
    )
    chi = (
        "3.0 * sum(r2sq) / (cast(min(n) as double) * 7 * 8)"
        " - 3.0 * min(n) * 8"
    )
    corr = (
        "1.0 - cast(min(tie_sum) as double)"
        " / (cast(min(n) as double) * 7 * 48)"
    )
    return cells.crossJoin(F.broadcast(meta)).groupBy().agg(
        F.min("n").cast("long").alias("n_weeks"),
        F.lit(6).cast("long").alias("df"),
        F.expr(f"round({chi}, 6) + 0.0").alias("friedman_chi2"),
        F.expr(f"round({corr}, 9) + 0.0").alias("tie_correction"),
        F.expr(
            f"case when {corr} > 0 then"
            f" round(({chi}) / ({corr}), 6) + 0.0 end"
        ).alias("chi2_adj"),
    )


ORACLE_WEEKDAY_FRIEDMAN = """
WITH daily AS (
  SELECT date_trunc('week', ts::DATE)::DATE AS wk,
         (ts::DATE - DATE '1970-01-01') % 7 AS dw,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
complete AS (
  SELECT wk FROM daily GROUP BY wk HAVING count(*) = 7),
blocks AS (SELECT d.* FROM daily d JOIN complete USING (wk)),
ranked AS (
  SELECT wk, dw,
         2 * rank() OVER (PARTITION BY wk ORDER BY c)
           + count(*) OVER (PARTITION BY wk, c) - 1 AS avg2,
         count(*) OVER (PARTITION BY wk, c) AS t
  FROM blocks),
per_dw AS (SELECT dw, sum(avg2)::BIGINT AS r2 FROM ranked GROUP BY 1),
meta AS (
  SELECT count(DISTINCT wk)::BIGINT AS n,
         sum(t * t - 1)::BIGINT AS tie_sum
  FROM ranked)
SELECT min(n)::BIGINT AS n_weeks, 6::BIGINT AS df,
       round(3.0 * sum(r2 * r2) / (min(n)::DOUBLE * 7 * 8)
             - 3.0 * min(n) * 8, 6) + 0.0 AS friedman_chi2,
       round(1.0 - min(tie_sum)::DOUBLE / (min(n)::DOUBLE * 7 * 48), 9)
         + 0.0 AS tie_correction,
       CASE WHEN 1.0 - min(tie_sum)::DOUBLE
                  / (min(n)::DOUBLE * 7 * 48) > 0 THEN
         round((3.0 * sum(r2 * r2) / (min(n)::DOUBLE * 7 * 8)
                - 3.0 * min(n) * 8)
               / (1.0 - min(tie_sum)::DOUBLE
                  / (min(n)::DOUBLE * 7 * 48)), 6) + 0.0 END AS chi2_adj
FROM per_dw CROSS JOIN meta
"""

BANK_QUERIES["events_weekday_friedman"] = events_weekday_friedman
BANK_ORACLES["events_weekday_friedman"] = ORACLE_WEEKDAY_FRIEDMAN


# ------------------------------------------- Bowley robust skewness

def events_value_bowley_skew(spark, sf):
    """Quantile-based (Bowley/Galton) skewness per event type:
    (Q₃ + Q₁ − 2·Q₂)/(Q₃ − Q₁) — the outlier-immune companion to the
    moment-based Jarque–Bera key (one fat whale can swing a third
    moment arbitrarily; it cannot move a quartile), bounded in
    [−1, 1] so types are directly comparable.

    Exactness: on integer micro values, each quartile interpolates at
    a position whose fraction is a multiple of ¼, so 4·Q is an exact
    integer in BOTH engines (the ×2 median trick generalized); the
    coefficient is one final double from those exact integers."""
    ev = T(spark, sf, "events").select(
        "event_type",
        F.expr("cast(floor(value * 1000000 + 0.5) as bigint)").alias("v"),
    )
    q = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.expr(
            "cast(floor(4 * percentile(v, 0.25) + 0.5) as bigint)"
        ).alias("q1_x4"),
        F.expr(
            "cast(floor(4 * percentile(v, 0.5) + 0.5) as bigint)"
        ).alias("q2_x4"),
        F.expr(
            "cast(floor(4 * percentile(v, 0.75) + 0.5) as bigint)"
        ).alias("q3_x4"),
    )
    return q.select(
        "event_type",
        "n_events",
        "q1_x4",
        "q2_x4",
        "q3_x4",
        F.expr(
            "case when q3_x4 > q1_x4 then"
            " round(cast(q3_x4 + q1_x4 - 2 * q2_x4 as double)"
            " / (q3_x4 - q1_x4), 6) + 0.0 end"
        ).alias("bowley_skew"),
    )


ORACLE_VALUE_BOWLEY = """
WITH ev AS (
  SELECT event_type, floor(value * 1000000 + 0.5)::BIGINT AS v
  FROM events),
q AS (
  SELECT event_type, count(*)::BIGINT AS n_events,
         floor(4 * quantile_cont(v, 0.25) + 0.5)::BIGINT AS q1_x4,
         floor(4 * quantile_cont(v, 0.5) + 0.5)::BIGINT AS q2_x4,
         floor(4 * quantile_cont(v, 0.75) + 0.5)::BIGINT AS q3_x4
  FROM ev GROUP BY 1)
SELECT event_type, n_events, q1_x4, q2_x4, q3_x4,
       CASE WHEN q3_x4 > q1_x4 THEN
         round((q3_x4 + q1_x4 - 2 * q2_x4)::DOUBLE / (q3_x4 - q1_x4), 6)
         + 0.0 END AS bowley_skew
FROM q
"""

BANK_QUERIES["events_value_bowley_skew"] = events_value_bowley_skew
BANK_ORACLES["events_value_bowley_skew"] = ORACLE_VALUE_BOWLEY


# ---------------------------------------- GIF pixel-entropy gauge

def mm_gif_pixel_entropy(spark, sf):
    """Image-complexity gauge over REAL GIF decode: Shannon entropy
    of the decoded pixel-value histogram per image (flat fills ≈ 0
    nats, rich content → ln 256) — the cheap blank/synthetic-image
    pre-filter in front of any embedding stage, proven through the
    full LZW decode with a closed-form oracle (the tiled-digest
    pixels make every value count an exact integer formula of the
    md5 hex digits)."""
    from faconne_spark.operators import multimodal as MM

    docs = T(spark, sf, "documents")
    return MM.extract_gif_pixel_entropy(MM.synthesize_gif(docs))


def _oracle_gif_pixel_entropy() -> str:
    hexb = (
        "((strpos('0123456789abcdef', substr(md5(text), {p}, 1)) - 1) * 16"
        " + strpos('0123456789abcdef', substr(md5(text), {p1}, 1)) - 1)"
    )
    b = [hexb.format(p=2 * i + 1, p1=2 * i + 2) for i in range(16)]
    return f"""
WITH geom AS (
  SELECT doc_id,
         ((8 + {b[0]} % 24) * (8 + {b[1]} % 24))::BIGINT AS n,
         list_value({", ".join(b)}) AS d
  FROM documents),
pos AS (
  SELECT doc_id, n, d[i + 1] AS v,
         (n // 16 + CASE WHEN i < n % 16 THEN 1 ELSE 0 END)::BIGINT AS ci
  FROM geom, unnest(range(0, 16)) AS u(i)),
vals AS (
  SELECT doc_id, n, v, sum(ci)::BIGINT AS c
  FROM pos GROUP BY 1, 2, 3),
cells AS (
  SELECT doc_id, n, c,
         floor(ln(n::DOUBLE / c) * 1000000 + 0.5)::BIGINT AS l
  FROM vals)
SELECT doc_id, min(n)::BIGINT AS n_px,
       count(*)::BIGINT AS n_distinct_values,
       ((2 * sum(c * l) + min(n)) // (2 * min(n)))::BIGINT
         AS entropy_micro_nats
FROM cells GROUP BY doc_id
"""


BANK_QUERIES["mm_gif_pixel_entropy"] = mm_gif_pixel_entropy
BANK_ORACLES["mm_gif_pixel_entropy"] = _oracle_gif_pixel_entropy()


# ------------------------------------------------ QQ decile ladder

def events_type_value_qq(spark, sf):
    """Quantile-quantile ladder between every two event types' value
    distributions: both distributions read at the nine interior
    deciles, with the per-decile micro gap — the WHERE-do-they-differ
    companion to the KS keys (KS reports one sup statistic; the QQ
    ladder localizes the divergence: "identical up to the median,
    then type A's tail runs away").

    Exactness: at probability k/10 the interpolation fraction is a
    multiple of 1/10, so 10× each decile of integer micro values is
    an exact BIGINT in both engines (the ×2-median trick generalized
    to the decile grid); gaps subtract exact integers.

    Scale: one grouped percentile pass (≤ types rows), a 9-row
    unpivot per type, and a broadcast self-join on decile."""
    probs = [round(k / 10, 1) for k in range(1, 10)]
    aggs = [F.count("*").alias("n")] + [
        F.expr(
            f"cast(floor(10 * percentile(v, {p}) + 0.5) as bigint)"
        ).alias(f"q_{k}")
        for k, p in enumerate(probs, start=1)
    ]
    q = (
        T(spark, sf, "events")
        .select(
            "event_type",
            F.expr("cast(floor(value * 1000000 + 0.5) as bigint)").alias(
                "v"
            ),
        )
        .groupBy("event_type")
        .agg(*aggs)
    )
    stack = ", ".join(f"{k}, q_{k}" for k in range(1, 10))
    ladder = q.select(
        "event_type",
        "n",
        F.expr(f"stack(9, {stack}) as (decile, q_x10)"),
    )
    a = ladder.select(
        F.col("event_type").alias("type_a"),
        "decile",
        F.col("n").alias("n_a"),
        F.col("q_x10").alias("qa_x10"),
    )
    b = ladder.select(
        F.col("event_type").alias("type_b"),
        "decile",
        F.col("n").alias("n_b"),
        F.col("q_x10").alias("qb_x10"),
    )
    return (
        a.join(F.broadcast(b), "decile")
        .filter(F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            "decile",
            "qa_x10",
            "qb_x10",
            F.expr("qb_x10 - qa_x10").alias("gap_x10"),
        )
    )


ORACLE_TYPE_VALUE_QQ = """
WITH ev AS (
  SELECT event_type, floor(value * 1000000 + 0.5)::BIGINT AS v
  FROM events),
q AS (
  SELECT event_type, count(*)::BIGINT AS n,
         {cols}
  FROM ev GROUP BY 1),
ladder AS (
  {ladder}
)
SELECT a.event_type AS type_a, b.event_type AS type_b, a.decile,
       a.q_x10 AS qa_x10, b.q_x10 AS qb_x10,
       (b.q_x10 - a.q_x10)::BIGINT AS gap_x10
FROM ladder a JOIN ladder b
  ON a.decile = b.decile AND a.event_type < b.event_type
""".format(
    cols=",\n         ".join(
        f"floor(10 * quantile_cont(v, {k / 10}) + 0.5)::BIGINT AS q_{k}"
        for k in range(1, 10)
    ),
    ladder="\n  UNION ALL\n  ".join(
        f"SELECT event_type, {k} AS decile, q_{k} AS q_x10 FROM q"
        for k in range(1, 10)
    ),
)

BANK_QUERIES["events_type_value_qq"] = events_type_value_qq
BANK_ORACLES["events_type_value_qq"] = ORACLE_TYPE_VALUE_QQ


# registered in round 10 (the staged proofs became driver-gated keys)
QUERIES = BANK_QUERIES
ORACLES = BANK_ORACLES
